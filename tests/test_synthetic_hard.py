"""Hard benchmark generator: graded SNR/FI metadata, difficulty, determinism.

The hard generator exists so quality claims are anchored on a benchmark with
discriminating power (VERDICT r3 item 1) — these tests pin the properties that
make it one: measured (not nominal) SNR spanning a wide range, FI spread with
LP/VT overlap, colored noise, and emergent onsets. Reference difficulty model:
VCSEIS (reference README.md:98-112), SNR definition `volpick/data/utils.py:45-102`.
"""

import numpy as np
import pandas as pd
import pytest

from volpick_tpu.data.dataset import load_dataset
from volpick_tpu.data.synthetic import make_hard_synthetic_dataset


@pytest.fixture(scope="module")
def hard_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("hard") / "ds"
    make_hard_synthetic_dataset(d, n_events=60, n_noise=15, n_samples=6001, seed=11)
    return d


class TestHardMetadata:
    def test_measured_snr_fi_columns(self, hard_ds):
        md = pd.read_csv(hard_ds / "metadata.csv")
        ev = md[md.source_type != "noise"]
        no = md[md.source_type == "noise"]
        assert ev.trace_mean_snr_db.notna().all()
        assert ev.trace_frequency_index.notna().all()
        assert no.trace_mean_snr_db.isna().all()

    def test_snr_spread_is_graded(self, hard_ds):
        md = pd.read_csv(hard_ds / "metadata.csv")
        snr = md[md.source_type != "noise"].trace_mean_snr_db
        # target range (-5, 40); composed-trace measurement floors near 0 dB
        assert snr.max() - snr.min() > 20.0
        assert snr.min() < 6.0
        assert snr.max() > 28.0

    def test_fi_spread_with_lp_vt_overlap(self, hard_ds):
        md = pd.read_csv(hard_ds / "metadata.csv")
        ev = md[md.source_type != "noise"]
        fi = ev.trace_frequency_index
        assert fi.max() - fi.min() > 1.5
        lp = ev[ev.source_type == "lp"].trace_frequency_index
        vt = ev[ev.source_type == "regular"].trace_frequency_index
        # LP sits lower on average but the distributions overlap (the point)
        assert lp.median() < vt.median()
        assert lp.max() > vt.min()

    def test_picks_in_bounds(self, hard_ds):
        md = pd.read_csv(hard_ds / "metadata.csv")
        ev = md[md.source_type != "noise"]
        p = ev.trace_p_arrival_sample.to_numpy()
        s = ev.trace_s_arrival_sample.to_numpy()
        assert (p > 10).all() and (s > p).all() and (s < 6001).all()


class TestHardWaveforms:
    def test_noise_is_colored(self, hard_ds):
        """Background spectrum must fall with frequency (1/f^alpha), unlike
        the easy generator's white noise."""
        ds = load_dataset(hard_ds)
        md = ds.metadata
        idx = md.index[md.source_type == "noise"][:5]
        for i in idx:
            x = ds.get_waveforms(int(i))[0]
            x = x[x != 0]  # skip gap zeros
            if len(x) < 2048:
                continue
            spec = np.abs(np.fft.rfft(x[:4096] * np.hanning(len(x[:4096]))))
            freq = np.fft.rfftfreq(len(x[:4096]), 0.01)
            lo = spec[(freq > 0.1) & (freq < 1.0)].mean()
            hi = spec[(freq > 10.0) & (freq < 40.0)].mean()
            assert lo > 2.0 * hi

    def test_low_snr_events_are_buried(self, hard_ds):
        """At measured SNR < 3 dB the P onset must not be visually trivial:
        pre-P and post-P RMS within ~2x."""
        ds = load_dataset(hard_ds)
        md = ds.metadata
        ev = md[(md.source_type != "noise") & (md.trace_mean_snr_db < 3.0)]
        checked = 0
        for i in ev.index[:5]:
            p = int(md.loc[i, "trace_p_arrival_sample"])
            if p < 600:
                continue
            x = ds.get_waveforms(int(i))
            pre = np.sqrt(np.mean(x[:, p - 500 : p] ** 2))
            post = np.sqrt(np.mean(x[:, p : p + 500] ** 2))
            assert post < 2.5 * pre
            checked += 1
        if checked == 0:
            pytest.skip("no low-SNR event with room before P in this draw")

    def test_deterministic(self, tmp_path):
        a = make_hard_synthetic_dataset(tmp_path / "a", n_events=8, n_noise=2,
                                        n_samples=3001, seed=5)
        b = make_hard_synthetic_dataset(tmp_path / "b", n_events=8, n_noise=2,
                                        n_samples=3001, seed=5)
        ma, mb = pd.read_csv(a / "metadata.csv"), pd.read_csv(b / "metadata.csv")
        pd.testing.assert_frame_equal(ma, mb)
        da, db = load_dataset(a), load_dataset(b)
        np.testing.assert_array_equal(da.get_waveforms(0), db.get_waveforms(0))

    def test_loads_and_windows(self, hard_ds):
        ds = load_dataset(hard_ds)
        assert len(ds) == 75
        x = ds.get_waveforms(0)
        assert x.shape == (3, 6001) and np.isfinite(x).all()


class TestDomains:
    def test_default_domain_is_identity(self, tmp_path):
        """Passing domain=DEFAULT_DOMAIN (or no domain) must reproduce the
        committed benchmark bit-exactly — parameterizing the physics must not
        perturb the rng call order."""
        from volpick_tpu.data.synthetic import DEFAULT_DOMAIN

        a = make_hard_synthetic_dataset(tmp_path / "a", n_events=8, n_noise=2,
                                        n_samples=3001, seed=5)
        b = make_hard_synthetic_dataset(tmp_path / "b", n_events=8, n_noise=2,
                                        n_samples=3001, seed=5,
                                        domain=dict(DEFAULT_DOMAIN))
        da, db = load_dataset(a), load_dataset(b)
        pd.testing.assert_frame_equal(da.metadata, db.metadata)
        for i in range(len(da)):
            np.testing.assert_array_equal(da.get_waveforms(i), db.get_waveforms(i))

    def test_shifted_domain_shifts_physics(self, tmp_path):
        """SHIFTED_DOMAIN (the cross-domain study's foreign physics) must
        measurably shift the frequency-index distribution upward (higher
        corners) relative to the default domain at the same seed."""
        from volpick_tpu.data.synthetic import SHIFTED_DOMAIN

        a = make_hard_synthetic_dataset(tmp_path / "base", n_events=24, n_noise=4,
                                        seed=9)
        b = make_hard_synthetic_dataset(tmp_path / "shift", n_events=24, n_noise=4,
                                        seed=9, domain=SHIFTED_DOMAIN,
                                        lp_fraction=0.15)
        fa = pd.read_csv(a / "metadata.csv")["trace_frequency_index"].dropna()
        fb = pd.read_csv(b / "metadata.csv")["trace_frequency_index"].dropna()
        assert fb.median() > fa.median() + 0.3
        # waveforms differ even at identical seed
        da, db = load_dataset(a), load_dataset(b)
        assert not np.array_equal(da.get_waveforms(0), db.get_waveforms(0))
