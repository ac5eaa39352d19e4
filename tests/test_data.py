"""Dataset layer tests: writer→reader roundtrip, chunks, splits, subsets."""

import numpy as np
import pandas as pd
import pytest

from volpick_tpu.data import (
    VCSEIS,
    WaveformDataset,
    WaveformDataWriter,
    assemble_datasets,
    generate_chunk_file,
    load_dataset,
)
from volpick_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    make_synthetic_dataset(d, n_events=20, n_noise=6, n_samples=3000, seed=1)
    return d


class TestForeignLayout:
    """Read a dataset written by raw h5py/pandas in layouts SeisBench itself
    produces but our own WaveformDataWriter never does: chunked file pairs
    with a `chunks` index, per-trace (non-bucketed) datasets, float64
    storage, WC dimension order, ENZ component order, 50 Hz sampling, and no
    split column (closes the round-2 'never parsed a foreign-written HDF5'
    validation gap at the layout level; reference
    `volpick/data/utils.py:117-139` writes through seisbench itself)."""

    @pytest.fixture()
    def foreign(self, tmp_path):
        import h5py

        rng = np.random.default_rng(4)
        chunks = ["_a", "_b"]
        waves = {}
        for ci, chunk in enumerate(chunks):
            rows = []
            with h5py.File(tmp_path / f"waveforms{chunk}.hdf5", "w") as f:
                g = f.create_group("data")
                fmt = f.create_group("data_format")
                fmt.create_dataset("dimension_order", data=b"WC")
                fmt.create_dataset("component_order", data=b"ENZ")
                fmt.create_dataset("sampling_rate", data=50.0)
                for i in range(3):
                    name = f"tr{ci}_{i}"
                    w = rng.normal(size=(3, 1500 + 100 * i)).astype(np.float64)
                    waves[name] = w
                    g.create_dataset(name, data=w.T)  # WC on disk
                    rows.append({
                        "trace_name": name,
                        "trace_sampling_rate_hz": 50.0,
                        "trace_p_arrival_sample": 300.0 + i,
                        "source_type": "earthquake",
                    })
            pd.DataFrame(rows).to_csv(tmp_path / f"metadata{chunk}.csv", index=False)
        (tmp_path / "chunks").write_text("\n".join(chunks) + "\n")
        return tmp_path, waves

    def test_reads_foreign_layout(self, foreign):
        path, waves = foreign
        ds = WaveformDataset(path, sampling_rate=100.0, component_order="ZNE")
        assert len(ds) == 6
        assert not ds.had_split_column and (ds.metadata["split"] == "train").all()
        data, md = ds.get_sample(0)
        name = ds.metadata.iloc[0]["trace_name"]
        src = waves[name]
        # 50 -> 100 Hz resample doubles W; ENZ -> ZNE flips channel order
        assert data.shape == (3, 2 * src.shape[1])
        np.testing.assert_allclose(
            data[0, 50:-50:2], src[2, 25:-25], rtol=0.2, atol=0.3
        )  # Z channel content survives (polyphase resample, interior samples)
        assert md["trace_p_arrival_sample"] == 600.0 + ds.metadata.index[0]  # rescaled onset
        assert md["trace_sampling_rate_hz"] == 100.0

    def test_native_rate_no_resample(self, foreign):
        path, waves = foreign
        ds = WaveformDataset(path, sampling_rate=50.0, component_order="ENZ")
        data, md = ds.get_sample(3)
        name = ds.metadata.iloc[3]["trace_name"]
        np.testing.assert_allclose(data, waves[name].astype(np.float32), atol=1e-6)


class TestWriterReader:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        waves = [rng.normal(size=(3, 100 + 17 * i)).astype(np.float32) for i in range(5)]
        with WaveformDataWriter(tmp_path / "metadata.csv", tmp_path / "waveforms.hdf5") as w:
            w.data_format = {"dimension_order": "CW", "component_order": "ZNE"}
            for i, wave in enumerate(waves):
                w.add_trace(
                    {"trace_name": f"tr{i}", "trace_sampling_rate_hz": 100.0, "split": "train"},
                    wave,
                )
        ds = WaveformDataset(tmp_path)
        assert len(ds) == 5
        for i, wave in enumerate(waves):
            got = ds.get_waveforms(i)
            np.testing.assert_allclose(got, wave, atol=1e-6)

    def test_bucket_packing(self, tmp_path):
        import h5py

        with WaveformDataWriter(
            tmp_path / "metadata.csv", tmp_path / "waveforms.hdf5", bucket_size=4
        ) as w:
            w.data_format = {"dimension_order": "CW", "component_order": "ZNE"}
            for i in range(10):
                w.add_trace({"trace_name": f"tr{i}"}, np.full((3, 50), float(i), np.float32))
        with h5py.File(tmp_path / "waveforms.hdf5") as f:
            assert len(f["data"]) < 10  # packed into buckets
        md = pd.read_csv(tmp_path / "metadata.csv")
        assert md["trace_name"].str.contains(r"\$").all()
        ds = WaveformDataset(tmp_path)
        got = ds.get_waveforms(7)
        np.testing.assert_allclose(got, np.full((3, 50), 7.0), atol=0)

    def test_component_reorder(self, tmp_path):
        wave = np.stack([np.full(20, 1.0), np.full(20, 2.0), np.full(20, 3.0)]).astype(np.float32)
        with WaveformDataWriter(tmp_path / "metadata.csv", tmp_path / "waveforms.hdf5") as w:
            w.data_format = {"dimension_order": "CW", "component_order": "ZNE"}
            w.add_trace({"trace_name": "a", "trace_sampling_rate_hz": 100.0}, wave)
        ds = WaveformDataset(tmp_path, component_order="ENZ")
        got = ds.get_waveforms(0)
        np.testing.assert_array_equal(got[:, 0], [3.0, 2.0, 1.0])

    def test_resampling_on_read(self, tmp_path):
        wave = np.sin(np.arange(400) / 10).astype(np.float32)[None, :].repeat(3, 0)
        with WaveformDataWriter(tmp_path / "metadata.csv", tmp_path / "waveforms.hdf5") as w:
            w.data_format = {"dimension_order": "CW", "component_order": "ZNE"}
            w.add_trace(
                {
                    "trace_name": "a",
                    "trace_sampling_rate_hz": 200.0,
                    "trace_p_arrival_sample": 100.0,
                },
                wave,
            )
        ds = WaveformDataset(tmp_path, sampling_rate=100.0)
        data, md = ds.get_sample(0)
        assert data.shape[-1] == 200
        assert md["trace_p_arrival_sample"] == pytest.approx(50.0)


class TestDataset:
    def test_splits(self, synth_ds):
        ds = WaveformDataset(synth_ds)
        train, dev, test = ds.train_dev_test()
        assert len(train) + len(dev) + len(test) == len(ds)
        assert (train.metadata["split"] == "train").all()

    def test_vcseis_selectors(self, synth_ds):
        ds = VCSEIS(synth_ds)
        lp = ds.get_long_period_earthquakes()
        reg = ds.get_regular_earthquakes()
        noise = ds.get_noise_traces()
        assert len(lp) + len(reg) + len(noise) == len(ds)
        assert len(noise) == 6
        assert (lp._source_type() == "lp").all()
        alaska = ds.get_alaska_subset()
        assert len(alaska) == len(ds)  # all synth stations are AV

    def test_load_dataset(self, synth_ds):
        ds = load_dataset(synth_ds)
        assert ds.sampling_rate == 100.0
        assert len(ds) == 26

    def test_preload(self, synth_ds):
        ds = WaveformDataset(synth_ds, cache="full")
        ds.preload_waveforms()
        assert len(ds._waveform_cache) == len(ds)


class TestAssembly:
    def test_assemble(self, tmp_path):
        d1, d2 = tmp_path / "a", tmp_path / "b"
        make_synthetic_dataset(d1, n_events=4, n_noise=0, n_samples=500, chunk="_r1")
        make_synthetic_dataset(d2, n_events=3, n_noise=2, n_samples=500, chunk="_r2", seed=9)
        dest = tmp_path / "combined"
        chunks = assemble_datasets({d1: ["_r1"], d2: ["_r2"]}, dest)
        assert chunks == ["_r1", "_r2"]
        ds = WaveformDataset(dest)
        assert len(ds) == 9
        assert set(ds.metadata["trace_chunk"]) == {"_r1", "_r2"}

    def test_repack(self, synth_ds, tmp_path):
        """repack_dataset preserves content and multiplies the block count so
        training_fraction subsampling resolves small fractions (the
        docs/DIFFSIZE.md granularity fix)."""
        from volpick_tpu.data import repack_dataset
        from volpick_tpu.train.trainer import apply_training_fraction

        src = WaveformDataset(synth_ds)
        dest = tmp_path / "fine"
        n_buckets = repack_dataset(synth_ds, dest, bucket_size=4)
        out = WaveformDataset(dest)
        assert len(out) == len(src)
        assert n_buckets == -(-len(src) // 4)
        # waveforms byte-identical per trace, all non-ref metadata preserved
        for i in (0, 7, len(src) - 1):
            np.testing.assert_array_equal(out.get_waveforms(i), src.get_waveforms(i))
        for col in src.metadata.columns:
            if col == "trace_name":
                continue
            a, b = src.metadata[col], out.metadata[col]
            assert (a.fillna("~") == b.fillna("~")).all() if a.isna().any() else (a == b).all()
        # distinct subsets at fractions that would collapse on coarse packing
        sizes = []
        for frac in (0.15, 0.45, 0.9):
            sub = WaveformDataset(dest)
            apply_training_fraction(frac, sub)
            sizes.append(len(sub))
        assert sizes[0] < sizes[1] < sizes[2]

    def test_repack_foreign_source(self, tmp_path):
        """repack copies RAW content: a WC-order, 50-Hz, float64 source with
        no split column repacks without double-resampling, component
        shuffling, or persisting reader-injected columns."""
        import h5py

        from volpick_tpu.data import repack_dataset

        src_dir = tmp_path / "foreign"
        src_dir.mkdir()
        rng = np.random.default_rng(0)
        rows = []
        with h5py.File(src_dir / "waveforms.hdf5", "w") as f:
            g = f.require_group("data")
            for i in range(10):
                g.create_dataset(f"tr{i}", data=rng.normal(size=(1500 + 10 * i, 3)))
                rows.append({"trace_name": f"tr{i}", "trace_sampling_rate_hz": 50.0,
                             "trace_p_arrival_sample": 300.0 + i, "source_type": "vt"})
            df = f.require_group("data_format")
            df.create_dataset("dimension_order", data="WC")
            df.create_dataset("component_order", data="ZNE")
            df.create_dataset("sampling_rate", data="50")
        pd.DataFrame(rows).to_csv(src_dir / "metadata.csv", index=False)

        n = repack_dataset(src_dir, tmp_path / "fine", bucket_size=3)
        assert n == 4
        out_md = pd.read_csv(tmp_path / "fine" / "metadata.csv")
        # reader-injected columns must not be baked into the new file (a
        # persisted split='train' would disable prepare_data's aux split)
        assert "split" not in out_md.columns
        assert "trace_chunk" not in out_md.columns
        assert (out_md["trace_sampling_rate_hz"] == 50.0).all()
        src, out = WaveformDataset(src_dir), WaveformDataset(tmp_path / "fine")
        for i in (0, 4, 9):  # converted reads agree: resampled exactly once
            np.testing.assert_allclose(
                src.get_waveforms(i), out.get_waveforms(i), atol=1e-6)
        _, md = out.get_sample(2)
        assert md["trace_p_arrival_sample"] == (300.0 + 2) * 2.0

    def test_abandoned_epoch_exits_cleanly(self, synth_ds):
        """Breaking out of a prefetching epoch and exiting the process must
        not abort: the producer thread is stopped and drained, never left
        blocked inside a jax dispatch at interpreter teardown."""
        import subprocess
        import sys

        code = f"""
import os; os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
from volpick_tpu.data import WaveformDataset
from volpick_tpu.pipeline.generator import TrainGenerator, AugmentConfig
gen = TrainGenerator(WaveformDataset({str(synth_ds)!r}).get_split("train"),
                     AugmentConfig(window=2001, stack=False), batch_size=4)
next(iter(gen.epoch()))
print("ok")
"""
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=240)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "ok" in r.stdout
