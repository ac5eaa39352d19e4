"""performance_vs_snr_fi on the hard benchmark (CPU, tiny).

Pins the end-to-end analysis path the committed EVAL artifact uses: hard
dataset with measured SNR/FI metadata -> task0 targets -> steered curves ->
P AND S recall binned by SNR/FI + per-source-type table (the reference's
Performance_vs_freq_vs_snr study, `volpick/data/utils.py:45-102`).
"""

import numpy as np
import pandas as pd
import pytest

from volpick_tpu.data.dataset import load_dataset
from volpick_tpu.data.synthetic import make_hard_synthetic_dataset
from volpick_tpu.eval.analysis import performance_vs_snr_fi
from volpick_tpu.eval.targets import generate_task0


@pytest.mark.slow
def test_performance_vs_snr_fi_end_to_end(tmp_path):
    d = make_hard_synthetic_dataset(tmp_path / "ds", n_events=48, n_noise=8,
                                    n_samples=6001, seed=21,
                                    split_prob=(0.2, 0.2, 0.6))
    ds = load_dataset(d)
    ds.preload_waveforms()
    generate_task0(ds, tmp_path / "targets", keep_source_type=True)

    from volpick_tpu.models.phasenet import PhaseNet

    import jax

    model = PhaseNet()
    params = model.init(jax.random.PRNGKey(42))
    out = performance_vs_snr_fi(
        model, params, ds, tmp_path / "targets", tmp_path / "out",
        set_name="test", prob_threshold=0.3, s_threshold=0.4,
        snr_bins=(-10, 0, 10, 20, 60), fi_bins=(-3, -1, 0, 1.5),
    )
    for key in ("p_recall_vs_snr", "s_recall_vs_snr", "p_recall_vs_fi",
                "s_recall_vs_fi", "recall_vs_type"):
        assert key in out, key
        assert (tmp_path / "out" / f"test_{key}.csv").exists()
    snr_tab = out["p_recall_vs_snr"]
    assert snr_tab["n"].sum() > 0
    # recall is a proper rate everywhere it is defined
    vals = snr_tab["recall"].dropna()
    assert ((vals >= 0) & (vals <= 1)).all()
    # untrained net on a hard benchmark must not be at ceiling overall
    total_tp = np.nansum(snr_tab["recall"].to_numpy() * snr_tab["n"].to_numpy())
    assert total_tp < snr_tab["n"].sum()
    ty = out["recall_vs_type"]
    assert set(ty.columns) >= {"source_type", "n_p", "p_recall", "n_s", "s_recall"}
