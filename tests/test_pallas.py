"""Pallas conditioning kernel vs the jnp reference (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from volpick_tpu.ops.pallas.conditioning import condition_windows_pallas
from volpick_tpu.ops.signal import demean, detrend_linear, normalize_amplitude


@pytest.mark.parametrize("detrend,norm", [(False, "peak"), (True, "peak"), (False, "std"), (True, "std")])
def test_matches_jnp_reference(rng, detrend, norm):
    x = (rng.normal(size=(8, 3, 1536)) * 7 + np.linspace(0, 3, 1536)).astype(np.float32)
    got = np.asarray(
        condition_windows_pallas(jnp.asarray(x), detrend=detrend, norm=norm, interpret=True)
    )
    ref = detrend_linear(jnp.asarray(x)) if detrend else demean(jnp.asarray(x))
    ref = np.asarray(normalize_amplitude(ref, norm=norm, per_channel=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_tile_mismatch_raises(rng):
    with pytest.raises(ValueError):
        condition_windows_pallas(jnp.zeros((6, 3, 128)), tile=4, interpret=True)
