"""Pallas flash-decode kernel vs XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.ops.flash_decode import (
    flash_decode_attention, xla_decode_attention,
)


@pytest.mark.parametrize("B,H,S,Dh", [(1, 4, 64, 32), (2, 2, 128, 32)])
def test_kernel_matches_xla(B, H, S, Dh):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, Dh)), jnp.float32)
    lens = rng.integers(5, S, B)
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])

    ref = xla_decode_attention(q, k, v, mask)
    out = flash_decode_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fully_masked_rows_do_not_nan():
    q = jnp.ones((1, 2, 32))
    k = jnp.ones((1, 2, 16, 32))
    v = jnp.ones((1, 2, 16, 32))
    mask = jnp.zeros((1, 16), bool).at[0, 0].set(True)
    out = flash_decode_attention(q, k, v, mask, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
