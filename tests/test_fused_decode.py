"""Fused all-layers decode kernel: interpret-mode parity vs the XLA layer.

The kernel is an experiment (slower than XLA on v5e — see the module
docstring), but its math must stay correct so future kernel work starts
from a verified base.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import T2SConfig
from genie_tts_tpu.models import t2s
from genie_tts_tpu.ops import fused_decode as fd


@pytest.mark.parametrize("pos", [96, 101])  # aligned and unaligned rows
def test_matches_xla_layers(pos):
    cfg = T2SConfig(num_layers=3)
    params = t2s.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L, D, H = cfg.num_layers, cfg.embed_dim, cfg.num_heads
    S = 256
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.standard_normal((1, 1, D)) * 0.3, jnp.float32)
    kc = jnp.asarray(rng.standard_normal((L, 1, H, S, D // H)) * 0.2, jnp.float32)
    vc = jnp.asarray(rng.standard_normal((L, 1, H, S, D // H)) * 0.2, jnp.float32)
    kv_mask = np.arange(S) <= pos

    h = h0
    k_refs = []
    for layer in range(L):
        lp = jax.tree.map(lambda x: x[layer], params["layers"])
        # default _layer_decode path stores caches kv-major [B,H,Dh,S]
        h, kcl, _ = t2s._layer_decode(
            lp, h, jnp.swapaxes(kc[layer], -1, -2),
            jnp.swapaxes(vc[layer], -1, -2), pos,
            jnp.asarray(kv_mask)[None], H)
        k_refs.append(jnp.swapaxes(kcl, -1, -2))   # back to [B,H,S,Dh]
    h_ref = np.asarray(h[0, 0])

    def to_sd(c):  # [L,1,H,S,Dh] -> [L,S,D]
        return jnp.transpose(c[:, 0], (0, 2, 1, 3)).reshape(L, S, D)

    stacked = fd.pack_decode_params(params, dtype=jnp.float32)
    h_out, k_out, v_out = fd.fused_decode_step(
        stacked, h0[0], to_sd(kc).astype(jnp.float32),
        to_sd(vc).astype(jnp.float32), jnp.int32(pos),
        jnp.asarray(kv_mask, jnp.float32), num_heads=H, interpret=True)

    np.testing.assert_allclose(np.asarray(h_out[0]), h_ref,
                               rtol=1e-4, atol=1e-5)
    # cache row written correctly, neighbors within the blend tile intact
    k_ref_row = np.asarray(k_refs[0][0, :, pos, :]).reshape(-1)
    np.testing.assert_allclose(np.asarray(k_out[0, pos, :]), k_ref_row,
                               rtol=1e-4, atol=1e-5)
    other = pos - 1
    np.testing.assert_allclose(
        np.asarray(k_out[0, other, :]),
        np.asarray(to_sd(kc)[0, other, :]), rtol=1e-5, atol=1e-6)
