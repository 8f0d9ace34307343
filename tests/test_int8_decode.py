"""Pallas int8-KV decode-attention kernel: interpret-mode parity.

The kernel (ops/int8_decode.py) computes flash partials of the big-cache
attention with in-kernel visibility (text/prompt/ring-window from
scalars). These tests pin it against the XLA reference implementation,
and pin the full buffered-layer merge (t2s._layer_decode_buffered with
kv_kernel_ctx) against the monolithic-softmax XLA path.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.ops import int8_decode
from genie_tts_tpu.models import t2s

B, H, Dh = 2, 4, 32
SX, SP, RING = 16, 8, 32
S = SX + SP + RING


def _rand_case(seed, head, kw):
    rng = np.random.default_rng(seed)
    kq = jnp.asarray(rng.integers(-127, 128, (B, H, Dh, S)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, H, Dh, S)), jnp.int8)
    ks = jnp.asarray(rng.random((B, H, S)) * 0.02 + 0.001, jnp.float32)
    vs = jnp.asarray(rng.random((B, H, S)) * 0.02 + 0.001, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, H, Dh)),
                    jnp.bfloat16).astype(jnp.float32)
    x_len = jnp.asarray(rng.integers(1, SX + 1, (B,)), jnp.int32)
    p_len = jnp.asarray(rng.integers(1, SP + 1, (B,)), jnp.int32)
    keys_written = jnp.asarray(kw, jnp.int32)
    ring_head = jnp.int32(head)
    return q, kq, ks, vq, vs, x_len, p_len, keys_written, ring_head


@pytest.mark.parametrize("head,kw", [
    (0, [0, 0]),              # empty ring
    (8, [8, 3]),              # partial ring, no wrap
    (4, [RING, 20]),          # wrapped ring (head < kw writes)
])
def test_kernel_matches_xla_reference(head, kw):
    q, kq, ks, vq, vs, x_len, p_len, kws, rh = _rand_case(0, head, kw)
    o_ref, m_ref, l_ref = int8_decode.xla_big_attention(
        q, kq, ks, vq, vs, x_len, p_len, kws, rh, sx=SX, sp=SP, ring=RING)
    o, m, l = int8_decode.int8_big_attention(
        q, kq, ks, vq, vs, x_len, p_len, kws, rh, sx=SX, sp=SP, ring=RING,
        interpret=True)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-5)
    # kernel dots run in bf16 (the serving dtype); the reference in f32
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref),
                               rtol=2e-2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=5e-2, atol=2e-2)


def test_layer_merge_matches_monolithic(monkeypatch):
    """Buffered layer with kernel partials == monolithic XLA int8 path."""
    monkeypatch.setattr(
        int8_decode, "int8_big_attention",
        functools.partial(int8_decode.int8_big_attention, interpret=True))
    rng = np.random.default_rng(1)
    D = H * Dh
    lp = {
        "qkv": {"w": jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.05,
                                 jnp.float32),
                "b": jnp.zeros((3 * D,), jnp.float32)},
        "out": {"w": jnp.asarray(rng.standard_normal((D, D)) * 0.05,
                                 jnp.float32),
                "b": jnp.zeros((D,), jnp.float32)},
        "ffn1": {"w": jnp.asarray(rng.standard_normal((D, 2 * D)) * 0.05,
                                  jnp.float32),
                 "b": jnp.zeros((2 * D,), jnp.float32)},
        "ffn2": {"w": jnp.asarray(rng.standard_normal((2 * D, D)) * 0.05,
                                  jnp.float32),
                 "b": jnp.zeros((D,), jnp.float32)},
        "norm1": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "norm2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
    }
    W = 8
    q, kq, ks, vq, vs, x_len, p_len, kws, rh = _rand_case(2, 8, [8, 5])
    h = jnp.asarray(rng.standard_normal((B, 1, D)) * 0.3, jnp.float32)
    k_buf = jnp.asarray(rng.standard_normal((B, H, Dh, W)) * 0.2, jnp.float32)
    v_buf = jnp.asarray(rng.standard_normal((B, H, Dh, W)) * 0.2, jnp.float32)
    buf_mask = jnp.arange(W) < 5
    # monolithic path needs the same visibility as the kernel recomputes
    pos = jnp.arange(S)[None, :]
    rpos = pos - (SX + SP)
    age = jnp.mod(rh - 1 - rpos, RING)
    # compacted-context semantics (prefill_join gathers text+prompt
    # columns to the front): ctx valid = [0, x_len+p_len)
    kv_mask = ((pos < (x_len + p_len)[:, None])
               | ((rpos >= 0) & (age < kws[:, None])))

    h_mono, kn_mono, vn_mono = t2s._layer_decode_buffered(
        lp, h, kq, vq, k_buf, v_buf, buf_mask, kv_mask, H,
        k_scale=ks, v_scale=vs)
    h_kern, kn_kern, vn_kern = t2s._layer_decode_buffered(
        lp, h, kq, vq, k_buf, v_buf, buf_mask, kv_mask, H,
        k_scale=ks, v_scale=vs,
        kv_kernel_ctx=(x_len, p_len, kws, rh, SX, SP, RING))
    np.testing.assert_array_equal(np.asarray(kn_mono), np.asarray(kn_kern))
    np.testing.assert_array_equal(np.asarray(vn_mono), np.asarray(vn_kern))
    np.testing.assert_allclose(np.asarray(h_mono), np.asarray(h_kern),
                               rtol=5e-2, atol=5e-2)
