"""Pallas TPU kernel: single-token KV-cache decode attention.

The hot op of the AR decode loop (north star: "static-shape autoregressive
decoder with a Pallas flash-decode KV-cache kernel"). For GPT-SoVITS
geometry (Dh=32, S<=~1.2k) an entire (batch, head) cache slice fits in
VMEM, so each program streams K/V exactly once from HBM and computes a
numerically-stable softmax in registers — no HBM score materialization,
no online-softmax bookkeeping needed:

    scores[s] = sum_d q[d] * K[s, d] * scale     (VPU reduce over lanes)
    p = exp(scores - max) * mask
    out[d] = sum_s p[s] * V[s, d] / sum_s p[s]   (VPU reduce over sublanes)

Grid: (B, H). Falls back to the XLA path on non-TPU backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    # blocks: q [1,1,1,Dh]; k/v [1,1,S,Dh]; mask [1,S,1]; o [1,1,1,Dh]
    q = q_ref[0, 0, 0, :].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)          # [S, Dh]
    v = v_ref[0, 0].astype(jnp.float32)
    mask = mask_ref[0]                            # [S, 1] bool
    scale = 1.0 / (q.shape[-1] ** 0.5)

    scores = jnp.sum(k * q[None, :], axis=-1, keepdims=True) * scale  # [S,1]
    scores = jnp.where(mask, scores, jnp.float32(-1e30))
    m = jnp.max(scores, axis=0, keepdims=True)
    p = jnp.exp(scores - m)
    p = jnp.where(mask, p, 0.0)
    denom = jnp.sum(p, axis=0, keepdims=True)                          # [1,1]
    out = jnp.sum(p * v, axis=0, keepdims=True) / denom                # [1,Dh]
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                           v_cache: jnp.ndarray, kv_mask: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """q [B,H,Dh], caches [B,H,S,Dh], kv_mask [B,S] bool -> [B,H,Dh]."""
    B, H, S, Dh = k_cache.shape
    mask = kv_mask[:, :, None]  # [B, S, 1]

    return pl.pallas_call(
        _decode_attn_kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, Dh), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), q.dtype),
        interpret=interpret,
    )(q[:, :, None, :], k_cache, v_cache, mask)[:, :, 0, :]


def xla_decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                         v_cache: jnp.ndarray, kv_mask: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA implementation (used on CPU and in kernel tests)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bhd,bhsd->bhs", q, k_cache,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(kv_mask[:, None, :], scores, jnp.float32(-1e30))
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", p.astype(v_cache.dtype), v_cache,
                      preferred_element_type=q.dtype)
