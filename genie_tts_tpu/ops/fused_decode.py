"""Fused T2S decode step — one Pallas kernel for all 24 layers.

The "kernel looping" play: at B=1 the XLA decode step costs ~32 us/layer
against a ~12 us/layer HBM floor (weights 6.3 MB + KV 2 MB per layer),
because the step is a chain of small ops the scheduler cannot pipeline
tightly. This kernel walks the layer grid sequentially (TPU grids are
serial), double-buffering each layer's weight/cache blocks while the
previous layer computes, with the hidden state carried in VMEM scratch.

Layouts (chosen so every tensor keeps >=128 lanes and no vector
reshapes, which Mosaic cannot lower):
  * K and V caches [L, S, D] — heads merged into D=H*Dh lanes (NWC);
    row stores at `pos` are sublane-dynamic (cheap).
  * scores = q_blockdiag [H, D] @ K^T via dot_general contracting the
    lane dim of both operands; att_full = probs [H, S] @ V [S, D].
  * the block-diagonal trick, built with iota masks (no reshapes):
    q_bd[h, (g,d)] = q[h,d] * (g == h), so one MXU matmul computes all
    heads' scores; the same diagonal selection + sublane reduction
    merges att_full[h, (h,d)] back to [1, D].

B=1 only (the latency-bound solo path); batched serving keeps the XLA
path which already amortizes well.

STATUS — measured on v5e (2026-08-16) and NOT wired into the engine:
correct (interpret-mode parity 2e-6 vs models/t2s._layer_decode) but
5.85 ms/step vs XLA's 0.80 — Mosaic serializes the aliased KV blocks
(each layer DMAs the full 0.9 MB cache block in and out around the
8-row blend) and the whole-layer block set needs
LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=24576 to fit. Kept as
a documented experiment: the XLA unrolled loop (RuntimeConfig.
layer_unroll=0) remains the production decode.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_kernel(pos_ref, mask_ref, h_in_ref,
                  wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref,
                  n1s_ref, n1b_ref, n2s_ref, n2b_ref,
                  kc_ref, vc_ref,
                  h_out_ref, kc_out_ref, vc_out_ref,
                  h_scr, *, num_heads: int, eps: float = 1e-5):
    l = pl.program_id(0)
    L = pl.num_programs(0)
    D = h_in_ref.shape[-1]
    Dh = D // num_heads
    S = kc_ref.shape[-2]

    @pl.when(l == 0)
    def _init():
        h_scr[:] = h_in_ref[:].astype(jnp.float32)

    h = h_scr[:]                                   # [8, D] fp32 (row 0 real)
    wdtype = wqkv_ref.dtype
    hb = h.astype(wdtype)

    qkv = jax.lax.dot_general(
        hb, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bqkv_ref[:].astype(jnp.float32)
    # cache update: Mosaic requires sublane stores to be 8-aligned, so
    # blend the new row into its aligned 8-row tile and store the tile
    pos = pos_ref[0]
    cache_dtype = kc_out_ref.dtype
    base = pl.multiple_of((pos // 8) * 8, 8)
    rowsel = (jax.lax.broadcasted_iota(jnp.int32, (8, D), 0)
              == (pos - base))
    k_tile = jnp.where(rowsel,
                       jnp.broadcast_to(qkv[0:1, D:2 * D], (8, D)),
                       kc_ref[pl.ds(base, 8), :].astype(jnp.float32))
    kc_out_ref[pl.ds(base, 8), :] = k_tile.astype(cache_dtype)
    v_tile = jnp.where(rowsel,
                       jnp.broadcast_to(qkv[0:1, 2 * D:], (8, D)),
                       vc_ref[pl.ds(base, 8), :].astype(jnp.float32))
    vc_out_ref[pl.ds(base, 8), :] = v_tile.astype(cache_dtype)

    # block-diagonal q [H, D]: q[h] in its own Dh-column block (iota
    # masks only — vector reshapes do not lower on TPU)
    rows = jax.lax.broadcasted_iota(jnp.int32, (num_heads, D), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (num_heads, D), 1)
    diag = (cols // Dh) == rows                                 # [H, D]
    q_bd = jnp.where(diag, jnp.broadcast_to(qkv[0:1, :D], (num_heads, D)),
                     0.0)

    scale = 1.0 / math.sqrt(Dh)
    scores = jax.lax.dot_general(
        q_bd.astype(cache_dtype), kc_out_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale           # [H, S]
    mask = mask_ref[:]                                         # [1, S] fp32
    scores = scores + (mask - 1.0) * 1e10
    probs = jax.nn.softmax(scores, axis=-1)                    # [H, S] fp32

    att_full = jax.lax.dot_general(
        probs.astype(cache_dtype), vc_out_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [H, D]
    att = jnp.sum(jnp.where(diag, att_full, 0.0), axis=0,
                  keepdims=True)                               # [1, D]

    proj = jax.lax.dot_general(
        jnp.broadcast_to(att, (8, D)).astype(wdtype), wout_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bout_ref[:].astype(jnp.float32)

    def layer_norm(x, scale_ref, bias_ref):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return ((x - mu) * jax.lax.rsqrt(var + eps)
                * scale_ref[:].astype(jnp.float32)
                + bias_ref[:].astype(jnp.float32))

    h = layer_norm(h + proj, n1s_ref, n1b_ref)

    hb2 = h.astype(wdtype)
    ff = jax.lax.dot_general(
        hb2, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[:].astype(jnp.float32)
    ff = jnp.maximum(ff, 0.0).astype(wdtype)
    ff2 = jax.lax.dot_general(
        ff, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[:].astype(jnp.float32)
    h = layer_norm(h + ff2, n2s_ref, n2b_ref)

    h_scr[:] = h

    @pl.when(l == L - 1)
    def _fin():
        h_out_ref[:] = h


def fused_decode_step(stacked, h, k_cache, v_cache, pos, mask,
                      *, num_heads: int, interpret: bool = False):
    """One decode step over all layers.

    stacked: dict of [L, ...] weight tensors (see pack_decode_params).
    h: [1, D] fp32 hidden (token + position embedding).
    k_cache / v_cache: [L, S, D] bf16 (heads merged into D lanes).
    pos: scalar int32 write position; mask: [S] fp32 (1 = attend).
    Returns (h_out [1, D] fp32, k_cache, v_cache) with caches updated
    in place (donated/aliased).
    """
    L, S, D = k_cache.shape
    h8 = jnp.broadcast_to(h.astype(jnp.float32), (8, D))
    mask2 = mask.astype(jnp.float32).reshape(1, S)
    pos_arr = jnp.reshape(pos.astype(jnp.int32), (1,))

    def bs(shape):
        # per-layer block; index_map receives (grid idx, *scalar prefetch)
        return pl.BlockSpec((1,) + shape,
                            lambda l, pos: (l,) + (0,) * len(shape))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # h_in
            bs((D, 3 * D)), bs((1, 3 * D)),
            bs((D, D)), bs((1, D)),
            bs((D, 4 * D)), bs((1, 4 * D)),
            bs((4 * D, D)), bs((1, D)),
            bs((1, D)), bs((1, D)), bs((1, D)), bs((1, D)),
            bs((S, D)),                               # k cache
            bs((S, D)),                               # v cache
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # h_out
            bs((S, D)),
            bs((S, D)),
        ],
        scratch_shapes=[pltpu.VMEM((8, D), jnp.float32)],
    )

    kernel = functools.partial(_squeezed_kernel, num_heads=num_heads)
    h_out, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, D), jnp.float32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={15: 1, 16: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(pos_arr, mask2, h8,
      stacked["wqkv"], stacked["bqkv"], stacked["wout"], stacked["bout"],
      stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"],
      stacked["n1s"], stacked["n1b"], stacked["n2s"], stacked["n2b"],
      k_cache, v_cache)
    return h_out[0:1], k_out, v_out


def _squeezed_kernel(pos_ref, mask_ref, h_in_ref,
                     wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref,
                     n1s_ref, n1b_ref, n2s_ref, n2b_ref,
                     kc_ref, vc_ref,
                     h_out_ref, kc_out_ref, vc_out_ref,
                     h_scr, *, num_heads: int):
    """Adapter: blocked refs carry a leading layer axis of 1."""
    class _Sq:
        def __init__(self, ref):
            self.ref = ref

        def __getitem__(self, idx):
            if idx == slice(None):
                return self.ref[0]
            return self.ref[(0,) + (idx if isinstance(idx, tuple) else (idx,))]

        def __setitem__(self, idx, val):
            self.ref[(0,) + (idx if isinstance(idx, tuple) else (idx,))] = val

        @property
        def shape(self):
            return self.ref.shape[1:]

        @property
        def dtype(self):
            return self.ref.dtype

    _layer_kernel(
        pos_ref, mask_ref, h_in_ref,
        _Sq(wqkv_ref), _Sq(bqkv_ref), _Sq(wout_ref), _Sq(bout_ref),
        _Sq(w1_ref), _Sq(b1_ref), _Sq(w2_ref), _Sq(b2_ref),
        _Sq(n1s_ref), _Sq(n1b_ref), _Sq(n2s_ref), _Sq(n2b_ref),
        _Sq(kc_ref), _Sq(vc_ref),
        h_out_ref, _Sq(kc_out_ref), _Sq(vc_out_ref),
        h_scr, num_heads=num_heads)


def pack_decode_params(t2s_params, dtype=jnp.bfloat16) -> dict:
    """T2S layer params -> stacked kernel layout (bf16 weights, fp32 norms).

    layers tree: qkv/out/ffn1/ffn2 with w [L, in, out], b [L, out];
    norms scale/bias [L, D].
    """
    lp = t2s_params["layers"]

    def w(x):
        return jnp.asarray(x, dtype)

    def b(x):
        return jnp.asarray(x, dtype)[:, None, :]  # [L,1,out]

    return {
        "wqkv": w(lp["qkv"]["w"]), "bqkv": b(lp["qkv"]["b"]),
        "wout": w(lp["out"]["w"]), "bout": b(lp["out"]["b"]),
        "w1": w(lp["ffn1"]["w"]), "b1": b(lp["ffn1"]["b"]),
        "w2": w(lp["ffn2"]["w"]), "b2": b(lp["ffn2"]["b"]),
        "n1s": jnp.asarray(lp["norm1"]["scale"], jnp.float32)[:, None, :],
        "n1b": jnp.asarray(lp["norm1"]["bias"], jnp.float32)[:, None, :],
        "n2s": jnp.asarray(lp["norm2"]["scale"], jnp.float32)[:, None, :],
        "n2b": jnp.asarray(lp["norm2"]["bias"], jnp.float32)[:, None, :],
    }
