"""Pallas TPU kernel: int8-KV decode attention over the slot ring cache.

The slot machine's decode segment is HBM-bound streaming the big K/V
caches every step (352 MB/step of bf16 at the 8-slot x 896-column
geometry — BENCH notes in models/slots.py). Storing the caches as int8
codes + per-column fp32 scales halves those bytes, but the pure-XLA
dequant path REGRESSES on v5e whenever the decode weights are also int8:
XLA stops fusing the cache converts into the attention dots and spends
+6-9 ms per 32-step segment materializing dequantized operands (measured;
see RuntimeConfig.slot_kv_int8). This kernel does what the XLA fusion
won't: stream the int8 bytes from HBM once, dequantize in VMEM, and
never touch HBM with anything wider.

MEASURED RESULT (v5e, 24L/512, 8x896 slot geometry, 32-step segments):
bf16 XLA 35.8 ms/segment; int8 pure-XLA 45.1; int8 + this kernel 41.1.
The kernel recovers most of XLA's int8 regression but does NOT beat the
bf16 baseline: both contractions run as fp32 VPU broadcast-reduces
(~2.3 M VPU ops/program ~= 0.46 ms/step across 24 layers x 8 slots),
which costs more than the ~0.2 ms/step of HBM bytes that int8 saves.
An MXU formulation (block-diagonal [H, H*Dh] x [H*Dh, S]) would fix
that, but Mosaic rejects the lane-merging reshapes it needs ("Insertion
of minor dim that is not a no-op only supported for 32-bit types" /
vector reshape 16x16x32 -> 16x512). Next lever if revisited: masked
S-tile skipping via manual DMA (typical visibility ~50-60% of columns),
which cuts DMA and VPU together. Until then RuntimeConfig.slot_kv_int8
stays OFF and the exact bf16 path serves.

Shape strategy (per (slot b, layer) program):

* both contractions (scores over Dh, values over S) run as VPU
  broadcast-reduces in fp32 — per head the dot is M=1, far too small for
  useful MXU occupancy, and Mosaic rejects the lane-merging reshapes a
  block-diagonal MXU formulation would need;
* the kv visibility mask is NOT an operand: it is recomputed in-kernel
  from four scalars (x_len, p_len, keys_written, ring_head — prefetched
  to SMEM), matching models/slots.py::decode_segment's frozen-segment
  ring visibility exactly;
* outputs are flash partials (m = row max, l = sum exp, o = unnormalized
  P@V) so the caller merges the in-segment write buffer + self column —
  which stay exact bf16 — with one log-sum-exp step (t2s.
  _layer_decode_buffered); the merged softmax is numerically identical
  to the monolithic one.

Reference behavior: /root/reference serves one utterance at a time with
fp16 ONNX caches (Server.py:87-141); this kernel exists for the TPU
serving machinery that replaces it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xl_ref, pl_ref, kw_ref, head_ref,      # scalar prefetch (SMEM)
            q_ref, kq_ref, ks_ref, vq_ref, vs_ref,  # VMEM blocks
            o_ref, m_ref, l_ref, *, sx, sp, ring):
    b = pl.program_id(0)
    H, Dh = q_ref.shape[1], q_ref.shape[2]
    S = kq_ref.shape[3]
    xl = xl_ref[b]
    plen = pl_ref[b]
    kw = kw_ref[b]
    head = head_ref[0]

    # frozen-segment visibility (models/slots.py::decode_segment): the
    # COMPACTED context block [0, x_len+p_len) (prefill_join gathers text
    # then prompt columns to the front) and the last `kw` ring writes
    # before `head`
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    rpos = pos - (sx + sp)
    age = jnp.remainder(head - 1 - rpos, ring)
    valid = ((pos < xl + plen)
             | ((rpos >= 0) & (age < kw)))          # [1, S]

    # VPU broadcast-reduce for both contractions: the dims are too small
    # for useful MXU work (M=1 per head), Mosaic rejects the reshapes a
    # block-diagonal MXU trick needs, and at ~1 M lanes of FMA per
    # program the VPU finishes well inside the DMA shadow anyway.
    q = q_ref[0].astype(jnp.float32)                # [H, Dh]
    k = kq_ref[0].astype(jnp.float32)               # [H, Dh, S]
    scores = jnp.sum(k * q[:, :, None], axis=1)     # [H, S]
    scale = 1.0 / (Dh ** 0.5)
    scores = scores * (ks_ref[0] * scale)            # per-column dequant
    scores = jnp.where(valid, scores, jnp.float32(-1e30))

    m = jnp.max(scores, axis=-1, keepdims=True)      # [H, 1]
    p = jnp.exp(scores - m)
    p = jnp.where(valid, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)           # [H, 1]

    pv = p * vs_ref[0]                               # fold V dequant scale
    v = vq_ref[0].astype(jnp.float32)                # [H, Dh, S]
    o = jnp.sum(v * pv[:, None, :], axis=-1)         # [H, Dh]
    o_ref[0] = o
    m_ref[0] = m
    l_ref[0] = l


@functools.partial(jax.jit, static_argnames=("sx", "sp", "ring", "interpret"))
def int8_big_attention(q, kq, ks, vq, vs, x_len, p_len, keys_written,
                       ring_head, *, sx, sp, ring, interpret=False):
    """Flash partials of decode attention over the int8 big cache.

    q [B,H,Dh] (bf16/f32); kq/vq [B,H,Dh,S] int8; ks/vs [B,H,S] f32;
    x_len/p_len/keys_written [B] i32; ring_head [] i32 (segment-frozen).
    Returns (o [B,H,Dh] f32 unnormalized, m [B,H] f32, l [B,H] f32) with
    m = -1e30 / l = 0 / o = 0 for rows whose mask is empty.
    """
    B, H, Dh, S = kq.shape
    assert S == sx + sp + ring
    head = jnp.reshape(ring_head, (1,)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Dh), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Dh, S), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Dh, S), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, S), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H, Dh), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 1), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, 1), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    o, m, l = pl.pallas_call(
        functools.partial(_kernel, sx=sx, sp=sp, ring=ring),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x_len.astype(jnp.int32), p_len.astype(jnp.int32),
      keys_written.astype(jnp.int32), head, q, kq, ks, vq, vs)
    return o, m[..., 0], l[..., 0]


def xla_big_attention(q, kq, ks, vq, vs, x_len, p_len, keys_written,
                      ring_head, *, sx, sp, ring):
    """Reference XLA implementation (CPU fallback and kernel tests)."""
    B, H, Dh, S = kq.shape
    pos = jnp.arange(S)[None, :]
    rpos = pos - (sx + sp)
    age = jnp.mod(ring_head - 1 - rpos, ring)
    valid = ((pos < (x_len + p_len)[:, None])       # compacted ctx block
             | ((rpos >= 0) & (age < keys_written[:, None])))   # [B, S]
    kf = kq.astype(jnp.float32) * ks[:, :, None, :]
    vf = vq.astype(jnp.float32) * vs[:, :, None, :]
    scale = 1.0 / (Dh ** 0.5)
    scores = jnp.einsum("bhd,bhds->bhs", q.astype(jnp.float32), kf) * scale
    scores = jnp.where(valid[:, None, :], scores, jnp.float32(-1e30))
    m = jnp.max(scores, axis=-1)
    p = jnp.exp(scores - m[..., None])
    p = jnp.where(valid[:, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhs,bhds->bhd", p, vf)
    return o, m, l
