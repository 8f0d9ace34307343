"""Shared neural-net building blocks (pure functions over param pytrees).

Conventions:
* params are nested dicts of jnp arrays;
* linear weights are stored ``[in, out]`` (row-vector convention, matches
  ``x @ w + b``);
* conv1d weights are stored ``[width, in, out]`` (feature-last lax.conv);
* activations flow in ``compute_dtype`` (bf16 by default), while LayerNorm
  statistics and softmax run in fp32 for stability.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear(params, x: jnp.ndarray) -> jnp.ndarray:
    """Dense layer; supports weight-only int8 quantization.

    Quantized params carry ``w`` int8 [in, out] + ``scale`` [out] (symmetric
    per-output-channel). The int8->compute-dtype convert fuses into the
    matmul's operand stream on TPU, so the weight read is half the HBM
    bytes of bf16 — measured 2.2x on the B=1 AR decode step (weight-
    streaming bound). The per-channel scale commutes with the contraction,
    so it is applied to the output (fused into the matmul epilogue).
    """
    w = params["w"]
    if w.dtype == jnp.int8:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
        y = y * params["scale"].astype(x.dtype)
    else:
        y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if "b" in params:
        y = y + params["b"]
    return y


def layer_norm(params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = normed * params["scale"] + params["bias"]
    return out.astype(x.dtype)


def conv1d(
    params,
    x: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """1D convolution. ``x``: [B, T, C_in] -> [B, T', C_out].

    Weight layout [width, in/groups, out].
    """
    y = jax.lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if "b" in params:
        y = y + params["b"]
    return y


def conv_transpose1d(params, x: jnp.ndarray, stride: int, padding: int = 0) -> jnp.ndarray:
    """Transposed 1D conv matching torch ConvTranspose1d semantics.

    ``x``: [B, T, C_in] -> [B, (T-1)*stride + width - 2*padding, C_out].
    Weight layout [width, in, out] (already transposed at convert time).
    """
    w = params["w"].astype(x.dtype)
    width = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, 0),
        window_strides=(1,),
        padding=[(width - 1 - padding, width - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in params:
        y = y + params["b"]
    return y


def conv1d_ncw(
    params,
    x: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """1D conv in channel-major layout: [B, C_in, T] -> [B, C_out, T'].

    TPU tiling pads the last two dims to (8, 128); for long-waveform /
    few-channel tensors (HiFi-GAN tails: C = 32/16/1, T = 10^5..10^6) the
    NWC layout pads channels 16->128 (8x HBM waste). NCW keeps T in lanes
    and C in sublanes, where small C pads at most to 8.

    Weight layout matches :func:`conv1d` ([width, in/groups, out]).
    """
    y = jax.lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCW", "WIO", "NCW"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if "b" in params:
        y = y + params["b"][None, :, None]
    return y


def conv1d_ncw_shiftdot(params, x: jnp.ndarray, padding: int = 0,
                        dilation: int = 1) -> jnp.ndarray:
    """k-tap dilated conv as k shifted copies + ONE contraction (NCW).

    XLA:TPU's convolution lowering for long-T / few-channel NCW tensors
    (HiFi-GAN tails) leaves 1.3-2.3x on the table vs expressing the same
    math as a stack of slice-shifted inputs contracted in a single
    dot_general (measured on v5e at B=8: k=3 C=16 T=194k conv 3.88 ms ->
    1.72 ms; conv_post 4.47 -> 2.57 ms; scripts/exp_hifigan_convs.py).
    Numerically identical to :func:`conv1d_ncw` up to bf16 reassociation.

    Same-length output only (output T == input T, pad as given).
    """
    w = params["w"].astype(x.dtype)           # [k, Ci, Co]
    k = w.shape[0]
    T = x.shape[2]
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    xs = jnp.stack([
        jax.lax.dynamic_slice_in_dim(xp, j * dilation, T, axis=2)
        for j in range(k)])                   # [k, B, Ci, T]
    y = jnp.einsum("jbct,jcd->bdt", xs, w,
                   preferred_element_type=x.dtype)
    if "b" in params:
        y = y + params["b"][None, :, None]
    return y


def conv_transpose1d_ncw(params, x: jnp.ndarray, stride: int, padding: int = 0) -> jnp.ndarray:
    """Transposed 1D conv in NCW layout (torch ConvTranspose1d semantics).

    ``x``: [B, C_in, T] -> [B, C_out, (T-1)*stride + width - 2*padding].
    """
    w = params["w"].astype(x.dtype)
    width = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, 0),
        window_strides=(1,),
        padding=[(width - 1 - padding, width - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCW", "WIO", "NCW"),
        preferred_element_type=x.dtype,
    )
    if "b" in params:
        y = y + params["b"][None, :, None]
    return y


def sine_position_table(max_len: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal position table [max_len, dim], positions 1..max_len.

    GPT-SoVITS's SinePositionalEmbedding builds positions with
    cumsum(ones) — i.e. 1-based — verified against the reference encoder
    graph (t2s_encoder_fp32.onnx: ConstantOfShape -> CumSum feeding
    Sin/Cos; x_scale constant = 1.0, so no sqrt(d) input scaling).
    Row i of this table is the embedding of (1-based) position i+1.
    """
    pos = jnp.arange(1, max_len + 1, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-jnp.log(10000.0) / dim)
    )
    pe = jnp.zeros((max_len, dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention, softmax in fp32.

    q: [B, H, Tq, D], k/v: [B, H, Tk, D]; mask: broadcastable to
    [B, H, Tq, Tk], True = attend.
    """
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.float32(-1e10))
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=q.dtype)
