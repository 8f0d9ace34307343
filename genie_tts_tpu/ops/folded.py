"""Folded (space-to-channel) 1D convolutions for the HiFi-GAN tail.

The HiFi-GAN decoder's late stages run at very low channel counts over
very long time axes (C = 64/32/16/1 at T up to ~3*10^5 for an 8 s
utterance; reference graph: GPT-SoVITS ``Generator`` inside
``vits_fp32.onnx``, SURVEY.md §2.2). On TPU those shapes are hostile to
the MXU: a conv contracts over only k*C <= 112 values and produces <= 64
output channels, so the systolic array runs nearly empty and XLA lowers
much of the work to the VPU — measured 3.7/2.5/5.6/6.5 ms for the
up3/up4/up5/post prefixes of a single 304-frame window at B=1 on v5e
(scripts/exp_hifigan_convs.py), ~50x off the stage rooflines.

The fix is a change of representation, not a kernel: fold ``r`` adjacent
time steps into the channel axis, so a fine-rate signal ``x[b, c, t]``
becomes a coarse-rate signal ``X[b, p*C + c, m] = x[b, c, m*r + p]``
(phase-major blocks). Any conv / transposed conv at the fine rate is
EXACTLY a small conv at the coarse rate whose dense weight
``W[q, p_i*Ci + ci, p_o*Co + co]`` is a pure re-indexing of the original
taps (each entry is a copy of one original weight — no arithmetic, no
precision change). With r chosen so r*C >= 128, every tail conv becomes
a stack of [r*Ci, r*Co] matmuls with the coarse time axis as the MXU's
free dimension — dense MXU work instead of starved VPU loops. Leaky
ReLUs, residual adds and validity masks are elementwise and commute with
the folding, so the whole tail runs folded and unfolds once at the very
end.

Cost model: a dilated conv's folded form does ~Q*r/k times the FLOPs of
the minimal form (Q = number of coarse taps ~ (k-1)*d/r + 2), i.e. ~d x
for dilation d — a fine trade for a >10x utilization jump. Weight
folding happens once at character-load time (fold_decoder in
models/sovits.py); the forward here is jit-traceable with all fold
metadata recomputed from static shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "conv_fold_meta", "tconv_fold_meta", "fold_conv_weights",
    "fold_tconv_weights", "folded_conv", "fold_signal", "unfold_signal",
]


def conv_fold_meta(k: int, dilation: int, padding: int,
                   r: int) -> Tuple[int, int]:
    """(q0, Q) coarse tap range of a folded k-tap conv at fold r.

    A fine-rate conv (conv1d_ncw semantics: cross-correlation,
    ``y[t] = sum_s w[s] * x[t + s*d - padding]``) reads, for output
    phase p_o of coarse column m, the input fine index
    ``m*r + p_o + s*d - padding = (m + q)*r + p_i``. q0/Q bound q over
    all (p_o, s)."""
    lo = 0 + 0 * dilation - padding                    # p_o = 0, s = 0
    hi = (r - 1) + (k - 1) * dilation - padding
    q0 = lo // r
    q1 = hi // r
    return q0, q1 - q0 + 1


def tconv_fold_meta(k: int, stride: int, padding: int,
                    r_in: int) -> Tuple[int, int]:
    """(q0, Q) coarse tap range of a folded transposed conv.

    Torch ConvTranspose1d semantics (``ops.layers.conv_transpose1d_ncw``):
    ``y[n'] = sum_m x[m] * w[n' + padding - stride*m]`` for the tap index
    in [0, k). With input fold r_in and output fold r_out = stride*r_in,
    output coarse column N reads input coarse column N + q through tap
    ``s = (p_o + padding - stride*p_i) - q*r_out``."""
    r_out = stride * r_in
    qs = []
    for p_i in range(r_in):
        for p_o in range(r_out):
            val = p_o + padding - stride * p_i
            for s in range(k):
                if (val - s) % r_out == 0:
                    qs.append((val - s) // r_out)
    if not qs:  # degenerate (k < stride gaps) — cannot happen for HiFi-GAN
        raise ValueError("transposed conv leaves output phases uncovered")
    q0 = min(qs)
    return q0, max(qs) - q0 + 1


def fold_conv_weights(w: np.ndarray, b, dilation: int, padding: int,
                      r: int) -> dict:
    """[k, Ci, Co] conv weights -> dense folded [Q, r*Ci, r*Co].

    Pure re-indexing: every nonzero entry of the folded weight is a copy
    of exactly one original tap ((p_o, s) -> (q, p_i) is injective), so
    the folded conv is bit-identical in exact arithmetic."""
    w = np.asarray(w)
    k, Ci, Co = w.shape
    q0, Q = conv_fold_meta(k, dilation, padding, r)
    W = np.zeros((Q, r * Ci, r * Co), w.dtype)
    for p_o in range(r):
        for s in range(k):
            off = p_o + s * dilation - padding
            q, p_i = off // r, off % r
            W[q - q0, p_i * Ci:(p_i + 1) * Ci, p_o * Co:(p_o + 1) * Co] = w[s]
    out = {"w": W}
    if b is not None:
        out["b"] = np.tile(np.asarray(b), r)
    return out


def fold_tconv_weights(w: np.ndarray, b, stride: int, padding: int,
                       r_in: int) -> dict:
    """[k, Ci, Co] transposed-conv weights -> folded [Q, r_in*Ci, r_out*Co]
    with r_out = stride * r_in (one coarse column in -> one out)."""
    w = np.asarray(w)
    k, Ci, Co = w.shape
    r_out = stride * r_in
    q0, Q = tconv_fold_meta(k, stride, padding, r_in)
    W = np.zeros((Q, r_in * Ci, r_out * Co), w.dtype)
    for p_i in range(r_in):
        for p_o in range(r_out):
            val = p_o + padding - stride * p_i
            for s in range(k):
                if (val - s) % r_out == 0:
                    q = (val - s) // r_out
                    W[q - q0, p_i * Ci:(p_i + 1) * Ci,
                      p_o * Co:(p_o + 1) * Co] = w[s]
    out = {"w": W}
    if b is not None:
        out["b"] = np.tile(np.asarray(b), r_out)
    return out


def folded_conv(fp, x: jnp.ndarray, q0: int, mode: str = "") -> jnp.ndarray:
    """Apply folded weights: x [B, r_i*Ci, M] -> [B, r_o*Co, M].

    ``q0`` is static (derived from the conv geometry via *_fold_meta at
    trace time, never stored in the params pytree). Three lowerings,
    selected by ``mode`` (or env GENIE_FOLDED_MODE; measured in
    scripts/exp_hifigan_folded.py):

    - "conv": hand the [Q, rCi, rCo] weight to XLA's conv lowering — a
      folded conv IS a Q-tap stride-1 conv over the coarse axis at
      >=128 channels, which XLA turns into implicit GEMM (no im2col
      materialization). Default.
    - "einsum": Q tap-shifted coarse views stacked then contracted
      (the shift+dot pattern from ``ops.layers.conv1d_ncw_shiftdot``).
    - "flat": same shifted views flattened into one [Q*rCi] contraction
      (a single wide matmul).
    """
    import os

    W = fp["w"].astype(x.dtype)
    Q = W.shape[0]
    M = x.shape[2]
    mode = mode or os.environ.get("GENIE_FOLDED_MODE", "conv")
    if Q == 1 and q0 == 0:
        y = jnp.einsum("bcm,cd->bdm", x, W[0],
                       preferred_element_type=x.dtype)
    elif mode == "conv":
        # cross-correlation: y[m] = sum_q W[q] . x[m + q0 + q]
        y = jax.lax.conv_general_dilated(
            x, W, window_strides=(1,),
            padding=[(-q0, Q - 1 + q0)],
            dimension_numbers=("NCH", "HIO", "NCH"),
            preferred_element_type=x.dtype)
    else:
        xp = jnp.pad(x, ((0, 0), (0, 0), (-q0, Q - 1 + q0)))
        xs = jnp.stack([jax.lax.slice_in_dim(xp, j, j + M, axis=2)
                        for j in range(Q)])          # [Q, B, rCi, M]
        if mode == "flat":
            B = x.shape[0]
            xf = xs.transpose(1, 0, 2, 3).reshape(B, -1, M)
            y = jnp.einsum("bcm,cd->bdm", xf, W.reshape(-1, W.shape[2]),
                           preferred_element_type=x.dtype)
        else:
            y = jnp.einsum("qbcm,qcd->bdm", xs, W,
                           preferred_element_type=x.dtype)
    if "b" in fp:
        y = y + fp["b"][None, :, None].astype(y.dtype)
    return y


def fold_signal(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, C, T] fine -> [B, r*C, T//r] coarse (phase-major blocks)."""
    B, C, T = x.shape
    return (x.reshape(B, C, T // r, r)
            .transpose(0, 3, 1, 2).reshape(B, r * C, T // r))


def unfold_signal(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, r*C, M] coarse -> [B, C, M*r] fine (inverse of fold_signal)."""
    B, rc, M = x.shape
    C = rc // r
    return (x.reshape(B, r, C, M)
            .transpose(0, 2, 3, 1).reshape(B, C, M * r))
