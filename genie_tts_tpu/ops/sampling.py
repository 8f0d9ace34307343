"""Jit-safe categorical sampling for the AR semantic decoder.

Implements the GPT-SoVITS sampling stack (repetition penalty over previously
emitted tokens, top-k / top-p filtering, temperature) as pure static-shape
JAX: everything operates on fixed-size ``[B, V]`` logits and a fixed-size
token-count histogram, so it traces once and lives inside the decode
``lax.while_loop``.

Sampling itself uses the Gumbel-max trick (argmax of perturbed logits), which
is a categorical draw without materializing a softmax.

Capability parity: the reference bakes sampling into its ONNX stage-decoder
graph (`/root/reference/src/genie_tts/Data/v2/Models/t2s_stage_decoder_fp32.onnx`,
consumed by `Core/Inference.py:95-106`); defaults follow GPT-SoVITS webui.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    top_k: int = 15
    top_p: float = 1.0
    temperature: float = 1.0
    repetition_penalty: float = 1.35


# Per-row top-k is computed against a static-width lax.top_k (a full
# [B, V] sort per AR step is measurably slower on TPU); rows asking for
# more than TOP_K_CAP keep the TOP_K_CAP-th threshold instead. The
# GPT-SoVITS webui exposes top_k 1..100, so the cap is not reachable
# from reference-shaped requests.
TOP_K_CAP = 128


class SamplingRows(NamedTuple):
    """Per-row sampling parameters (device arrays, shape [B] each).

    The slot engine (models/slots.py) carries these in its persistent
    state so requests with different sampling configs share one compiled
    decode graph — a static ``SamplingConfig`` would key a recompile (and
    a separate slot machine) per distinct config.
    """
    top_k: jnp.ndarray               # [B] int32; <=0 disables
    top_p: jnp.ndarray               # [B] float32; >=1 disables
    temperature: jnp.ndarray         # [B] float32
    repetition_penalty: jnp.ndarray  # [B] float32


def rows_from_config(cfg: SamplingConfig, batch: int) -> SamplingRows:
    """Broadcast one SamplingConfig to per-row arrays (host-side)."""
    import numpy as np

    return SamplingRows(
        top_k=np.full(batch, cfg.top_k, np.int32),
        top_p=np.full(batch, cfg.top_p, np.float32),
        temperature=np.full(batch, cfg.temperature, np.float32),
        repetition_penalty=np.full(batch, cfg.repetition_penalty, np.float32),
    )


def apply_repetition_penalty(
    logits: jnp.ndarray, token_counts: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """Penalize every token already emitted (count > 0).

    ``logits``: [B, V] fp32. ``token_counts``: [B, V] int32 histogram of
    previously generated tokens (prompt + decoded).
    """
    if penalty == 1.0:
        return logits
    seen = token_counts > 0
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, penalized, logits)


def top_k_top_p_filter(logits: jnp.ndarray, top_k: int, top_p: float) -> jnp.ndarray:
    """Mask logits outside the nucleus / top-k set with -inf. [B, V] fp32.

    Order matches GPT-SoVITS ``logits_to_probs``: top-p runs FIRST on the
    full distribution (sorted descending; remove tokens whose inclusive
    cumulative probability exceeds ``top_p``, always keeping the argmax),
    then top-k masks below the k-th remaining logit. Running top-k first
    would renormalize the nucleus over only k tokens and keep the
    threshold-crossing token — a different set than the reference's.
    """
    neg = jnp.float32(-1e10)
    if top_p < 1.0:
        sort_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        remove_sorted = cum > top_p
        remove_sorted = remove_sorted.at[..., 0].set(False)  # keep argmax
        keep = jnp.ones_like(remove_sorted).at[
            jnp.arange(logits.shape[0])[:, None], sort_idx
        ].set(~remove_sorted)
        logits = jnp.where(keep, logits, neg)
    if top_k > 0 and top_k < logits.shape[-1]:
        # lax.top_k, not a full sort: this runs once per decode step inside
        # the AR while_loop, and a full 1025-wide sort is far slower on TPU
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, neg, logits)
    return logits


def sample_token(
    key: Optional[jax.Array],
    logits: jnp.ndarray,
    token_counts: jnp.ndarray,
    cfg: SamplingConfig,
    forbid: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One categorical draw per row. Returns [B] int32.

    ``forbid``: optional [V] (or per-row [B, V]) bool — tokens never
    sampled (e.g. EOS on the very first decode step, matching GPT-SoVITS's
    first-step EOS mask; per-row min_steps gates in the slot engine).
    ``noise``: optional pre-drawn [B, V] Gumbel noise. Inside the AR
    while_loop a per-step ``jax.random.gumbel`` costs a threefry kernel
    chain every iteration; callers instead draw one [steps, B, V] table
    up front (a single large, well-vectorized kernel) and slice per step.
    """
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, token_counts, cfg.repetition_penalty)
    if forbid is not None:
        fb = forbid if forbid.ndim == logits.ndim else forbid[None, :]
        logits = jnp.where(fb, jnp.float32(-1e10), logits)
    logits = top_k_top_p_filter(logits, cfg.top_k, cfg.top_p)
    temperature = max(cfg.temperature, 1e-5)
    if noise is None:
        noise = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits / temperature + noise, axis=-1).astype(jnp.int32)


def sample_token_rows(
    key: Optional[jax.Array],
    logits: jnp.ndarray,
    token_counts: jnp.ndarray,
    rows: SamplingRows,
    forbid: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One categorical draw per row with PER-ROW sampling parameters.

    Matches :func:`sample_token` exactly when every row carries the same
    config (penalty -> forbid mask -> top-p -> top-k -> temperature, the
    GPT-SoVITS ``logits_to_probs`` order): the top-k threshold is the same
    k-th value whether found by ``lax.top_k(k)`` or read out of a wider
    ``lax.top_k(TOP_K_CAP)``, and the top-p sort branch only runs (via
    ``lax.cond``) when some row has top_p < 1.
    """
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    pen = rows.repetition_penalty[:, None]
    seen = (token_counts > 0) & (pen != 1.0)
    penalized = jnp.where(logits < 0, logits * pen, logits / pen)
    logits = jnp.where(seen, penalized, logits)
    if forbid is not None:
        fb = forbid if forbid.ndim == logits.ndim else forbid[None, :]
        logits = jnp.where(fb, jnp.float32(-1e10), logits)
    neg = jnp.float32(-1e10)

    def _with_top_p(lg):
        sort_idx = jnp.argsort(-lg, axis=-1)
        sorted_logits = jnp.take_along_axis(lg, sort_idx, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        remove_sorted = cum > rows.top_p[:, None]
        remove_sorted = remove_sorted.at[..., 0].set(False)  # keep argmax
        keep = jnp.ones_like(remove_sorted).at[
            jnp.arange(B)[:, None], sort_idx].set(~remove_sorted)
        return jnp.where(keep, lg, neg)

    # the sort-based nucleus branch only executes when requested (scalar
    # lax.cond — XLA:TPU runs one branch, so default-sampling rows never
    # pay the per-step [B, V] sort)
    logits = jax.lax.cond(jnp.any(rows.top_p < 1.0), _with_top_p,
                          lambda lg: lg, logits)
    cap = min(TOP_K_CAP, V)
    vals = jax.lax.top_k(logits, cap)[0]                     # [B, cap]
    kth = jnp.take_along_axis(
        vals, (jnp.clip(rows.top_k, 1, cap) - 1)[:, None], axis=-1)
    apply_k = (rows.top_k > 0) & (rows.top_k < V)
    logits = jnp.where(apply_k[:, None] & (logits < kth), neg, logits)
    temperature = jnp.maximum(rows.temperature, 1e-5)[:, None]
    if noise is None:
        noise = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits / temperature + noise, axis=-1).astype(jnp.int32)
