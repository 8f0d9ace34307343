"""Segmented low-latency streaming: length-independent time-to-first-audio.

The fused streaming head (`engine._t2s_latent_first`) vocodes its first
chunk only after the ENTIRE decode finishes, so TTFA grows linearly with
utterance length (~0.35 ms/step: +35 ms at the 200-step ladder, ~175 ms
at the 500-step reference cap — `/root/reference/src/genie_tts/Core/
Inference.py:95`). Here decode runs as W-step SEGMENTS on a solo (B=1)
slot machine (`models/slots.py` — the same masks/ring machinery the slot
batcher uses, token-stream-identical to `t2s.generate`), and audio is
vocoded from the codes decoded SO FAR while later segments still run:

    prefill -> insert -> segment 1 -> latent(prefix) + first window
                      -> segment 2 ...            (all async dispatches)
    first blocking fetch returns the first ~0.3-0.6 s of audio after
    ~W decoded codes, REGARDLESS of how long the utterance will be.

Approximation contract: the SoVITS latent stage (enc_ssl self-attention
+ MRTE + flow) is bidirectional over the code sequence, so audio windows
vocoded from a PREFIX of the codes differ slightly from whole-utterance
synthesis (the token stream itself is exact). Two guards bound the
artifact: (1) an emission LOOKAHEAD of ``stream_lookahead`` codes keeps
every emitted frame >= 2*lookahead frames behind the decode frontier, so
the HiFi-GAN receptive field (~14 frames) never touches masked/immature
latent positions; (2) every latent recompute reuses ONE PRNG key, and
JAX's counter-based threefry makes the flow noise prefix-stable across
growing frame buckets — overlapping z positions see identical noise.
Exact whole-utterance streaming remains available via
``stream_segmented=False`` (the fused head).

The reference has no intra-utterance streaming at all (sentence-granular
chunks only, `Core/TTSPlayer.py:98-107`).
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import slots as slots_mod
from ..models import sovits
from ..models.t2s import finalize_semantic_tokens
from ..ops.sampling import SamplingConfig, SamplingRows, rows_from_config
from ..utils.metrics import metrics
from .buckets import pad_to, pick_bucket
from .engine import CharacterModel, ReferenceFeatures, TTSEngine, _to_pcm16
from .slot_batcher import _insert_jit, _prefill_jit, _seg_jit

logger = logging.getLogger(__name__)


def stream_geometry(cfg, tcfg) -> "tuple[int, int, int, int]":
    """(W, ring, sx, sp) for the solo streaming machine. Shares the slot
    batcher's phoneme/prompt buckets so `fits` semantics match; the ring
    covers the full decode cap (per-request max_steps is row state)."""
    W = cfg.stream_seg_steps
    cap = pick_bucket(tcfg.max_decode_steps, cfg.step_caps)
    ring = -(-min(cap, tcfg.max_decode_steps + W) // W) * W
    return W, ring, cfg.slot_phoneme_bucket, cfg.slot_prompt_bucket


def fits_stream(cfg, ref: ReferenceFeatures, phones: np.ndarray) -> bool:
    return (len(ref.phones) + len(phones) <= cfg.slot_phoneme_bucket
            and len(ref.prompt_tokens) <= cfg.slot_prompt_bucket)


@functools.partial(
    jax.jit,
    static_argnames=("vcfg", "cb", "first_window", "lookahead", "pcm16"))
def _stream_head(sovits_params, key, tok0, seg_tok, counts, done,
                 text, t_len, ge, ge_mrte, noise_scale, *,
                 vcfg, cb, first_window, lookahead, pcm16):
    """Latent + first vocode window from the FIRST segment's device-side
    tokens — dispatched before any host sync, so TTFA pays exactly one
    blocking fetch. Returns (audio [1, first_window*hop], emit_frames [1]).

    ``emit_frames`` stays ``lookahead`` codes behind the decode frontier
    unless the row already finished (then everything emits, with the
    reference's y[-1]=0 quirk applied in-graph)."""
    toks = jnp.concatenate([tok0[:, None], seg_tok], axis=1)   # [1, 1+W]
    n = counts                                                  # [1]
    pos = jnp.arange(toks.shape[1])[None, :]
    codes = jnp.where(pos < n[:, None], toks, 0)
    codes = jnp.where(done[:, None] & (pos == n[:, None] - 1), 0, codes)
    codes = jnp.clip(codes, 0, vcfg.vq_codes - 1)
    codes = jnp.pad(codes, ((0, 0), (0, cb - toks.shape[1])))
    z = sovits.synthesize_latent(
        sovits_params, vcfg, key, codes, n, text, t_len, ge, ge_mrte,
        noise_scale)                                            # [1, 2*cb, 192]
    zc = jax.lax.slice_in_dim(z, 0, first_window, axis=1)
    valid_z = jnp.minimum(2 * n, first_window)                  # decoded frames
    audio = sovits.vocode_frames(sovits_params, vcfg, zc, ge, valid_z)
    emit = jnp.where(done, 2 * n,
                     2 * jnp.maximum(n - lookahead, 0))
    emit = jnp.minimum(emit, first_window)
    if pcm16:
        audio = _to_pcm16(audio)
    return audio, emit


def synthesize_stream_segments(
    engine: TTSEngine,
    char: CharacterModel,
    ref: ReferenceFeatures,
    text_phones: np.ndarray,
    text_bert: np.ndarray,
    sampling: Optional[SamplingConfig] = None,
    seed: Optional[int] = None,
    noise_scale: float = 0.5,
    min_steps: int = 0,
    max_steps: Optional[int] = None,
    pcm16: bool = False,
):
    """Generator of waveform chunks; first chunk after ~W decoded codes."""
    t_start = time.perf_counter()
    cfg, tcfg, vcfg = engine.cfg, char.t2s_cfg, char.sovits_cfg
    W, ring, sx, sp = stream_geometry(cfg, tcfg)
    unroll = engine._unroll(tcfg)
    hop = vcfg.hop_length
    halo = cfg.vocode_halo
    chunk = cfg.stream_chunk
    lookahead = cfg.stream_lookahead
    if seed is None:
        seed = engine._next_seed()
    max_steps = min(max_steps or tcfg.max_decode_steps, ring)
    min_steps = min(min_steps, max_steps)

    packed = np.concatenate([ref.phones, text_phones]).astype(np.int32)
    if np.any(ref.bert) or np.any(text_bert):
        bert = pad_to(np.concatenate([ref.bert, text_bert])
                      .astype(np.float32), sx, axis=0)[None]
    else:
        bert = None
    t_bucket = pick_bucket(len(text_phones), cfg.phoneme_buckets)
    text_b = pad_to(text_phones.astype(np.int32), t_bucket)[None]
    t_len = np.array([min(len(text_phones), t_bucket)], np.int32)

    # per-request solo machine state (donated through the segment loop)
    state = slots_mod.init_slots(
        tcfg, 1, sx, sp, ring, dtype=char.t2s_params["audio_embed"].dtype)
    kc, vc = state.k_cache, state.v_cache
    small = state._replace(k_cache=0, v_cache=0)
    seg_fn = functools.partial(_seg_jit, tcfg=tcfg, W=W, sx=sx, sp=sp,
                               ring=ring, unroll=unroll)
    key = jax.random.PRNGKey(seed)
    kjoin = jax.random.fold_in(key, 1_000_000)
    klat = jax.random.fold_in(key, 2_000_000)   # ONE latent key: prefix-
    # stable flow noise across every latent recompute of this request

    samp = rows_from_config(sampling or SamplingConfig(), 1)
    ctx_k, ctx_v, tok0, hist = _prefill_jit(
        char.t2s_params, cfg=tcfg, key=kjoin,
        phones=pad_to(packed, sx)[None], bert=bert,
        x_len=np.array([len(packed)], np.int32),
        prompts=ref.prompts_dev(sp),
        p_len=np.array([len(ref.prompt_tokens)], np.int32), samp=samp)
    # the solo stream machine keeps exact (bf16/fp32) KV — no int8 scales
    kc, vc, _, _, small = _insert_jit(
        kc, vc, None, None, small, np.int32(0), ctx_k, ctx_v, tok0, hist,
        np.int32(min(len(packed), sx)),
        np.int32(min(len(ref.prompt_tokens), sp)),
        np.int32(min_steps), np.int32(max_steps),
        SamplingRows(*(a[0] for a in samp)), ring=ring)

    # segment 1 + streaming head, all dispatched before any fetch
    kc, vc, _, _, small1, seg1 = seg_fn(char.t2s_params, kc, vc, None, None,
                                        small, jax.random.fold_in(key, 1))
    head_cb = pick_bucket(W + 1, cfg.frame_buckets)
    first_window = 2 * (W + 1)
    head_audio, head_emit = _stream_head(
        char.sovits_params, klat, tok0, seg1, small1.counts, small1.done,
        text_b, t_len, ref.ge_dev, ref.ge_mrte_dev, noise_scale,
        vcfg=vcfg, cb=head_cb, first_window=first_window,
        lookahead=lookahead, pcm16=pcm16)
    # depth-1 pipeline: segment 2 runs while the head fetch flies home
    small = small1
    pending = None
    if 2 * W < ring:
        kc, vc, _, _, small, seg2 = seg_fn(
            char.t2s_params, kc, vc, None, None, small1,
            jax.random.fold_in(key, 2))
        pending = (seg2, small)

    audio_np, emit_np, tok0_np, seg1_np, done_np, counts_np = jax.device_get(
        (head_audio, head_emit, tok0, seg1, small1.done, small1.counts))
    emitted = int(emit_np[0])
    count = int(counts_np[0])
    done = bool(done_np[0])
    toks_host = [np.asarray(tok0_np), np.asarray(seg1_np)[0]]
    if emitted > 0:
        metrics.observe("ttfa", time.perf_counter() - t_start)
        yield audio_np[0, : emitted * hop]
    ttfa_pending = emitted == 0

    vocode = engine._vocode_pcm if pcm16 else engine._vocode

    def emit_windows(count, done):
        """Vocode every safe window [emitted, frontier) from a fresh
        prefix latent; yields pieces. Uses the shared ``klat`` so flow
        noise matches previous recomputes on overlapping positions."""
        nonlocal emitted, ttfa_pending
        codes_np = np.concatenate(toks_host)[:count]
        if done:
            codes_np = finalize_semantic_tokens(
                codes_np[None], np.array([count]), tcfg.eos_id)[0]
            count = len(codes_np)
            frontier = 2 * count
        else:
            frontier = 2 * max(count - lookahead, 0)
        if frontier - emitted < (1 if done else chunk):
            return
        fb = pick_bucket(max(count, 1), cfg.frame_buckets)
        z = engine._latent(
            char.sovits_params, vcfg, klat,
            pad_to(np.clip(codes_np, 0, vcfg.vq_codes - 1)
                   .astype(np.int32), fb)[None],
            np.array([count], np.int32), text_b, t_len,
            ref.ge_dev, ref.ge_mrte_dev, noise_scale)
        F = 2 * fb
        jobs = []
        while frontier - emitted >= (1 if done else chunk):
            start = emitted
            w = min(chunk, frontier - start)
            s0 = max(start - halo, 0)
            s1 = min(start + chunk + halo, F)
            zc = jax.lax.slice_in_dim(z, s0, s1, axis=1)
            valid_z = np.array([min(max(2 * count - s0, 0), s1 - s0)],
                               np.int32)
            a = vocode(char.sovits_params, vcfg, zc, ref.ge_dev, valid_z)
            jobs.append((a, (start - s0) * hop, w))
            emitted += w
        for a, off, w in jobs:
            arr = jax.device_get(a)
            if ttfa_pending:
                metrics.observe("ttfa", time.perf_counter() - t_start)
                ttfa_pending = False
            yield arr[0, off: off + w * hop]

    seg_idx = 2
    while not done and pending is not None:
        seg_dev, small_now = pending
        pending = None
        # dispatch segment k+1 before fetching segment k (depth-1
        # pipeline: the fetch overlaps the in-flight segment's compute)
        if (seg_idx + 1) * W <= ring:
            kc, vc, _, _, small_next, seg_next = seg_fn(
                char.t2s_params, kc, vc, None, None, small_now,
                jax.random.fold_in(key, seg_idx + 1))
            pending = (seg_next, small_next)
        seg_np, done_np, counts_np = jax.device_get(
            (seg_dev, small_now.done, small_now.counts))
        toks_host.append(np.asarray(seg_np)[0])
        count = int(counts_np[0])
        done = bool(done_np[0])
        yield from emit_windows(count, done)
        seg_idx += 1

    # final flush (also covers the head-finished-everything case)
    yield from emit_windows(count, True)
    metrics.incr("utterances")
    metrics.observe("synthesize_utterance", time.perf_counter() - t_start)
    metrics.observe("audio_seconds", emitted * hop / vcfg.sample_rate)


def stream_warmup_units(engine: TTSEngine, char: CharacterModel,
                        pcm16: bool = True) -> list:
    """AOT lower+compile thunks for the segmented streaming graphs:
    solo prefill/insert/segment at the stream geometry, the stream head,
    and the per-window latent/vocode shapes the emitter can hit."""
    cfg, tcfg, vcfg = engine.cfg, char.t2s_cfg, char.sovits_cfg
    W, ring, sx, sp = stream_geometry(cfg, tcfg)
    unroll = engine._unroll(tcfg)
    params = char.t2s_params
    state = jax.eval_shape(functools.partial(
        slots_mod.init_slots, tcfg, 1, sx, sp, ring,
        dtype=params["audio_embed"].dtype))
    kc, vc = state.k_cache, state.v_cache
    small = state._replace(k_cache=0, v_cache=0)
    key = jax.random.PRNGKey(0)

    def sds(shape, dt):
        return jax.ShapeDtypeStruct(shape, dt)

    i32, f32 = jnp.int32, jnp.float32
    samp1 = SamplingRows(sds((1,), i32), sds((1,), f32), sds((1,), f32),
                         sds((1,), f32))
    samp0 = SamplingRows(sds((), i32), sds((), f32), sds((), f32),
                         sds((), f32))
    scalar = sds((), i32)
    units = []
    prefill_kw = dict(key=key, phones=sds((1, sx), i32),
                      x_len=sds((1,), i32), prompts=sds((1, sp), i32),
                      p_len=sds((1,), i32), samp=samp1)
    # slot-batcher warmup already covers the [1, sx] prefill graphs when
    # slots serve; compile here too (cheap no-op re-lower if cached)
    for bert in (None, sds((1, sx, tcfg.bert_dim), f32)):
        units.append(functools.partial(
            lambda b: _prefill_jit.lower(
                params, cfg=tcfg, bert=b, **prefill_kw).compile(), bert))
    ctx_k, ctx_v, tok0, hist = jax.eval_shape(
        functools.partial(slots_mod.prefill_join, cfg=tcfg),
        params, bert=None, **prefill_kw)
    units.append(lambda: _insert_jit.lower(
        kc, vc, None, None, small, scalar, ctx_k, ctx_v, tok0, hist,
        scalar, scalar, scalar, scalar, samp0, ring=ring).compile())
    units.append(lambda: _seg_jit.lower(
        params, kc, vc, None, None, small, key, tcfg=tcfg, W=W, sx=sx,
        sp=sp, ring=ring, unroll=unroll).compile())
    head_cb = pick_bucket(W + 1, cfg.frame_buckets)
    for tb in cfg.phoneme_buckets:
        units.append(functools.partial(
            lambda tb_: _stream_head.lower(
                char.sovits_params, key, sds((1,), i32), sds((1, W), i32),
                sds((1,), i32), sds((1,), bool),
                sds((1, tb_), i32), sds((1,), i32),
                sds((1, vcfg.gin_channels, 1), f32),
                sds((1, vcfg.mrte_channels, 1), f32), 0.5,
                vcfg=vcfg, cb=head_cb, first_window=2 * (W + 1),
                lookahead=cfg.stream_lookahead, pcm16=pcm16).compile(), tb))
    # per-window vocode widths (latent grid is covered by engine.warmup)
    chunk, halo = cfg.stream_chunk, cfg.vocode_halo
    widths = set()
    for fb in cfg.frame_buckets:
        F = 2 * fb
        for start in range(0, F, chunk):
            s0 = max(start - halo, 0)
            widths.add(min(start + chunk + halo, F) - s0)
    vocode = engine._vocode_pcm if pcm16 else engine._vocode
    ge = jnp.zeros((1, vcfg.gin_channels, 1), f32)
    ones = jnp.ones((1,), i32)
    for w in sorted(widths):
        units.append(functools.partial(
            lambda w_: vocode.lower(
                char.sovits_params, vcfg,
                sds((1, w_, vcfg.inter_channels), f32), ge, ones).compile(),
            w))
    return units
