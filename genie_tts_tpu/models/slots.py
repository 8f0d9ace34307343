"""In-flight (slot-based) continuous batching for the T2S decoder.

The window batcher (runtime/batcher.py) coalesces requests that arrive
within a few ms and decodes them as one batch — but a request arriving
mid-batch waits for the whole batch to finish (hundreds of ms under
load). Here the decoder runs as a persistent B-slot machine: one shared
decode loop advances all occupied slots W steps per dispatch ("segment"),
and the host may insert a new request into a free slot *between*
segments. Join latency is one segment (~W steps) instead of one batch.

This is the vLLM-style in-flight batching idea mapped to XLA static
shapes (the reference serves strictly one utterance at a time —
``/root/reference/src/genie_tts/Server.py:87-141``):

* every shape is static: B slots, phoneme/prompt buckets, a decode RING
  of ``ring_len`` key/value columns per slot;
* per-row join times are handled by MASKS, not dynamic shapes: a slot's
  visible ring columns are the last ``keys_written[b]`` global writes;
* all slots share one row-uniform write head, so cache updates stay
  dense ``dynamic_update_slice`` ops (never scatters): within a segment
  new K/V columns collect in a small buffer (see
  ``t2s._layer_decode_buffered``), and one merge per segment writes them
  at ``ring_head`` — uniform across rows because every slot writes every
  step (finished/empty slots write garbage that their masks hide).

Ring invariant: a slot decodes at most ``ring_len`` tokens, and ring slot
j is rewritten every ``ring_len`` global steps — by then any row that
wrote j has either finished or exceeded its cap, so no valid column is
ever clobbered. ``ring_len`` must be a multiple of W so a segment's merge
never wraps.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import T2SConfig
from ..ops.sampling import SamplingRows, sample_token_rows
from . import t2s


class SlotState(NamedTuple):
    """Device-resident decode state for B slots (donate into each segment).

    Cache layout [L,B,H,Dh,S] kv-major with S = Sx+Sp+2*ring_len:

    * ``[0, Sx+Sp)`` — the request's COMPACTED prefill context: text then
      prompt K/V columns gathered to the front at prefill time (valid
      columns are exactly ``[0, x_len+p_len)`` — no pad holes to read
      around);
    * ``[Sx+Sp, Sx+Sp+ring)`` — the decode ring in ring-index order (the
      classic layout);
    * ``[Sx+Sp+ring, Sx+Sp+2*ring)`` — a SECOND copy of the ring, written
      at ``head+ring`` by the same merge. Ring column j and j+ring are
      always identical, so the last ``ring_win`` writes form one
      CONTIGUOUS window ending at ``head+ring`` — decode_segment's
      windowed read slices just that window instead of streaming the
      whole ring every step (decode is KV-read bound at the serving
      geometry; the duplicate write is one extra W-column store per
      segment).
    """

    k_cache: jnp.ndarray      # [L,B,H,Dh,S]  S = Sx+Sp+2*ring_len, kv-major
    v_cache: jnp.ndarray      # [L,B,H,Dh,S]
    # int8 KV mode (init_slots kv_int8=True): caches hold int8 codes and
    # these carry the per-column fp32 dequant scales [L,B,H,S]; None in
    # the exact bf16/fp32 mode (the two modes are distinct pytrees, so
    # they compile to distinct programs — no runtime branch)
    k_scale: Optional[jnp.ndarray]
    v_scale: Optional[jnp.ndarray]
    cur_tok: jnp.ndarray      # [B] last sampled token per row
    keys_written: jnp.ndarray  # [B] ring columns this row has written
    counts: jnp.ndarray       # [B] tokens emitted (frozen once done)
    done: jnp.ndarray         # [B] bool — row finished (EOS or cap)
    active: jnp.ndarray       # [B] bool — slot occupied
    hist: jnp.ndarray         # [B,V] repetition-penalty histogram
    x_len: jnp.ndarray        # [B]
    p_len: jnp.ndarray        # [B]
    min_steps: jnp.ndarray    # [B]
    max_steps: jnp.ndarray    # [B] per-row decode cap (<= ring_len)
    # per-row sampling parameters (ops/sampling.py::SamplingRows): carried
    # in state so requests with ANY SamplingConfig share one decode graph
    samp_top_k: jnp.ndarray   # [B] int32
    samp_top_p: jnp.ndarray   # [B] float32
    samp_temp: jnp.ndarray    # [B] float32
    samp_rep: jnp.ndarray     # [B] float32
    ring_head: jnp.ndarray    # [] int32 — next global write column in [0, ring_len)

    @property
    def sampling_rows(self) -> SamplingRows:
        return SamplingRows(top_k=self.samp_top_k, top_p=self.samp_top_p,
                            temperature=self.samp_temp,
                            repetition_penalty=self.samp_rep)


def quantize_kv_columns(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-column symmetric int8 quantization of K/V columns.

    x [..., Dh, S] -> (int8 codes [..., Dh, S], fp32 scale [..., S]); the
    scale is the column's max-|.| over Dh divided by 127 (near-lossless
    per-token KV quantization). Decode is HBM-bound streaming the whole
    cache every step (BENCH_r02: decode_segment ~352 MB/step of bf16 KV at
    the 8x896 slot geometry); int8 halves those bytes.
    """
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-2), 1e-6) / 127.0
    q = jnp.round(xf / s[..., None, :]).astype(jnp.int8)
    return q, s


def init_slots(cfg: T2SConfig, n_slots: int, sx: int, sp: int, ring_len: int,
               dtype=jnp.bfloat16, kv_int8: bool = False) -> SlotState:
    L, H, Dh, V = (cfg.num_layers, cfg.num_heads, cfg.head_dim,
                   cfg.semantic_vocab)
    S = sx + sp + 2 * ring_len   # doubled ring: see SlotState docstring
    B = n_slots
    z = jnp.zeros
    cache_dtype = jnp.int8 if kv_int8 else dtype
    return SlotState(
        k_cache=z((L, B, H, Dh, S), cache_dtype),
        v_cache=z((L, B, H, Dh, S), cache_dtype),
        k_scale=z((L, B, H, S), jnp.float32) if kv_int8 else None,
        v_scale=z((L, B, H, S), jnp.float32) if kv_int8 else None,
        cur_tok=z((B,), jnp.int32), keys_written=z((B,), jnp.int32),
        counts=z((B,), jnp.int32), done=jnp.ones((B,), bool),
        active=z((B,), bool), hist=z((B, V), jnp.int32),
        x_len=z((B,), jnp.int32), p_len=z((B,), jnp.int32),
        min_steps=z((B,), jnp.int32),
        max_steps=jnp.full((B,), ring_len, jnp.int32),
        samp_top_k=z((B,), jnp.int32), samp_top_p=jnp.ones((B,), jnp.float32),
        samp_temp=jnp.ones((B,), jnp.float32),
        samp_rep=jnp.ones((B,), jnp.float32),
        ring_head=jnp.int32(0),
    )


def prefill_join(
    params: t2s.Params,
    cfg: T2SConfig,
    key: jax.Array,
    phones: jnp.ndarray,        # [1, Sx] packed [ref_text | text], slot bucket
    bert,                       # [1, Sx, bert_dim] or None
    x_len: jnp.ndarray,         # [1]
    prompts: jnp.ndarray,       # [1, Sp]
    p_len: jnp.ndarray,         # [1]
    samp: SamplingRows,         # per-row arrays, shape [1]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One request's prefill at the slot geometry.

    Returns (ctx_k [L,1,H,Dh,Sx+Sp], ctx_v, tok0 [1], hist [1,V]) ready for
    :func:`insert_slot`. Mirrors the head of :func:`t2s.generate`
    (first-draw EOS mask included). Sampling parameters arrive as [1]
    arrays so one compiled prefill graph serves every SamplingConfig.

    The returned context columns are COMPACTED: the valid text columns
    (``[0, x_len)`` of the packed layout) and prompt columns (``[Sx,
    Sx+p_len)``) are gathered to the front, so the slot machine's decode
    reads ``[0, x_len+p_len)`` instead of masking around two pad holes —
    and can slice its context read to a ladder bucket. Decode attention
    sees the same key/value SET either way; only the (irrelevant) column
    order changes.
    """
    Sx, Sp = phones.shape[1], prompts.shape[1]
    V = cfg.semantic_vocab
    if bert is None:
        bert = jnp.zeros(phones.shape + (cfg.bert_dim,), jnp.float32)
    x = t2s.embed_text(params, phones, bert)
    logits0, (k_ctx, v_ctx) = t2s.prefill(params, cfg, x, x_len, prompts,
                                          p_len, cache_len=Sx + Sp)
    k_ctx = jnp.swapaxes(k_ctx, -1, -2)     # kv-major [L,1,H,Dh,Sx+Sp]
    v_ctx = jnp.swapaxes(v_ctx, -1, -2)
    # compact: [text pad-hole prompt pad-hole] -> [text prompt ...], i.e.
    # position j reads source column j (text) or Sx + j - x_len (prompt);
    # columns past x_len+p_len are garbage behind the decode mask
    pos = jnp.arange(Sx + Sp)
    src = jnp.where(pos < x_len[0], pos,
                    jnp.minimum(Sx + pos - x_len[0], Sx + Sp - 1))
    k_ctx = jnp.take(k_ctx, src, axis=-1)
    v_ctx = jnp.take(v_ctx, src, axis=-1)
    hist = jnp.zeros((1, V), jnp.int32)
    prompt_valid = jnp.arange(Sp)[None, :] < p_len[:, None]
    hist = hist.at[jnp.zeros((1, 1), jnp.int32),
                   prompts].add(prompt_valid.astype(jnp.int32))
    forbid_eos = jnp.zeros((V,), bool).at[cfg.eos_id].set(True)
    tok0 = sample_token_rows(key, logits0, hist, samp, forbid=forbid_eos)
    hist = hist + jax.nn.one_hot(tok0, V, dtype=jnp.int32)
    return k_ctx, v_ctx, tok0, hist


def insert_slot(
    state: SlotState,
    slot: jnp.ndarray,          # [] int32 slot index
    ctx_k: jnp.ndarray,         # [L,1,H,Dh,Sx+Sp]
    ctx_v: jnp.ndarray,
    tok0: jnp.ndarray,          # [1]
    hist: jnp.ndarray,          # [1,V]
    x_len: jnp.ndarray,         # [] int32
    p_len: jnp.ndarray,         # [] int32
    min_steps: jnp.ndarray,     # [] int32
    max_steps: jnp.ndarray,     # [] int32
    samp: SamplingRows,         # scalar-or-[1] sampling params for this row
) -> SlotState:
    """Claim a slot for a prefetched request (jit with donated state)."""
    b = slot

    def set1(vec, val):
        return vec.at[b].set(jnp.reshape(val, ()))

    k_scale, v_scale = state.k_scale, state.v_scale
    if k_scale is not None:
        ctx_k, ks = quantize_kv_columns(ctx_k)
        ctx_v, vs = quantize_kv_columns(ctx_v)
        k_scale = jax.lax.dynamic_update_slice(k_scale, ks, (0, b, 0, 0))
        v_scale = jax.lax.dynamic_update_slice(v_scale, vs, (0, b, 0, 0))
    k_cache = jax.lax.dynamic_update_slice(
        state.k_cache, ctx_k.astype(state.k_cache.dtype), (0, b, 0, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(
        state.v_cache, ctx_v.astype(state.v_cache.dtype), (0, b, 0, 0, 0))
    hist_all = jax.lax.dynamic_update_slice_in_dim(
        state.hist, hist, b, axis=0)
    return state._replace(
        k_cache=k_cache, v_cache=v_cache, k_scale=k_scale, v_scale=v_scale,
        cur_tok=set1(state.cur_tok, tok0[0]),
        keys_written=set1(state.keys_written, 0),
        counts=set1(state.counts, 1),
        done=set1(state.done, False),
        active=set1(state.active, True),
        hist=hist_all,
        x_len=set1(state.x_len, x_len),
        p_len=set1(state.p_len, p_len),
        min_steps=set1(state.min_steps, min_steps),
        max_steps=set1(state.max_steps, max_steps),
        samp_top_k=set1(state.samp_top_k, samp.top_k),
        samp_top_p=set1(state.samp_top_p, samp.top_p),
        samp_temp=set1(state.samp_temp, samp.temperature),
        samp_rep=set1(state.samp_rep, samp.repetition_penalty),
    )


def release_slot(state: SlotState, slot: jnp.ndarray) -> SlotState:
    """Free a harvested slot (its cache columns are garbage behind masks)."""
    return state._replace(
        active=state.active.at[slot].set(False),
        done=state.done.at[slot].set(True),
    )


def decode_segment(
    params: t2s.Params,
    state: SlotState,
    key: jax.Array,
    cfg: T2SConfig,
    seg_steps: int,
    sx: int,
    sp: int,
    ring_len: int,
    layer_unroll: int = 1,
    kv_kernel: bool = False,
    ctx_win: Optional[int] = None,
    ring_win: Optional[int] = None,
) -> Tuple[SlotState, jnp.ndarray]:
    """Advance every occupied slot ``seg_steps`` decode steps (one dispatch).

    Returns (state', seg_tokens [B, seg_steps]) — tokens sampled this
    segment per row; rows that are done/empty repeat EOS. The per-step
    K/V columns collect in a [L,B,H,Dh,W] buffer via
    :func:`t2s._layer_decode_buffered`; one merge writes them to the ring
    at the (row-uniform) ring head — TWICE, at ``head`` and ``head+ring``
    (see SlotState: the second copy makes any backward window contiguous).
    ``ring_len % seg_steps == 0``.

    ``ctx_win``/``ring_win`` bound the big-cache READ (decode is KV-read
    bound at the serving geometry — BENCH_r02: ~352 MB/step of bf16 KV at
    8x896): attention streams only the first ``ctx_win`` context columns
    and the last ``ring_win`` ring writes instead of the whole padded
    cache. The caller must guarantee every active row fits: ``x_len[b] +
    p_len[b] <= ctx_win`` and ``keys_written[b] <= ring_win`` — otherwise
    valid keys silently fall outside the read (the scheduler picks the
    windows from per-row host bookkeeping, runtime/slot_batcher.py).
    Defaults read everything. The Pallas int8 kernel path indexes the
    classic first-copy layout and ignores the windows.
    """
    assert ring_len % seg_steps == 0, "segment must not wrap the ring"
    W = seg_steps
    L, B, H, Dh, S = state.k_cache.shape
    int8_kv = state.k_scale is not None
    # in int8 mode the big caches are int8 codes; the in-segment write
    # buffer stays in the compute dtype (the newest W columns — the most
    # attention-relevant context — remain exact; only merged ring/ctx
    # columns carry quantization error)
    buf_dtype = (params["audio_embed"].dtype if int8_kv
                 else state.k_cache.dtype)
    V = cfg.semantic_vocab
    Sx, Sp = sx, sp
    ctx_win = min(ctx_win or Sx + Sp, Sx + Sp)
    ring_win = min(ring_win or ring_len, ring_len)
    use_kernel = int8_kv and kv_kernel
    pe_full = t2s.sine_position_table(Sx + Sp + ring_len, cfg.embed_dim,
                                      dtype=jnp.float32)
    gumbel = jax.random.gumbel(key, (W, B, V), dtype=jnp.float32)
    forbid_eos = jnp.zeros((V,), bool).at[cfg.eos_id].set(True)
    head0 = state.ring_head
    ctx_len = state.x_len + state.p_len          # compacted ctx (prefill_join)

    def slice_last(x, start, width):
        return jax.lax.dynamic_slice_in_dim(x, start, width, axis=-1)

    if use_kernel:
        # Pallas kernel path: classic monolithic cache view (first ring
        # copy, ring-index order); the kernel recomputes visibility from
        # the segment-frozen scalars
        S1 = Sx + Sp + ring_len
        k_read = (state.k_cache[..., :S1],)
        v_read = (state.v_cache[..., :S1],)
        ks_read = (state.k_scale[..., :S1],)
        vs_read = (state.v_scale[..., :S1],)
        ring_pos = jnp.arange(ring_len)[None, :]
        age = jnp.mod(head0 - 1 - ring_pos, ring_len)
        ring_valid = age < state.keys_written[:, None]          # [B, ring]
        kv_positions = jnp.arange(S1)[None, :]
        kv_mask = (kv_positions < ctx_len[:, None])
        kv_mask = kv_mask.at[:, Sx + Sp:].set(ring_valid)
        kv_mask = (kv_mask,)
    else:
        # windowed read: [first ctx_win context cols | last ring_win ring
        # writes]. The window ends at head+ring (exclusive) in the doubled
        # region, so window column j carries the write of age
        # ring_win-1-j; sliced ONCE per segment, read every step.
        win_start = Sx + Sp + ring_len + head0 - ring_win
        k_read = (state.k_cache[..., :ctx_win],
                  slice_last(state.k_cache, win_start, ring_win))
        v_read = (state.v_cache[..., :ctx_win],
                  slice_last(state.v_cache, win_start, ring_win))
        if int8_kv:
            ks_read = (state.k_scale[..., :ctx_win],
                       slice_last(state.k_scale, win_start, ring_win))
            vs_read = (state.v_scale[..., :ctx_win],
                       slice_last(state.v_scale, win_start, ring_win))
        else:
            ks_read = vs_read = (None, None)
        ctx_mask = jnp.arange(ctx_win)[None, :] < ctx_len[:, None]
        win_age = ring_win - 1 - jnp.arange(ring_win)[None, :]
        win_mask = win_age < state.keys_written[:, None]        # [B, ring_win]
        kv_mask = (ctx_mask, win_mask)

    def inner(i, carry):
        (cur_tok, keys_written, counts, done, hist, seg_tokens,
         k_buf, v_buf) = carry
        emb = params["audio_embed"][cur_tok]                    # [B, D]
        audio_pos = state.p_len + keys_written                  # [B]
        pos_emb = pe_full[audio_pos]
        h = (emb + (params["audio_pos_alpha"] * pos_emb).astype(emb.dtype)
             )[:, None]
        buf_mask = jnp.arange(W) < i

        # Pallas int8 path: the kernel recomputes visibility from the
        # segment-frozen scalars (state.* — NOT the loop-carried counters,
        # which advance per step while the big cache's visible set stays
        # fixed until the merge)
        ctx = ((state.x_len, state.p_len, state.keys_written, head0,
                Sx, Sp, ring_len) if (int8_kv and kv_kernel) else None)

        n_reg = len(k_read)

        def layer_body(h, inputs):
            if int8_kv:
                lp, kb, vb, ks, vs, kbuf, vbuf = inputs
            else:
                (lp, kb, vb, kbuf, vbuf), ks, vs = (
                    inputs, (None,) * n_reg, (None,) * n_reg)
            if use_kernel:   # kernel path takes the monolithic region
                kb, vb, ks, vs = kb[0], vb[0], ks[0], vs[0]
                msk = kv_mask[0]
            else:
                msk = kv_mask
            h, k_new, v_new = t2s._layer_decode_buffered(
                lp, h, kb, vb, kbuf, vbuf, buf_mask, msk, H,
                k_scale=ks, v_scale=vs, kv_kernel_ctx=ctx)
            return h, (k_new, v_new)

        xs = ((params["layers"], k_read, v_read, ks_read, vs_read,
               k_buf, v_buf) if int8_kv else
              (params["layers"], k_read, v_read, k_buf, v_buf))
        h, (k_cols, v_cols) = jax.lax.scan(
            layer_body, h, xs, unroll=layer_unroll)
        k_buf = jax.lax.dynamic_update_slice_in_dim(
            k_buf, k_cols[..., None], i, axis=4)
        v_buf = jax.lax.dynamic_update_slice_in_dim(
            v_buf, v_cols[..., None], i, axis=4)

        logits = jnp.dot(h[:, 0].astype(jnp.float32),
                         params["predict"]["w"].astype(jnp.float32))
        # per-row EOS gate: below min_steps EOS is masked out of sampling
        row_step = keys_written + 1                              # tokens so far
        eos_blocked = row_step < state.min_steps                 # [B]
        forbid = forbid_eos[None, :] & eos_blocked[:, None]
        noise = jax.lax.dynamic_index_in_dim(gumbel, i, keepdims=False)
        nxt = sample_token_rows(None, logits, hist, state.sampling_rows,
                                forbid=forbid, noise=noise)
        argmax_eos = jnp.argmax(logits, axis=-1) == cfg.eos_id
        eos_ok = row_step >= state.min_steps
        now_done = (argmax_eos | (nxt == cfg.eos_id)) & eos_ok
        # mirror t2s.generate's bookkeeping exactly: a row samples while
        # row_step < max_steps and flips done once row_step+1 reaches it
        alive = state.active & ~done & (row_step < state.max_steps)
        nxt = jnp.where(alive, nxt, cfg.eos_id)
        seg_tokens = seg_tokens.at[:, i].set(nxt)
        hist = hist + jax.nn.one_hot(nxt, V, dtype=jnp.int32) * (
            alive).astype(jnp.int32)[:, None]
        keys_written = keys_written + alive.astype(jnp.int32)
        counts = jnp.where(alive, counts + 1, counts)
        done = done | now_done | (row_step + 1 >= state.max_steps)
        return (nxt, keys_written, counts, done, hist, seg_tokens,
                k_buf, v_buf)

    k_buf = jnp.zeros((L, B, H, Dh, W), buf_dtype)
    v_buf = jnp.zeros((L, B, H, Dh, W), buf_dtype)
    seg_tokens0 = jnp.full((B, W), cfg.eos_id, jnp.int32)
    (cur_tok, keys_written, counts, done, hist, seg_tokens, k_buf, v_buf) = \
        jax.lax.fori_loop(
            0, W, inner,
            (state.cur_tok, state.keys_written, state.counts, state.done,
             state.hist, seg_tokens0, k_buf, v_buf))

    # merge the segment's W columns at the (uniform) ring head — twice:
    # ring-index copy at head, window copy at head+ring (contiguity)
    base = Sx + Sp + head0
    k_scale, v_scale = state.k_scale, state.v_scale
    if int8_kv:
        k_buf, ks = quantize_kv_columns(k_buf)
        v_buf, vs = quantize_kv_columns(v_buf)
        k_scale = jax.lax.dynamic_update_slice(k_scale, ks, (0, 0, 0, base))
        k_scale = jax.lax.dynamic_update_slice(
            k_scale, ks, (0, 0, 0, base + ring_len))
        v_scale = jax.lax.dynamic_update_slice(v_scale, vs, (0, 0, 0, base))
        v_scale = jax.lax.dynamic_update_slice(
            v_scale, vs, (0, 0, 0, base + ring_len))
    k_cache = jax.lax.dynamic_update_slice(
        state.k_cache, k_buf, (0, 0, 0, 0, base))
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_buf, (0, 0, 0, 0, base + ring_len))
    v_cache = jax.lax.dynamic_update_slice(
        state.v_cache, v_buf, (0, 0, 0, 0, base))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_buf, (0, 0, 0, 0, base + ring_len))
    state = state._replace(
        k_cache=k_cache, v_cache=v_cache, k_scale=k_scale, v_scale=v_scale,
        cur_tok=cur_tok,
        keys_written=keys_written, counts=counts, done=done, hist=hist,
        ring_head=jnp.mod(head0 + W, ring_len),
    )
    return state, seg_tokens
