"""In-flight continuous batching scheduler (slot engine).

The window batcher (batcher.py) groups arrivals within a few ms and runs
them as one batch — a request landing mid-batch waits for the WHOLE batch
(hundreds of ms under load). This scheduler keeps a persistent B-slot
decode machine on the device (models/slots.py): every dispatch advances
all occupied slots ``slot_steps`` tokens, and new requests claim free
slots between dispatches. Join latency is one segment (tens of ms), and
per-request ``min_steps``/``max_steps`` are dynamic per-row values — no
per-ladder recompiles.

One scheduler serves one character (the slot caches embed its weights'
geometry); the HTTP layer keeps a batcher per loaded character.
"""
from __future__ import annotations

import functools
import logging
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import slots as slots_mod
from ..models.t2s import finalize_semantic_tokens
from ..ops.sampling import SamplingConfig, SamplingRows, rows_from_config
from ..utils.metrics import metrics
from .buckets import pad_to
from .engine import CharacterModel, ReferenceFeatures, TTSEngine

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Shared jitted slot graphs. Module-level (NOT per-batcher) so every
# character with the same geometry reuses one compiled program — weights
# are arguments, sampling parameters are per-row state arrays, and the
# only static keys are the model config + slot geometry. One warmup pass
# covers every character the server will ever load.
# ---------------------------------------------------------------------------

def _strip_big(state):
    """Zero the big-cache leaves so the 'small' state can be returned
    undonated (scales exist only in int8-KV mode — None stays None)."""
    return state._replace(
        k_cache=0, v_cache=0,
        k_scale=None if state.k_scale is None else 0,
        v_scale=None if state.v_scale is None else 0)


def _kv_kernel_enabled(cfg) -> bool:
    """Route the int8-KV big-cache attention through the Pallas kernel
    (ops/int8_decode.py). TPU-only: every other backend (CPU tests,
    virtual meshes, GPU) takes the pure-XLA dequant fallback — the kernel
    uses pltpu grid specs that would fail to trace elsewhere.
    GENIE_KV_KERNEL=0 forces the XLA path."""
    import os

    if os.environ.get("GENIE_KV_KERNEL", "1").lower() in ("0", "false"):
        return False
    return cfg.slot_kv_int8 and jax.default_backend() == "tpu"


@functools.partial(
    jax.jit, donate_argnames=("kc", "vc", "ks", "vs"),
    static_argnames=("tcfg", "W", "sx", "sp", "ring", "unroll", "kv_kernel",
                     "ctx_win", "ring_win"))
def _seg_jit(params, kc, vc, ks, vs, small, key, *, tcfg, W, sx, sp, ring,
             unroll, kv_kernel=False, ctx_win=None, ring_win=None):
    # Donation is split: ONLY the big KV caches (+ int8 scales) donate
    # (in-place reuse across dispatches). The small state leaves
    # (done/counts/...) and seg_tokens must SURVIVE the next dispatch —
    # the depth-1 pipelined loop fetches segment k's outputs after
    # dispatching k+1.
    state = small._replace(k_cache=kc, v_cache=vc, k_scale=ks, v_scale=vs)
    state, seg_tok = slots_mod.decode_segment(
        state=state, params=params, key=key, cfg=tcfg, seg_steps=W,
        sx=sx, sp=sp, ring_len=ring, layer_unroll=unroll,
        kv_kernel=kv_kernel, ctx_win=ctx_win, ring_win=ring_win)
    return (state.k_cache, state.v_cache, state.k_scale, state.v_scale,
            _strip_big(state), seg_tok)


@functools.partial(jax.jit, donate_argnames=("kc", "vc", "ks", "vs"),
                   static_argnames=("ring",))
def _insert_jit(kc, vc, ks, vs, small, slot, ctx_k, ctx_v, tok0, hist,
                x_len, p_len, mn, mx, samp, *, ring):
    state = small._replace(k_cache=kc, v_cache=vc, k_scale=ks, v_scale=vs)
    # ring safety invariant: a row may never decode more tokens
    # than the ring holds (the merge would clobber its live keys)
    mx = jnp.minimum(mx, np.int32(ring))
    state = slots_mod.insert_slot(state, slot, ctx_k, ctx_v, tok0,
                                  hist, x_len, p_len,
                                  jnp.minimum(mn, mx), mx, samp)
    return (state.k_cache, state.v_cache, state.k_scale, state.v_scale,
            _strip_big(state))


@jax.jit
def _release_jit(small, slot):  # touches flags only — no caches involved
    return slots_mod.release_slot(small, slot)


@functools.partial(jax.jit, static_argnames=("fb", "count", "vq_codes"))
def _spec_codes_jit(tok0s, seg_tok, slots, *, fb, count, vq_codes):
    """[R_pad, fb] device codes for speculative first pieces: row r is
    ``tok0s[r]`` followed by the first ``count - 1`` tokens of the
    IN-FLIGHT segment's row ``slots[r]``. Runs after that segment on the
    device stream, so the tokens exist by the time this executes — the
    host never waits for them.

    ``tok0s`` is a TUPLE of [1] arrays (one per padded row) and the
    clip/pad all happen inside this one jit: every op-by-op glue
    dispatch costs a ~0.45 s compile on the tunneled backend the first
    time its shape appears, which stalled the scheduler mid-traffic
    (r5 measurement). Keyed on the padded row-bucket, so the compile
    set is bounded by batch_buckets."""
    rows = seg_tok[slots, : count - 1]                    # [R_pad, count-1]
    codes = jnp.zeros((len(tok0s), fb), jnp.int32)
    codes = codes.at[:, 0].set(jnp.concatenate(tok0s))
    codes = codes.at[:, 1:count].set(rows)
    return jnp.clip(codes, 0, vq_codes - 1)


_prefill_jit = jax.jit(slots_mod.prefill_join, static_argnames=("cfg",))


def seg_window_combos(cfg, sx: int, sp: int, ring: int) -> list:
    """Every (ctx_win, ring_win) static pair the scheduler can dispatch:
    the ladder product plus the full-read fallback (None, None). Warmed
    ahead of traffic so window transitions never stall on a compile."""
    combos = [(None, None)]
    if cfg.slot_windowed_kv and not _kv_kernel_enabled(cfg):
        ctx_l = [w for w in cfg.slot_ctx_windows if w < sx + sp]
        ring_l = [w for w in cfg.slot_ring_windows if w < ring]
        combos += [(c, r) for c in ctx_l for r in ring_l]
    return combos


def seg_widths(cfg, ring: int) -> "tuple[int, ...]":
    """The segment step-widths the scheduler can dispatch: slot_steps
    always, plus the shorter slot_join_steps used while a streaming row
    owes its first piece (TTFA). Both must divide the ring."""
    widths = [cfg.slot_steps]
    j = cfg.slot_join_steps
    if j and j != cfg.slot_steps and ring % j == 0:
        widths.append(j)
    return tuple(widths)


def slot_geometry(cfg, tcfg) -> "tuple[int, int, int, int, int]":
    """(n_slots, seg_steps, ring, phoneme_bucket, prompt_bucket) — the
    static geometry every slot graph is keyed on. Shared by the batcher
    and the AOT warmup so they can never drift."""
    W = cfg.slot_steps
    ring = -(-min(cfg.slot_ring, tcfg.max_decode_steps) // W) * W
    return (cfg.slot_batch, W, ring,
            cfg.slot_phoneme_bucket, cfg.slot_prompt_bucket)


def _slot_finisher_t_bucket(cfg) -> int:
    """The ONE text bucket the slot finisher pads to (keeps its compiled
    key space at batch x frame instead of batch x frame x text; the extra
    MRTE/enc_text compute on padded text is negligible vs HiFi-GAN)."""
    from .buckets import pick_bucket

    return pick_bucket(cfg.slot_phoneme_bucket, cfg.phoneme_buckets)


def slot_warmup_units(engine: "TTSEngine", char: "CharacterModel",
                      pcm16: bool = True) -> list:
    """AOT lower+compile thunks for every slot-serving graph.

    The slot graphs are module-level jits keyed only on model config +
    geometry, so compiling them here (engine.warmup sweep) covers every
    character the server will load. Inputs are ShapeDtypeStructs — no
    device allocation. Includes the batched finisher ladder the slot
    scheduler's completions hit (``engine.finisher_warmup_units``)."""
    cfg, tcfg = engine.cfg, char.t2s_cfg
    B, W, ring, sx, sp = slot_geometry(cfg, tcfg)
    unroll = engine._unroll(tcfg)
    params = char.t2s_params
    state = jax.eval_shape(functools.partial(
        slots_mod.init_slots, tcfg, B, sx, sp, ring,
        dtype=params["audio_embed"].dtype, kv_int8=cfg.slot_kv_int8))
    kc, vc = state.k_cache, state.v_cache
    ks, vs = state.k_scale, state.v_scale
    small = _strip_big(state)
    key = jax.random.fold_in(jax.random.PRNGKey(0), 0)

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
    for bert in (None, sds((1, sx, tcfg.bert_dim), f32)):
        units.append(functools.partial(
            lambda b: _prefill_jit.lower(
                params, cfg=tcfg, bert=b, **prefill_kw).compile(), bert))
    ctx_k, ctx_v, tok0, hist = jax.eval_shape(
        functools.partial(slots_mod.prefill_join, cfg=tcfg),
        params, bert=None, **prefill_kw)
    units.append(lambda: _insert_jit.lower(
        kc, vc, ks, vs, small, scalar, ctx_k, ctx_v, tok0, hist,
        scalar, scalar, scalar, scalar, samp0, ring=ring).compile())
    units.append(lambda: _release_jit.lower(small, scalar).compile())
    for cw, rw in seg_window_combos(cfg, sx, sp, ring):
        for w in seg_widths(cfg, ring):
            units.append(functools.partial(
                lambda cw, rw, w: _seg_jit.lower(
                    params, kc, vc, ks, vs, small, key, tcfg=tcfg, W=w,
                    sx=sx, sp=sp, ring=ring, unroll=unroll,
                    kv_kernel=_kv_kernel_enabled(cfg),
                    ctx_win=cw, ring_win=rw).compile(), cw, rw, w))
    # window-pump graphs: streaming rows pump per-row even without the
    # machine-wide flag, so a server must have them warm
    units.extend(engine.window_warmup_units(
        char, wins=(cfg.vocode_chunk + 2 * cfg.vocode_halo,
                    cfg.vocode_chunk // 2 + 2 * cfg.vocode_halo),
        t_bucket=_slot_finisher_t_bucket(cfg), pcm16=pcm16))
    if not cfg.slot_stream_finisher:
        units.extend(engine.finisher_warmup_units(
            char, t_buckets=(_slot_finisher_t_bucket(cfg),), pcm16=pcm16))
    return units


def _stream_close(req: "_Request", err: Optional[BaseException] = None):
    """Terminate a streaming consumer: exception propagates, None ends."""
    if req.stream_q is not None:
        req.stream_q.put(err)


@dataclass
class _Request:
    ref: ReferenceFeatures
    phones: np.ndarray
    bert: np.ndarray
    min_steps: int
    max_steps: int
    sampling: Optional[SamplingConfig] = None
    ctx_cols: int = 0         # x_len + p_len (compacted context columns)
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[BaseException] = None
    # filled at insert time
    tok0_dev: object = None   # [1] device array; fetched at completion
    seg_tokens: List[np.ndarray] = field(default_factory=list)
    harvested: bool = False
    cancelled: bool = False   # waiter gave up (timeout): drop, don't decode
    # window-pump state (cfg.slot_stream_finisher)
    klat: object = None       # per-request flow-noise key (prefix-stable)
    tok0_np: Optional[int] = None
    count_seen: int = 0       # tokens confirmed by the last fetched segment
    emitted: int = 0          # latent frames already dispatched to vocode
    pieces: dict = field(default_factory=dict)   # start_frame -> pcm piece
    final_codes: Optional[np.ndarray] = None
    # in-flight streaming (synthesize_stream): pieces are ALSO pushed to
    # this queue as their fetches land; None terminates, an exception
    # propagates to the consuming generator
    stream_q: Optional[queue.Queue] = None
    # TTFA stage timestamps (perf_counter): queue wait / join-to-dispatch /
    # dispatch-to-first-piece land in metrics as ttfa_* timers
    t_submit: float = 0.0
    t_join: float = 0.0
    t_first_dispatch: float = 0.0


class SlotBatcher:
    """Persistent B-slot decode loop with between-segment joins.

    ``pcm16``: finisher vocodes emit int16 on device and results are
    int16 PCM — half the d2h bytes of f32 (the finisher is transfer-bound
    on tunneled hosts; serving output is PCM16 anyway). The HTTP serving
    path enables it; the default keeps f32 for API callers."""

    def __init__(self, engine: TTSEngine, char: CharacterModel,
                 pcm16: bool = False):
        self.engine = engine
        self.char = char
        self.pcm16 = pcm16
        self.cfg = engine.cfg
        tcfg = char.t2s_cfg
        (self.n_slots, self.W, self.ring,
         self.sx, self.sp) = slot_geometry(self.cfg, tcfg)
        self._unroll = engine._unroll(tcfg)
        # finisher vocodes pad text to ONE bucket: key space stays
        # (batch x frame), all warmable ahead of traffic
        self._t_buckets = (_slot_finisher_t_bucket(self.cfg),)

        self._decode_segs = {
            w: functools.partial(
                _seg_jit, tcfg=tcfg, W=w, sx=self.sx, sp=self.sp,
                ring=self.ring, unroll=self._unroll,
                kv_kernel=_kv_kernel_enabled(self.cfg))
            for w in seg_widths(self.cfg, self.ring)}
        self._decode_seg = self._decode_segs[self.W]
        self.join_W = min(self._decode_segs)   # == W when join steps off
        # windowed KV reads: ladder of (ctx, ring) read windows; the
        # dispatch loop picks the smallest pair covering every active row
        # (host bookkeeping in self._merged / req.ctx_cols). Joint
        # fallback to the full read keeps the compiled-graph set small.
        self.windowed_kv = (self.cfg.slot_windowed_kv
                            and not _kv_kernel_enabled(self.cfg))
        self._ctx_ladder = tuple(sorted(
            w for w in self.cfg.slot_ctx_windows if w < self.sx + self.sp))
        self._ring_ladder = tuple(sorted(
            w for w in self.cfg.slot_ring_windows if w < self.ring))
        self._merged = [0] * self.n_slots   # merged ring keys per slot
        self._insert = functools.partial(_insert_jit, ring=self.ring)
        self._release = _release_jit
        self._prefill_join = functools.partial(_prefill_jit, cfg=tcfg)

        # Window pump: vocode one vocode_chunk window per pumped row every
        # half-chunk of decoded steps, batched across rows; completion
        # vocodes only the remainder. PER-ROW policy: rows with a STREAMING
        # consumer (synthesize_stream) always pump — that is what makes
        # slot-served responses stream with decode-bound TTFA. Rows
        # without a consumer skip the pump (its latent recomputes cost
        # ~10% throughput, the r3 negative result) and complete through
        # the POOLED whole-utterance finisher — unless
        # cfg.slot_stream_finisher forces the legacy all-rows-pump mode.
        self.windows = self.cfg.slot_stream_finisher
        self.chunk = self.cfg.vocode_chunk
        self.halo = self.cfg.vocode_halo
        self.win = self.chunk + 2 * self.halo
        self.win_small = self.chunk // 2 + 2 * self.halo
        self.lookahead = self.cfg.stream_lookahead
        # the first-piece window must fit the large pump window; larger
        # configs would silently truncate the emitted audio at fetch time
        self.first_piece = min(self.cfg.slot_first_piece, self.chunk)
        # dedicated small window for first pieces and short remainders: a
        # 16-frame piece vocoded through win_small (176 frames) spends
        # ~3x the HiFi-GAN work and doubles the latent bucket; every
        # extra device-ms here is head-of-line latency for the TTFA the
        # piece exists to serve
        self.win_first = (self.first_piece + 2 * self.halo
                          if self.first_piece else 0)
        if not self.win_first or self.win_first >= self.win_small:
            self.win_first = self.win_small

        self._reset_state()
        self._slots: List[Optional[_Request]] = [None] * self.n_slots
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._seg_counter = 0
        self._defer_pump = False
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()
        # pooled finisher fetches overlap on two workers; window-pump
        # piece fetches and window completions pin ONE dedicated worker so
        # they execute in submission order — a completion never reads a
        # window piece that is still in flight
        self._vocoder = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="slot-vocode")
        self._winworker = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="slot-windows")
        # finished rows awaiting the batched finisher vocode. Vocoding each
        # segment's finishers alone runs at B=1-2 (~108 ms/utt measured on
        # v5e vs 43 ms/utt at B=8) and was the dominant serving cost; rows
        # now POOL across segments and flush when enough collect, the
        # oldest has waited slot_finisher_wait_segs segments, or the
        # machine idles. [(req, count, age_in_segments)]
        self._finish_pending: List[list] = []

    # -- public -----------------------------------------------------------

    def start(self) -> None:
        with self._lock:
            if self._running:
                return
            # a previous loop may still be finishing its last iteration;
            # two loops would race the donated cache buffers
            if self._thread is not None and self._thread.is_alive():
                self._thread.join()
            self._running = True
            # XLA compiles run on this thread (workers only fetch); LLVM
            # codegen recursion can overflow the default 8 MB thread stack
            prev_stack = threading.stack_size(64 * 1024 * 1024)
            try:
                self._thread = threading.Thread(target=self._loop,
                                                daemon=True, name="tts-slots")
                self._thread.start()
            finally:
                threading.stack_size(prev_stack)

    def stop(self) -> None:
        """Signal shutdown. The loop thread drains: it fails every queued
        and in-flight request loudly on exit (no hung waiters)."""
        with self._lock:
            self._running = False

    def fits(self, ref: ReferenceFeatures, phones: np.ndarray) -> bool:
        """Whether a request fits the slot machine's static geometry."""
        return (len(ref.phones) + len(phones) <= self.sx
                and len(ref.prompt_tokens) <= self.sp)

    def warmup(self, ref: ReferenceFeatures, text_phones: np.ndarray,
               max_steps: Optional[int] = None,
               streaming: bool = False) -> int:
        """Compile the serving graphs before traffic: the finisher-vocode
        batch ladder (finisher group sizes are load-dependent — an unwarmed
        B bucket would stall a mid-run completion for a full compile), then
        prefill+insert+segment via one real tiny request. ``streaming``:
        also compile the window-pump graphs streaming consumers hit."""
        max_steps = min(max_steps or self.char.t2s_cfg.max_decode_steps,
                        self.ring)
        n = 0
        if self.windows or streaming:
            # window pump + remainder graphs at every (batch, frame>=win/2,
            # window) bucket — AOT lower+compile on a thread pool (serial
            # eager warmup measured 430 s on v5e; compiles release the GIL)
            wins = {self.win, self.win_small, self.win_first}
            n = self.engine._run_compile_units(
                self.engine.window_warmup_units(
                    self.char, wins=tuple(sorted(wins)),
                    t_bucket=self._t_buckets[0], pcm16=self.pcm16))
        if not self.windows:
            # finisher groups mix arbitrary lengths: warm EVERY frame
            # bucket a request can land in between half the cap and the
            # cap (EOS spreads completions across that band; a mid-run
            # compile stall on an unwarmed bucket costs seconds)
            lengths = {max(max_steps, 1), max(max_steps // 2, 1)}
            lengths |= {b for b in self.cfg.frame_buckets
                        if max_steps // 2 <= b < max_steps}
            for length in lengths:
                codes = np.zeros(length, np.int32)
                for b in self.cfg.batch_buckets:
                    # warm THROUGH the first bucket >= n_slots — that is the
                    # bucket pick_bucket pads full finisher groups to
                    self.engine.vocode_codes_batch(
                        self.char, [(ref, text_phones, codes)]
                        * min(b, self.n_slots), t_buckets=self._t_buckets,
                        pcm16=self.pcm16)
                    n += 1
                    if b >= self.n_slots:
                        break
        # AOT-compile every windowed-KV segment graph the scheduler can
        # dispatch (ladder product + full fallback) — a window transition
        # mid-traffic must not stall on a compile
        combos = seg_window_combos(self.cfg, self.sx, self.sp, self.ring)
        if len(combos) > 1 or len(seg_widths(self.cfg, self.ring)) > 1:
            state = jax.eval_shape(functools.partial(
                slots_mod.init_slots, self.char.t2s_cfg, self.n_slots,
                self.sx, self.sp, self.ring,
                dtype=self.char.t2s_params["audio_embed"].dtype,
                kv_int8=self.cfg.slot_kv_int8))
            small = _strip_big(state)
            key = jax.random.fold_in(jax.random.PRNGKey(0), 0)
            kw = dict(tcfg=self.char.t2s_cfg, sx=self.sx,
                      sp=self.sp, ring=self.ring, unroll=self._unroll,
                      kv_kernel=_kv_kernel_enabled(self.cfg))
            n += self.engine._run_compile_units([
                functools.partial(
                    lambda cw, rw, w: _seg_jit.lower(
                        self.char.t2s_params, state.k_cache, state.v_cache,
                        state.k_scale, state.v_scale, small, key, W=w,
                        ctx_win=cw, ring_win=rw, **kw).compile(), cw, rw, w)
                for cw, rw in combos
                for w in seg_widths(self.cfg, self.ring)])
        bert = np.zeros((len(text_phones), self.char.t2s_cfg.bert_dim),
                        np.float32)
        self.synthesize(ref, text_phones, bert, timeout=600,
                        max_steps=min(2 * self.W, max_steps))
        if streaming:
            # the speculative first-piece codes jit at every padded row
            # bucket (tiny graphs, but a first-shape compile mid-traffic
            # stalls a TTFA)
            if self.first_piece:
                from .buckets import pick_bucket

                count = self.first_piece // 2 + self.lookahead
                fb = pick_bucket(max(count, -(-self._win_for(
                    [(None, None, count, 0, self.first_piece)]) // 2)),
                    self.cfg.frame_buckets)
                i32 = jnp.int32
                n += self.engine._run_compile_units([
                    functools.partial(
                        lambda r, w0: _spec_codes_jit.lower(
                            tuple([jax.ShapeDtypeStruct((1,), i32)] * r),
                            jax.ShapeDtypeStruct((self.n_slots, w0), i32),
                            jax.ShapeDtypeStruct((r,), i32),
                            fb=fb, count=count,
                            vq_codes=self.char.sovits_cfg.vq_codes
                        ).compile(), r, w0)
                    for r in self.cfg.batch_buckets if r <= self.n_slots
                    # same guard as _spec_first_pieces: a segment
                    # shorter than the claimed count never dispatches
                    for w0 in set(seg_widths(self.cfg, self.ring))
                    if w0 >= count - 1])
            # one real STREAMING request: first-use op-by-op glue on the
            # speculative first-piece + pump + piece-fetch paths costs
            # ~0.45 s per shape on the tunneled backend — pay it here,
            # not on the first client's TTFA
            steps = min(2 * self.W, max_steps)
            for _ in self.synthesize_stream(ref, text_phones, bert,
                                            timeout=600, min_steps=steps,
                                            max_steps=steps):
                pass
            return n + 2
        return n + 1

    def synthesize(self, ref: ReferenceFeatures, phones: np.ndarray,
                   bert: np.ndarray, timeout: Optional[float] = None,
                   min_steps: int = 0,
                   max_steps: Optional[int] = None,
                   sampling: Optional[SamplingConfig] = None) -> np.ndarray:
        """Blocking submit; decodes in-flight with concurrent requests.

        ``sampling`` is per-request: rows with different configs share the
        same decode graph (per-row parameters live in the slot state)."""
        self.start()
        max_steps = min(max_steps or self.char.t2s_cfg.max_decode_steps,
                        self.ring)
        req = _Request(ref, phones.astype(np.int32), bert,
                       min_steps=min(min_steps, max_steps),
                       max_steps=max_steps, sampling=sampling)
        self._q.put(req)
        if not req.done.wait(timeout):
            # stop burning slot-machine work on an abandoned request: the
            # scheduler drops it from the queue or releases its slot
            req.cancelled = True
            raise TimeoutError("slot-batched synthesis timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def synthesize_stream(self, ref: ReferenceFeatures, phones: np.ndarray,
                          bert: np.ndarray, timeout: Optional[float] = None,
                          min_steps: int = 0,
                          max_steps: Optional[int] = None,
                          sampling: Optional[SamplingConfig] = None):
        """Streaming submit: yields PCM pieces AS THE WINDOW PUMP EMITS
        them, while the request decodes in-flight next to others — the
        under-load counterpart of the solo segmented streaming path
        (which monopolizes the device per request). Streaming rows pump
        PER-ROW: concurrent non-streaming requests keep the cheaper
        pooled whole-utterance finisher (no machine-wide throughput tax).
        Call :meth:`warmup` with ``streaming=True`` before traffic or the
        first stream stalls on the window-graph compiles.
        """
        self.start()
        max_steps = min(max_steps or self.char.t2s_cfg.max_decode_steps,
                        self.ring)
        if self.first_piece:
            # floor: the speculative first piece claims this many tokens
            # from the row's first decode segment (_spec_first_pieces),
            # which is only sound if EOS cannot land inside them. 16
            # codes = 0.32 s of audio — below any non-degenerate
            # utterance, so the floor changes nothing real while letting
            # EVERY streaming request take the speculative TTFA path.
            min_steps = max(min_steps,
                            min(self.first_piece // 2 + self.lookahead,
                                max_steps))
        req = _Request(ref, phones.astype(np.int32), bert,
                       min_steps=min(min_steps, max_steps),
                       max_steps=max_steps, sampling=sampling,
                       stream_q=queue.Queue(),
                       t_submit=time.perf_counter())
        self._q.put(req)
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            budget = (None if deadline is None
                      else max(deadline - time.monotonic(), 0.001))
            try:
                item = req.stream_q.get(timeout=budget)
            except queue.Empty:
                req.cancelled = True
                raise TimeoutError("slot-batched stream timed out") from None
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    # -- scheduler --------------------------------------------------------

    def _occupied(self) -> bool:
        return any(r is not None for r in self._slots)

    def _stream_waiter_queued(self) -> bool:
        """A streaming request is waiting to join (TTFA in progress)."""
        with self._q.mutex:
            return any(r.stream_q is not None and not r.cancelled
                       for r in self._q.queue)

    def _drop_cancelled(self) -> None:
        """Free slots whose waiters timed out (their rows decode garbage
        otherwise, queueing live requests behind abandoned work)."""
        for b, req in enumerate(self._slots):
            if req is not None and req.cancelled and not req.harvested:
                req.harvested = True
                self._slots[b] = None
                self._merged[b] = 0
                self._small = self._release(self._small, np.int32(b))

    def _pick_windows(self) -> "tuple[Optional[int], Optional[int]]":
        """Smallest (ctx_win, ring_win) read windows covering every
        occupied slot: ctx >= max row x_len+p_len, ring >= max merged
        ring keys (self._merged — bumped by W per dispatched segment, so
        in-flight segments are covered). Falls back to the full read
        (None, None) when either dimension exceeds its ladder, keeping
        the reachable graph set at |ctx|x|ring| + 1."""
        if not self.windowed_kv:
            return None, None
        ctx_need = ring_need = 0
        for b, req in enumerate(self._slots):
            if req is None:
                continue
            ctx_need = max(ctx_need, req.ctx_cols)
            ring_need = max(ring_need, self._merged[b])
        ctx_win = next((w for w in self._ctx_ladder if w >= ctx_need), None)
        ring_win = next((w for w in self._ring_ladder if w >= ring_need),
                        None)
        if ctx_win is None or ring_win is None:
            return None, None
        return ctx_win, ring_win

    def _fill_slots(self, block: bool) -> None:
        self._drop_cancelled()
        free = [i for i, r in enumerate(self._slots) if r is None]
        while free:
            try:
                req = self._q.get(timeout=0.2) if block else \
                    self._q.get_nowait()
            except queue.Empty:
                return
            block = False
            if req.cancelled:
                continue
            b = free.pop(0)
            try:
                self._insert_request(b, req)
            except BaseException as e:  # noqa: BLE001 — bad request only
                req.error = e
                _stream_close(req, e)
                req.done.set()
                free.insert(0, b)

    def _insert_request(self, b: int, req: _Request) -> None:
        ref, phones = req.ref, req.phones
        packed = np.concatenate([ref.phones, phones]).astype(np.int32)
        if len(packed) > self.sx or len(ref.prompt_tokens) > self.sp:
            raise ValueError(
                f"request exceeds slot buckets ({len(packed)} phonemes > "
                f"{self.sx} or {len(ref.prompt_tokens)} prompts > {self.sp})")
        if np.any(ref.bert) or np.any(req.bert):
            bert = pad_to(np.concatenate([ref.bert, req.bert])
                          .astype(np.float32), self.sx, axis=0)[None]
        else:
            bert = None  # all-zero BERT built on device (JA/EN path)
        # disjoint keyspace from segment keys (PRNGKey(n) folded with 0):
        # a plain PRNGKey(counter*K+b) collides with PRNGKey(seg) streams
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(self._seg_counter), 1), b)
        # per-request flow-noise key: window pumps recompute the prefix
        # latent across pumps/batches — noise must be a pure function of
        # (request, position) (sovits.synthesize_latent_rows)
        req.klat = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(self._seg_counter), 2), b)
        samp = rows_from_config(req.sampling or SamplingConfig(), 1)
        with metrics.timer("slot_join"):
            ctx_k, ctx_v, tok0, hist = self._prefill_join(
                self.char.t2s_params, key=key,
                phones=pad_to(packed, self.sx)[None], bert=bert,
                x_len=np.array([len(packed)], np.int32),
                prompts=ref.prompts_dev(self.sp),
                p_len=np.array([len(ref.prompt_tokens)], np.int32),
                samp=samp)
        req.tok0_dev = tok0   # fetched at completion time — a blocking
        # tok0 round trip here would serialize every join with the loop
        self._kc, self._vc, self._ks, self._vs, self._small = self._insert(
            self._kc, self._vc, self._ks, self._vs, self._small,
            np.int32(b), ctx_k, ctx_v,
            tok0, hist, np.int32(len(packed)),
            np.int32(len(ref.prompt_tokens)),
            np.int32(req.min_steps), np.int32(req.max_steps),
            SamplingRows(*(a[0] for a in samp)))
        req.ctx_cols = len(packed) + len(ref.prompt_tokens)
        self._merged[b] = 0
        self._slots[b] = req
        if req.stream_q is not None and req.t_submit:
            req.t_join = time.perf_counter()
            metrics.observe("ttfa_queue_wait", req.t_join - req.t_submit)

    def _harvest(self, seg_tok: np.ndarray, done: np.ndarray,
                 counts: np.ndarray,
                 occupants: List[Optional[_Request]]) -> None:
        """Collect one fetched segment. ``occupants`` is the slot list AT
        DISPATCH TIME — with the depth-1 pipeline a finished row can still
        appear (done) in the next in-flight segment, so completion is
        guarded by the request's harvested flag. Finished rows pool in
        ``_finish_pending`` for the batched finisher (flush policy in
        :meth:`_flush_finishers_maybe`)."""
        for b, req in enumerate(occupants):
            if req is None or req.harvested:
                continue
            req.seg_tokens.append(seg_tok[b])
            req.count_seen = int(counts[b])
            if done[b]:
                req.harvested = True
                if self._slots[b] is req:
                    self._slots[b] = None
                    self._merged[b] = 0
                self._small = self._release(self._small, np.int32(b))
                self._finish_pending.append([req, int(counts[b]), 0])

    # -- window pump (cfg.slot_stream_finisher) ----------------------------

    def _codes_so_far(self, req: _Request, count: int) -> np.ndarray:
        return np.concatenate([[req.tok0_np]] + req.seg_tokens)[:count]

    def _fetch_tok0(self, reqs) -> None:
        missing = [r for r in reqs if r.tok0_np is None]
        if missing:
            for r, arr in zip(missing,
                              jax.device_get([r.tok0_dev for r in missing])):
                r.tok0_np = int(arr[0])

    def _win_for(self, jobs) -> int:
        """Smallest static window covering every job's width (completion
        remainders are usually << chunk; vocoding them in the full pump
        window would double their HiFi-GAN cost)."""
        need = max(width for *_x, width in jobs) + 2 * self.halo
        for w in (self.win_first, self.win_small, self.win):
            if need <= w:
                return w
        raise ValueError(
            f"no vocode window covers width+halo={need} frames "
            f"(windows: {self.win_first}, {self.win_small}, {self.win}); "
            f"job widths must be clamped to vocode_chunk={self.chunk}")

    def _dispatch_windows(self, jobs, codes_dev=None) -> None:
        """One batched latent + window vocode for ``jobs`` = [(req, codes,
        count, start, width_frames)]. Dispatch here on the scheduler
        thread (may compile); the piece fetch runs on the (single) worker.
        ``codes_dev``: device codes overriding the jobs' codes (the
        speculative first-piece path — see :meth:`_spec_first_pieces`)."""
        rows = [(req.ref, req.phones, codes, count, req.klat, start, width)
                for req, codes, count, start, width in jobs]
        with metrics.timer("slot_window_vocode"):
            handle = self.engine.vocode_windows_dispatch(
                self.char, rows, win=self._win_for(jobs), pcm16=self.pcm16,
                t_buckets=self._t_buckets, codes_dev=codes_dev)
        metrics.gauge("slot_window_rows", len(jobs))
        now = time.perf_counter()
        for req, _, _, start, width in jobs:
            req.emitted = start + width
            if start == 0 and req.stream_q is not None and req.t_join:
                req.t_first_dispatch = now
                metrics.observe("ttfa_join_to_dispatch", now - req.t_join)
        meta = [(req, start) for req, _, _, start, _ in jobs]

        def fetch(meta=meta, handle=handle):
            try:
                for (req, start), piece in zip(
                        meta, TTSEngine.vocode_windows_fetch(handle)):
                    req.pieces[start] = piece
                    if req.stream_q is not None and not req.cancelled:
                        if start == 0 and req.t_first_dispatch:
                            t = time.perf_counter()
                            metrics.observe("ttfa_dispatch_to_piece",
                                            t - req.t_first_dispatch)
                            metrics.observe("ttfa_total", t - req.t_submit)
                        req.stream_q.put(piece)
            except BaseException as e:  # noqa: BLE001 — surface at completion
                logger.exception("window fetch failed")
                for req, _ in meta:
                    req.error = e
                    _stream_close(req, e)
                    req.done.set()

        self._winworker.submit(fetch)

    def _spec_first_pieces(self, seg_tok, seg_w: int) -> None:
        """Speculative first pieces for rows whose FIRST decode segment
        is the one just dispatched: the vocode is enqueued on the device
        stream right behind that segment, with codes assembled on-device
        from its (not yet fetched) token buffer. The join -> first-audio
        chain thus crosses ONE device round trip instead of waiting for
        tokens to reach the host and re-dispatching a pump one or two
        loop iterations later (measured: TTFA p50 388 ms under 6-way
        streaming load, dominated by ~100 ms iteration boundaries).
        Guarded by min_steps >= claimed count so every claimed token is
        a real pre-EOS token."""
        if not self.first_piece:
            return
        count = self.first_piece // 2 + self.lookahead
        if count - 1 > seg_w:
            return                      # one segment cannot cover it
        jobs, slots = [], []
        for b, req in enumerate(self._slots):
            if (req is not None and req.stream_q is not None
                    and not req.harvested and not req.cancelled
                    and req.emitted == 0 and req.count_seen == 0
                    and req.tok0_dev is not None
                    and req.min_steps >= count):
                jobs.append((req, None, count, 0, self.first_piece))
                slots.append(b)
        if not jobs:
            return
        from .buckets import pick_bucket

        win = self._win_for(jobs)
        fb = pick_bucket(max(count, -(-win // 2)), self.cfg.frame_buckets)
        R = len(jobs)
        R_pad = max(pick_bucket(R, self.cfg.batch_buckets), R)
        tok0s = tuple([req.tok0_dev for req, *_ in jobs]
                      + [jobs[0][0].tok0_dev] * (R_pad - R))
        slots_pad = np.asarray(slots + [slots[0]] * (R_pad - R), np.int32)
        codes_dev = _spec_codes_jit(
            tok0s, seg_tok, slots_pad, fb=fb, count=count,
            vq_codes=self.char.sovits_cfg.vq_codes)
        self._dispatch_windows(jobs, codes_dev=codes_dev)

    def _run_pump_flush(self) -> None:
        """One round of vocode dispatches: pump on the chunk cadence (a
        half-chunk of decoded steps since the last pump — step-based
        because segments have mixed widths) — or every segment while a
        streaming row still owes its first (small) piece, in which case
        ONLY first-piece jobs run off-cadence; then the finisher flush
        (forced when the machine idles: every live row is harvested, so
        nothing is coming that could grow the finisher batch)."""
        on_cadence = self._steps_since_pump >= self.chunk // 2
        if on_cadence:
            self._steps_since_pump = 0
        if (on_cadence
                or (self.first_piece and any(
                    r.emitted == 0 and r.stream_q is not None
                    for r in self._pump_rows()))):
            self._pump_windows(first_only=not on_cadence)
        with metrics.timer("slot_flush_host"):
            self._flush_finishers_maybe(force=not self._occupied())

    def _pump_rows(self) -> list:
        """Rows the window pump serves: every in-flight row in the legacy
        all-pump mode, else only rows with a streaming consumer."""
        return [r for r in self._slots
                if r is not None and not r.harvested and not r.cancelled
                and (self.windows or r.stream_q is not None)]

    def _pump_windows(self, first_only: bool = False) -> None:
        """Vocode one chunk for every pumped row whose decoded frontier
        (lookahead-guarded) is a full chunk past what it has emitted.
        A streaming row's FIRST piece is the small ``first_piece`` window
        instead (TTFA under load becomes decode-bound; the scheduler pumps
        every segment until it lands). ``first_only`` (the off-cadence
        per-segment pump) serves ONLY rows awaiting that first piece, so
        unrelated rows keep their chunk dispatches on the half-chunk
        step cadence in well-batched vocode calls."""
        jobs = []
        for req in self._pump_rows():
            frontier = 2 * max(req.count_seen - self.lookahead, 0)
            if (self.first_piece and req.emitted == 0
                    and req.stream_q is not None):
                if frontier >= self.first_piece:
                    jobs.append((req, self.first_piece))
            elif (not first_only
                  and frontier - req.emitted >= self.chunk):
                jobs.append((req, self.chunk))
        if not jobs:
            return
        self._fetch_tok0([req for req, _ in jobs])
        self._dispatch_windows([
            (req, self._codes_so_far(req, req.count_seen), req.count_seen,
             req.emitted, width) for req, width in jobs])

    def _flush_finishers_windows(self, pend) -> None:
        """Windows-mode completion: vocode only the REMAINDER of each
        finished row (the pump already emitted everything up to the
        lookahead-guarded frontier), then assemble in piece order."""
        reqs = [r for r, _, _ in pend]
        try:
            self._fetch_tok0(reqs)
            for req, count, _ in pend:
                toks = self._codes_so_far(req, count)
                req.final_codes = finalize_semantic_tokens(
                    toks[None], np.array([count]),
                    self.char.t2s_cfg.eos_id)[0]
            while True:
                jobs = []
                for req in reqs:
                    total = 2 * len(req.final_codes)
                    if req.emitted < total:
                        jobs.append((req, req.final_codes,
                                     len(req.final_codes), req.emitted,
                                     min(self.chunk, total - req.emitted)))
                if not jobs:
                    break
                self._dispatch_windows(jobs)
        except BaseException as e:  # noqa: BLE001 — surface to the waiters
            logger.exception("window completion dispatch failed")
            for req in reqs:
                req.error = e
                _stream_close(req, e)
                req.done.set()
            return

        def assemble(reqs=reqs):
            for req in reqs:
                if req.done.is_set():
                    continue
                try:
                    total = 2 * len(req.final_codes) * \
                        self.char.sovits_cfg.hop_length
                    parts = [req.pieces[k] for k in sorted(req.pieces)]
                    dtype = np.int16 if self.pcm16 else np.float32
                    audio = (np.concatenate(parts) if parts
                             else np.zeros(0, dtype))
                    req.result = audio[:total]
                    metrics.incr("slot_utterances")
                    _stream_close(req)
                except BaseException as e:  # noqa: BLE001
                    logger.exception("window assembly failed")
                    req.error = e
                    _stream_close(req, e)
                finally:
                    req.done.set()

        self._winworker.submit(assemble)

    def _flush_finishers_maybe(self, force: bool = False) -> None:
        """Dispatch the pooled finisher vocode when the batch is worth it.

        PUMPED rows (streaming consumers, or every row in the legacy
        all-pump mode) complete IMMEDIATELY through the window path — the
        pump already emitted everything but the final partial window, so
        pooling buys no batched-vocode gain and only delays the waiter.
        The rest pool: flush when ``force`` (shutdown/idle — nothing to
        wait for), the pool reached ``slot_finisher_batch`` rows, or the
        oldest row has waited ``slot_finisher_wait_segs`` segments.
        Measured on v5e the per-utterance vocode cost is 108/93/68/43 ms
        at B=1/2/4/8 — a 2-segment wait (~74 ms) that lifts B from 1 to
        3-4 is a net win under load while ``force``-on-idle keeps solo
        latency unchanged."""
        pend = [e for e in self._finish_pending if not e[0].cancelled]
        for e in self._finish_pending:
            if e[0].cancelled and not e[0].done.is_set():
                e[0].done.set()
        win_pend = [e for e in pend
                    if self.windows or e[0].stream_q is not None
                    or e[0].emitted > 0]
        win_ids = {id(e) for e in win_pend}   # identity, not == (dataclass
        pend = [e for e in pend if id(e) not in win_ids]  # eq hits ndarrays)
        self._finish_pending = pend
        if win_pend:
            metrics.gauge("slot_finisher_rows", len(win_pend))
            self._flush_finishers_windows(win_pend)
        if not pend:
            return
        oldest = max(e[2] for e in pend)
        # pooling trades completion latency for vocode batch size — a
        # trade that only pays while there is BACKLOG to decode in the
        # meantime. With free slots and an empty queue the pooled rows'
        # waiters are exactly the clients who would refill the machine
        # (closed-loop serving), so waiting starves the device: measured
        # 6.86 -> (see PARITY r5) utt/s on the 6-client stage from this
        # line alone.
        starving = (self._q.empty()
                    and any(r is None for r in self._slots))
        if not (force or starving
                or len(pend) >= self.cfg.slot_finisher_batch
                or oldest >= self.cfg.slot_finisher_wait_segs):
            return
        self._finish_pending = []
        metrics.gauge("slot_finisher_rows", len(pend))
        # pooled rows vocode as ONE batch. The DISPATCH half (which may
        # compile) runs here on the scheduler thread — XLA:CPU segfaults
        # when a compile races other threads' compute; workers only fetch
        # device buffers.
        reqs = [r for r, _, _ in pend]
        try:
            # first tokens usually arrived piggybacked on a segment fetch
            # (tok0_np); one batched RPC covers any that did not
            self._fetch_tok0(reqs)
            items = []
            for req, count, _ in pend:
                toks = self._codes_so_far(req, count)
                codes = finalize_semantic_tokens(
                    toks[None], np.array([count]),
                    self.char.t2s_cfg.eos_id)[0]
                items.append((req.ref, req.phones, codes))
            handle = self.engine.vocode_codes_dispatch(
                self.char, items, t_buckets=self._t_buckets,
                pcm16=self.pcm16)
        except BaseException as e:  # noqa: BLE001 — surface to the waiters
            logger.exception("slot vocode dispatch failed")
            for req in reqs:
                req.error = e
                req.done.set()
            return
        self._vocoder.submit(self._complete_fetch, reqs, handle)

    def _complete_fetch(self, reqs, handle) -> None:
        """Worker half: blocking fetch + assembly only (no jit calls)."""
        try:
            audios = self.engine.vocode_codes_fetch(handle)
            for req, audio in zip(reqs, audios):
                req.result = audio
            metrics.incr("slot_utterances", len(reqs))
        except BaseException as e:  # noqa: BLE001 — surface to the waiters
            logger.exception("slot request completion failed")
            for req in reqs:
                req.error = e
        finally:
            for req in reqs:
                req.done.set()

    def _loop(self) -> None:
        # depth-1 pipeline: dispatch segment k+1 BEFORE the blocking fetch
        # of segment k's outputs, so the ~25 ms tunnel round trip overlaps
        # the next segment's device compute. Joins land between dispatches
        # (<= 2 segments of wait); releases apply to the state after the
        # in-flight segment, which is safe — done rows are frozen by masks.
        try:
            self._loop_body()
        finally:
            # drain on shutdown: no waiter may hang on a dead scheduler
            self._fail_all(RuntimeError("slot batcher stopped"))

    def _loop_body(self) -> None:
        pending = None  # (seg_tok, done, counts, occupants) of the prior dispatch
        while self._running:
            try:
                self._fill_slots(block=not self._occupied()
                                 and pending is None
                                 and not self._finish_pending)
                if self._occupied():
                    self._seg_counter += 1
                    key = jax.random.fold_in(
                        jax.random.PRNGKey(self._seg_counter), 0)
                    metrics.gauge("slot_occupancy", sum(
                        r is not None for r in self._slots))
                    ctx_win, ring_win = self._pick_windows()
                    # short segments while a streaming row owes its first
                    # piece: the join->first-audio chain crosses fewer
                    # segment boundaries (TTFA). Also forced when a full
                    # segment would cross the ring image boundary (mixed
                    # widths leave the head W-unaligned; a write past
                    # ring would clamp and corrupt).
                    w = self.W
                    if (self.join_W != self.W and any(
                            r is not None and r.stream_q is not None
                            and r.emitted == 0 and not r.harvested
                            and not r.cancelled for r in self._slots)):
                        w = self.join_W
                    if self._head + w > self.ring:
                        w = self.join_W
                    # _decode_seg stays the attribute for the default
                    # width so tests can inject faults/stubs through it
                    seg_fn = (self._decode_seg if w == self.W
                              else self._decode_segs[w])
                    with metrics.timer("slot_segment"):
                        (self._kc, self._vc, self._ks, self._vs,
                         self._small, seg_tok) = \
                            seg_fn(self.char.t2s_params, self._kc, self._vc,
                                   self._ks, self._vs, self._small, key,
                                   ctx_win=ctx_win, ring_win=ring_win)
                    self._head = (self._head + w) % self.ring
                    self._steps_since_pump += w
                    for b, r in enumerate(self._slots):
                        if r is not None:       # row advanced <= w merged keys
                            self._merged[b] = min(self._merged[b] + w,
                                                  r.max_steps)
                    dispatched = (seg_tok, self._small.done,
                                  self._small.counts, list(self._slots))
                    self._spec_first_pieces(seg_tok, w)
                else:
                    dispatched = None
                if self._defer_pump:
                    # vocode work deferred from the previous iteration so
                    # a joining streaming row's prefill+segment+spec piece
                    # entered the device queue ahead of it
                    self._defer_pump = False
                    self._run_pump_flush()
                if pending is not None:
                    seg_tok, done, counts, occupants = pending
                    # piggyback first-token fetches on the segment RPC:
                    # the pump/completion paths need tok0 on host, and a
                    # separate device_get would stall the scheduler a
                    # full tunnel round trip
                    tok0_rows = [r for r in occupants
                                 if r is not None and r.tok0_np is None
                                 and r.tok0_dev is not None]
                    with metrics.timer("slot_fetch"):
                        tok_np, done_np, counts_np, *toks0 = jax.device_get(
                            (seg_tok, done, counts,
                             *[r.tok0_dev for r in tok0_rows]))
                    for r, arr in zip(tok0_rows, toks0):
                        r.tok0_np = int(arr[0])
                    for e in self._finish_pending:
                        e[2] += 1          # aged one more segment
                    self._harvest(tok_np, done_np, counts_np, occupants)
                pending = dispatched
                # defer this iteration's pump/flush dispatches when a
                # streaming request is waiting AND can join: the next
                # iteration dispatches its prefill+segment+speculative
                # first piece BEFORE this vocode work, so the TTFA chain
                # does not queue behind 100-250 ms of chunk pumps and
                # finisher flushes on the FIFO device stream (measured
                # r5: ttfa_dispatch_to_piece p50 299 ms, almost all of
                # it head-of-line work). The deferred work runs at most
                # one segment later — throughput is unaffected.
                if (self._stream_waiter_queued()
                        and any(r is None for r in self._slots)):
                    self._defer_pump = True
                else:
                    self._run_pump_flush()
            except BaseException as e:  # noqa: BLE001 — device/driver faults
                # the machine's device state is suspect: fail every waiter
                # loudly (reference-style worker-boundary isolation) and
                # rebuild the slot state for subsequent traffic
                logger.exception("slot scheduler segment failed")
                pending = None
                self._fail_all(e)
                self._reset_state()

    def _fail_all(self, e: BaseException) -> None:
        for req, _, _ in self._finish_pending:
            if not req.done.is_set():
                req.error = e
                _stream_close(req, e)
                req.done.set()
        self._finish_pending = []
        for b, req in enumerate(self._slots):
            if req is not None and not req.harvested:
                req.harvested = True
                req.error = e
                _stream_close(req, e)
                req.done.set()
            self._slots[b] = None
            self._merged[b] = 0
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            req.error = e
            _stream_close(req, e)
            req.done.set()

    def _reset_state(self) -> None:
        self._merged = [0] * self.n_slots
        self._head = 0                  # host mirror of state.ring_head
        self._steps_since_pump = 0
        state0 = slots_mod.init_slots(
            self.char.t2s_cfg, self.n_slots, self.sx, self.sp, self.ring,
            dtype=self.char.t2s_params["audio_embed"].dtype,
            kv_int8=self.cfg.slot_kv_int8)
        self._kc, self._vc = state0.k_cache, state0.v_cache
        self._ks, self._vs = state0.k_scale, state0.v_scale
        self._small = _strip_big(state0)
