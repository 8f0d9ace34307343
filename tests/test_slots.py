"""In-flight slot batching: device-level equivalence + scheduler behavior.

The slot machine (models/slots.py) must reproduce the reference decode
semantics exactly: a request decoded in a slot — alone or joined mid-run
next to other requests — yields the same greedy token stream as
t2s.generate. The scheduler (runtime/slot_batcher.py) must complete
concurrent requests and reuse freed slots.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.models import slots, t2s
from genie_tts_tpu.ops.sampling import SamplingConfig
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference,
)

CFG = T2SConfig(
    phoneme_vocab=40, semantic_vocab=33, embed_dim=32, num_layers=2,
    num_heads=4, ffn_dim=64, bert_dim=16, ssl_dim=8, eos_id=32,
    max_decode_steps=64,
)
GREEDY = SamplingConfig(top_k=1, temperature=1.0, repetition_penalty=1.0)
SX, SP, RING, W = 16, 8, 32, 8


@pytest.fixture(scope="module")
def params():
    return t2s.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _solo_greedy(params, phones, x_len, prompts, p_len, steps):
    x = t2s.embed_text(params, phones,
                       jnp.zeros(phones.shape + (CFG.bert_dim,)))
    res = t2s.generate(params, CFG, GREEDY, jax.random.PRNGKey(0), x,
                       x_len, prompts, p_len, max_steps=steps,
                       cache_len=int(phones.shape[1] + prompts.shape[1] + steps),
                       min_steps=steps)
    return np.asarray(res.tokens)[0, : int(res.counts[0])]


def _join(params, state, slot, phones, x_len, prompts, p_len,
          min_steps, max_steps, scfg=GREEDY):
    from genie_tts_tpu.ops.sampling import SamplingRows, rows_from_config

    samp = rows_from_config(scfg, 1)
    ctx_k, ctx_v, tok0, hist = slots.prefill_join(
        params, CFG, jax.random.PRNGKey(0),
        phones, None, x_len, prompts, p_len, samp)
    state = slots.insert_slot(
        state, jnp.int32(slot), ctx_k, ctx_v, tok0, hist,
        x_len[0], p_len[0], jnp.int32(min_steps), jnp.int32(max_steps),
        SamplingRows(*(a[0] for a in samp)))
    return state, int(tok0[0])


def _pad_row(ids, n):
    out = np.zeros(n, np.int32)
    out[: len(ids)] = ids
    return out


@pytest.mark.slow
def test_slot_solo_matches_generate(params):
    """One request alone in the slot machine == t2s.generate (greedy)."""
    ids = np.array([3, 5, 7, 2, 11], np.int32)
    prm = np.array([4, 5, 6], np.int32)
    steps = 24
    expect = _solo_greedy(
        params, jnp.asarray(_pad_row(ids, SX))[None], jnp.array([5]),
        jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]), steps)

    state = slots.init_slots(CFG, 4, SX, SP, RING, dtype=jnp.float32)
    state, tok0 = _join(params, state, 0,
                        jnp.asarray(_pad_row(ids, SX))[None], jnp.array([5]),
                        jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]),
                        steps, steps)
    got = [tok0]
    for seg in range(RING // W):
        state, seg_tok = slots.decode_segment(
            params, state, jax.random.PRNGKey(100 + seg), CFG,
            W, SX, SP, RING)
        got.extend(np.asarray(seg_tok)[0])
        if bool(np.asarray(state.done)[0]):
            break
    count = int(np.asarray(state.counts)[0])
    assert count == len(expect)
    np.testing.assert_array_equal(np.array(got[:count]), expect)


@pytest.mark.slow
def test_slot_staggered_join_matches_solo(params):
    """A request joining mid-run next to a busy slot decodes identically."""
    idsA = np.array([3, 5, 7, 2, 11], np.int32)
    idsB = np.array([9, 1, 4, 6], np.int32)
    prm = np.array([4, 5, 6], np.int32)
    stepsA, stepsB = 24, 16
    expA = _solo_greedy(
        params, jnp.asarray(_pad_row(idsA, SX))[None], jnp.array([5]),
        jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]), stepsA)
    expB = _solo_greedy(
        params, jnp.asarray(_pad_row(idsB, SX))[None], jnp.array([4]),
        jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]), stepsB)

    state = slots.init_slots(CFG, 4, SX, SP, RING, dtype=jnp.float32)
    state, tokA = _join(params, state, 0,
                        jnp.asarray(_pad_row(idsA, SX))[None], jnp.array([5]),
                        jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]),
                        stepsA, stepsA)
    gotA, gotB = [tokA], []
    # one segment with A alone, then B joins slot 2
    state, seg_tok = slots.decode_segment(
        params, state, jax.random.PRNGKey(0), CFG, W, SX, SP, RING)
    gotA.extend(np.asarray(seg_tok)[0])
    state, tokB = _join(params, state, 2,
                        jnp.asarray(_pad_row(idsB, SX))[None], jnp.array([4]),
                        jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]),
                        stepsB, stepsB)
    gotB.append(tokB)
    for seg in range(RING // W):
        state, seg_tok = slots.decode_segment(
            params, state, jax.random.PRNGKey(1 + seg), CFG,
            W, SX, SP, RING)
        gotA.extend(np.asarray(seg_tok)[0])
        gotB.extend(np.asarray(seg_tok)[2])
        if bool(np.all(np.asarray(state.done)[[0, 2]])):
            break
    cA = int(np.asarray(state.counts)[0])
    cB = int(np.asarray(state.counts)[2])
    assert cA == len(expA) and cB == len(expB)
    np.testing.assert_array_equal(np.array(gotA[:cA]), expA)
    np.testing.assert_array_equal(np.array(gotB[:cB]), expB)


def test_slot_ring_reuse_after_release(params):
    """A freed slot accepts a new request whose stream matches solo."""
    ids = np.array([9, 1, 4, 6], np.int32)
    prm = np.array([4, 5, 6], np.int32)
    steps = 12
    exp = _solo_greedy(
        params, jnp.asarray(_pad_row(ids, SX))[None], jnp.array([4]),
        jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]), steps)
    state = slots.init_slots(CFG, 2, SX, SP, RING, dtype=jnp.float32)
    # occupy + finish + release slot 0, advancing the ring head
    state, _ = _join(params, state, 0,
                     jnp.asarray(_pad_row(ids, SX))[None], jnp.array([4]),
                     jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]),
                     8, 8)
    state, _ = slots.decode_segment(
        params, state, jax.random.PRNGKey(0), CFG, W, SX, SP, RING)
    assert bool(np.asarray(state.done)[0])
    state = slots.release_slot(state, jnp.int32(0))
    # rejoin the same slot with a fresh request; ring head is mid-ring now
    state, tok0 = _join(params, state, 0,
                        jnp.asarray(_pad_row(ids, SX))[None], jnp.array([4]),
                        jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]),
                        steps, steps)
    got = [tok0]
    for seg in range(RING // W):
        state, seg_tok = slots.decode_segment(
            params, state, jax.random.PRNGKey(5 + seg), CFG,
            W, SX, SP, RING)
        got.extend(np.asarray(seg_tok)[0])
        if bool(np.asarray(state.done)[0]):
            break
    c = int(np.asarray(state.counts)[0])
    assert c == len(exp)
    np.testing.assert_array_equal(np.array(got[:c]), exp)


def test_quantize_kv_columns_roundtrip_bound():
    """Per-column int8 KV quantization: |x - q*s| <= s/2 elementwise."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 2, 4, 8, 16)) * 2.0, jnp.float32)
    q, s = slots.quantize_kv_columns(x)
    assert q.dtype == jnp.int8 and s.shape == (3, 2, 4, 16)
    err = np.abs(np.asarray(x) - np.asarray(q, np.float32)
                 * np.asarray(s)[..., None, :])
    assert np.all(err <= np.asarray(s)[..., None, :] * 0.5 + 1e-7)
    # columns whose max is +/-127 grid units reconstruct (near-)exactly:
    # the scale then lands on the grid pitch itself
    grid = np.asarray(rng.integers(-126, 127, (1, 1, 2, 8, 4)), np.float32)
    grid[..., 0, :] = 127.0
    q2, s2 = slots.quantize_kv_columns(jnp.asarray(grid * 0.031))
    np.testing.assert_allclose(
        np.asarray(q2, np.float32) * np.asarray(s2)[..., None, :],
        grid * 0.031, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_slot_windowed_reads_match_full(params):
    """Windowed KV reads (ctx_win/ring_win) == full-cache decode.

    The window slices must expose exactly the visible key set: greedy
    token streams are identical to the defaults (and so to t2s.generate,
    via test_slot_solo_matches_generate). Covers windows smaller than
    the buckets and the segment where the ring-read crosses a merge
    boundary (keys_written > ring_win would be a scheduler bug; here
    every window covers the live keys)."""
    ids = np.array([3, 5, 7, 2, 11], np.int32)
    prm = np.array([4, 5, 6], np.int32)
    steps = 24

    def run(ctx_win, ring_win):
        state = slots.init_slots(CFG, 4, SX, SP, RING, dtype=jnp.float32)
        state, tok0 = _join(params, state, 1,
                            jnp.asarray(_pad_row(ids, SX))[None],
                            jnp.array([5]),
                            jnp.asarray(_pad_row(prm, SP))[None],
                            jnp.array([3]), steps, steps)
        got = [tok0]
        for seg in range(RING // W):
            state, seg_tok = slots.decode_segment(
                params, state, jax.random.PRNGKey(100 + seg), CFG,
                W, SX, SP, RING, ctx_win=ctx_win, ring_win=ring_win)
            got.extend(np.asarray(seg_tok)[1])
            if bool(np.asarray(state.done)[1]):
                break
        count = int(np.asarray(state.counts)[1])
        return np.array(got[:count])

    full = run(None, None)
    assert len(full) == steps
    # ctx window: 5 text + 3 prompt = 8 valid cols; window 16 covers them
    np.testing.assert_array_equal(run(16, None), full)
    # ring window == exactly the decoded length (tight)
    np.testing.assert_array_equal(run(None, RING - W), full)
    # both, tight-ish
    np.testing.assert_array_equal(run(8, RING - W), full)


@pytest.mark.slow
def test_slot_windowed_ring_wrap(params):
    """A long decode whose ring writes wrap: the backward window through
    the doubled-ring second copy must still expose the last ring_win
    writes. Decode RING tokens (head wraps to 0), windows < RING."""
    ids = np.array([3, 5, 7, 2, 11], np.int32)
    prm = np.array([4, 5, 6], np.int32)
    steps = RING          # maximum: fills the whole ring

    def run(ring_win):
        state = slots.init_slots(CFG, 2, SX, SP, RING, dtype=jnp.float32)
        state, tok0 = _join(params, state, 0,
                            jnp.asarray(_pad_row(ids, SX))[None],
                            jnp.array([5]),
                            jnp.asarray(_pad_row(prm, SP))[None],
                            jnp.array([3]), steps, steps)
        got = [tok0]
        for seg in range(RING // W):
            # scheduler contract: window >= merged keys so far
            win = max(ring_win, min((seg + 1) * W, RING))
            state, seg_tok = slots.decode_segment(
                params, state, jax.random.PRNGKey(7 + seg), CFG,
                W, SX, SP, RING, ring_win=min(win, RING))
            got.extend(np.asarray(seg_tok)[0])
        count = int(np.asarray(state.counts)[0])
        return np.array(got[:count])

    np.testing.assert_array_equal(run(W), run(RING))


def test_slot_kv_int8_machinery(params):
    """int8-KV slot machine: int8 caches + scales, sane greedy decode.

    Numerical quality at serving geometry is gated by
    tests/test_e2e_parity.py::test_slot_kv_int8_quality (d=512); this
    checks the tiny-model machinery — dtypes, scale updates on insert and
    merge, and that the decode still terminates with a plausible stream.
    """
    ids = np.array([3, 5, 7, 2, 11], np.int32)
    prm = np.array([4, 5, 6], np.int32)
    steps = 24
    exact = _solo_greedy(
        params, jnp.asarray(_pad_row(ids, SX))[None], jnp.array([5]),
        jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]), steps)

    state = slots.init_slots(CFG, 4, SX, SP, RING, dtype=jnp.float32,
                             kv_int8=True)
    assert state.k_cache.dtype == jnp.int8
    assert state.k_scale.shape == (CFG.num_layers, 4, CFG.num_heads,
                                   SX + SP + 2 * RING)   # doubled ring
    state, tok0 = _join(params, state, 0,
                        jnp.asarray(_pad_row(ids, SX))[None], jnp.array([5]),
                        jnp.asarray(_pad_row(prm, SP))[None], jnp.array([3]),
                        steps, steps)
    # insert quantized the context columns: scales nonzero where written
    ks = np.asarray(state.k_scale)
    assert np.all(ks[:, 0, :, :5] > 0)
    assert np.all(ks[:, 1] == 0)          # untouched slot
    got = [tok0]
    for seg in range(RING // W):
        state, seg_tok = slots.decode_segment(
            params, state, jax.random.PRNGKey(100 + seg), CFG,
            W, SX, SP, RING)
        got.extend(np.asarray(seg_tok)[0])
        if bool(np.asarray(state.done)[0]):
            break
    assert state.k_cache.dtype == jnp.int8
    count = int(np.asarray(state.counts)[0])
    assert count == len(exact)            # min_steps pins the length here
    # tiny random models are the quantization worst case (no logit
    # margins); require agreement only on the early stream
    n = min(8, count)
    agree = float(np.mean(np.array(got[:n]) == exact[:n]))
    assert agree >= 0.5, f"early-stream agreement {agree}"


@pytest.mark.slow
def test_slot_batcher_end_to_end():
    """Scheduler: concurrent requests through SlotBatcher produce audio."""
    import threading

    vcfg = SoVITSConfig(
        spec_channels=33, inter_channels=16, hidden_channels=16,
        filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
        mrte_channels=16, ssl_dim=8, vq_codes=32, vq_dim=8,
        gin_channels=16, flow_layers=2, wn_layers=2, wn_kernel=5,
        upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4),
        upsample_initial=32, resblock_kernels=(3,),
        resblock_dilations=((1, 3),), n_fft=64, hop_length=8, win_length=64)
    rcfg = RuntimeConfig(
        phoneme_buckets=(16, 32), prompt_buckets=(16,),
        frame_buckets=(32, 64), slot_batch=4, slot_steps=8, slot_ring=32,
        slot_phoneme_bucket=32, slot_prompt_bucket=16)
    eng = TTSEngine(rcfg)
    char = make_random_character(t2s_cfg=CFG, sovits_cfg=vcfg,
                                 dtype=jnp.float32)
    ref = make_random_reference(char, eng, ref_seconds=0.2)

    from genie_tts_tpu.runtime.slot_batcher import SlotBatcher

    sb = SlotBatcher(eng, char)
    outs = {}

    def client(i):
        ph = np.arange(1, 5 + i, dtype=np.int32)
        bert = np.zeros((len(ph), CFG.bert_dim), np.float32)
        outs[i] = sb.synthesize(ref, ph, bert, timeout=300,
                                min_steps=10, max_steps=20)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    sb.stop()
    assert set(outs) == {0, 1, 2}
    for a in outs.values():
        assert a.dtype == np.float32 and len(a) > 0 and np.isfinite(a).all()


@pytest.mark.slow
def test_slot_batcher_survives_segment_failure():
    """A device-side fault fails waiters loudly, then the machine recovers."""
    vcfg = SoVITSConfig(
        spec_channels=33, inter_channels=16, hidden_channels=16,
        filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
        mrte_channels=16, ssl_dim=8, vq_codes=32, vq_dim=8,
        gin_channels=16, flow_layers=2, wn_layers=2, wn_kernel=5,
        upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4),
        upsample_initial=32, resblock_kernels=(3,),
        resblock_dilations=((1, 3),), n_fft=64, hop_length=8, win_length=64)
    rcfg = RuntimeConfig(
        phoneme_buckets=(16, 32), prompt_buckets=(16,),
        frame_buckets=(32, 64), slot_batch=2, slot_steps=8, slot_ring=16,
        slot_phoneme_bucket=32, slot_prompt_bucket=16)
    eng = TTSEngine(rcfg)
    char = make_random_character(t2s_cfg=CFG, sovits_cfg=vcfg,
                                 dtype=jnp.float32)
    ref = make_random_reference(char, eng, ref_seconds=0.2)

    from genie_tts_tpu.runtime.slot_batcher import SlotBatcher

    sb = SlotBatcher(eng, char)
    boom = RuntimeError("injected device fault")
    real_seg = sb._decode_seg
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise boom
        return real_seg(*a, **kw)

    sb._decode_seg = flaky
    ph = np.arange(1, 6, dtype=np.int32)
    bert = np.zeros((len(ph), CFG.bert_dim), np.float32)
    with pytest.raises(RuntimeError, match="injected device fault"):
        sb.synthesize(ref, ph, bert, timeout=120, max_steps=12)
    # the machine recovered: a fresh request succeeds
    audio = sb.synthesize(ref, ph, bert, timeout=120, max_steps=12)
    sb.stop()
    assert len(audio) > 0 and np.isfinite(audio).all()


def test_slot_batcher_stop_fails_waiters():
    """stop() must fail in-flight waiters loudly, never hang them."""
    import threading

    vcfg = SoVITSConfig(
        spec_channels=33, inter_channels=16, hidden_channels=16,
        filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
        mrte_channels=16, ssl_dim=8, vq_codes=32, vq_dim=8,
        gin_channels=16, flow_layers=2, wn_layers=2, wn_kernel=5,
        upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4),
        upsample_initial=32, resblock_kernels=(3,),
        resblock_dilations=((1, 3),), n_fft=64, hop_length=8, win_length=64)
    rcfg = RuntimeConfig(
        phoneme_buckets=(16, 32), prompt_buckets=(16,),
        frame_buckets=(32, 64), slot_batch=2, slot_steps=8, slot_ring=64,
        slot_phoneme_bucket=32, slot_prompt_bucket=16)
    eng = TTSEngine(rcfg)
    char = make_random_character(t2s_cfg=CFG, sovits_cfg=vcfg,
                                 dtype=jnp.float32)
    ref = make_random_reference(char, eng, ref_seconds=0.2)

    from genie_tts_tpu.runtime.slot_batcher import SlotBatcher

    sb = SlotBatcher(eng, char)
    ph = np.arange(1, 6, dtype=np.int32)
    bert = np.zeros((len(ph), CFG.bert_dim), np.float32)
    result = {}

    def client():
        try:
            # pin a long decode so stop() lands mid-flight
            result["audio"] = sb.synthesize(ref, ph, bert, timeout=120,
                                            min_steps=64, max_steps=64)
        except BaseException as e:  # noqa: BLE001
            result["error"] = e

    t = threading.Thread(target=client)
    t.start()
    import time

    time.sleep(1.0)  # let the request enter the machine
    sb.stop()
    t.join(timeout=60)
    assert not t.is_alive(), "waiter hung after stop()"
    # either it finished just before stop, or it was failed loudly
    assert "audio" in result or isinstance(result.get("error"), RuntimeError)
