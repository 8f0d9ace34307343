"""Streaming window finisher for the slot batcher (slot_stream_finisher).

Covers the three claims the design rests on:

* per-row-key prefix latents are NOISE-STABLE: recomputing a request's
  latent with more codes / a bigger frame bucket / a different batch
  composition reproduces the same flow noise on the shared prefix
  (sovits.synthesize_latent_rows);
* window vocoding is interior-exact: halo-padded windows of one latent
  reproduce the single-shot waveform away from the (masked) edges;
* the slot batcher's windowed path assembles complete utterances of
  exactly the same length as the legacy whole-utterance finisher.
"""
import threading

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.models import sovits
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference,
)

TCFG = T2SConfig(
    phoneme_vocab=40, semantic_vocab=33, embed_dim=32, num_layers=2,
    num_heads=4, ffn_dim=64, bert_dim=16, ssl_dim=8, eos_id=32,
    max_decode_steps=64,
)
VCFG = SoVITSConfig(
    spec_channels=33, inter_channels=16, hidden_channels=16,
    filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
    mrte_channels=16, ssl_dim=8, vq_codes=32, vq_dim=8,
    gin_channels=16, flow_layers=2, wn_layers=2, wn_kernel=5,
    upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4),
    upsample_initial=32, resblock_kernels=(3,),
    resblock_dilations=((1, 3),), n_fft=64, hop_length=8, win_length=64)


def _vparams():
    return sovits.init_params(jax.random.PRNGKey(0), VCFG, dtype=jnp.float32)


@pytest.mark.slow
def test_latent_rows_prefix_noise_stable():
    """Same per-row key => same prefix latent across (count, fb, batch).

    Uses a 1-layer/1-flow config so the latent's local receptive field
    (attn window +-4/layer + WN kernels) stays well inside the prefix —
    the production margin is the stream/slot ``lookahead`` (the residual
    local-attention tail there is the documented streaming approximation;
    this test isolates the NOISE-stability claim, which must be exact).
    """
    vcfg = SoVITSConfig(
        spec_channels=33, inter_channels=16, hidden_channels=16,
        filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
        mrte_channels=16, ssl_dim=8, vq_codes=32, vq_dim=8,
        gin_channels=16, flow_layers=1, wn_layers=1, wn_kernel=3,
        upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4),
        upsample_initial=32, resblock_kernels=(3,),
        resblock_dilations=((1, 3),), n_fft=64, hop_length=8,
        win_length=64)
    params = sovits.init_params(jax.random.PRNGKey(0), vcfg,
                                dtype=jnp.float32)
    rng = np.random.default_rng(0)
    codes80 = rng.integers(0, vcfg.vq_codes, 80).astype(np.int32)
    text = rng.integers(1, 40, 6).astype(np.int32)
    keyA = jax.random.fold_in(jax.random.PRNGKey(7), 1)
    keyB = jax.random.fold_in(jax.random.PRNGKey(7), 2)
    ge = jnp.zeros((1, vcfg.gin_channels, 1), jnp.float32)
    gm = jnp.zeros((1, vcfg.mrte_channels, 1), jnp.float32)

    def latent(keys, codes_b, lens):
        B = codes_b.shape[0]
        return sovits.synthesize_latent_rows(
            params, vcfg, keys, jnp.asarray(codes_b),
            jnp.asarray(lens, jnp.int32),
            jnp.asarray(np.tile(text, (B, 1))),
            jnp.full((B,), len(text), jnp.int32),
            jnp.tile(ge, (B, 1, 1)), jnp.tile(gm, (B, 1, 1)), 0.5,
            noise_frames=256)

    # row A alone at count=60, fb=64
    c60 = np.zeros((1, 64), np.int32)
    c60[0, :60] = codes80[:60]
    zA = np.asarray(latent(jnp.stack([keyA]), c60, [60]))

    # SAME codes/count, different batch composition (A now at index 1
    # next to an unrelated row) and a bigger (masked-pad-only) frame
    # bucket: row A's latent must be IDENTICAL — only per-row noise
    # indexing could make it differ
    cB = np.zeros((2, 96), np.int32)
    cB[0, :25] = rng.integers(0, vcfg.vq_codes, 25)
    cB[1, :60] = codes80[:60]
    zBA = np.asarray(latent(jnp.stack([keyB, keyA]), cB, [25, 60]))
    np.testing.assert_allclose(zA[0, :2 * 60], zBA[1, :2 * 60],
                               rtol=1e-4, atol=1e-5)

    # growing the CODES (count 60 -> 80) perturbs the prefix only through
    # the encoders' bidirectional attention — the documented streaming
    # approximation. Same noise => the early prefix stays close; a fresh
    # key at the same codes diverges far more (pure-noise difference).
    c80b = np.zeros((1, 96), np.int32)
    c80b[0, :80] = codes80
    z80 = np.asarray(latent(jnp.stack([keyA]), c80b, [80]))
    zfresh = np.asarray(latent(jnp.stack([keyB]), c60, [60]))
    n = 2 * 30
    d_grow = float(np.sqrt(np.mean((zA[0, :n] - z80[0, :n]) ** 2)))
    d_key = float(np.sqrt(np.mean((zA[0, :n] - zfresh[0, :n]) ** 2)))
    assert d_grow < 0.5 * d_key, (
        f"prefix drift {d_grow:.3f} not small vs fresh-noise {d_key:.3f}")


@pytest.mark.slow
def test_window_vocode_interior_exact():
    """Two halo-padded windows == the single-shot waveform interior."""
    params = _vparams()
    rng = np.random.default_rng(1)
    count, hop = 24, VCFG.hop_length
    F = 2 * count
    z = jnp.asarray(rng.standard_normal((1, F, VCFG.inter_channels)) * 0.3,
                    jnp.float32)
    ge = jnp.zeros((1, VCFG.gin_channels, 1), jnp.float32)
    whole = np.asarray(sovits.vocode_frames(
        params, VCFG, z, ge, jnp.array([F], jnp.int32)))[0]

    halo, chunk = 6, 24
    win = chunk + 2 * halo
    pieces = []
    for start in (0, chunk):
        s0 = int(np.clip(start - halo, 0, F - win))
        a = np.asarray(sovits.vocode_window_rows(
            params, VCFG, z, ge, jnp.array([s0], jnp.int32),
            jnp.array([F], jnp.int32), win))[0]
        pieces.append(a[(start - s0) * hop: (start - s0 + chunk) * hop])
    stitched = np.concatenate(pieces)
    assert stitched.shape == whole.shape
    # the generator's receptive field (~14 frames of kernels here ~ less)
    # is inside the halo; interior samples match to fp tolerance
    np.testing.assert_allclose(stitched, whole, rtol=2e-2, atol=2e-3)


def _mk_batcher(stream_finisher: bool, **over):
    rcfg = RuntimeConfig(
        phoneme_buckets=(16, 32), prompt_buckets=(16,),
        frame_buckets=(16, 32, 64), slot_batch=4, slot_steps=4,
        slot_ring=32, slot_phoneme_bucket=32, slot_prompt_bucket=16,
        vocode_chunk=over.pop("vocode_chunk", 16),
        vocode_halo=over.pop("vocode_halo", 4),
        **over)
    object.__setattr__(rcfg, "slot_stream_finisher", stream_finisher)
    eng = TTSEngine(rcfg)
    char = make_random_character(t2s_cfg=TCFG, sovits_cfg=VCFG,
                                 dtype=jnp.float32)
    ref = make_random_reference(char, eng, ref_seconds=0.2)
    from genie_tts_tpu.runtime.slot_batcher import SlotBatcher

    return SlotBatcher(eng, char), ref


@pytest.mark.slow
def test_windows_path_matches_legacy_length():
    """Windowed assembly emits exactly the legacy finisher's length."""
    ph = np.arange(1, 6, dtype=np.int32)
    bert = np.zeros((len(ph), TCFG.bert_dim), np.float32)
    outs = {}
    for mode in (False, True):
        sb, ref = _mk_batcher(mode)
        # pinned length: min_steps == max_steps makes counts deterministic
        outs[mode] = sb.synthesize(ref, ph, bert, timeout=300,
                                   min_steps=12, max_steps=12)
        sb.stop()
    assert len(outs[True]) == len(outs[False]) > 0
    assert np.isfinite(outs[True]).all()


@pytest.mark.slow
def test_synthesize_stream_pieces():
    """Streaming slot requests yield ordered pieces that reassemble to
    exactly the blocking result's length; concurrent streams coexist."""
    sb, ref = _mk_batcher(True, vocode_chunk=8, vocode_halo=2)
    ph = np.arange(1, 6, dtype=np.int32)
    bert = np.zeros((len(ph), TCFG.bert_dim), np.float32)
    hop = VCFG.hop_length
    outs = {}

    def client(i):
        pieces = list(sb.synthesize_stream(ref, ph, bert, timeout=300,
                                           min_steps=24, max_steps=24))
        outs[i] = pieces

    threads = [threading.Thread(target=client, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    sb.stop()
    for i, pieces in outs.items():
        assert len(pieces) >= 2, f"req {i} streamed {len(pieces)} pieces"
        total = np.concatenate(pieces)
        assert len(total) == 2 * 24 * hop
        assert np.isfinite(total).all()


@pytest.mark.slow
def test_mixed_streaming_without_windows_flag():
    """PER-ROW pump: with the machine-wide windows flag OFF, a streaming
    request still yields incremental pieces while concurrent blocking
    requests complete through the pooled finisher — streaming must not
    require (or tax) the whole machine (the r3 windows-mode throughput
    regression was machine-wide)."""
    sb, ref = _mk_batcher(False, vocode_chunk=8, vocode_halo=2)
    assert not sb.windows
    ph = np.arange(1, 6, dtype=np.int32)
    bert = np.zeros((len(ph), TCFG.bert_dim), np.float32)
    hop = VCFG.hop_length
    outs = {}

    def stream_client():
        outs["s"] = list(sb.synthesize_stream(ref, ph, bert, timeout=300,
                                              min_steps=24, max_steps=24))

    def block_client(i):
        outs[i] = sb.synthesize(ref, ph, bert, timeout=300,
                                min_steps=24, max_steps=24)

    threads = [threading.Thread(target=stream_client)] + [
        threading.Thread(target=block_client, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    sb.stop()
    assert len(outs["s"]) >= 2, f"streamed {len(outs['s'])} pieces"
    total = np.concatenate(outs["s"])
    assert len(total) == 2 * 24 * hop
    assert np.isfinite(total).all()
    for i in range(2):
        assert len(outs[i]) == 2 * 24 * hop
        assert np.isfinite(outs[i]).all()


def test_windows_multi_pump_assembly():
    """A decode long enough for several pumps assembles contiguously."""
    sb, ref = _mk_batcher(True, vocode_chunk=8, vocode_halo=2)
    assert sb.windows and sb.chunk // 2 <= sb.join_W  # pumps every segment
    ph = np.arange(1, 6, dtype=np.int32)
    bert = np.zeros((len(ph), TCFG.bert_dim), np.float32)
    outs = {}

    def client(i):
        outs[i] = sb.synthesize(ref, ph, bert, timeout=300,
                                min_steps=24, max_steps=24)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    sb.stop()
    hop = VCFG.hop_length
    for i, a in outs.items():
        assert len(a) == 2 * 24 * hop, f"req {i}: {len(a)} samples"
        assert np.isfinite(a).all()
        assert a.dtype == np.float32


def test_win_for_picks_smallest_covering_window():
    """First pieces and short remainders must vocode through the small
    dedicated window (win_first), full chunks through the large one."""
    sb, _ = _mk_batcher(True, vocode_chunk=64, vocode_halo=4)
    try:
        fp = sb.first_piece
        assert fp == 16 and sb.win_first == fp + 2 * sb.halo
        job = (None, None, 8, 0, fp)
        assert sb._win_for([job]) == sb.win_first
        wide = (None, None, 8, 0, sb.chunk)
        assert sb._win_for([wide]) == sb.win
        mixed = sb._win_for([job, (None, None, 8, 0, sb.chunk // 2)])
        assert mixed == sb.win_small
    finally:
        sb.stop()


def test_spec_codes_matches_host_assembly():
    """The speculative first-piece codes (device-assembled from the
    in-flight segment buffer) must equal the host-side _codes_so_far
    assembly for the same tokens."""
    from genie_tts_tpu.runtime.slot_batcher import _spec_codes_jit

    rng = np.random.default_rng(0)
    W, B, fb, count, vq = 16, 4, 64, 12, 32
    seg_tok = rng.integers(0, 30, (B, W)).astype(np.int32)
    tok0s = rng.integers(0, 30, (2,)).astype(np.int32)
    slots = np.array([2, 0], np.int32)
    got = np.asarray(_spec_codes_jit(
        tuple(jnp.asarray(tok0s[r:r + 1]) for r in range(2)),
        jnp.asarray(seg_tok), slots, fb=fb, count=count, vq_codes=vq))
    for r in range(2):
        want = np.zeros(fb, np.int32)
        want[0] = tok0s[r]
        want[1:count] = seg_tok[slots[r], : count - 1]
        np.testing.assert_array_equal(got[r], np.clip(want, 0, vq - 1))
