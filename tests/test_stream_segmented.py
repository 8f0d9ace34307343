"""Segmented streaming (runtime/stream.py): length-independent TTFA path.

The token stream is exact (solo slot machine == t2s.generate, see
tests/test_slots.py); the AUDIO is a prefix-latent approximation, so
these tests assert structural invariants — total length equals the
non-streamed synthesis (greedy → identical token counts), chunk cadence,
finiteness — rather than sample equality.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.ops.sampling import SamplingConfig
from genie_tts_tpu.runtime.engine import (

    TTSEngine, make_random_character, make_random_reference,
)

pytestmark = pytest.mark.slow  # module fixture compiles full model graphs (minutes on CPU)


TCFG = T2SConfig(
    phoneme_vocab=732, semantic_vocab=33, embed_dim=32, num_layers=2,
    num_heads=4, ffn_dim=64, bert_dim=16, ssl_dim=24, eos_id=32,
    max_decode_steps=24,
)
VCFG = SoVITSConfig(
    spec_channels=33, inter_channels=16, hidden_channels=16, filter_channels=32,
    n_heads=2, n_layers=2, kernel_size=3, mrte_channels=16, ssl_dim=24,
    vq_codes=32, vq_dim=24, gin_channels=16,
    flow_layers=2, wn_layers=2, wn_kernel=5,
    upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4), upsample_initial=32,
    resblock_kernels=(3,), resblock_dilations=((1, 3),),
    n_fft=64, hop_length=8, win_length=64,
)
RCFG = RuntimeConfig(
    phoneme_buckets=(16, 32), prompt_buckets=(16,), frame_buckets=(32,),
    vocode_chunk=16, vocode_halo=4, stream_segmented=True,
    stream_seg_steps=4, stream_lookahead=2, stream_chunk=8,
    step_caps=(24,), slot_phoneme_bucket=32, slot_prompt_bucket=16,
)

GREEDY = SamplingConfig(top_k=1, temperature=1.0, repetition_penalty=1.0,
                        top_p=1.0)


@pytest.fixture(scope="module")
def setup():
    eng = TTSEngine(RCFG)
    char = make_random_character(t2s_cfg=TCFG, sovits_cfg=VCFG,
                                 dtype=jnp.float32)
    ref = make_random_reference(char, eng, ref_seconds=0.2)
    return eng, char, ref


def test_segmented_total_length_matches_solo(setup):
    """Greedy tokens are identical across paths, so the TOTAL emitted
    sample count must equal non-streamed synthesis exactly."""
    eng, char, ref = setup
    phones = np.array([5, 10, 15, 20], np.int32)
    bert = np.zeros((4, TCFG.bert_dim), np.float32)
    full = eng.synthesize_utterance(char, ref, phones, bert, seed=11,
                                    sampling=GREEDY)
    chunks = list(eng.synthesize_utterance_stream(
        char, ref, phones, bert, seed=11, sampling=GREEDY))
    assert len(chunks) >= 1
    streamed = np.concatenate(chunks)
    assert streamed.shape == full.shape, (
        f"streamed {streamed.shape} vs full {full.shape}")
    assert np.isfinite(streamed).all()


def test_segmented_min_steps_long_decode(setup):
    """min_steps forces a multi-segment decode; chunks must arrive in
    more than one piece and cover 2*count*hop samples."""
    eng, char, ref = setup
    phones = np.array([5, 10, 15], np.int32)
    bert = np.zeros((3, TCFG.bert_dim), np.float32)
    chunks = list(eng.synthesize_utterance_stream(
        char, ref, phones, bert, seed=3, sampling=GREEDY,
        min_steps=20, max_steps=24))
    total = sum(len(c) for c in chunks)
    hop = VCFG.hop_length
    assert total % hop == 0
    assert total >= 2 * 20 * hop          # at least min_steps codes of audio
    assert len(chunks) >= 2               # streamed, not one blob
    for c in chunks:
        assert np.isfinite(np.asarray(c, np.float32)).all()


def test_segmented_pcm16(setup):
    eng, char, ref = setup
    phones = np.array([5, 10], np.int32)
    bert = np.zeros((2, TCFG.bert_dim), np.float32)
    chunks = list(eng.synthesize_utterance_stream(
        char, ref, phones, bert, seed=7, sampling=GREEDY, pcm16=True))
    assert all(c.dtype == np.int16 for c in chunks)
    assert sum(len(c) for c in chunks) > 0


def test_segmented_falls_back_when_oversize(setup):
    """Requests exceeding the stream geometry use the fused path."""
    eng, char, ref = setup
    phones = np.arange(1, 40, dtype=np.int32) % 30 + 1   # packed > 32 bucket
    bert = np.zeros((len(phones), TCFG.bert_dim), np.float32)
    chunks = list(eng.synthesize_utterance_stream(
        char, ref, phones, bert, seed=5, sampling=GREEDY))
    assert sum(len(c) for c in chunks) > 0


def test_stream_warmup_units(setup):
    from genie_tts_tpu.runtime.stream import stream_warmup_units

    eng, char, ref = setup
    units = stream_warmup_units(eng, char, pcm16=False)
    assert len(units) >= 5
    for u in units:
        u()   # every thunk must lower+compile
