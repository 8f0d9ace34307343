"""End-to-end engine test on tiny random models: text -> waveform."""
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.ops.sampling import SamplingConfig
from genie_tts_tpu.runtime.buckets import bucket_batch, pad_to, pick_bucket
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference,
)

TCFG = T2SConfig(
    phoneme_vocab=732, semantic_vocab=33, embed_dim=32, num_layers=2,
    num_heads=4, ffn_dim=64, bert_dim=16, ssl_dim=24, eos_id=32,
    max_decode_steps=12,
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
    phoneme_buckets=(16, 32), prompt_buckets=(16, 32), frame_buckets=(16, 32),
    kv_cache_len=64,
)


class TestBuckets:
    def test_pick(self):
        assert pick_bucket(5, (8, 16)) == 8
        assert pick_bucket(9, (8, 16)) == 16
        assert pick_bucket(99, (8, 16)) == 16  # clamps to max

    def test_pad_to(self):
        a = np.arange(5)
        assert pad_to(a, 8).shape == (8,)
        assert pad_to(a, 3).shape == (3,)
        np.testing.assert_array_equal(pad_to(a, 8)[:5], a)

    def test_bucket_batch(self):
        batch, lens = bucket_batch([np.ones(3), np.ones(7)], (8, 16))
        assert batch.shape == (2, 8)
        np.testing.assert_array_equal(lens, [3, 7])


@pytest.fixture(scope="module")
def setup():
    eng = TTSEngine(RCFG)
    char = make_random_character(t2s_cfg=TCFG, sovits_cfg=VCFG, dtype=jnp.float32)
    ref = make_random_reference(char, eng, ref_seconds=0.2)
    return eng, char, ref


@pytest.mark.slow
def test_e2e_synthesis(setup):
    eng, char, ref = setup
    phones = np.array([5, 10, 15, 20, 25], np.int32)
    bert = np.zeros((5, TCFG.bert_dim), np.float32)
    audio = eng.synthesize_utterance(
        char, ref, phones, bert, sampling=SamplingConfig(top_k=5), seed=3)
    assert audio.dtype == np.float32
    assert audio.ndim == 1
    # audio length = 2 * n_codes * hop; bounded by max_decode_steps
    assert 0 < len(audio) <= 2 * TCFG.max_decode_steps * VCFG.hop_length
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0


@pytest.mark.slow
def test_e2e_deterministic_given_seed(setup):
    eng, char, ref = setup
    phones = np.array([5, 10, 15], np.int32)
    bert = np.zeros((3, TCFG.bert_dim), np.float32)
    a = eng.synthesize_utterance(char, ref, phones, bert, seed=7)
    b = eng.synthesize_utterance(char, ref, phones, bert, seed=7)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_prompt_token_extraction(setup):
    eng, char, ref = setup
    assert ref.prompt_tokens.ndim == 1
    assert (ref.prompt_tokens >= 0).all()
    assert (ref.prompt_tokens < 1024).all()
    assert ref.ge.shape == (VCFG.gin_channels, 1)


@pytest.mark.slow
def test_pipelined_matches_fused(setup):
    eng, char, ref = setup
    items = []
    for i in range(3):
        ph = np.array([5 + i, 10, 15, 20], np.int32)
        items.append((ph, np.zeros((4, TCFG.bert_dim), np.float32)))
    piped = eng.synthesize_pipelined(char, ref, items, seed=100,
                                     fixed_steps=8, window=2)
    assert len(piped) == 3
    for i, (ph, bert) in enumerate(items):
        solo = eng.synthesize_utterance(char, ref, ph, bert, seed=100 + i,
                                        fixed_steps=8)
        np.testing.assert_array_equal(piped[i], solo)


@pytest.mark.slow
def test_oversize_lengths_clamp_to_buckets(setup):
    """Inputs beyond the largest bucket truncate SAFELY: the lengths fed to
    the attention masks clamp to the bucket, so no unwritten cache
    positions are marked valid (they produced garbage audio before)."""
    eng, char, ref = setup
    # a text whose packed phones exceed the largest phoneme bucket (32)
    big = np.arange(1, 60, dtype=np.int32) % 30 + 1
    bert = np.zeros((len(big), char.t2s_cfg.bert_dim), np.float32)
    audio = eng.synthesize_utterance(char, ref, big, bert, seed=0,
                                     fixed_steps=8)
    assert len(audio) > 0 and np.isfinite(audio).all()
    # batched path with one oversize row
    outs = eng.synthesize_batch(
        char, [(ref, big, bert),
               (ref, big[:4], bert[:4])], seed=1, fixed_steps=8)
    assert all(np.isfinite(a).all() and len(a) > 0 for a in outs)
