"""Intra-utterance streaming: chunked output equals non-streamed output."""
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
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
# tiny vocode chunks to force the chunked path; halo 8 > tiny-model RF.
# stream_segmented OFF: these tests assert EXACT equality with the
# non-streamed output, which only the fused head guarantees (the
# segmented path trades prefix-latent exactness for length-independent
# TTFA — covered by tests/test_stream_segmented.py).
RCFG = RuntimeConfig(
    phoneme_buckets=(16, 32), prompt_buckets=(16,), frame_buckets=(32,),
    vocode_chunk=16, vocode_halo=8, stream_segmented=False,
)


@pytest.fixture(scope="module")
def setup():
    eng = TTSEngine(RCFG)
    char = make_random_character(t2s_cfg=TCFG, sovits_cfg=VCFG, dtype=jnp.float32)
    ref = make_random_reference(char, eng, ref_seconds=0.2)
    return eng, char, ref


def test_stream_matches_batch(setup):
    eng, char, ref = setup
    phones = np.array([5, 10, 15, 20], np.int32)
    bert = np.zeros((4, TCFG.bert_dim), np.float32)
    full = eng.synthesize_utterance(char, ref, phones, bert, seed=11)
    chunks = list(eng.synthesize_utterance_stream(char, ref, phones, bert, seed=11))
    assert len(chunks) >= 1
    streamed = np.concatenate(chunks)
    assert streamed.shape == full.shape
    np.testing.assert_allclose(streamed, full, rtol=2e-3, atol=2e-4)


def test_stream_chunk_sizes(setup):
    eng, char, ref = setup
    phones = np.array([5, 10, 15], np.int32)
    bert = np.zeros((3, TCFG.bert_dim), np.float32)
    chunks = list(eng.synthesize_utterance_stream(char, ref, phones, bert, seed=3))
    hop = VCFG.hop_length
    # all but the last chunk are exactly vocode_chunk frames
    for c in chunks[:-1]:
        assert len(c) == RCFG.vocode_chunk * hop
