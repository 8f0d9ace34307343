"""Continuous batcher tests: concurrent requests batch and all complete."""
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.runtime.batcher import ContinuousBatcher
from genie_tts_tpu.runtime.engine import (

    TTSEngine, make_random_character, make_random_reference,
)

pytestmark = pytest.mark.slow  # module fixture compiles full model graphs (minutes on CPU)


TCFG = T2SConfig(
    phoneme_vocab=732, semantic_vocab=33, embed_dim=32, num_layers=2,
    num_heads=4, ffn_dim=64, bert_dim=16, ssl_dim=24, eos_id=32,
    max_decode_steps=10,
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
    phoneme_buckets=(16, 32), prompt_buckets=(16,), frame_buckets=(16,),
)


@pytest.fixture(scope="module")
def setup():
    eng = TTSEngine(RCFG)
    char = make_random_character(t2s_cfg=TCFG, sovits_cfg=VCFG, dtype=jnp.float32)
    ref = make_random_reference(char, eng, ref_seconds=0.2)
    return eng, char, ref


def test_synthesize_batch_rows(setup):
    eng, char, ref = setup
    items = [
        (ref, np.array([5, 10, 15], np.int32), np.zeros((3, 16), np.float32)),
        (ref, np.array([7, 2, 9, 11, 4], np.int32), np.zeros((5, 16), np.float32)),
    ]
    outs = eng.synthesize_batch(char, items, seed=1)
    assert len(outs) == 2
    for a in outs:
        assert a.dtype == np.float32 and a.ndim == 1
        assert np.isfinite(a).all()


def test_concurrent_requests_all_complete(setup):
    eng, char, ref = setup
    batcher = ContinuousBatcher(eng, max_batch=4, window_ms=50)
    results = {}
    errors = []

    def worker(i):
        try:
            phones = np.array([3 + i, 8, 12], np.int32)
            bert = np.zeros((3, 16), np.float32)
            results[i] = batcher.synthesize(char, ref, phones, bert, timeout=120)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=150)
    assert not errors
    assert len(results) == 4
    for a in results.values():
        assert isinstance(a, np.ndarray) and np.isfinite(a).all()
    batcher.stop()
