"""Data-parallel serving over a device mesh (virtual 8-CPU devices).

synthesize_batch with a dp mesh shards the batch axis across chips with
replicated weights (the TPU-native analogue of the reference's only
scale-out knob, ``uvicorn workers=N`` — ``Server.py:164-165``). Results
must match single-device execution row-for-row.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.parallel.mesh import make_mesh
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference,
)

TCFG = T2SConfig(
    phoneme_vocab=64, semantic_vocab=33, embed_dim=32, num_layers=2,
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


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    solo = TTSEngine(RuntimeConfig())
    char = make_random_character(t2s_cfg=TCFG, sovits_cfg=VCFG,
                                 dtype=jnp.float32)
    ref = make_random_reference(char, solo, ref_seconds=0.2)
    rng = np.random.default_rng(0)
    items = []
    for i in range(8):
        tp = rng.integers(1, TCFG.phoneme_vocab, 6 + i % 3).astype(np.int32)
        tb = np.zeros((len(tp), TCFG.bert_dim), np.float32)
        items.append((ref, tp, tb))
    return solo, char, ref, items


def test_dp_batch_matches_single_device(setup):
    solo, char, ref, items = setup
    outs_solo = solo.synthesize_batch(char, items, seed=7, fixed_steps=8)

    mesh = make_mesh(dp=8)
    dp_engine = TTSEngine(RuntimeConfig(), mesh=mesh)
    dp_engine.replicate_character(char)
    outs_dp = dp_engine.synthesize_batch(char, items, seed=7, fixed_steps=8)

    assert len(outs_dp) == len(outs_solo) == 8
    for a, b in zip(outs_solo, outs_dp):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_dp_pads_partial_batches(setup):
    solo, char, ref, items = setup
    mesh = make_mesh(dp=8)
    dp_engine = TTSEngine(RuntimeConfig(), mesh=mesh)
    dp_engine.replicate_character(char)
    # 3 requests on an 8-wide mesh: padded to 8 internally, 3 returned
    outs = dp_engine.synthesize_batch(char, items[:3], seed=1, fixed_steps=8)
    assert len(outs) == 3
    for a in outs:
        assert np.isfinite(a).all() and len(a) > 0


def test_dp_with_mesh_tp_axis_present(setup):
    """A (dp=4, tp=2) mesh still serves: batch shards over dp only."""
    solo, char, ref, items = setup
    mesh = make_mesh(dp=4, tp=2)
    dp_engine = TTSEngine(RuntimeConfig(), mesh=mesh)
    dp_engine.replicate_character(char)
    outs = dp_engine.synthesize_batch(char, items[:4], seed=2, fixed_steps=8)
    assert len(outs) == 4
    for a in outs:
        assert np.isfinite(a).all()
