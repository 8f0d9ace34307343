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

pytestmark = pytest.mark.slow  # module fixture compiles full model graphs (minutes on CPU)


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


def test_tp_sharded_decode_matches(setup):
    """Megatron-style TP shardings on the T2S decoder (mesh tp axis) give
    the same tokens as replicated execution — XLA inserts the collectives
    (SURVEY §2.4)."""
    from genie_tts_tpu.parallel.mesh import make_mesh, shard_params
    from genie_tts_tpu.models import t2s
    from genie_tts_tpu.ops.sampling import SamplingConfig
    import jax

    solo, char, ref, items = setup
    mesh = make_mesh(dp=1, tp=4)
    sharded, _ = shard_params(char.t2s_params, mesh)

    rng = np.random.default_rng(3)
    phones = jnp.asarray(rng.integers(1, TCFG.phoneme_vocab, (1, 8)), jnp.int32)
    prompts = jnp.asarray(rng.integers(0, TCFG.semantic_vocab - 1, (1, 12)),
                          jnp.int32)
    args = dict(max_steps=8, cache_len=8 + 12 + 8, min_steps=8)
    fn = jax.jit(t2s.generate_e2e,
                 static_argnames=("cfg", "scfg", "max_steps", "cache_len",
                                  "min_steps", "use_flash", "layer_unroll"))
    scfg = SamplingConfig(top_k=1, repetition_penalty=1.0)
    key = jax.random.PRNGKey(0)
    xl = jnp.array([8]); pl = jnp.array([12])
    codes_rep, len_rep = fn(char.t2s_params, TCFG, scfg, key, phones, None,
                            xl, prompts, pl, **args)
    codes_tp, len_tp = fn(sharded, TCFG, scfg, key, phones, None,
                          xl, prompts, pl, **args)
    np.testing.assert_array_equal(np.asarray(codes_rep), np.asarray(codes_tp))
    assert int(len_rep[0]) == int(len_tp[0])


def test_tp_sharded_serving_matches(setup):
    """shard_character + a (dp=2, tp=4) mesh: the FULL serving path
    (synthesize_batch) runs the decode tp-sharded with dp batch sharding
    and reproduces single-device outputs row-for-row."""
    solo, char, ref, items = setup
    outs_solo = solo.synthesize_batch(char, items, seed=11, fixed_steps=8)

    import copy

    mesh = make_mesh(dp=2, tp=4)
    tp_engine = TTSEngine(RuntimeConfig(), mesh=mesh)
    char2 = copy.copy(char)
    tp_engine.shard_character(char2)
    # decoder matmul leaves actually carry the Megatron tp sharding
    qkv = char2.t2s_params["layers"]["qkv"]["w"]
    assert "tp" in str(qkv.sharding.spec)
    outs_tp = tp_engine.synthesize_batch(char2, items, seed=11,
                                         fixed_steps=8)
    assert len(outs_tp) == len(outs_solo)
    for a, b in zip(outs_solo, outs_tp):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_tp_sharded_solo_utterance_matches(setup):
    """synthesize_utterance (the solo serving path) under a tp mesh."""
    solo, char, ref, items = setup
    _, tp_, tb_ = items[0]
    from genie_tts_tpu.ops.sampling import SamplingConfig

    greedy = SamplingConfig(top_k=1, temperature=1.0,
                            repetition_penalty=1.0)
    a_solo = solo.synthesize_utterance(char, ref, tp_, tb_, sampling=greedy,
                                       seed=5, min_steps=8, max_steps=8)

    import copy

    mesh = make_mesh(dp=1, tp=8)
    tp_engine = TTSEngine(RuntimeConfig(), mesh=mesh)
    char2 = copy.copy(char)
    tp_engine.shard_character(char2)
    a_tp = tp_engine.synthesize_utterance(char2, ref, tp_, tb_,
                                          sampling=greedy, seed=5,
                                          min_steps=8, max_steps=8)
    assert a_solo.shape == a_tp.shape
    np.testing.assert_allclose(a_solo, a_tp, rtol=1e-4, atol=1e-5)


def test_api_mesh_env_wiring():
    """GENIE_MESH="2x4" builds the serving mesh at api import and
    load_character places weights on it (subprocess: module-global
    engine)."""
    import subprocess
    import sys

    code = (
        "import os\n"
        "os.environ['GENIE_MESH'] = '2x4'\n"
        "os.environ['GENIE_PLATFORM'] = 'cpu'\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +\n"
        "    ' --xla_force_host_platform_device_count=8')\n"
        "from genie_tts_tpu import api\n"
        "assert api.engine.mesh is not None\n"
        "assert dict(api.engine.mesh.shape) == {'dp': 2, 'tp': 4}\n"
        "print('MESH-OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert "MESH-OK" in out.stdout, out.stderr[-2000:]
