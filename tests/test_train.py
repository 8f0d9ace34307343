"""Sharded fine-tuning step: loss decreases on a fixed batch (dp x tp CPU mesh)."""
import jax
import numpy as np
import pytest

from genie_tts_tpu.config import T2SConfig
from genie_tts_tpu.models import t2s
from genie_tts_tpu.parallel.mesh import make_mesh, t2s_param_shardings
from genie_tts_tpu.parallel.train import make_batch, make_train_step

CFG = T2SConfig(
    phoneme_vocab=50, semantic_vocab=33, embed_dim=32, num_layers=2,
    num_heads=4, ffn_dim=64, bert_dim=16, ssl_dim=8, eos_id=32,
    max_decode_steps=8,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_train_step_loss_decreases():
    mesh = make_mesh(dp=2, tp=4)
    params = t2s.init_params(jax.random.PRNGKey(0), CFG, dtype=np.float32)
    init_fn, step_fn = make_train_step(CFG, mesh, learning_rate=1e-3)
    params, opt_state = init_fn(params)
    batch = make_batch(CFG, batch_size=4, sx=8, sy=10)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step_fn(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits the fixed batch


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_param_shardings_cover_tree():
    mesh = make_mesh(dp=2, tp=4)
    params = t2s.init_params(jax.random.PRNGKey(0), CFG, dtype=np.float32)
    shardings = t2s_param_shardings(params, mesh)
    n_params = len(jax.tree.leaves(params))
    n_shard = len(jax.tree.leaves(
        shardings, is_leaf=lambda x: hasattr(x, "spec")))
    assert n_params == n_shard


def test_train_loss_masks_padding():
    """Loss must ignore positions beyond sem_len."""
    import jax.numpy as jnp

    params = t2s.init_params(jax.random.PRNGKey(0), CFG, dtype=np.float32)
    b1 = make_batch(CFG, 2, sx=6, sy=8)
    b2 = {k: v.copy() for k, v in b1.items()}
    b2["semantic"][:, 6:] = 7  # mutate only padded tail (sem_len=8... set shorter)
    b1["sem_len"][:] = 6
    b2["sem_len"][:] = 6
    l1 = float(t2s.train_loss(jax.tree.map(jnp.asarray, params), CFG,
                              {k: jnp.asarray(v) for k, v in b1.items()}))
    l2 = float(t2s.train_loss(jax.tree.map(jnp.asarray, params), CFG,
                              {k: jnp.asarray(v) for k, v in b2.items()}))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
