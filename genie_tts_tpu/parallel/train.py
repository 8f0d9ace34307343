"""Sharded fine-tuning step for the T2S decoder (dp x tp).

GPT-SoVITS users fine-tune the T2S GPT on character data; this provides
that capability TPU-natively: one jitted train step, parameters sharded
Megatron-style over the ``tp`` mesh axis, batch over ``dp``; XLA inserts
the psum/all-gather collectives.
"""
from __future__ import annotations

from typing import Dict

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import T2SConfig
from ..models import t2s
from .mesh import batch_sharding, t2s_param_shardings


def make_train_step(cfg: T2SConfig, mesh: Mesh, learning_rate: float = 1e-4):
    """Returns (init_fn, step_fn).

    init_fn(params) -> (sharded_params, sharded_opt_state)
    step_fn(params, opt_state, batch) -> (params, opt_state, loss)
    """
    tx = optax.adamw(learning_rate)
    p_shard = None  # bound at init

    def init_fn(params):
        nonlocal p_shard
        p_shard = t2s_param_shardings(params, mesh)
        params = jax.device_put(params, p_shard)
        opt_state = tx.init(params)
        # optimizer moments mirror the param shardings
        o_shard = jax.tree.map(
            lambda s: s if isinstance(s, NamedSharding) else NamedSharding(mesh, P()),
            jax.eval_shape(tx.init, params),
            is_leaf=lambda x: False,
        )
        del o_shard  # XLA lays out opt state to match params automatically
        return params, opt_state

    def loss_fn(params, batch):
        return t2s.train_loss(params, cfg, batch)

    @jax.jit
    def step_fn(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def sharded_step(params, opt_state, batch):
        b_shard = batch_sharding(mesh)
        batch = {k: jax.device_put(v, b_shard) for k, v in batch.items()}
        return step_fn(params, opt_state, batch)

    return init_fn, sharded_step


def make_batch(cfg: T2SConfig, batch_size: int, sx: int, sy: int, seed: int = 0) -> Dict:
    """Synthetic teacher-forcing batch (tests/dryrun)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return {
        "phones": rng.integers(1, cfg.phoneme_vocab, (batch_size, sx)).astype(np.int32),
        "bert": rng.standard_normal((batch_size, sx, cfg.bert_dim)).astype(np.float32),
        "x_len": np.full((batch_size,), sx, np.int32),
        "semantic": rng.integers(0, cfg.semantic_vocab - 1, (batch_size, sy)).astype(np.int32),
        "sem_len": np.full((batch_size,), sy, np.int32),
    }
