"""Device mesh + sharding rules (the TPU-native "communication backend").

The reference has no distributed layer at all (SURVEY.md §2.4: its only
scale-out knob is ``uvicorn workers=N``, `Server.py:164-165`). Here
parallelism is first-class: a ``jax.sharding.Mesh`` over (dp, tp) axes,
NamedSharding rules per parameter, and XLA collectives inserted by the
compiler — serving scales by data-parallel continuous batching across
chips, with optional tensor parallelism over the T2S decoder.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(dp: int = 1, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {len(devices)}")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DP_AXIS, TP_AXIS))


def _t2s_param_spec(path: str) -> P:
    """PartitionSpec for a T2S parameter addressed by '/'-joined path.

    Megatron-style layout: QKV/FFN-in column-parallel, Out/FFN-out
    row-parallel; embeddings and norms replicated. Stacked layer params
    carry a leading layer axis (never sharded).
    """
    if path.startswith("layers/"):
        if "qkv/w" in path or "ffn1/w" in path:
            return P(None, None, TP_AXIS)      # [L, in, out]: shard out
        if "qkv/b" in path or "ffn1/b" in path:
            return P(None, TP_AXIS)
        if "qkv/scale" in path or "ffn1/scale" in path:
            return P(None, TP_AXIS)            # int8 per-out-channel scales
        if "out/w" in path or "ffn2/w" in path:
            return P(None, TP_AXIS, None)      # [L, in, out]: shard in
        return P()                              # biases of row-parallel, norms
    return P()                                  # embeddings, predict, encoder


def tree_paths(tree, prefix="") -> Dict[str, object]:
    """Flatten a nested dict/list pytree into {path: leaf}."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(tree_paths(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(tree_paths(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def t2s_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching the T2S param pytree."""
    def assign(path, leaf):
        return NamedSharding(mesh, _t2s_param_spec(path))

    flat = tree_paths(params)
    specs = {p: assign(p, l) for p, l in flat.items()}

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree))
        return specs[prefix[:-1]]

    return rebuild(params)


def shard_params(params, mesh: Mesh):
    shardings = t2s_param_shardings(params, mesh)
    return jax.device_put(params, shardings), shardings


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DP_AXIS))
