"""Checkpoint I/O: flat safetensors with fp16-on-disk discipline.

The reference distributes weights as fp16 ``.bin`` blobs dequantized to
fp32 in memory at load (``/root/reference/src/genie_tts/ModelManager.py:59-114``).
Here checkpoints are safetensors files with '/'-joined tree paths, fp16 on
disk, materialized as bf16 (compute) / fp32 (norms, codebooks) on load.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Union

import jax.numpy as jnp
import numpy as np

# Param-tree leaves that must stay fp32 on device for numerical parity.
_FP32_SUFFIXES = (
    "scale", "bias", "gamma", "beta", "alpha",
    "codebook", "quantizer_embed",
)

# List-typed nodes in our param schemas (rebuilt as lists, not dicts).
_LIST_KEYS = {
    "conv_layers", "in_layers", "res_skip_layers", "ups", "resblocks",
    "temporal", "convs1", "convs2",
}


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]):
    root: Dict = {}
    for path, leaf in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def _wants_fp32(path: str) -> bool:
    leaf = path.rsplit("/", 1)[-1]
    return leaf in _FP32_SUFFIXES or any(path.endswith(s) for s in _FP32_SUFFIXES)


def save_params(params, path: Union[str, Path]) -> None:
    """Save a param pytree as fp16 safetensors (fp32 for sensitive leaves)."""
    from safetensors.numpy import save_file

    flat = flatten_tree(params)
    out = {}
    for k, v in flat.items():
        v = np.asarray(v)  # ml_dtypes handles bf16 -> fp16/fp32 casts
        # order="C" is load-bearing: converter weights are often transposed
        # views (F-ordered), astype's default order="K" would keep that
        # layout, and safetensors serializes the raw buffer assuming C
        # order — silently scrambling the matrix.
        out[k] = v.astype(np.float32 if _wants_fp32(k) else np.float16,
                          order="C")
    save_file(out, str(path))


def load_params(path: Union[str, Path], compute_dtype=jnp.bfloat16):
    """Load safetensors -> param pytree (bf16 compute, fp32 where needed)."""
    from safetensors.numpy import load_file

    flat = load_file(str(path))
    out = {}
    for k, v in flat.items():
        if _wants_fp32(k):
            out[k] = jnp.asarray(v, dtype=jnp.float32)
        else:
            out[k] = jnp.asarray(v, dtype=compute_dtype)
    return unflatten_tree(out)


def save_character_config(path: Union[str, Path], *, version: str,
                          language: str, extra: Dict = None) -> None:
    cfg = {"version": version, "language": language}
    if extra:
        cfg.update(extra)
    Path(path).write_text(json.dumps(cfg, indent=2))


def load_character_config(path: Union[str, Path]) -> Dict:
    return json.loads(Path(path).read_text())
