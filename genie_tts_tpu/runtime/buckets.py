"""Static-shape bucketing so jitted graphs never recompile.

The reference's ONNX graphs are fully dynamic-shaped; XLA wants static
shapes. Every host->device boundary rounds sequence lengths up to a fixed
bucket ladder; masks inside the models make padded execution bit-equivalent
to exact-length execution (tested in tests/test_sovits.py /
tests/test_t2s.py padding-invariance tests).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def pick_bucket(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length; the largest bucket if none fit (callers
    must truncate — mirrors the reference's implicit max-length behavior)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def pad_to(arr: np.ndarray, target: int, axis: int = 0, value=0) -> np.ndarray:
    """Right-pad (or truncate) ``arr`` along ``axis`` to ``target``."""
    cur = arr.shape[axis]
    if cur == target:
        return arr
    if cur > target:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, target)
        return arr[tuple(sl)]
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - cur)
    return np.pad(arr, widths, constant_values=value)


def bucket_batch(arrs: Sequence[np.ndarray], buckets: Sequence[int],
                 axis: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-length arrays into one bucketed batch.

    Returns (batch [N, bucket, ...], lengths [N]).
    """
    lens = np.array([a.shape[axis] for a in arrs], np.int32)
    tgt = pick_bucket(int(lens.max()), buckets)
    out = np.stack([pad_to(a, tgt, axis=axis) for a in arrs])
    return out, np.minimum(lens, tgt)
