"""Speaker-verification embedding model (ERes2NetV2) — V2ProPlus cloning.

Role of the reference's ``speaker_encoder.onnx``
(``/root/reference/src/genie_tts/Core/Resources.py:57-60``, invoked at
``Audio/ReferenceAudio.py:71-76``): 16 kHz waveform -> 20480-d embedding
fed to the prompt encoder.

The full ERes2NetV2 JAX port (res2net stages + attentional feature fusion
+ statistics pooling over the 3D-Speaker geometry) is scheduled for the
next round; this module provides the loading/gating surface so the
pipeline degrades with an actionable error instead of crashing, and an
injectable hook used by tests.
"""
from __future__ import annotations

import logging
from typing import Callable, Optional

import numpy as np

from ..config import sv_model_path

logger = logging.getLogger(__name__)

SV_EMB_DIM = 20480

_custom_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None


def set_sv_fn(fn: Optional[Callable[[np.ndarray], np.ndarray]]) -> None:
    """Inject a speaker-verification embedding function (tests/plugins)."""
    global _custom_fn
    _custom_fn = fn


def get_sv_fn() -> Optional[Callable[[np.ndarray], np.ndarray]]:
    """Returns audio_16k -> [20480] embedding fn, or None if unavailable."""
    if _custom_fn is not None:
        return _custom_fn
    path = sv_model_path()
    if path.is_file():
        raise NotImplementedError(
            f"SV checkpoint found at {path} but the ERes2NetV2 JAX model is "
            "not implemented yet (scheduled next round).")
    logger.warning("SV model unavailable (%s); V2ProPlus cloning disabled", path)
    return None
