"""Speaker-verification embedding — V2ProPlus cloning surface.

Role of the reference's ``speaker_encoder.onnx``
(``/root/reference/src/genie_tts/Core/Resources.py:57-60``, invoked at
``Audio/ReferenceAudio.py:71-76``): 16 kHz waveform -> 20480-d embedding
fed to the prompt encoder.

Backed by the ERes2NetV2 JAX model (models/eres2net.py) over Kaldi fbank
features (ops/audio.kaldi_fbank) when the checkpoint asset is present;
injectable hook for tests/plugins.
"""
from __future__ import annotations

import logging
from typing import Callable, Optional

import numpy as np

from ..config import sv_model_path

logger = logging.getLogger(__name__)

SV_EMB_DIM = 20480

_custom_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None
_loaded_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None


def set_sv_fn(fn: Optional[Callable[[np.ndarray], np.ndarray]]) -> None:
    """Inject a speaker-verification embedding function (tests/plugins)."""
    global _custom_fn
    _custom_fn = fn


def make_sv_fn(params) -> Callable[[np.ndarray], np.ndarray]:
    """Build audio_16k -> [20480] from an ERes2NetV2 param tree."""
    import jax
    import jax.numpy as jnp

    from ..ops.audio import kaldi_fbank
    from . import eres2net

    apply = jax.jit(eres2net.apply)

    def fn(audio_16k: np.ndarray) -> np.ndarray:
        feats = kaldi_fbank(jnp.asarray(audio_16k, jnp.float32)[None])
        return np.asarray(apply(params, feats)[0], np.float32)

    return fn


def get_sv_fn() -> Optional[Callable[[np.ndarray], np.ndarray]]:
    """Returns audio_16k -> [20480] embedding fn, or None if unavailable."""
    global _loaded_fn
    if _custom_fn is not None:
        return _custom_fn
    if _loaded_fn is not None:
        return _loaded_fn
    path = sv_model_path()
    if path.is_file():
        from ..convert.io import load_params

        _loaded_fn = make_sv_fn(load_params(path))
        return _loaded_fn
    logger.warning("SV model unavailable (%s); V2ProPlus cloning disabled", path)
    return None
