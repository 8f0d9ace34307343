"""genie-tts-tpu — TPU-native GPT-SoVITS voice-cloning TTS framework.

Public API parity with the reference package
(``/root/reference/src/genie_tts/__init__.py:1-29``).
"""
from .api import (
    clear_reference_audio_cache,
    convert_model,
    convert_to_onnx,
    download_genie_data,
    load_character,
    load_predefined_character,
    set_reference_audio,
    start_server,
    stop,
    tts,
    tts_async,
    unload_character,
    wait_for_playback_done,
)

__version__ = "0.1.0"

__all__ = [
    "load_character",
    "unload_character",
    "set_reference_audio",
    "tts_async",
    "tts",
    "stop",
    "convert_model",
    "convert_to_onnx",
    "clear_reference_audio_cache",
    "start_server",
    "load_predefined_character",
    "wait_for_playback_done",
    "download_genie_data",
]
