"""Public Python API — surface parity with the reference package
(``/root/reference/src/genie_tts/__init__.py:1-29`` /
``Internal.py:94-398``): load_character, unload_character,
set_reference_audio, tts, tts_async, stop, wait_for_playback_done,
clear_reference_audio_cache, convert_model (alias convert_to_onnx),
load_predefined_character, start_server, download_genie_data.
"""
from __future__ import annotations

import asyncio
import logging
import os
import threading
from os import PathLike
from pathlib import Path
from typing import AsyncIterator, Dict, Optional, Union

import numpy as np

from .config import RuntimeConfig, genie_data_dir
from .frontend.dispatcher import get_phones_and_bert
from .frontend.language import MONOLINGUAL, normalize_language, require_supported
from .ops.sampling import SamplingConfig
from .runtime.engine import TTSEngine
from .runtime.model_manager import model_manager
from .runtime.reference_audio import reference_audio_cache
from .runtime.session import session_registry, tts_session

logger = logging.getLogger(__name__)

SUPPORTED_AUDIO_EXTS = {".wav", ".flac", ".ogg", ".aiff", ".aif"}

def _serving_mesh():
    """Optional multi-chip serving mesh from GENIE_MESH="dpxtp" (e.g.
    "4x2": batch shards over 4 dp groups, each decoding tp-sharded over
    2 chips). Unset or 1x1 -> single-device serving. Characters loaded
    through the API are placed per the mesh (engine.shard_character)."""
    spec = os.environ.get("GENIE_MESH", "")
    if not spec:
        return None
    try:
        dp, tp = (int(x) for x in spec.lower().split("x"))
    except ValueError as e:
        raise ValueError(f"GENIE_MESH must be 'DPxTP', got {spec!r}") from e
    if dp * tp <= 1:
        return None
    # device enumeration initializes the backend — pin GENIE_PLATFORM
    # first (TTSEngine normally does this, but the mesh is built before
    # the engine constructor runs)
    platform = os.environ.get("GENIE_PLATFORM")
    if platform:
        import jax

        try:
            jax.config.update("jax_platforms", platform)
        except RuntimeError:
            logger.warning("backend already initialized; GENIE_PLATFORM ignored")
    from .parallel.mesh import make_mesh

    return make_mesh(dp=dp, tp=tp)


engine = TTSEngine(RuntimeConfig(), mesh=_serving_mesh())

# character -> reference-audio config (parity: Internal.py:37)
_reference_audios: Dict[str, dict] = {}

_hubert_jit = None


def _hubert_fn():
    """Jitted HuBERT forward, or None when weights are unavailable."""
    global _hubert_jit
    if _hubert_jit is not None:
        return _hubert_jit
    loaded = model_manager.load_hubert()
    if loaded is None:
        return None
    import jax
    import jax.numpy as jnp

    from .models import hubert as hubert_model

    params, hcfg = loaded
    # params passed as an argument (not a closure constant) so the compiled
    # graph is weight-independent and persistent-cacheable
    apply = jax.jit(hubert_model.apply, static_argnames=("cfg",))

    def fn(audio_16k: np.ndarray) -> np.ndarray:
        out = apply(params, jnp.asarray(audio_16k, jnp.float32)[None], cfg=hcfg)
        return np.asarray(out[0], np.float32)

    _hubert_jit = fn
    return fn


# ---------------------------------------------------------------------------
# Character management
# ---------------------------------------------------------------------------

def load_character(character_name: str,
                   model_dir: Union[str, PathLike],
                   language: str) -> None:
    """Load a character checkpoint directory (t2s/vits safetensors)."""
    language = require_supported(language)
    if "Chinese" in language:  # Chinese/Hybrid: warm the BERT feature model
        model_manager.load_roberta()
    char = model_manager.load_character(character_name,
                                        os.fspath(model_dir), language)
    if engine.mesh is not None:
        # place weights on the serving mesh: Megatron tp shardings on the
        # T2S decoder when GENIE_MESH has tp>1, replication otherwise
        engine.shard_character(char)


def unload_character(character_name: str) -> None:
    model_manager.remove_character(character_name)
    # pop under the lock: a concurrent first request in get_slot_batcher
    # must not re-insert a batcher for the character being unloaded
    # (leaked scheduler thread + slot KV cache under a stale key)
    with _slot_batchers_lock:
        sb = _slot_batchers.pop(character_name, None)
    if sb is not None:
        sb.stop()


def set_reference_audio(character_name: str,
                        audio_path: Union[str, PathLike],
                        audio_text: str,
                        language: Optional[str] = None) -> bool:
    """Register the voice-cloning reference clip for a character.

    Returns False (after logging) for unsupported formats — log-and-continue
    parity with the reference (``Internal.py:163-168``) — so programmatic
    callers (HTTP server) can still signal the failure.
    """
    audio_path = os.fspath(audio_path)
    ext = os.path.splitext(audio_path)[1].lower()
    if ext not in SUPPORTED_AUDIO_EXTS:
        logger.error("Audio format '%s' not supported (supported: %s)",
                     ext, sorted(SUPPORTED_AUDIO_EXTS))
        return False
    if language is None:
        model = model_manager.get(character_name)
        if model is None:
            raise ValueError("No language specified and character not loaded")
        language = model.language
    language = normalize_language(language)
    if language not in MONOLINGUAL:
        raise ValueError(f"Unknown language: {language}")
    _reference_audios[character_name] = {
        "audio_path": audio_path, "audio_text": audio_text, "language": language,
    }
    # eagerly warm the clip cache (decodes audio, runs G2P + HuBERT)
    reference_audio_cache.get_clip(audio_path, audio_text, language,
                                   hubert_fn=_hubert_fn())
    return True


def clear_reference_audio_cache() -> None:
    reference_audio_cache.clear()


# ---------------------------------------------------------------------------
# Synthesis
# ---------------------------------------------------------------------------

_batcher = None


def get_batcher():
    """Lazy global ContinuousBatcher bound to the engine (serving path)."""
    global _batcher
    if _batcher is None:
        from .runtime.batcher import ContinuousBatcher

        _batcher = ContinuousBatcher(
            engine, max_batch=engine.cfg.batch_max,
            window_ms=engine.cfg.batch_window_ms)
    return _batcher


_slot_batchers: dict = {}
_slot_batchers_lock = threading.Lock()


def get_slot_batcher(char):
    """Lazy per-character SlotBatcher (in-flight continuous batching).

    Locked: two concurrent first requests must not each build a batcher
    (the loser would leak a scheduler thread and a full slot KV cache).
    """
    with _slot_batchers_lock:
        sb = _slot_batchers.get(char.name)
        if sb is None:
            from .runtime.slot_batcher import SlotBatcher

            # serving emits PCM16; int16 finisher fetches halve d2h bytes
            sb = SlotBatcher(engine, char, pcm16=True)
            _slot_batchers[char.name] = sb
        return sb


def _make_synth_fn(character_name: str, sampling: Optional[SamplingConfig] = None,
                   use_batcher: bool = False):
    """Build (synth, synth_stream) for one character.

    ``use_batcher``: route whole sentences through continuous batching so
    concurrent requests share the chip (the server's default /tts path;
    BASELINE config[4]). Default-sampling requests that fit the slot
    machine's static buckets take the in-flight slot batcher (join a
    running batch at the next ~W-step segment); others fall back to the
    window batcher. The stream fn stays direct — it's the solo
    intra-utterance-latency path.
    """
    char = model_manager.get(character_name)
    if char is None:
        raise ValueError(f"Character '{character_name}' is not loaded")
    ref_cfg = _reference_audios[character_name]
    from .models.sv import get_sv_fn

    feats = reference_audio_cache.get_features(
        engine, char, ref_cfg["audio_path"], ref_cfg["audio_text"],
        ref_cfg["language"], hubert_fn=_hubert_fn(),
        sv_fn=get_sv_fn() if char.version == "v2ProPlus" else None)

    def synth(sentence: str) -> Optional[np.ndarray]:
        # leading 。 guards against the model swallowing the first phrase
        # (reference behavior: Core/Inference.py:27)
        phones, bert = get_phones_and_bert("。" + sentence, char.language)
        if len(phones) == 0:
            return None
        if use_batcher:
            if engine.cfg.serve_slots:
                # custom sampling joins slots too: sampling parameters are
                # per-row state in the slot machine, not graph constants
                sb = get_slot_batcher(char)
                if sb.fits(feats, phones):
                    return sb.synthesize(feats, phones, bert,
                                         sampling=sampling)
            return get_batcher().synthesize(
                char, feats, phones, bert, sampling=sampling)
        return engine.synthesize_utterance(
            char, feats, phones, bert, sampling=sampling)

    def synth_stream(sentence: str):
        phones, bert = get_phones_and_bert("。" + sentence, char.language)
        if len(phones) == 0:
            return
        # Streaming route: the slot machine pumps window pieces PER-ROW,
        # so a streaming request can JOIN the shared machine and yield
        # pieces as pumps emit them — concurrent streams then share the
        # chip instead of each monopolizing a solo machine. Policy: slot
        # machine BUSY (or legacy all-pump mode) -> join it; idle -> the
        # solo segmented path below (lowest TTFA, device to itself).
        if engine.cfg.serve_slots:
            sb = get_slot_batcher(char)
            if sb.fits(feats, phones) and (
                    engine.cfg.slot_stream_finisher
                    or sb._occupied() or not sb._q.empty()):
                yield from sb.synthesize_stream(feats, phones, bert,
                                                sampling=sampling)
                return
        yield from engine.synthesize_utterance_stream(
            char, feats, phones, bert, sampling=sampling)

    return synth, synth_stream


def tts(character_name: str,
        text: str,
        play: bool = False,
        split_sentence: bool = True,
        save_path: Union[str, PathLike, None] = None,
        sampling: Optional[SamplingConfig] = None) -> None:
    """Blocking synthesis of ``text`` (optionally play / save)."""
    if character_name not in _reference_audios:
        logger.error("Call set_reference_audio first to set the reference audio.")
        return
    if save_path:
        save_path = os.fspath(save_path)
        parent = os.path.dirname(save_path)
        if parent:
            os.makedirs(parent, exist_ok=True)
    synth, _ = _make_synth_fn(character_name, sampling)
    tts_session.start_session(synth, play=play, split=split_sentence,
                              save_path=save_path)
    tts_session.feed(text)
    tts_session.end_session()
    tts_session.wait_for_tts_completion()


async def tts_async(character_name: str,
                    text: str,
                    play: bool = False,
                    split_sentence: bool = False,
                    save_path: Union[str, PathLike, None] = None,
                    sampling: Optional[SamplingConfig] = None
                    ) -> AsyncIterator[bytes]:
    """Async generator of PCM16 chunks (one per sentence)."""
    if character_name not in _reference_audios:
        raise ValueError("Call set_reference_audio first to set the reference audio.")
    if save_path:
        save_path = os.fspath(save_path)
        parent = os.path.dirname(save_path)
        if parent:
            os.makedirs(parent, exist_ok=True)

    stream_q: asyncio.Queue = asyncio.Queue()
    loop = asyncio.get_running_loop()

    def chunk_cb(chunk: Optional[bytes]) -> None:
        loop.call_soon_threadsafe(stream_q.put_nowait, chunk)

    synth, synth_stream = _make_synth_fn(character_name, sampling)
    session = session_registry.create()  # isolated: concurrent calls don't interleave
    session.start_session(synth, play=play, split=split_sentence,
                          save_path=save_path, chunk_callback=chunk_cb,
                          synth_stream_fn=synth_stream)
    session.feed(text)
    session.end_session()
    while True:
        chunk = await stream_q.get()
        if chunk is None:
            break
        yield chunk


def stop() -> None:
    tts_session.stop()
    session_registry.stop_all()


def wait_for_playback_done() -> None:
    tts_session.wait_for_playback_done()
    session_registry.wait_all()


# ---------------------------------------------------------------------------
# Conversion
# ---------------------------------------------------------------------------

def convert_model(torch_ckpt_path: Union[str, PathLike],
                  torch_pth_path: Union[str, PathLike],
                  output_dir: Union[str, PathLike],
                  language: str = "Japanese") -> None:
    """Convert GPT-SoVITS torch checkpoints to a character checkpoint dir."""
    try:
        import torch  # noqa: F401
    except ImportError:
        logger.error("PyTorch is not installed; conversion requires torch.")
        return
    from .convert.torch_convert import convert_character

    convert_character(os.fspath(torch_ckpt_path), os.fspath(torch_pth_path),
                      os.fspath(output_dir), language=language)


def convert_to_onnx(torch_ckpt_path, torch_pth_path, output_dir) -> None:
    """Reference-API-compatible alias of :func:`convert_model`.

    (This framework emits JAX safetensors checkpoints, not ONNX graphs.)
    """
    convert_model(torch_ckpt_path, torch_pth_path, output_dir)


# ---------------------------------------------------------------------------
# Predefined characters / shared data (HF Hub downloads; gated offline)
# ---------------------------------------------------------------------------

CHARA_LANG = {"mika": "Japanese", "feibi": "Chinese", "thirtyseven": "English"}
CHARA_ALIAS_MAP = {
    "mika": "mika", "美香": "mika", "みか": "mika",
    "feibi": "feibi", "菲比": "feibi",
    "thirtyseven": "thirtyseven", "37": "thirtyseven",
}
_PREDEFINED_REPO = "AkitoP/Genie-TTS-Characters"


def load_predefined_character(character_name: str) -> None:
    """Download + load a predefined character (needs network access)."""
    import json

    name = CHARA_ALIAS_MAP.get(character_name.lower().strip())
    if name is None:
        logger.error("No predefined character model found for %s", character_name)
        return
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        logger.error("huggingface_hub unavailable; cannot download characters.")
        return
    save_path = Path(snapshot_download(
        repo_id=_PREDEFINED_REPO, allow_patterns=[f"{name}/*"],
        local_dir=genie_data_dir() / "CharacterModels")) / name
    load_character(name, save_path / "tts_models", CHARA_LANG[name])
    manifest = json.loads((save_path / "prompt_wav.json").read_text())
    set_reference_audio(
        name,
        save_path / "prompt_wav" / manifest["Normal"]["wav"],
        manifest["Normal"]["text"],
        CHARA_LANG[name])


def download_genie_data() -> None:
    """Fetch shared models (HuBERT, RoBERTa, SV, G2P dicts) into GenieData."""
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        logger.error("huggingface_hub unavailable; place assets manually in %s",
                     genie_data_dir())
        return
    snapshot_download(repo_id="AkitoP/Genie-TTS-Data",
                      local_dir=genie_data_dir())


def start_server(host: str = "127.0.0.1", port: int = 8000,
                 workers: int = 1) -> None:
    from .server.http import start_server as _start

    _start(host=host, port=port, workers=workers)
