"""Character/model manager: LRU-cached weights + shared model singletons.

Capability parity with the reference ModelManager
(``/root/reference/src/genie_tts/ModelManager.py:117-324``): LRU cache of
per-character model weights (capacity ``Max_Cached_Character_Models``, 3),
lazy global HuBERT, self-healing reload of evicted characters, model-dir
validation with actionable errors. ONNX sessions are replaced by param
pytrees on device; fp16-on-disk dequantization happens inside
``convert/io.load_params``.
"""
from __future__ import annotations

import logging
import threading
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax

from ..config import (HubertConfig, RobertaConfig, RuntimeConfig, SoVITSConfig,
                      T2SConfig, hubert_dir, roberta_dir)
from ..utils.lru import LRUCache
from .engine import CharacterModel

logger = logging.getLogger(__name__)

REQUIRED_FILES = ("t2s.safetensors", "vits.safetensors", "config.json")
V2PP_FILES = ("prompt_encoder.safetensors",)


def check_model_dir(model_dir) -> Dict:
    """Validate a character checkpoint directory; returns its config."""
    from ..convert.io import load_character_config

    path = Path(model_dir)
    if not path.is_dir():
        raise FileNotFoundError(
            f"Model directory '{model_dir}' does not exist or is not a directory.")
    missing = [f for f in REQUIRED_FILES if not (path / f).is_file()]
    if missing:
        raise FileNotFoundError(
            f"\n[genie-tts-tpu] Invalid model directory: '{path}'\n"
            f"Missing files: {', '.join(missing)}\n"
            f"A valid character checkpoint contains:\n"
            f"  - t2s.safetensors   (text-to-semantic GPT weights)\n"
            f"  - vits.safetensors  (SoVITS synthesizer weights)\n"
            f"  - config.json       (version/language metadata)\n"
            f"  - prompt_encoder.safetensors  (V2ProPlus only)\n"
            f"Produce one with genie_tts_tpu.convert_model(ckpt, pth, out_dir).")
    cfg = load_character_config(path / "config.json")
    if cfg.get("version") == "v2ProPlus":
        missing = [f for f in V2PP_FILES if not (path / f).is_file()]
        if missing:
            raise FileNotFoundError(
                f"V2ProPlus model at '{path}' missing: {', '.join(missing)}")
    return cfg


class ModelManager:
    def __init__(self, runtime_cfg: Optional[RuntimeConfig] = None):
        self.cfg = runtime_cfg or RuntimeConfig()
        self._lock = threading.RLock()
        self._cache: LRUCache[str, CharacterModel] = LRUCache(
            self.cfg.max_cached_characters,
            on_evict=lambda name, _: logger.info("evicted character '%s'", name))
        # name -> (model_dir, language) for self-healing reload after evict
        self._registry: Dict[str, Tuple[str, str]] = {}
        self._hubert: Optional[Tuple[Dict, HubertConfig]] = None
        self._roberta = None          # (params, cfg, tokenizer) when loaded
        self._roberta_tried = False

    # -- characters -------------------------------------------------------

    def load_character(self, name: str, model_dir: str, language: str,
                       compute_dtype=None) -> CharacterModel:
        """``compute_dtype``: device dtype for non-sensitive weights
        (default bf16 — the TPU serving dtype; fp32 for CPU parity runs)."""
        import jax.numpy as jnp

        from ..convert.io import load_params as _load_params

        dtype = compute_dtype or jnp.bfloat16

        def load_params(p):
            return _load_params(p, compute_dtype=dtype)

        cfg = check_model_dir(model_dir)
        version = cfg.get("version", "v2")
        path = Path(model_dir)
        # config.json may override model hyperparameters (tiny/test models,
        # future GPT-SoVITS variants); tuple-typed fields arrive as lists
        import dataclasses as _dc

        def _deep_tuple(v):
            return tuple(_deep_tuple(x) for x in v) if isinstance(v, list) else v

        def _cfg(cls, overrides, **defaults):
            fields = {f.name for f in _dc.fields(cls)}
            kw = dict(defaults)
            for k, v in (overrides or {}).items():
                if k in fields:
                    kw[k] = _deep_tuple(v)
            return cls(**kw)

        t2s_params = load_params(path / "t2s.safetensors")
        if self.cfg.t2s_int8:
            from ..models.t2s import quantize_params

            t2s_params = quantize_params(t2s_params)
        sovits_cfg = _cfg(
            SoVITSConfig, cfg.get("sovits"), version=version,
            gin_channels=1024 if version == "v2ProPlus" else 512)
        sovits_params = load_params(path / "vits.safetensors")
        import jax

        if self.cfg.hifi_fold and jax.default_backend() == "tpu":
            # fold the HiFi-GAN tail into space-to-channel form so its
            # low-channel convs run on the MXU (config.hifi_fold docs)
            from ..models.sovits import fold_decoder

            sovits_params["dec"] = fold_decoder(
                sovits_params["dec"], sovits_cfg, start_stage=2,
                r0=self.cfg.hifi_fold)
        with self._lock:
            model = CharacterModel(
                name=name, language=language, version=version,
                t2s_params=t2s_params,
                sovits_params=sovits_params,
                t2s_cfg=_cfg(T2SConfig, cfg.get("t2s")),
                sovits_cfg=sovits_cfg,
                prompt_encoder_params=(
                    load_params(path / "prompt_encoder.safetensors")
                    if version == "v2ProPlus" else None),
            )
            self._cache.put(name, model)
            self._registry[name] = (str(model_dir), language)
            logger.info("loaded character '%s' (%s, %s)", name, version, language)
            return model

    def register(self, model: CharacterModel) -> None:
        """Insert an already-built model (tests, random characters)."""
        with self._lock:
            self._cache.put(model.name, model)

    def get(self, name: str) -> Optional[CharacterModel]:
        with self._lock:
            model = self._cache.get(name)
            if model is not None:
                return model
            if name in self._registry:  # evicted: self-heal reload
                model_dir, language = self._registry[name]
                logger.info("reloading evicted character '%s'", name)
                return self.load_character(name, model_dir, language)
            return None

    def remove_character(self, name: str) -> None:
        with self._lock:
            self._cache.pop(name)
            self._registry.pop(name, None)

    # -- shared models ----------------------------------------------------

    def load_hubert(self) -> Optional[Tuple[Dict, HubertConfig]]:
        """Lazy global HuBERT (reference: ``ModelManager.load_cn_hubert``)."""
        with self._lock:
            if self._hubert is not None:
                return self._hubert
            from ..convert.io import load_params

            path = hubert_dir() / "hubert.safetensors"
            if not path.is_file():
                logger.warning("HuBERT checkpoint not found at %s; reference-"
                               "audio SSL features unavailable", path)
                return None
            cfg = HubertConfig()
            self._hubert = (load_params(path), cfg)
            return self._hubert

    def set_hubert(self, params: Dict, cfg: HubertConfig) -> None:
        """Inject HuBERT weights (tests / preloaded)."""
        with self._lock:
            self._hubert = (params, cfg)

    def load_roberta(self):
        """Lazy global RoBERTa + tokenizer for Chinese BERT features
        (reference: ``ModelManager.load_roberta_model``). Installs the
        per-phoneme feature hook into the G2P dispatcher. Returns the
        (params, cfg, tokenizer) triple or None when assets are missing."""
        with self._lock:
            if self._roberta is not None:
                return self._roberta
            if self._roberta_tried:
                return None
            self._roberta_tried = True
            root = roberta_dir()
            ckpt = root / "roberta.safetensors"
            tok_path = root / "tokenizer.json"
            if not (ckpt.is_file() and tok_path.is_file()):
                logger.warning(
                    "RoBERTa assets not found at %s; Chinese BERT features "
                    "will be zero (pronunciation unaffected, prosody degrades)",
                    root)
                return None
            from ..convert.io import load_params
            from tokenizers import Tokenizer

            self._roberta = (load_params(ckpt), RobertaConfig(),
                             Tokenizer.from_file(str(tok_path)))
            self._install_bert_hook()
            return self._roberta

    def set_roberta(self, params: Dict, cfg: RobertaConfig, tokenizer) -> None:
        """Inject RoBERTa weights + tokenizer (tests / preloaded)."""
        with self._lock:
            self._roberta = (params, cfg, tokenizer)
            self._install_bert_hook()

    def _install_bert_hook(self) -> None:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ..frontend.dispatcher import set_bert_feature_fn
        from ..models import roberta as roberta_model
        from .buckets import pad_to, pick_bucket

        params, cfg, tokenizer = self._roberta
        apply = jax.jit(roberta_model.phone_features,
                        static_argnames=("cfg", "max_phones"))
        buckets = self.cfg.phoneme_buckets

        def bert_fn(norm_text: str, word2ph) -> np.ndarray:
            enc = tokenizer.encode(norm_text)
            ids = np.asarray(enc.ids, np.int32)
            mask = np.asarray(enc.attention_mask, np.int32)
            n_chars = len(ids) - 2  # CLS/SEP stripped in the graph
            reps = np.asarray(word2ph, np.int32)
            if len(reps) != n_chars:
                # tokenizer/char mismatch (rare unicode): zero features
                return np.zeros((int(sum(word2ph)), cfg.embed_dim), np.float32)
            total = int(reps.sum())
            max_phones = pick_bucket(total, buckets)
            # static shapes: pad tokens + repeats to the bucket ladder
            tok_bucket = pick_bucket(len(ids), buckets)
            out = apply(params,
                        pad_to(ids, tok_bucket)[None],
                        pad_to(mask, tok_bucket)[None],
                        pad_to(reps, tok_bucket - 2),
                        cfg=cfg, max_phones=max_phones)
            return np.asarray(out[:total], np.float32)

        set_bert_feature_fn(bert_fn)


model_manager = ModelManager()
