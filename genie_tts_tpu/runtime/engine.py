"""TTS inference engine: jitted model stages + static-shape bucketing.

Orchestrates the full synthesis pipeline (the role of
``/root/reference/src/genie_tts/Core/Inference.py:16-109``, where the
reference drives 4-5 ONNX sessions with a <=500-iteration host loop):

  phones+bert (host G2P) -> [bucket] -> T2S prefill + on-device AR decode
  -> semantic codes -> [bucket] -> SoVITS synthesize -> 32 kHz waveform.

Every stage is a jitted function keyed only by bucket shape, so steady-state
serving never recompiles. Reference-audio features (HuBERT SSL -> VQ prompt
tokens, V2 style embedding / V2ProPlus prompt-encoder embeddings) are
computed once per reference clip and cached by the model manager layer.
"""
from __future__ import annotations

import dataclasses
import logging
import threading
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RuntimeConfig, SoVITSConfig, T2SConfig
from ..models import sovits, t2s
from ..ops.audio import linear_spectrogram
from ..ops.sampling import SamplingConfig
from .buckets import pad_to, pick_bucket

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class CharacterModel:
    """Loaded weights for one character (t2s + sovits [+ prompt encoder])."""
    name: str
    language: str
    version: str                    # "v2" | "v2ProPlus"
    t2s_params: Dict
    sovits_params: Dict
    t2s_cfg: T2SConfig
    sovits_cfg: SoVITSConfig
    prompt_encoder_params: Optional[Dict] = None


@dataclasses.dataclass
class ReferenceFeatures:
    """Per-reference-clip features (cached; reference parity:
    ``Audio/ReferenceAudio.py:28-76``)."""
    phones: np.ndarray              # [Tr] int32 phoneme ids of the transcript
    bert: np.ndarray                # [Tr, 1024] fp32
    prompt_tokens: np.ndarray       # [Tp] int32 semantic VQ tokens
    ge: np.ndarray                  # [gin, 1] speaker embedding (flow/dec)
    ge_mrte: np.ndarray             # [512, 1] speaker embedding (MRTE)


class TTSEngine:
    """Stateless-compute engine; all mutable state is the jit cache."""

    def __init__(self, runtime_cfg: Optional[RuntimeConfig] = None):
        self.cfg = runtime_cfg or RuntimeConfig()
        self._lock = threading.Lock()
        self._rng = np.random.default_rng(0)
        # jitted stage functions (shared across characters; retrace only on
        # new bucket shapes)
        self._generate = jax.jit(
            t2s.generate,
            static_argnames=("cfg", "scfg", "max_steps", "cache_len", "min_steps"),
        )
        self._embed_text = jax.jit(t2s.embed_text)
        self._extract_prompt = jax.jit(t2s.extract_prompt_tokens)
        self._synthesize = jax.jit(
            sovits.synthesize, static_argnames=("cfg",))
        self._ref_embed = jax.jit(
            sovits.reference_embedding, static_argnames=("cfg",))

    # -- reference feature extraction ------------------------------------

    def compute_prompt_tokens(self, char: CharacterModel, ssl_content: np.ndarray) -> np.ndarray:
        """HuBERT features [T,768] -> semantic prompt ids [T//2]."""
        toks = self._extract_prompt(char.t2s_params, jnp.asarray(ssl_content)[None])
        return np.asarray(toks[0])

    def compute_v2_speaker_embedding(
        self, char: CharacterModel, audio_32k: np.ndarray
    ) -> np.ndarray:
        """V2 path: ref waveform -> linear spec -> MelStyleEncoder -> ge."""
        cfg = char.sovits_cfg
        spec = linear_spectrogram(
            jnp.asarray(audio_32k)[None], n_fft=cfg.n_fft, hop=cfg.hop_length,
            win_length=cfg.win_length)
        ge = self._ref_embed(char.sovits_params, cfg, spec,
                             jnp.array([spec.shape[1]]))
        return np.asarray(ge[0])

    # -- synthesis --------------------------------------------------------

    def synthesize_utterance(
        self,
        char: CharacterModel,
        ref: ReferenceFeatures,
        text_phones: np.ndarray,
        text_bert: np.ndarray,
        sampling: Optional[SamplingConfig] = None,
        seed: Optional[int] = None,
        noise_scale: float = 0.5,
    ) -> np.ndarray:
        """One sentence -> float32 waveform [S] at 32 kHz."""
        scfg = sampling or SamplingConfig()
        tcfg = char.t2s_cfg
        if seed is None:
            seed = int(self._rng.integers(0, 2 ** 31 - 1))
        key = jax.random.PRNGKey(seed)

        # ---- T2S: pack [ref_text | text] + prompt, bucket, decode
        phones = np.concatenate([ref.phones, text_phones]).astype(np.int32)
        bert = np.concatenate([ref.bert, text_bert]).astype(np.float32)
        x_len = len(phones)
        x_bucket = pick_bucket(x_len, self.cfg.phoneme_buckets)
        p_len = len(ref.prompt_tokens)
        p_bucket = pick_bucket(p_len, self.cfg.prompt_buckets)

        x = self._embed_text(
            char.t2s_params,
            jnp.asarray(pad_to(phones, x_bucket))[None],
            jnp.asarray(pad_to(bert, x_bucket, axis=0))[None],
        )
        k_gen, k_syn = jax.random.split(key)
        res = self._generate(
            char.t2s_params, tcfg, scfg, k_gen,
            x, jnp.array([x_len]),
            jnp.asarray(pad_to(ref.prompt_tokens.astype(np.int32), p_bucket))[None],
            jnp.array([p_len]),
            max_steps=tcfg.max_decode_steps,
            cache_len=x_bucket + p_bucket + tcfg.max_decode_steps,
        )
        codes = t2s.finalize_semantic_tokens(res.tokens, res.counts, tcfg.eos_id)[0]
        if len(codes) == 0:
            logger.warning("T2S produced no semantic tokens; returning silence")
            return np.zeros(0, np.float32)

        # ---- SoVITS: bucket codes + text, vocode, trim
        scfg_v = char.sovits_cfg
        c_bucket = pick_bucket(len(codes), self.cfg.frame_buckets)
        t_bucket = pick_bucket(len(text_phones), self.cfg.phoneme_buckets)
        audio = self._synthesize(
            char.sovits_params, scfg_v, k_syn,
            jnp.asarray(pad_to(codes.astype(np.int32), c_bucket))[None],
            jnp.array([len(codes)]),
            jnp.asarray(pad_to(text_phones.astype(np.int32), t_bucket))[None],
            jnp.array([len(text_phones)]),
            jnp.asarray(ref.ge)[None], jnp.asarray(ref.ge_mrte)[None],
            noise_scale,
        )
        n_samples = 2 * len(codes) * scfg_v.hop_length
        return np.asarray(audio[0, :n_samples], dtype=np.float32)

    def warmup(self, char: CharacterModel, ref: ReferenceFeatures) -> None:
        """Compile the steady-state bucket set ahead of serving."""
        phones = np.zeros(8, np.int32)
        bert = np.zeros((8, char.t2s_cfg.bert_dim), np.float32)
        self.synthesize_utterance(char, ref, phones, bert, seed=0)


# ---------------------------------------------------------------------------
# Random character factory (tests / benchmarks)
# ---------------------------------------------------------------------------

def make_random_character(
    name: str = "random",
    language: str = "Japanese",
    seed: int = 0,
    t2s_cfg: Optional[T2SConfig] = None,
    sovits_cfg: Optional[SoVITSConfig] = None,
    dtype=jnp.bfloat16,
) -> CharacterModel:
    tcfg = t2s_cfg or T2SConfig()
    vcfg = sovits_cfg or SoVITSConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return CharacterModel(
        name=name, language=language, version=vcfg.version,
        t2s_params=t2s.init_params(k1, tcfg, dtype=dtype),
        sovits_params=sovits.init_params(k2, vcfg, dtype=dtype),
        t2s_cfg=tcfg, sovits_cfg=vcfg,
    )


def make_random_reference(
    char: CharacterModel,
    engine: TTSEngine,
    ref_seconds: float = 5.0,
    seed: int = 0,
) -> ReferenceFeatures:
    """Build reference features from white-noise audio + dummy transcript."""
    rng = np.random.default_rng(seed)
    sr = char.sovits_cfg.sample_rate
    audio_32k = (rng.standard_normal(int(ref_seconds * sr)) * 0.05).astype(np.float32)
    # stand-in HuBERT features at 50 Hz (real path: models/hubert.py)
    n_frames = int(ref_seconds * 50)
    ssl = rng.standard_normal((n_frames, char.t2s_cfg.ssl_dim)).astype(np.float32)
    prompt_tokens = engine.compute_prompt_tokens(char, ssl)
    ge = engine.compute_v2_speaker_embedding(char, audio_32k)
    n_ref_phones = 12
    return ReferenceFeatures(
        phones=rng.integers(1, char.t2s_cfg.phoneme_vocab, n_ref_phones).astype(np.int32),
        bert=np.zeros((n_ref_phones, char.t2s_cfg.bert_dim), np.float32),
        prompt_tokens=prompt_tokens,
        ge=ge,
        ge_mrte=ge[: char.sovits_cfg.mrte_channels],
    )
