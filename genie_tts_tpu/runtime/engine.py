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
import functools
import logging
import os
import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RuntimeConfig, SoVITSConfig, T2SConfig
from ..models import sovits, t2s
from ..ops.audio import linear_spectrogram
from ..ops.sampling import SamplingConfig
from ..utils.metrics import metrics
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
    _ge_dev: Optional[jnp.ndarray] = None
    _ge_mrte_dev: Optional[jnp.ndarray] = None
    _prompts_dev: Optional[Dict] = None

    @property
    def ge_dev(self) -> jnp.ndarray:
        """Device-resident [1, gin, 1] (uploaded once, reused per utterance)."""
        if self._ge_dev is None:
            self._ge_dev = jnp.asarray(self.ge)[None]
        return self._ge_dev

    @property
    def ge_mrte_dev(self) -> jnp.ndarray:
        if self._ge_mrte_dev is None:
            self._ge_mrte_dev = jnp.asarray(self.ge_mrte)[None]
        return self._ge_mrte_dev

    def prompts_dev(self, bucket: int) -> jnp.ndarray:
        """Device-resident [1, bucket] padded prompt tokens, cached per
        bucket (prompt tokens never change for a reference clip)."""
        if self._prompts_dev is None:
            self._prompts_dev = {}
        if bucket not in self._prompts_dev:
            self._prompts_dev[bucket] = jnp.asarray(
                pad_to(self.prompt_tokens.astype(np.int32), bucket))[None]
        return self._prompts_dev[bucket]


def _to_pcm16(audio: jnp.ndarray) -> jnp.ndarray:
    """fp32 waveform -> int16 PCM on device (halves the d2h transfer; the
    serving output format is PCM16 anyway)."""
    return jnp.round(jnp.clip(audio, -1.0, 1.0) * 32767.0).astype(jnp.int16)


def _fit_codes(codes: jnp.ndarray, bucket: int) -> jnp.ndarray:
    if bucket < codes.shape[1]:
        return jax.lax.slice_in_dim(codes, 0, bucket, axis=1)
    if bucket > codes.shape[1]:
        return jnp.pad(codes, ((0, 0), (0, bucket - codes.shape[1])))
    return codes


def _pcm16_host(audio: np.ndarray) -> np.ndarray:
    """Host-side float -> int16 PCM (mirror of the on-device _to_pcm16)."""
    return np.round(np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)


def _t2s_and_vocode(t2s_params, sovits_params, tcfg, vcfg, scfg, key,
                    phones, bert, x_len, prompts, p_len, text, t_len,
                    ge, ge_mrte, noise_scale, max_steps, cache_len, min_steps,
                    use_flash=False, layer_unroll=1, codes_bucket=None,
                    pcm16=False, max_steps_dyn=None, vocode_chunk=0,
                    vocode_halo=0):
    """Whole utterance in one XLA program: T2S decode + SoVITS vocode.

    Zero host syncs mid-utterance. ``codes_bucket`` sizes the vocoder
    stage (defaults to ``max_steps``); for the EOS path the engine picks
    a bucket covering ``max_steps`` so actual length never exceeds it —
    padded frames are masked, and the caller trims to
    ``2 * codes_len * hop`` samples. ``pcm16``: emit int16 PCM.
    ``min_steps``/``max_steps_dyn`` are TRACED scalars (one compiled
    graph per static decode cap serves any step ladder). When
    ``vocode_chunk`` > 0 the vocode runs as in-graph halo chunks with
    invalid windows SKIPPED (sovits.vocode_frames_chunked) — work stays
    proportional to emitted length even with a coarse cap.
    """
    kg, ks = jax.random.split(key)
    codes, codes_len = t2s.generate_e2e(
        t2s_params, tcfg, scfg, kg, phones, bert, x_len, prompts, p_len,
        max_steps=max_steps, cache_len=cache_len, min_steps=min_steps,
        use_flash=use_flash, layer_unroll=layer_unroll,
        max_steps_dyn=max_steps_dyn)
    codes = _fit_codes(codes, codes_bucket or max_steps)
    if vocode_chunk:
        z = sovits.synthesize_latent(
            sovits_params, vcfg, ks, codes, codes_len, text, t_len,
            ge, ge_mrte, noise_scale)
        audio = sovits.vocode_frames_chunked(
            sovits_params, vcfg, z, ge, 2 * codes_len,
            chunk=vocode_chunk, halo=vocode_halo)
    else:
        audio = sovits.synthesize(
            sovits_params, vcfg, ks, codes, codes_len, text, t_len,
            ge, ge_mrte, noise_scale)
    if pcm16:
        audio = _to_pcm16(audio)
    return audio, codes_len


def _t2s_latent_first(t2s_params, sovits_params, tcfg, vcfg, scfg, key,
                      phones, bert, x_len, prompts, p_len, text, t_len,
                      ge, ge_mrte, noise_scale, max_steps, cache_len,
                      min_steps, layer_unroll, codes_bucket, first_window,
                      first_frames, use_flash=False, pcm16=False,
                      max_steps_dyn=None):
    """Streaming head: decode + latent + FIRST vocode chunk, one dispatch.

    Time-to-first-audio = (decode + latent + one small vocode window +
    one tunnel round trip) instead of paying a blocking sync per stage
    (each blocking RPC costs ~25 ms on tunneled TPU hosts). Returns
    (z latent [B, 2*codes_bucket, C] — stays on device for the remaining
    chunks, codes_len [B], first audio [B, first_frames*hop]).
    """
    kg, ks = jax.random.split(key)
    codes, codes_len = t2s.generate_e2e(
        t2s_params, tcfg, scfg, kg, phones, bert, x_len, prompts, p_len,
        max_steps=max_steps, cache_len=cache_len, min_steps=min_steps,
        use_flash=use_flash, layer_unroll=layer_unroll,
        max_steps_dyn=max_steps_dyn)
    codes = _fit_codes(codes, codes_bucket)
    z = sovits.synthesize_latent(
        sovits_params, vcfg, ks, codes, codes_len, text, t_len,
        ge, ge_mrte, noise_scale)
    zc = jax.lax.slice_in_dim(z, 0, min(first_window, z.shape[1]), axis=1)
    valid = jnp.clip(2 * codes_len, 0, zc.shape[1])
    a = sovits.vocode_frames(sovits_params, vcfg, zc, ge, valid)
    first = jax.lax.slice_in_dim(
        a, 0, min(first_frames * vcfg.hop_length, a.shape[1]), axis=1)
    if pcm16:
        first = _to_pcm16(first)
    return z, codes_len, first


def _enable_persistent_compile_cache() -> None:
    """Cache compiled XLA programs across processes (first compile of the
    full pipeline costs tens of seconds per graph on tunneled hosts).
    Opt out with GENIE_NO_COMPILE_CACHE=1.

    CPU backends are EXCLUDED: XLA:CPU cache entries are AOT machine code
    whose deserialization is feature-set sensitive — reading an entry
    produced with different CPU flags (or concurrently from a worker
    thread) segfaults the process inside
    ``compilation_cache.get_executable_and_time`` (observed twice,
    deterministically, in the test suite). CPU compiles are cheap; TPU
    keeps the cache where it saves tens of seconds per graph."""
    import os

    if os.environ.get("GENIE_NO_COMPILE_CACHE"):
        return
    # Gate on the RESOLVED backend, not the jax_platforms string: plugin
    # hosts list a cpu fallback after the accelerator (e.g. 'axon,cpu'),
    # and a substring test silently disabled the cache on the TPU — the
    # r3 49-second every-run cold start.
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - no devices at all
        return
    if backend == "cpu":
        return
    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.expanduser(f"~/.cache/genie_tts_tpu_xla_{backend}"))
            # persist EVERYTHING: on the tunneled backend even trivial
            # op-by-op graphs (broadcast, slice, convert) take ~0.45 s to
            # compile, and a serving warmup dispatches ~100 of them — the
            # default 1 s floor re-paid that tax every process (r5: 46 s
            # of a 303 s warmup was sub-second compiles)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
    except Exception:  # pragma: no cover - config name drift
        logger.debug("could not enable persistent compilation cache")


class TTSEngine:
    """Stateless-compute engine; all mutable state is the jit cache."""

    def __init__(self, runtime_cfg: Optional[RuntimeConfig] = None,
                 mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` with a dp axis. When
        set, ``synthesize_batch`` shards the batch dimension across the
        mesh (data-parallel serving over chips — BASELINE config[4]
        "continuous-batched multi-character serving on v5e-8"); weights
        must be replicated via :meth:`replicate_character`."""
        self.cfg = runtime_cfg or RuntimeConfig()
        self.mesh = mesh
        import os

        # GENIE_PLATFORM pins the JAX backend (the axon TPU plugin ignores
        # the standard JAX_PLATFORMS env var)
        platform = os.environ.get("GENIE_PLATFORM")
        if platform:
            try:
                jax.config.update("jax_platforms", platform)
            except RuntimeError:
                logger.warning("backend already initialized; GENIE_PLATFORM ignored")
        _enable_persistent_compile_cache()
        self._lock = threading.Lock()
        self._pe_apply = None   # lazy engine-lifetime jit of prompt_encoder
        self._rng = np.random.default_rng(0)
        # jitted stage functions (shared across characters; retrace only on
        # new bucket shapes)
        # min_steps / max_steps_dyn are TRACED: a step ladder (bench
        # 100/150/200, user max_steps) shares one compiled graph per
        # static decode cap (max_steps) — the r2 bench's 373 s compile
        # sweep was 3x this ladder
        self._generate = jax.jit(
            t2s.generate,
            static_argnames=("cfg", "scfg", "max_steps", "cache_len", "use_flash", "layer_unroll"),
        )
        self._generate_e2e = jax.jit(
            t2s.generate_e2e,
            static_argnames=("cfg", "scfg", "max_steps", "cache_len", "use_flash", "layer_unroll"),
        )
        self._embed_text = jax.jit(t2s.embed_text)
        self._extract_prompt = jax.jit(t2s.extract_prompt_tokens)
        self._synthesize = jax.jit(
            sovits.synthesize, static_argnames=("cfg",))
        self._latent = jax.jit(
            sovits.synthesize_latent, static_argnames=("cfg",))
        self._vocode = jax.jit(
            sovits.vocode_frames, static_argnames=("cfg",))

        def _vocode_pcm16(params, cfg, z, ge, valid):
            return _to_pcm16(sovits.vocode_frames(params, cfg, z, ge, valid))

        # int16 on device: the serving output format is PCM16 anyway, and
        # the d2h audio fetch rides a ~30 MB/s tunnel — half the bytes is
        # ~half the finisher's wall time (measured: the batched finisher
        # is TRANSFER-bound, not compute-bound; latent 4 ms + HiFi-GAN
        # 23 ms vs ~35 ms/MB of fetch)
        self._vocode_pcm = jax.jit(_vocode_pcm16, static_argnames=("cfg",))
        # window-pump stages (slot streaming finisher): per-row noise keys
        # + per-row window starts so rows at different emit positions
        # vocode as one batch
        self._latent_rows = jax.jit(
            sovits.synthesize_latent_rows,
            static_argnames=("cfg", "noise_frames"))

        def _vocode_window_rows16(params, cfg, z, ge, starts, fv, win,
                                  pcm16):
            a = sovits.vocode_window_rows(params, cfg, z, ge, starts, fv,
                                          win)
            return _to_pcm16(a) if pcm16 else a.astype(jnp.float32)

        self._vocode_window_rows = jax.jit(
            _vocode_window_rows16, static_argnames=("cfg", "win", "pcm16"))
        self._ref_embed = jax.jit(
            sovits.reference_embedding, static_argnames=("cfg",))
        self._fused = jax.jit(
            _t2s_and_vocode,
            static_argnames=("tcfg", "vcfg", "scfg", "max_steps", "cache_len",
                             "use_flash", "layer_unroll",
                             "codes_bucket", "pcm16", "vocode_chunk",
                             "vocode_halo"))
        self._fused_first = jax.jit(
            _t2s_latent_first,
            static_argnames=("tcfg", "vcfg", "scfg", "max_steps", "cache_len",
                             "layer_unroll", "codes_bucket",
                             "first_window", "first_frames", "use_flash",
                             "pcm16"))
        # device-side codes re-bucketing (static output length)
        self._slice_codes = jax.jit(
            lambda codes, n: jax.lax.slice_in_dim(codes, 0, n, axis=1),
            static_argnames=("n",))

    def _unroll(self, tcfg) -> int:
        """Decode layer unroll: 0 in config means full unroll (see
        RuntimeConfig.layer_unroll for the v5e measurements)."""
        return self.cfg.layer_unroll or tcfg.num_layers

    def _next_seed(self) -> int:
        """Thread-safe seed draw (np.random.Generator is not)."""
        with self._lock:
            return int(self._rng.integers(0, 2 ** 31 - 1))

    # -- data-parallel serving over a mesh ---------------------------------

    @property
    def _dp_size(self) -> int:
        if self.mesh is None:
            return 1
        return self.mesh.shape[self.cfg.dp_axis]

    def _dp_put(self, x):
        """Shard a batch-major array's leading axis over the dp mesh axis."""
        if self.mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(self.cfg.dp_axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def replicate_character(self, char: CharacterModel) -> CharacterModel:
        """Replicate a character's weights across the mesh (dp serving)."""
        if self.mesh is None:
            return char
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        char.t2s_params = jax.device_put(char.t2s_params, rep)
        char.sovits_params = jax.device_put(char.sovits_params, rep)
        if char.prompt_encoder_params is not None:
            char.prompt_encoder_params = jax.device_put(
                char.prompt_encoder_params, rep)
        return char

    def shard_character(self, char: CharacterModel) -> CharacterModel:
        """Tensor-parallel placement of a character over the mesh's tp
        axis: the T2S decoder's per-layer matmuls get Megatron shardings
        (QKV/FFN-in column-parallel, Out/FFN-out row-parallel —
        parallel/mesh.py; XLA inserts the all-reduces), everything else
        replicates. Every serving path (solo, batched, slots) then runs
        the decode tp-sharded — the jitted graphs are unchanged, GSPMD
        partitions them from the parameter shardings. Combine with a dp
        axis for 2D (batch x tensor) serving. Token parity vs replicated
        execution: tests/test_dp_serving.py."""
        if self.mesh is None or self.mesh.shape.get(self.cfg.tp_axis, 1) == 1:
            return self.replicate_character(char)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import shard_params

        char.t2s_params, _ = shard_params(char.t2s_params, self.mesh)
        rep = NamedSharding(self.mesh, P())
        char.sovits_params = jax.device_put(char.sovits_params, rep)
        if char.prompt_encoder_params is not None:
            char.prompt_encoder_params = jax.device_put(
                char.prompt_encoder_params, rep)
        return char

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

    def compute_v2pp_speaker_embedding(
        self, char: CharacterModel, audio_32k: np.ndarray, sv_emb: np.ndarray
    ) -> "Tuple[np.ndarray, np.ndarray]":
        """V2ProPlus path: prompt encoder (ref spec + sv_emb) -> (ge, ge_mrte).

        Reference behavior: ``Audio/ReferenceAudio.py:68-76``.
        """
        from ..models import prompt_encoder as pe

        cfg = char.sovits_cfg
        if char.prompt_encoder_params is None:
            raise RuntimeError(f"character '{char.name}' has no prompt encoder")
        spec = linear_spectrogram(
            jnp.asarray(audio_32k)[None], n_fft=cfg.n_fft, hop=cfg.hop_length,
            win_length=cfg.win_length)
        if self._pe_apply is None:
            # one engine-lifetime jit wrapper: a fresh jax.jit per call
            # would retrace + recompile for every new reference clip
            self._pe_apply = jax.jit(pe.apply)
        ge, ge_adv = self._pe_apply(char.prompt_encoder_params, spec,
                                    jnp.array([spec.shape[1]]),
                                    jnp.asarray(sv_emb)[None])
        return np.asarray(ge[0]), np.asarray(ge_adv[0])

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
        fixed_steps: Optional[int] = None,
        min_steps: int = 0,
        max_steps: Optional[int] = None,
        pcm16: bool = False,
    ) -> np.ndarray:
        """One sentence -> waveform [S] at 32 kHz (float32, or int16 when
        ``pcm16`` — the PCM conversion then runs on device and the d2h
        transfer is half the bytes; used by the serving/bench paths).

        ``min_steps``: EOS masked below this step count (0 = reference
        behavior). Used by benchmarks to exercise the realistic
        EOS-terminated decode path at controlled minimum lengths.

        Dispatch discipline (tunneled TPU hosts pay ~25 ms per blocking
        RPC): when the decode cap fits ``solo_fused_max_codes``, the WHOLE
        utterance (embed + prefill + decode + EOS finalize + latent +
        vocode + PCM) is ONE jitted dispatch followed by ONE
        ``jax.device_get`` — no mid-pipeline syncs at all. Above the cap,
        the staged path pays a single extra ``codes_len`` sync to size the
        vocoder bucket.
        """
        with metrics.timer("synthesize_utterance"):
            audio = self._synthesize_utterance(
                char, ref, text_phones, text_bert, sampling, seed,
                noise_scale, fixed_steps, min_steps, max_steps, pcm16)
        metrics.incr("utterances")
        metrics.observe("audio_seconds", len(audio) / char.sovits_cfg.sample_rate)
        return audio

    def _synthesize_utterance(self, char, ref, text_phones, text_bert,
                              sampling, seed, noise_scale, fixed_steps,
                              min_steps=0, max_steps=None, pcm16=False):
        scfg = sampling or SamplingConfig()
        tcfg = char.t2s_cfg
        vcfg = char.sovits_cfg
        if seed is None:
            seed = self._next_seed()

        # ---- T2S: pack [ref_text | text], single-dispatch generate
        phones = np.concatenate([ref.phones, text_phones]).astype(np.int32)
        x_bucket = pick_bucket(len(phones), self.cfg.phoneme_buckets)
        p_bucket = pick_bucket(len(ref.prompt_tokens), self.cfg.prompt_buckets)
        # clamp lengths to their buckets: beyond the largest bucket the data
        # is truncated (pad_to/prompts_dev), and an unclamped length would
        # mark unwritten cache positions valid in the attention masks
        x_len = min(len(phones), x_bucket)
        p_len = min(len(ref.prompt_tokens), p_bucket)
        max_steps = fixed_steps or max_steps or tcfg.max_decode_steps

        if np.any(ref.bert) or np.any(text_bert):
            bert = np.concatenate([ref.bert, text_bert]).astype(np.float32)
            bert_dev = pad_to(bert, x_bucket, axis=0)[None]
        else:
            bert_dev = None  # all-zero BERT built on device (JA/EN path)

        # single-dispatch fast path: T2S + vocoder in one XLA program with
        # ZERO mid-pipeline host syncs. Taken when the decode length is
        # pinned, or on the EOS path whenever the decode cap fits a frame
        # bucket small enough that vocoding the whole bucket is cheaper
        # than the sync + extra dispatches it saves (tunneled hosts pay
        # 20-40 ms per blocking round trip).
        # static decode cap: requests bucket onto the step_caps ladder;
        # actual min/max steps ride the dispatch as traced scalars (one
        # graph per cap serves the whole ladder). fixed_steps (tests,
        # dryruns) keeps a snug exact cap.
        cap = (fixed_steps if fixed_steps is not None
               else pick_bucket(max_steps, self.cfg.step_caps))
        if fixed_steps is not None or cap <= self.cfg.solo_fused_max_codes:
            t_bucket = pick_bucket(len(text_phones), self.cfg.phoneme_buckets)
            audio, codes_len = self._fused(
                char.t2s_params, char.sovits_params,
                tcfg=tcfg, vcfg=vcfg, scfg=scfg,
                key=jax.random.PRNGKey(seed),
                phones=pad_to(phones, x_bucket)[None], bert=bert_dev,
                x_len=np.array([x_len], np.int32),
                prompts=ref.prompts_dev(p_bucket),
                p_len=np.array([p_len], np.int32),
                text=pad_to(text_phones.astype(np.int32), t_bucket)[None],
                t_len=np.array([min(len(text_phones), t_bucket)], np.int32),
                ge=ref.ge_dev, ge_mrte=ref.ge_mrte_dev,
                noise_scale=noise_scale,
                max_steps=cap,
                cache_len=x_bucket + p_bucket + cap,
                min_steps=np.int32(fixed_steps if fixed_steps is not None
                                   else min_steps),
                max_steps_dyn=np.int32(max_steps),
                use_flash=self.cfg.use_flash_decode,
                layer_unroll=self._unroll(tcfg),
                codes_bucket=cap,
                vocode_chunk=self.cfg.vocode_chunk,
                vocode_halo=self.cfg.vocode_halo, pcm16=pcm16)
            # ONE blocking fetch for both buffers; trim on host (an
            # int(codes_len) -> device-slice -> fetch chain costs 2-3
            # extra ~25 ms round trips on tunneled hosts)
            a, n = jax.device_get((audio, codes_len))
            n_samples = 2 * int(n[0]) * vcfg.hop_length
            a = a[0, :n_samples]
            return a if pcm16 else np.asarray(a, np.float32)

        # numpy args ride the dispatch itself — no separate device_put RPCs
        k_gen, k_syn = jax.random.split(jax.random.PRNGKey(seed))
        codes, codes_len = self._generate_e2e(
            char.t2s_params, tcfg, scfg, k_gen,
            pad_to(phones, x_bucket)[None], bert_dev,
            np.array([x_len], np.int32),
            ref.prompts_dev(p_bucket),
            np.array([p_len], np.int32),
            max_steps=cap,
            cache_len=x_bucket + p_bucket + cap,
            min_steps=np.int32(min_steps),
            max_steps_dyn=np.int32(max_steps),
            use_flash=self.cfg.use_flash_decode,
            layer_unroll=self._unroll(tcfg),
        )

        # ---- SoVITS: bucket codes (host-side, codes are tiny), vocode, trim
        # (fixed_steps took the fused single-dispatch path above)
        codes_np, n_arr = jax.device_get((codes, codes_len))  # one sync
        n_codes = int(n_arr[0])
        if n_codes == 0:
            logger.warning("T2S produced no semantic tokens; returning silence")
            return np.zeros(0, np.int16 if pcm16 else np.float32)
        c_bucket = pick_bucket(n_codes, self.cfg.frame_buckets)
        codes_b = codes_np[:, :c_bucket] if c_bucket <= codes_np.shape[1] else \
            np.pad(codes_np, ((0, 0), (0, c_bucket - codes_np.shape[1])))
        t_bucket = pick_bucket(len(text_phones), self.cfg.phoneme_buckets)
        z = self._latent(
            char.sovits_params, vcfg, k_syn,
            codes_b, n_arr,
            pad_to(text_phones.astype(np.int32), t_bucket)[None],
            np.array([min(len(text_phones), t_bucket)], np.int32),
            ref.ge_dev, ref.ge_mrte_dev,
            noise_scale,
        )
        audio = self._vocode_audio(char, z, ref.ge_dev, n_arr)
        n_samples = 2 * n_codes * vcfg.hop_length
        audio = audio[0, :n_samples].astype(np.float32)
        return _pcm16_host(audio) if pcm16 else audio

    def vocode_codes(
        self,
        char: CharacterModel,
        ref: ReferenceFeatures,
        text_phones: np.ndarray,
        codes: np.ndarray,
        seed: int = 0,
        noise_scale: float = 0.5,
        pcm16: bool = False,
    ) -> np.ndarray:
        """Semantic codes -> waveform for one utterance.

        Tail of the pipeline for callers that ran T2S themselves (the slot
        batcher decodes many requests in one shared loop and vocodes each
        as it finishes). ``codes``: [n] int32 finalized semantic tokens.
        """
        return self.vocode_codes_batch(
            char, [(ref, text_phones, codes)], seed=seed,
            noise_scale=noise_scale, pcm16=pcm16)[0]

    def vocode_codes_batch(
        self,
        char: CharacterModel,
        items: "list[tuple[ReferenceFeatures, np.ndarray, np.ndarray]]",
        seed: int = 0,
        noise_scale: float = 0.5,
        b_buckets: "Optional[tuple]" = None,
        t_buckets: "Optional[tuple]" = None,
        pcm16: bool = False,
    ) -> "list[np.ndarray]":
        """Batched codes -> waveform tail (dispatch + fetch in one call)."""
        handle = self.vocode_codes_dispatch(char, items, seed=seed,
                                            noise_scale=noise_scale,
                                            b_buckets=b_buckets,
                                            t_buckets=t_buckets, pcm16=pcm16)
        return self.vocode_codes_fetch(handle)

    def vocode_codes_dispatch(
        self,
        char: CharacterModel,
        items: "list[tuple[ReferenceFeatures, np.ndarray, np.ndarray]]",
        seed: int = 0,
        noise_scale: float = 0.5,
        b_buckets: "Optional[tuple]" = None,
        t_buckets: "Optional[tuple]" = None,
        pcm16: bool = False,
    ):
        """Async half of the batched codes -> waveform tail.

        Rows finishing in the same slot segment vocode as ONE latent +
        HiFi-GAN dispatch chain — per-row solo vocoding was the slot
        batcher's dominant serving cost (each row pays its own dispatch +
        fetch round trips). Dispatch (which may COMPILE) is kept on the
        caller's thread; the returned handle is fetched anywhere via
        :meth:`vocode_codes_fetch` (XLA:CPU segfaults if a compile races
        other threads' compute). ``b_buckets`` overrides the batch-pad
        ladder.
        """
        vcfg = char.sovits_cfg
        B = len(items)
        lens = np.array([len(c) for (_, _, c) in items], np.int32)
        if B == 0 or int(lens.max()) == 0:
            empty = np.zeros((B, 0), np.int16 if pcm16 else np.float32)
            return ([jnp.asarray(empty)], [(0, 0)], lens, vcfg.hop_length)
        B_pad = max(pick_bucket(B, b_buckets or self.cfg.batch_buckets), B)
        items = list(items) + [items[0]] * (B_pad - B)
        lens = np.concatenate([lens, lens[:1].repeat(B_pad - B)])
        c_bucket = pick_bucket(int(lens.max()), self.cfg.frame_buckets)
        lens = np.minimum(lens, c_bucket)   # truncated past the ladder
        codes_b = np.stack([
            pad_to(c[:c_bucket].astype(np.int32), c_bucket)
            for (_, _, c) in items])
        t_lens = np.array([len(tp) for (_, tp, _) in items], np.int32)
        t_bucket = pick_bucket(int(t_lens.max()),
                               t_buckets or self.cfg.phoneme_buckets)
        t_lens = np.minimum(t_lens, t_bucket)
        text_b = np.stack([pad_to(tp.astype(np.int32), t_bucket)
                           for (_, tp, _) in items])
        ge_b = jnp.concatenate([r.ge_dev for (r, _, _) in items], axis=0)
        gm_b = jnp.concatenate([r.ge_mrte_dev for (r, _, _) in items], axis=0)
        z = self._latent(
            char.sovits_params, vcfg, jax.random.PRNGKey(seed),
            codes_b, lens, text_b, t_lens, ge_b, gm_b, noise_scale)
        pieces, spans = self._vocode_dispatch(char, z, ge_b, lens,
                                              pcm16=pcm16)
        metrics.incr("utterances", B)
        return (pieces, spans, lens[:B], vcfg.hop_length)

    def vocode_codes_fetch(self, handle) -> "list[np.ndarray]":
        """Blocking half of the codes->waveform tail: fetch + assemble.

        Safe to call from worker threads — it only reads device buffers
        (device_get), never dispatches jitted calls (XLA:CPU segfaults
        when a compile races other threads' compute; all compiles happen
        in the dispatch half, which schedulers run on one thread)."""
        pieces, spans, lens, hop = handle
        audio = self._vocode_assemble(pieces, spans)
        if audio.dtype != np.int16:
            audio = audio.astype(np.float32)
        return [audio[i, : 2 * int(lens[i]) * hop] for i in range(len(lens))]

    def vocode_windows_dispatch(self, char: CharacterModel, rows,
                                win: int, pcm16: bool = False,
                                noise_scale: float = 0.5,
                                b_buckets=None, t_buckets=None,
                                codes_dev=None):
        """Async per-row WINDOW vocode (the slot batcher's window pump).

        ``rows``: list of ``(ref, text_phones, codes_np, count, key,
        start_frame, out_frames)`` — vocode ``out_frames`` of row audio
        beginning at latent frame ``start_frame`` from the row's prefix
        latent over ``codes_np[:count]``. ``key`` is the request's
        PER-ROW flow-noise key (prefix-stable across pumps; see
        sovits.synthesize_latent_rows). Rows at different emit positions
        batch into ONE latent + ONE window dispatch; fetch the handle
        with :meth:`vocode_windows_fetch`.

        ``codes_dev``: optional [len(rows), fb] DEVICE codes overriding
        the rows' ``codes_np`` (which may then be None). Lets the slot
        scheduler vocode a first piece from an IN-FLIGHT segment's token
        buffer without waiting for the tokens to round-trip to the host
        (speculative first-piece dispatch; fb must match this method's
        bucket choice for the rows' counts).
        """
        vcfg = char.sovits_cfg
        B = len(rows)
        halo = self.cfg.vocode_halo
        B_pad = max(pick_bucket(B, b_buckets or self.cfg.batch_buckets), B)
        rows = list(rows) + [rows[0]] * (B_pad - B)
        lens = np.array([r[3] for r in rows], np.int32)
        # fb >= win/2 so the window slice always fits the latent grid
        fb = pick_bucket(max(int(lens.max()), -(-win // 2)),
                         self.cfg.frame_buckets)
        if int(lens.max()) > fb:
            # a row decoded past the largest frame bucket: its window
            # starts would advance beyond the bucketed latent and the
            # fetch would return silently-truncated audio. Configs keep
            # slot_ring <= max(frame_buckets); fail loudly if they drift.
            raise ValueError(
                f"window vocode row has {int(lens.max())} latent frames > "
                f"largest frame bucket {fb}; raise frame_buckets or lower "
                "slot_ring/max_steps")
        lens = np.minimum(lens, fb)
        if codes_dev is not None:
            # pre-padded to the batch bucket and pre-clipped by the
            # caller's jit: no op-by-op glue here (each first-shape
            # dispatch costs a ~0.45 s compile on the tunneled backend)
            if codes_dev.shape != (B_pad, fb):
                raise ValueError(
                    f"codes_dev shape {codes_dev.shape} != ({B_pad}, {fb})"
                    " — the caller must pad device codes to this method's"
                    " batch/frame buckets")
            codes_b = codes_dev
        else:
            codes_b = np.stack([
                pad_to(np.clip(c[:fb], 0, vcfg.vq_codes - 1)
                       .astype(np.int32), fb)
                for (_, _, c, *_rest) in rows])
        t_lens = np.array([len(tp) for (_, tp, *_r) in rows], np.int32)
        t_bucket = pick_bucket(int(t_lens.max()),
                               t_buckets or self.cfg.phoneme_buckets)
        t_lens = np.minimum(t_lens, t_bucket)
        text_b = np.stack([pad_to(tp.astype(np.int32), t_bucket)
                           for (_, tp, *_r) in rows])
        ge_b = jnp.concatenate([r[0].ge_dev for r in rows], axis=0)
        gm_b = jnp.concatenate([r[0].ge_mrte_dev for r in rows], axis=0)
        keys_b = jnp.stack([jnp.asarray(r[4]) for r in rows])
        z = self._latent_rows(
            char.sovits_params, vcfg, keys_b, codes_b, lens, text_b,
            t_lens, ge_b, gm_b, noise_scale)
        F = 2 * fb
        win = min(win, F)   # tiny ladders: window covers the whole grid
        starts = np.array([r[5] for r in rows], np.int32)
        s0 = np.clip(starts - halo, 0, F - win).astype(np.int32)
        fv = 2 * lens
        audio = self._vocode_window_rows(
            char.sovits_params, vcfg, z, ge_b, jnp.asarray(s0),
            jnp.asarray(fv), win=win, pcm16=pcm16)
        hop = vcfg.hop_length
        offs = (starts - s0) * hop
        widths = np.array([r[6] for r in rows], np.int32) * hop
        return (audio, offs, widths, B)

    @staticmethod
    def vocode_windows_fetch(handle) -> "list[np.ndarray]":
        """Blocking half of the window pump (worker-thread safe: fetch
        only, no jit dispatch)."""
        audio, offs, widths, B = handle
        a = jax.device_get(audio)
        return [a[i, offs[i]: offs[i] + widths[i]] for i in range(B)]

    def _vocode_dispatch(self, char: CharacterModel, z, ge, codes_len,
                         pcm16: bool = False):
        """Async half of chunked HiFi-GAN: dispatch all windows, no sync.

        z [B, F, 192] -> (pieces [device arrays], spans). Chunked so memory
        stays bounded at any utterance length. ``pcm16``: emit int16 on
        device (halves the d2h transfer — the batched finisher is
        transfer-bound on tunneled hosts).
        """
        vcfg = char.sovits_cfg
        B, F, _ = z.shape
        hop = vcfg.hop_length
        chunk, halo = self.cfg.vocode_chunk, self.cfg.vocode_halo
        vocode = self._vocode_pcm if pcm16 else self._vocode
        frames_valid = 2 * codes_len                      # device [B]
        if F <= chunk + 2 * halo:
            a = vocode(char.sovits_params, vcfg, z, ge, frames_valid)
            return [a], [(0, F * hop)]
        pieces, spans = [], []
        for start in range(0, F, chunk):
            s0 = max(start - halo, 0)
            s1 = min(start + chunk + halo, F)
            zc = jax.lax.slice_in_dim(z, s0, s1, axis=1)
            valid = jnp.clip(frames_valid - s0, 0, s1 - s0)
            pieces.append(vocode(char.sovits_params, vcfg, zc, ge, valid))
            spans.append(((start - s0) * hop, min(chunk, F - start) * hop))
        return pieces, spans

    @staticmethod
    def _vocode_assemble(pieces, spans) -> np.ndarray:
        # all chunk dispatches are in flight; fetch them in ONE blocking RPC
        # and trim the halos on host (a device-slice + per-piece fetch chain
        # costs a ~25 ms tunnel round trip per chunk)
        arrs = jax.device_get(pieces)
        return np.concatenate(
            [a[:, off: off + n] for a, (off, n) in zip(arrs, spans)], axis=1)

    def _vocode_audio(self, char: CharacterModel, z, ge, codes_len) -> np.ndarray:
        """Chunked HiFi-GAN over the latent (dispatch + fetch)."""
        return self._vocode_assemble(*self._vocode_dispatch(char, z, ge,
                                                            codes_len))

    def synthesize_utterance_stream(
        self,
        char: CharacterModel,
        ref: ReferenceFeatures,
        text_phones: np.ndarray,
        text_bert: np.ndarray,
        sampling: Optional[SamplingConfig] = None,
        seed: Optional[int] = None,
        noise_scale: float = 0.5,
        min_steps: int = 0,
        max_steps: Optional[int] = None,
        pcm16: bool = False,
    ):
        """Generator of waveform chunks for one sentence (intra-utterance
        streaming): yields ~``vocode_chunk``-frame pieces as the chunked
        HiFi-GAN completes them.

        The head of the stream (decode + latent + FIRST vocode window) is
        ONE fused dispatch followed by ONE blocking fetch, so
        time-to-first-audio = decode + latent + one small vocode window +
        one tunnel round trip. Remaining chunks are sized exactly to the
        emitted length and fetched one blocking RPC each (they overlap the
        device computing subsequent chunks).

        With ``cfg.stream_segmented`` (default), requests that fit the
        stream geometry route to the SEGMENTED path (runtime/stream.py):
        decode runs in W-step segments and the first chunk is vocoded
        from the first segment's codes — TTFA length-independent."""
        import time as _time

        if self.cfg.stream_segmented:
            from .stream import fits_stream, synthesize_stream_segments

            if fits_stream(self.cfg, ref, text_phones):
                yield from synthesize_stream_segments(
                    self, char, ref, text_phones, text_bert,
                    sampling=sampling, seed=seed, noise_scale=noise_scale,
                    min_steps=min_steps, max_steps=max_steps, pcm16=pcm16)
                return

        t_start = _time.perf_counter()
        scfg = sampling or SamplingConfig()
        tcfg, vcfg = char.t2s_cfg, char.sovits_cfg
        if seed is None:
            seed = self._next_seed()

        phones = np.concatenate([ref.phones, text_phones]).astype(np.int32)
        x_bucket = pick_bucket(len(phones), self.cfg.phoneme_buckets)
        p_bucket = pick_bucket(len(ref.prompt_tokens), self.cfg.prompt_buckets)
        x_len = min(len(phones), x_bucket)       # truncated past the ladder
        p_len = min(len(ref.prompt_tokens), p_bucket)
        max_steps = max_steps or tcfg.max_decode_steps
        if np.any(ref.bert) or np.any(text_bert):
            bert = np.concatenate([ref.bert, text_bert]).astype(np.float32)
            bert_dev = pad_to(bert, x_bucket, axis=0)[None]
        else:
            bert_dev = None

        hop = vcfg.hop_length
        chunk, halo = self.cfg.vocode_chunk, self.cfg.vocode_halo
        first = min(self.cfg.stream_first_chunk, chunk)
        cap = pick_bucket(max_steps, self.cfg.step_caps)
        c_bucket = cap
        F = 2 * c_bucket
        t_bucket = pick_bucket(len(text_phones), self.cfg.phoneme_buckets)

        z, codes_len, first_audio = self._fused_first(
            char.t2s_params, char.sovits_params,
            tcfg=tcfg, vcfg=vcfg, scfg=scfg,
            key=jax.random.PRNGKey(seed),
            phones=pad_to(phones, x_bucket)[None], bert=bert_dev,
            x_len=np.array([x_len], np.int32),
            prompts=ref.prompts_dev(p_bucket),
            p_len=np.array([p_len], np.int32),
            text=pad_to(text_phones.astype(np.int32), t_bucket)[None],
            t_len=np.array([min(len(text_phones), t_bucket)], np.int32),
            ge=ref.ge_dev, ge_mrte=ref.ge_mrte_dev, noise_scale=noise_scale,
            max_steps=cap, cache_len=x_bucket + p_bucket + cap,
            min_steps=np.int32(min_steps),
            max_steps_dyn=np.int32(max_steps),
            use_flash=self.cfg.use_flash_decode,
            layer_unroll=self._unroll(tcfg),
            codes_bucket=c_bucket, first_window=min(first + halo, F),
            first_frames=first, pcm16=pcm16)
        n_arr, first_np = jax.device_get((codes_len, first_audio))
        n_codes = int(n_arr[0])
        if n_codes == 0:
            return
        total_valid = 2 * n_codes
        emitted = min(first, total_valid)
        metrics.observe("ttfa", _time.perf_counter() - t_start)
        yield first_np[0, : emitted * hop]

        # remaining chunks: dispatch over the valid region only, then
        # fetch in order (fetch of chunk i overlaps compute of i+1..)
        jobs = []
        for start in range(first, total_valid, chunk):
            s0 = max(start - halo, 0)
            s1 = min(start + chunk + halo, F)
            zc = jax.lax.slice_in_dim(z, s0, s1, axis=1)
            valid = np.array([min(max(total_valid - s0, 0), s1 - s0)], np.int32)
            a = self._vocode(char.sovits_params, vcfg, zc, ref.ge_dev, valid)
            n_frames = min(chunk, total_valid - start)
            jobs.append((a, (start - s0) * hop, n_frames))
        for a, off, n_frames in jobs:
            arr = jax.device_get(a)
            piece = arr[0, off: off + n_frames * hop]
            piece = (_pcm16_host(piece) if pcm16
                     else np.asarray(piece, np.float32))
            emitted += n_frames
            yield piece
        metrics.incr("utterances")
        metrics.observe("synthesize_utterance", _time.perf_counter() - t_start)
        metrics.observe("audio_seconds", emitted * hop / vcfg.sample_rate)

    def synthesize_pipelined(
        self,
        char: CharacterModel,
        ref: ReferenceFeatures,
        items: "list[tuple[np.ndarray, np.ndarray]]",
        sampling: Optional[SamplingConfig] = None,
        seed: int = 0,
        noise_scale: float = 0.5,
        fixed_steps: Optional[int] = None,
        window: int = 4,
    ) -> "list[np.ndarray]":
        """Sequential utterances with dispatch-ahead pipelining.

        JAX dispatch is asynchronous: the host enqueues utterance i+1's
        whole program while the device still runs utterance i, then fetches
        results with a bounded in-flight ``window``. Device utilization
        approaches 100% without batching — the single-client serving mode.
        """
        scfg = sampling or SamplingConfig()
        tcfg, vcfg = char.t2s_cfg, char.sovits_cfg
        max_steps = fixed_steps or tcfg.max_decode_steps
        cap = (fixed_steps if fixed_steps is not None
               else pick_bucket(max_steps, self.cfg.step_caps))
        p_bucket = pick_bucket(len(ref.prompt_tokens), self.cfg.prompt_buckets)
        p_len = min(len(ref.prompt_tokens), p_bucket)

        in_flight: "list[tuple[object, object]]" = []
        out: "list[np.ndarray]" = []

        def fetch_one():
            a, n = jax.device_get(in_flight.pop(0))  # one blocking RPC
            out.append(np.asarray(
                a[0, : 2 * int(n[0]) * vcfg.hop_length], np.float32))

        for i, (text_phones, text_bert) in enumerate(items):
            phones = np.concatenate([ref.phones, text_phones]).astype(np.int32)
            x_bucket = pick_bucket(len(phones), self.cfg.phoneme_buckets)
            x_len = min(len(phones), x_bucket)
            t_bucket = pick_bucket(len(text_phones), self.cfg.phoneme_buckets)
            if np.any(ref.bert) or np.any(text_bert):
                bert_dev = pad_to(np.concatenate([ref.bert, text_bert]).astype(
                    np.float32), x_bucket, axis=0)[None]
            else:
                bert_dev = None
            audio, codes_len = self._fused(
                char.t2s_params, char.sovits_params,
                tcfg=tcfg, vcfg=vcfg, scfg=scfg,
                key=jax.random.PRNGKey(seed + i),
                phones=pad_to(phones, x_bucket)[None], bert=bert_dev,
                x_len=np.array([x_len], np.int32),
                prompts=ref.prompts_dev(p_bucket),
                p_len=np.array([p_len], np.int32),
                text=pad_to(text_phones.astype(np.int32), t_bucket)[None],
                t_len=np.array([min(len(text_phones), t_bucket)], np.int32),
                ge=ref.ge_dev, ge_mrte=ref.ge_mrte_dev,
                noise_scale=noise_scale,
                max_steps=cap,
                cache_len=x_bucket + p_bucket + cap,
                min_steps=np.int32(fixed_steps or 0),
                max_steps_dyn=np.int32(max_steps),
                use_flash=self.cfg.use_flash_decode,
                layer_unroll=self._unroll(tcfg),
                codes_bucket=cap,
                vocode_chunk=self.cfg.vocode_chunk,
                vocode_halo=self.cfg.vocode_halo)
            in_flight.append((audio, codes_len))
            if len(in_flight) >= window:
                fetch_one()
        while in_flight:
            fetch_one()
        return out

    def synthesize_batch(
        self,
        char: CharacterModel,
        items: "list[tuple[ReferenceFeatures, np.ndarray, np.ndarray]]",
        sampling: Optional[SamplingConfig] = None,
        seed: Optional[int] = None,
        noise_scale: float = 0.5,
        fixed_steps: Optional[int] = None,
        min_steps: int = 0,
        max_steps: Optional[int] = None,
    ) -> "list[np.ndarray]":
        """Batched synthesis for continuous serving.

        ``items``: [(ref_features, text_phones, text_bert)] — heterogeneous
        lengths batch together via per-row masks (the packed-layout design
        of models/t2s.py). One T2S dispatch + one vocoder dispatch for the
        whole batch.
        """
        scfg = sampling or SamplingConfig()
        tcfg, vcfg = char.t2s_cfg, char.sovits_cfg
        if seed is None:
            seed = self._next_seed()
        k_gen, k_syn = jax.random.split(jax.random.PRNGKey(seed))
        B = len(items)
        # pad the batch dimension to a bucket (replicated rows, outputs
        # sliced back to B) so any arrival count hits a compiled program;
        # under dp serving, also to a multiple of the mesh's dp extent
        B_pad = max(pick_bucket(B, self.cfg.batch_buckets), B)
        dp = self._dp_size
        B_pad = -(-B_pad // dp) * dp
        items = list(items) + [items[0]] * (B_pad - B)

        phones_rows, bert_rows, prompt_rows, text_rows = [], [], [], []
        any_bert = False
        for ref, tp, tb in items:
            phones_rows.append(np.concatenate([ref.phones, tp]).astype(np.int32))
            bert_rows.append(np.concatenate([ref.bert, tb]).astype(np.float32))
            prompt_rows.append(ref.prompt_tokens.astype(np.int32))
            text_rows.append(tp.astype(np.int32))
            any_bert = any_bert or bool(np.any(ref.bert)) or bool(np.any(tb))

        x_lens = np.array([len(p) for p in phones_rows], np.int32)
        p_lens = np.array([len(p) for p in prompt_rows], np.int32)
        t_lens = np.array([len(t) for t in text_rows], np.int32)
        x_bucket = pick_bucket(int(x_lens.max()), self.cfg.phoneme_buckets)
        p_bucket = pick_bucket(int(p_lens.max()), self.cfg.prompt_buckets)
        t_bucket = pick_bucket(int(t_lens.max()), self.cfg.phoneme_buckets)
        # clamp: rows beyond the largest bucket are truncated by pad_to, and
        # unclamped lengths would validate unwritten cache positions
        x_lens = np.minimum(x_lens, x_bucket)
        p_lens = np.minimum(p_lens, p_bucket)
        t_lens = np.minimum(t_lens, t_bucket)
        max_steps = fixed_steps or max_steps or tcfg.max_decode_steps
        cap = (fixed_steps if fixed_steps is not None
               else pick_bucket(max_steps, self.cfg.step_caps))

        phones_b = np.stack([pad_to(p, x_bucket) for p in phones_rows])
        prompts_b = np.stack([pad_to(p, p_bucket) for p in prompt_rows])
        bert_b = (self._dp_put(np.stack([pad_to(b, x_bucket, axis=0)
                                         for b in bert_rows]))
                  if any_bert else None)

        codes, codes_len = self._generate_e2e(
            char.t2s_params, tcfg, scfg, k_gen,
            self._dp_put(phones_b), bert_b, self._dp_put(x_lens),
            self._dp_put(prompts_b), self._dp_put(p_lens),
            max_steps=cap, cache_len=x_bucket + p_bucket + cap,
            min_steps=np.int32(fixed_steps or min_steps),
            max_steps_dyn=np.int32(max_steps),
            use_flash=self.cfg.use_flash_decode,
            layer_unroll=self._unroll(tcfg),
        )
        lens = np.asarray(codes_len)
        c_bucket = pick_bucket(int(max(lens.max(), 1)), self.cfg.frame_buckets)
        codes_b = (self._slice_codes(codes, n=c_bucket)
                   if c_bucket < codes.shape[1]
                   else jnp.pad(codes, ((0, 0), (0, c_bucket - codes.shape[1]))))
        text_b = self._dp_put(np.stack([pad_to(t, t_bucket) for t in text_rows]))
        ge_b = self._dp_put(
            jnp.concatenate([ref.ge_dev for ref, _, _ in items], axis=0))
        gm_b = self._dp_put(
            jnp.concatenate([ref.ge_mrte_dev for ref, _, _ in items], axis=0))
        z = self._latent(
            char.sovits_params, vcfg, k_syn, codes_b, codes_len,
            text_b, self._dp_put(t_lens), ge_b, gm_b, noise_scale)
        audio = self._vocode_audio(char, z, ge_b, codes_len)
        metrics.incr("utterances", B)
        return [audio[i, : 2 * int(lens[i]) * vcfg.hop_length].astype(np.float32)
                for i in range(B)]

    def _run_compile_units(self, units) -> int:
        """Execute AOT compile thunks — concurrently off-CPU.

        ``jit.lower(...).compile()`` traces under the GIL but compiles in
        C++ with the GIL released, so a thread pool overlaps the XLA
        compiles (measured: the serial sweep was 373 s on v5e). XLA:CPU
        is excluded — concurrent CPU compiles have segfaulted on this
        stack (see tests/conftest.py forensics); CPU warmups run serially.
        """
        if jax.default_backend() == "cpu" or len(units) <= 1:
            for u in units:
                u()
            return len(units)
        from concurrent.futures import ThreadPoolExecutor

        workers = min(8, os.cpu_count() or 8)
        with ThreadPoolExecutor(max_workers=workers,
                                thread_name_prefix="warmup") as ex:
            for _ in ex.map(lambda u: u(), units):
                pass
        return len(units)

    def warmup(self, char: CharacterModel, ref: ReferenceFeatures,
               sweep: bool = False) -> int:
        """Compile the steady-state graphs ahead of serving.

        ``sweep=False``: one synthesis (the smallest bucket combination).
        ``sweep=True``: AOT-compile (``jit(...).lower().compile()``, no
        execution) every bucket-ladder graph the serving path can hit —
        T2S decode per phoneme bucket (with and without BERT features),
        SoVITS latent per (frame, text) bucket, HiFi-GAN vocode windows,
        the batched finisher ladder, and (when slot serving is on) the
        slot machine's prefill/insert/segment graphs — so a cold server
        never stalls multi-seconds on a mid-request compile. Compiles run
        CONCURRENTLY off-CPU (:meth:`_run_compile_units`). Returns the
        number of graphs compiled; with the persistent compile cache,
        reruns are near-instant.
        """
        if not sweep:
            phones = np.zeros(8, np.int32)
            bert = np.zeros((8, char.t2s_cfg.bert_dim), np.float32)
            self.synthesize_utterance(char, ref, phones, bert, seed=0)
            return 1
        tcfg, vcfg = char.t2s_cfg, char.sovits_cfg
        scfg = SamplingConfig()
        key = jax.random.PRNGKey(0)
        p_bucket = pick_bucket(len(ref.prompt_tokens), self.cfg.prompt_buckets)
        prompts = jnp.zeros((1, p_bucket), jnp.int32)
        ones = jnp.ones((1,), jnp.int32)
        units = []
        use_bert = ("chinese" in char.language.lower()
                    or "hybrid" in char.language.lower()
                    or char.language.lower() in ("zh", "zh_en"))
        max_steps = pick_bucket(tcfg.max_decode_steps, self.cfg.step_caps)
        c_bucket = max_steps
        first = min(self.cfg.stream_first_chunk, self.cfg.vocode_chunk)
        first_window = min(first + self.cfg.vocode_halo, 2 * c_bucket)
        ge = jnp.zeros((1, vcfg.gin_channels, 1), jnp.float32)
        gm = jnp.zeros((1, vcfg.mrte_channels, 1), jnp.float32)

        def unit(fn, *args, **kwargs):
            units.append(lambda: fn.lower(*args, **kwargs).compile())

        for xb in self.cfg.phoneme_buckets:
            berts = [None] + ([jnp.zeros((1, xb, tcfg.bert_dim),
                                         jnp.float32)] if use_bert else [])
            for bert in berts:
                unit(self._generate_e2e,
                     char.t2s_params, tcfg, scfg, key,
                     jnp.zeros((1, xb), jnp.int32), bert, ones,
                     prompts, ones, max_steps=max_steps,
                     cache_len=xb + p_bucket + max_steps,
                     min_steps=np.int32(0),
                     max_steps_dyn=np.int32(max_steps),
                     use_flash=self.cfg.use_flash_decode,
                     layer_unroll=self._unroll(tcfg))
                # streaming head (decode+latent+first chunk fused);
                # text bucket <= packed bucket always
                for tb in self.cfg.phoneme_buckets:
                    if tb > xb:
                        continue
                    unit(self._fused_first,
                         char.t2s_params, char.sovits_params,
                         tcfg=tcfg, vcfg=vcfg, scfg=scfg, key=key,
                         phones=jnp.zeros((1, xb), jnp.int32), bert=bert,
                         x_len=ones, prompts=prompts, p_len=ones,
                         text=jnp.zeros((1, tb), jnp.int32), t_len=ones,
                         ge=ge, ge_mrte=gm, noise_scale=0.5,
                         max_steps=max_steps,
                         cache_len=xb + p_bucket + max_steps,
                         min_steps=np.int32(0),
                         max_steps_dyn=np.int32(max_steps),
                         layer_unroll=self._unroll(tcfg),
                         codes_bucket=c_bucket,
                         first_window=first_window, first_frames=first,
                         use_flash=self.cfg.use_flash_decode,
                         pcm16=False)
                    if max_steps > self.cfg.solo_fused_max_codes:
                        continue
                    # the fused solo path actually serves at this cap:
                    # cover it too (serving emits PCM16)
                    unit(self._fused,
                         char.t2s_params, char.sovits_params,
                         tcfg=tcfg, vcfg=vcfg, scfg=scfg, key=key,
                         phones=jnp.zeros((1, xb), jnp.int32), bert=bert,
                         x_len=ones, prompts=prompts, p_len=ones,
                         text=jnp.zeros((1, tb), jnp.int32), t_len=ones,
                         ge=ge, ge_mrte=gm, noise_scale=0.5,
                         max_steps=max_steps,
                         cache_len=xb + p_bucket + max_steps,
                         min_steps=np.int32(0),
                         max_steps_dyn=np.int32(max_steps),
                         use_flash=self.cfg.use_flash_decode,
                         layer_unroll=self._unroll(tcfg),
                         codes_bucket=c_bucket,
                         vocode_chunk=self.cfg.vocode_chunk,
                         vocode_halo=self.cfg.vocode_halo, pcm16=True)
        for fb in self.cfg.frame_buckets:
            for tb in self.cfg.phoneme_buckets:
                unit(self._latent,
                     char.sovits_params, vcfg, key,
                     jnp.zeros((1, fb), jnp.int32), ones,
                     jnp.zeros((1, tb), jnp.int32), ones,
                     ge, gm, 0.5)
        # HiFi-GAN windows the chunked vocoder dispatches
        chunk, halo = self.cfg.vocode_chunk, self.cfg.vocode_halo
        widths = {2 * fb for fb in self.cfg.frame_buckets
                  if 2 * fb <= chunk + 2 * halo}
        widths |= {chunk + halo, chunk + 2 * halo,
                   min(self.cfg.stream_first_chunk, chunk) + halo}
        for w in sorted(widths):
            unit(self._vocode,
                 char.sovits_params, vcfg,
                 jnp.zeros((1, w, vcfg.inter_channels), jnp.float32),
                 ge, ones)
        if self.cfg.serve_slots:
            from .slot_batcher import slot_warmup_units

            units.extend(slot_warmup_units(self, char, pcm16=True))
        if self.cfg.stream_segmented:
            from .stream import stream_warmup_units

            units.extend(stream_warmup_units(self, char, pcm16=True))
        with metrics.timer("warmup_sweep"):
            n = self._run_compile_units(units)
        logger.info("warmup sweep compiled %d graphs", n)
        return n

    def finisher_warmup_units(self, char: CharacterModel, t_buckets=None,
                              pcm16: bool = False) -> list:
        """AOT thunks for the batched codes->waveform tail
        (:meth:`vocode_codes_dispatch`): ``_latent`` at every
        (batch, frame, text) bucket the finisher can hit plus the
        HiFi-GAN windows at every batch bucket. ``t_buckets`` narrows the
        text ladder (the slot batcher pins ONE text bucket so its
        finisher key space stays small)."""
        vcfg = char.sovits_cfg
        key = jax.random.PRNGKey(0)
        units = []
        t_buckets = tuple(t_buckets or self.cfg.phoneme_buckets)
        chunk, halo = self.cfg.vocode_chunk, self.cfg.vocode_halo
        vocode = self._vocode_pcm if pcm16 else self._vocode
        for b in self.cfg.batch_buckets:
            lens = jnp.ones((b,), jnp.int32)
            ge = jnp.zeros((b, vcfg.gin_channels, 1), jnp.float32)
            gm = jnp.zeros((b, vcfg.mrte_channels, 1), jnp.float32)
            widths = set()
            for fb in self.cfg.frame_buckets:
                for tb in t_buckets:
                    units.append(functools.partial(
                        lambda *a: self._latent.lower(*a).compile(),
                        char.sovits_params, vcfg, key,
                        jnp.zeros((b, fb), jnp.int32), lens,
                        jnp.zeros((b, tb), jnp.int32), lens, ge, gm, 0.5))
                # windows _vocode_dispatch slices out of z [b, 2*fb, :]
                F = 2 * fb
                if F <= chunk + 2 * halo:
                    widths.add(F)
                else:
                    for start in range(0, F, chunk):
                        s0 = max(start - halo, 0)
                        widths.add(min(start + chunk + halo, F) - s0)
            for w in sorted(widths):
                units.append(functools.partial(
                    lambda *a: vocode.lower(*a).compile(),
                    char.sovits_params, vcfg,
                    jnp.zeros((b, w, vcfg.inter_channels), jnp.float32),
                    ge, lens))
        return units

    def window_warmup_units(self, char: CharacterModel, wins,
                            t_bucket: int, pcm16: bool = False) -> list:
        """AOT thunks for the slot window pump
        (:meth:`vocode_windows_dispatch`): per-row-key prefix latents at
        every (batch, frame>=win/2) bucket plus the fixed-width window
        vocode at every batch bucket."""
        vcfg = char.sovits_cfg
        zdt = char.sovits_params["quantizer_embed"].dtype
        units = []
        keyp = jax.random.PRNGKey(0)
        for b in self.cfg.batch_buckets:
            keys = jnp.stack([keyp] * b)
            lens = jnp.ones((b,), jnp.int32)
            ge = jnp.zeros((b, vcfg.gin_channels, 1), jnp.float32)
            gm = jnp.zeros((b, vcfg.mrte_channels, 1), jnp.float32)
            for fb in self.cfg.frame_buckets:
                if 2 * fb < min(wins):
                    continue
                units.append(functools.partial(
                    lambda *a: self._latent_rows.lower(*a).compile(),
                    char.sovits_params, vcfg, keys,
                    jnp.zeros((b, fb), jnp.int32), lens,
                    jnp.zeros((b, t_bucket), jnp.int32), lens, ge, gm, 0.5))
                for win in wins:
                    if 2 * fb < win:
                        continue
                    units.append(functools.partial(
                        lambda b_, fb_, ge_, w_:
                        self._vocode_window_rows.lower(
                            char.sovits_params, vcfg,
                            jax.ShapeDtypeStruct((b_, 2 * fb_,
                                                  vcfg.inter_channels), zdt),
                            ge_, jax.ShapeDtypeStruct((b_,), jnp.int32),
                            jax.ShapeDtypeStruct((b_,), jnp.int32),
                            win=w_, pcm16=pcm16).compile(), b, fb, ge, win))
        return units


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
    eos_boost: float = 1.0,
    int8: bool = False,
) -> CharacterModel:
    """Random-weight character for tests/benchmarks.

    ``eos_boost``: scale on the EOS column of the predict layer. Random
    weights give EOS no statistical edge — the AR loop settles into a
    quasi-fixed point and (measured on v5e) essentially never emits EOS,
    so every decode runs to the 500-step cap. Boosting the EOS logit
    variance makes termination stochastic at realistic utterance lengths
    (~1.6 -> ~1%/step once EOS is unmasked), exercising the real
    EOS-terminated variable-length serving path."""
    tcfg = t2s_cfg or T2SConfig()
    vcfg = sovits_cfg or SoVITSConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    # jit the initializers: one dispatch for the whole tree instead of one
    # per leaf (the per-op tunnel latency makes eager init minutes-slow)
    t2s_init = jax.jit(t2s.init_params, static_argnames=("cfg", "dtype"))
    sovits_init = jax.jit(sovits.init_params, static_argnames=("cfg", "dtype"))
    t2s_params = t2s_init(k1, cfg=tcfg, dtype=dtype)
    if eos_boost != 1.0:
        w = t2s_params["predict"]["w"]
        col = w[:, tcfg.eos_id] * eos_boost
        t2s_params["predict"]["w"] = w.at[:, tcfg.eos_id].set(col)
    if int8:
        t2s_params = t2s.quantize_params(t2s_params)
    return CharacterModel(
        name=name, language=language, version=vcfg.version,
        t2s_params=t2s_params,
        sovits_params=sovits_init(k2, cfg=vcfg, dtype=dtype),
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
