"""Configuration layer: model hyperparameters + runtime flags.

Replaces the reference's scattered env-var reads
(``/root/reference/src/genie_tts/Core/Resources.py:30-65``,
``ModelManager.py:119``, ``Audio/ReferenceAudio.py:14-15``) with typed
dataclasses. All env vars honored by the reference keep working.

Model hyperparameters describe GPT-SoVITS V2 / V2ProPlus checkpoints
(decoder geometry recoverable from the reference's ONNX key manifests,
``/root/reference/src/genie_tts/Data/v2/Keys/t2s_onnx_keys.txt`` /
``vits_onnx_keys.txt``).
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional, Tuple


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class T2SConfig:
    """Text-to-semantic GPT decoder (AR transformer)."""
    phoneme_vocab: int = 732          # GPT-SoVITS V2 symbol table size
    semantic_vocab: int = 1025        # 1024 codes + EOS (id 1024)
    embed_dim: int = 512
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 2048
    bert_dim: int = 1024
    ssl_dim: int = 768            # HuBERT feature width (encoder prompt path)
    eos_id: int = 1024
    max_decode_steps: int = 500       # reference cap: Core/Inference.py:95

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


@dataclasses.dataclass(frozen=True)
class SoVITSConfig:
    """VITS/SoVITS synthesizer (text encoder + MRTE, RVQ, flow, HiFi-GAN)."""
    spec_channels: int = 1025         # n_fft 2048 -> 1025 bins
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6                 # text-encoder attention layers (split 3+3 around MRTE)
    kernel_size: int = 3
    mrte_channels: int = 512          # MRTE cross-attention width
    ssl_dim: int = 768                # HuBERT feature dim
    vq_codes: int = 1024
    vq_dim: int = 768
    gin_channels: int = 512           # speaker embedding width
    # flow
    flow_layers: int = 4              # residual coupling layers (flows 0,2,4,6)
    wn_layers: int = 4
    wn_kernel: int = 5
    # HiFi-GAN generator
    upsample_rates: Tuple[int, ...] = (10, 8, 2, 2, 2)   # hop 640 @ 32 kHz
    upsample_kernels: Tuple[int, ...] = (16, 16, 8, 2, 2)
    upsample_initial: int = 512
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    sample_rate: int = 32000
    hop_length: int = 640
    n_fft: int = 2048
    win_length: int = 2048
    semantic_frame_rate: int = 25     # Hz; upsampled 2x to 50 Hz latent frames
    version: str = "v2"               # "v2" | "v2ProPlus"
    # v2ProPlus additions
    sv_dim: int = 20480               # speaker-verification embedding


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    """chinese-hubert-base SSL feature extractor."""
    conv_dims: Tuple[int, ...] = (512,) * 7
    conv_strides: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernels: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    sample_rate: int = 16000


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    """chinese-roberta-wwm-ext-large for per-phoneme BERT features."""
    vocab_size: int = 21128
    embed_dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    max_position: int = 512
    type_vocab: int = 2
    feature_layer: int = -3           # third-to-last hidden state


# ---------------------------------------------------------------------------
# Runtime config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Execution knobs: precision, bucketing, mesh, caches."""
    # Precision: weights bf16 on device, fp32 for LayerNorm/VQ/flow-sensitive math.
    compute_dtype: str = "bfloat16"
    # Static-shape buckets so jitted graphs never recompile.
    phoneme_buckets: Tuple[int, ...] = (32, 64, 128, 256)
    prompt_buckets: Tuple[int, ...] = (128, 256, 512)
    kv_cache_len: int = 1024          # prompt (<=500) + decode (<=500) headroom
    # 192 exists for the serving band: EOS at typical sentence lengths
    # lands at 130-210 codes, and padding those to 256 wasted ~20% of
    # every finisher vocode (latent + HiFi-GAN + d2h scale with the
    # BUCKET, not the actual length — r5 measurement)
    frame_buckets: Tuple[int, ...] = (64, 128, 192, 256, 512)
    # STATIC decode-cap ladder. The actual per-call min/max decode steps
    # are traced scalars (t2s.generate max_steps_dyn), so every request
    # whose cap rounds to the same bucket shares ONE compiled decode
    # graph; the caps only bound buffer sizes (tokens/Gumbel/KV/codes).
    step_caps: Tuple[int, ...] = (64, 128, 256, 512)
    # batch-dimension ladder: continuous batching pads B up to a bucket so
    # arbitrary arrival counts reuse a handful of compiled programs
    batch_buckets: Tuple[int, ...] = (1, 2, 4, 8)
    decode_block: int = 16            # while_loop unroll block for EOS checks
    # Decode layer-loop unroll. 0 = full unroll (all 24 layers inlined in
    # the while_loop body). Measured on v5e: full unroll nearly HALVES the
    # per-step decode cost at B=1 (1.49 -> 0.81 ms/step) and cuts B=8 from
    # 9.7 to 3.4 ms/step — the lax.scan over (layers, caches) materializes
    # stacked cache outputs every step, which unrolling eliminates.
    # Compile time stays ~10 s/graph. GENIE_LAYER_UNROLL overrides.
    layer_unroll: int = dataclasses.field(
        default_factory=lambda: _env_int("GENIE_LAYER_UNROLL", 0))
    # Weight-only int8 quantization of the T2S decoder's per-layer matmuls
    # (symmetric per-output-channel; models/t2s.py::quantize_params). The
    # B=1 AR decode streams 24 x 6.3 MB of weights per step; int8 halves
    # the bytes — measured 2.2x per decode step on v5e. Applied at
    # character-load time by the model manager. GENIE_T2S_INT8=0 restores
    # full-precision decode weights.
    t2s_int8: bool = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "GENIE_T2S_INT8", "1").lower() not in ("0", "false", "off"))
    # In-flight (slot) continuous batching — models/slots.py +
    # runtime/slot_batcher.py. A persistent slot_batch-slot decode machine
    # advances slot_steps tokens per dispatch; requests join free slots
    # between dispatches (join latency = one segment, not one batch). The
    # slot machine's shapes are static: packed phonemes <= the phoneme
    # bucket, prompts <= the prompt bucket, decode ring slot_ring tokens
    # (rounded up to a slot_steps multiple). per-request min/max steps are
    # dynamic per-row values — no ladder recompiles.
    slot_batch: int = 8
    slot_steps: int = 32
    slot_ring: int = 512
    slot_phoneme_bucket: int = 192
    slot_prompt_bucket: int = 192
    # Finisher pooling: finished rows wait up to slot_finisher_wait_segs
    # decode segments (or until slot_finisher_batch rows collect) so the
    # codes->waveform tail vocodes at batch>1. Measured v5e finisher cost:
    # 108/93/68/43 ms per utterance at B=1/2/4/8 — pooling more than pays
    # for the <=2-segment (~74 ms) wait under concurrent load; an idle
    # machine flushes immediately so solo latency is unaffected.
    slot_finisher_batch: int = 4
    slot_finisher_wait_segs: int = 2
    # Windowed KV reads for the slot decode (models/slots.py): each
    # segment's attention streams only the first ctx_window >= max row
    # x_len+p_len context columns and the last ring_window >= max row
    # keys_written ring writes, instead of the whole padded cache (decode
    # is KV-read bound at the serving geometry: ~352 MB/step of bf16 KV
    # at 8x896; measured -0.22 ms/step for a 256-column ring window).
    # The scheduler picks the smallest ladder entries covering the active
    # rows per dispatch; when EITHER dimension exceeds its ladder it
    # falls back to the full cache read (so the reachable graph set stays
    # ladder-product + 1, all warmed ahead of traffic — no mid-run
    # compile stalls). GENIE_SLOT_WINDOWED_KV=0 disables (full reads).
    slot_ctx_windows: Tuple[int, ...] = (256,)
    slot_ring_windows: Tuple[int, ...] = (256, 384)
    slot_windowed_kv: bool = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "GENIE_SLOT_WINDOWED_KV", "1").lower() not in (
                "0", "false", "off"))
    # Streaming window finisher (OPT-IN): instead of vocoding each
    # utterance whole at completion, every chunk's worth of decoded codes
    # vocodes DURING decode as one batch across all in-flight rows
    # (window pump), and completion vocodes only the final partial
    # window. Audio becomes the prefix-latent approximation the solo
    # streaming path already serves (stream.py), and pieces become
    # available incrementally (the building block for streaming
    # slot-served responses).
    #
    # DEFAULT OFF: measured on v5e (bench.py slots6 stage, 6 clients),
    # the whole-utterance finisher serves 9.85 utt/s @ p50 606 ms vs
    # 8.82 @ 663 for the window pump — the batched-window HiFi-GAN gain
    # (7.9 ms/utt-window at B=8 vs 13.9 at B=4) is eaten by solo
    # completion remainders and per-pump latent recomputes at this
    # concurrency. Machinery + quality guards are fully tested
    # (tests/test_slot_windows.py); GENIE_SLOT_WINDOWS=1 opts in.
    slot_stream_finisher: bool = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "GENIE_SLOT_WINDOWS", "0").lower() in ("1", "true", "on"))
    # int8 KV cache for the slot machine: the big K/V caches hold int8
    # codes + per-column fp32 scales (models/slots.py::quantize_kv_columns)
    # so each decode step streams HALF the cache bytes (the dominant HBM
    # stream at the 8x896 slot geometry). The in-segment write buffer and
    # prefill stay exact; quality gate: tests/test_e2e_parity.py
    # (kv-int8 token agreement + waveform bound at d=512).
    #
    # DEFAULT OFF: measured on v5e, the pure-XLA int8 path REGRESSES the
    # decode segment (36 -> 45 ms per 32-step segment at occupancy 8)
    # whenever the decode weights are also int8 — XLA stops fusing the
    # cache dequant into the attention dots (isolated: int8 KV alone wins
    # 38->34 ms; with int8 weights even the bare int8->bf16 converts cost
    # +6 ms/segment). The Pallas kernel (ops/int8_decode.py, used
    # automatically on TPU when this flag is on) recovers most of that
    # (41 ms) but still trails bf16 — its VPU dequant+FMA outweighs the
    # saved bytes; full analysis in the kernel docstring. Opt in with
    # GENIE_SLOT_KV_INT8=1 (e.g. if HBM pressure ever matters more than
    # step latency: the int8 cache is half the footprint).
    slot_kv_int8: bool = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "GENIE_SLOT_KV_INT8", "0").lower() in ("1", "true", "on"))
    # Pallas flash-decode attention in the AR loop (TPU only; measured
    # neutral at B=1, revisit for large-batch serving). GENIE_FLASH_DECODE=1.
    use_flash_decode: bool = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "GENIE_FLASH_DECODE", "0").lower() in ("1", "true", "on"))
    # Folded (space-to-channel) HiFi-GAN tail: at character-load time the
    # low-channel tail stages (C = 64/32/16/1, stages >= 2) are re-indexed
    # into the folded domain (ops/folded.py + models/sovits.fold_decoder)
    # with an extra input fold of ``hifi_fold`` phases, so every tail conv
    # runs as a dense >=256-wide MXU matmul instead of a starved VPU conv.
    # Pure weight re-indexing — bit-identical in exact arithmetic
    # (tests/test_folded.py). Measured whole-hifigan on v5e at production
    # geometry (scripts/exp_hifigan_folded.py): B=1 F=304 16.0 -> 9.9 ms,
    # B=8 49.0 vs 62.5 ms. Applied on the TPU backend only (on CPU the
    # fold's extra FLOPs lose). 0 disables; GENIE_HIFI_FOLD overrides.
    hifi_fold: int = dataclasses.field(
        default_factory=lambda: _env_int("GENIE_HIFI_FOLD", 2))
    # chunked HiFi-GAN vocoding: bounded memory + streaming TTFA. Halo must
    # exceed the generator's frame-level receptive field (~14 frames).
    vocode_chunk: int = 256           # latent frames per chunk (5.12 s audio;
    # chunk 256 + halo 24 measured fastest on v5e: 133 ms vs 207-223 ms
    # for 512 frames at chunk 128/512)
    # solo EOS path: fuse decode+latent+vocode into ONE dispatch (no host
    # syncs) when the decode cap fits this many codes. Re-measured on v5e
    # with the single-device_get fetch + snug ceil-32 codes bucket: the
    # fused path saves 2-3 blocking tunnel round trips (~25 ms each) per
    # utterance vs the staged path (321 -> ~230 ms at ~8 s of audio), so
    # it is ON by default for decode caps <= 256 codes (~10 s). Above the
    # cap, vocoding the whole bucket would out-cost the saved syncs; the
    # staged path (one codes_len sync) takes over. GENIE_SOLO_FUSED=0
    # disables.
    solo_fused_max_codes: int = dataclasses.field(
        default_factory=lambda: _env_int("GENIE_SOLO_FUSED", 256))
    # streaming: the FIRST chunk is smaller so first audio lands sooner
    # (0.96 s of audio; its vocode window is first+halo frames)
    stream_first_chunk: int = 48
    # slot streaming (runtime/slot_batcher.py window pump): a streaming
    # row's FIRST piece is this many latent frames (16 -> 0.32 s audio).
    # Sized so the claimed token count (first_piece/2 + lookahead) fits
    # inside ONE decode segment: the scheduler then vocodes the first
    # piece SPECULATIVELY behind the row's first segment with codes
    # assembled on-device (slot_batcher._spec_first_pieces), making TTFA
    # one device round trip instead of 2-3 loop iterations. 0 restores
    # the chunk rule (first audio only after a full vocode_chunk).
    slot_first_piece: int = 16
    # While a streaming row still owes its first piece the scheduler
    # dispatches SHORTER decode segments (this many steps instead of
    # slot_steps) so the join->first-token->first-vocode chain crosses
    # fewer ~33 ms segment boundaries. Costs ~0.4 ms/step extra while
    # active (per-segment fixed overhead amortized over fewer steps);
    # rows owe a first piece for ~2 of their ~7 segments, so the
    # throughput tax is a few percent. 0 keeps slot_steps always.
    # Must divide slot_ring.
    slot_join_steps: int = 16
    # SEGMENTED streaming (runtime/stream.py): decode runs as W-step
    # segments on a solo slot machine and audio windows vocode from the
    # prefix of decoded codes — TTFA becomes length-INDEPENDENT (~W codes
    # in, first audio out) at the cost of prefix-latent approximation
    # (see stream.py docstring). GENIE_STREAM_SEGMENTED=0 restores the
    # exact fused head (TTFA then grows with decode length).
    stream_segmented: bool = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "GENIE_STREAM_SEGMENTED", "1").lower() not in ("0", "false",
                                                           "off"))
    stream_seg_steps: int = 16        # decode segment width W (0.64 s audio)
    # emitted frames trail the decode frontier by this many CODES so the
    # HiFi-GAN receptive field (~14 frames) only sees mature latent
    stream_lookahead: int = 8
    stream_chunk: int = 64            # follow-up window stride (1.28 s audio)
    # generator receptive field ~14 frames; 24 keeps margin and measured
    # ~35% faster than 32 on v5e (window alignment)
    vocode_halo: int = 24
    # Serving: continuous batching of concurrent requests (HTTP /tts).
    # The reference's only scale-out is uvicorn workers=N; here concurrent
    # same-character sentences micro-batch onto the chip (BASELINE
    # config[4]). GENIE_SERVE_BATCHING=0 restores solo per-request serving.
    serve_batching: bool = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "GENIE_SERVE_BATCHING", "1").lower() not in ("0", "false", "off"))
    batch_max: int = dataclasses.field(
        default_factory=lambda: _env_int("GENIE_BATCH_MAX", 8))
    batch_window_ms: float = dataclasses.field(
        default_factory=lambda: float(
            os.environ.get("GENIE_BATCH_WINDOW_MS", 8.0)))
    # In-flight slot serving: default-sampling /tts requests that fit the
    # slot buckets join a PERSISTENT decode machine at the next ~slot_steps
    # segment instead of waiting out a whole window batch.
    # GENIE_SLOT_SERVING=0 falls back to window batching only.
    serve_slots: bool = dataclasses.field(
        default_factory=lambda: os.environ.get(
            "GENIE_SLOT_SERVING", "1").lower() not in ("0", "false", "off"))
    # Mesh
    dp_axis: str = "dp"
    tp_axis: str = "tp"
    # Caches (reference env var names honored)
    max_cached_characters: int = dataclasses.field(
        default_factory=lambda: _env_int("Max_Cached_Character_Models", 3))
    max_cached_reference_audio: int = dataclasses.field(
        default_factory=lambda: _env_int("Max_Cached_Reference_Audio", 10))


# ---------------------------------------------------------------------------
# Paths (GenieData layout parity: Core/Resources.py:30-65)
# ---------------------------------------------------------------------------

def genie_data_dir() -> Path:
    return Path(os.environ.get("GENIE_DATA_DIR", "./GenieData"))


def asset_path(name: str, env_override: Optional[str] = None) -> Path:
    if env_override and env_override in os.environ:
        return Path(os.environ[env_override])
    return genie_data_dir() / name


HUBERT_DIR_ENV = "GENIE_HUBERT_DIR"
ROBERTA_DIR_ENV = "GENIE_ROBERTA_DIR"
SV_MODEL_ENV = "GENIE_SV_MODEL"
CHINESE_G2P_ENV = "GENIE_CHINESE_G2P_DIR"
ENGLISH_G2P_ENV = "GENIE_ENGLISH_G2P_DIR"


def hubert_dir() -> Path:
    return asset_path("chinese-hubert-base", HUBERT_DIR_ENV)


def roberta_dir() -> Path:
    return asset_path("RoBERTa", ROBERTA_DIR_ENV)


def sv_model_path() -> Path:
    return asset_path("speaker_encoder.safetensors", SV_MODEL_ENV)


def chinese_g2p_dir() -> Path:
    return asset_path("G2P/Chinese", CHINESE_G2P_ENV)


def english_g2p_dir() -> Path:
    return asset_path("G2P/English", ENGLISH_G2P_ENV)
