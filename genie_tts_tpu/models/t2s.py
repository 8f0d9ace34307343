"""Text-to-semantic (T2S) autoregressive GPT decoder — TPU-native.

Re-implements the capability of the reference's three ONNX graphs
(``t2s_encoder`` / ``t2s_first_stage_decoder`` / ``t2s_stage_decoder``,
orchestrated by ``/root/reference/src/genie_tts/Core/Inference.py:63-109``)
as two jitted stages with fully static shapes:

* :func:`encode` — phoneme+BERT embedding and HuBERT->VQ prompt extraction
  (capability of the ONNX encoder, 84 nodes);
* :func:`generate` — prefill over the packed ``[text | prompt]`` sequence
  followed by an **entirely on-device** ``lax.while_loop`` autoregressive
  decode with a pre-allocated KV cache. The reference runs one ONNX session
  call per decode step (<=500 host round-trips,
  ``Core/Inference.py:95-106``); here the whole loop is one XLA program.

Model geometry (24 layers x d512 x 16 heads, post-LN, ReLU FFN 2048,
scaled-sinusoidal positions with learned alpha) matches GPT-SoVITS V2
checkpoints as recoverable from the reference key manifest
(``Data/v2/Keys/t2s_onnx_keys.txt``).

Static-shape batching layout (per batch row, cache length S):

    [ 0 .............. Sx )   text block (right-padded, len x_len[b])
    [ Sx ......... Sx+Sp )    semantic prompt block (right-padded, len p_len[b])
    [ Sx+Sp ............ )    decoded tokens, step t lives at Sx+Sp+t

Attention masking covers the pad holes, so rows with different lengths
batch together in one SPMD program (the foundation for continuous
batching). Text attends bidirectionally within text; audio attends to text
plus causally to audio — the GPT-SoVITS mask.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import T2SConfig
from ..ops.layers import attention, layer_norm, linear, sine_position_table
from ..ops.sampling import SamplingConfig, sample_token

# Batched decode merges buffered K/V columns into the big cache every
# _WRITE_CHUNK steps (see generate: the merge is a whole-cache copy on TPU,
# so W amortizes it; larger W adds wasted trailing iterations after EOS).
_WRITE_CHUNK = 16

Params = Dict


# ---------------------------------------------------------------------------
# Initialization (random weights for tests/benchmarks; real weights come from
# the converter, genie_tts_tpu/convert/)
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: T2SConfig, dtype=jnp.bfloat16) -> Params:
    ks = iter(jax.random.split(key, 32))
    d, f, v = cfg.embed_dim, cfg.ffn_dim, cfg.semantic_vocab
    L = cfg.num_layers

    def dense(k, i, o):
        return {
            "w": (jax.random.normal(k, (i, o)) * (i ** -0.5)).astype(dtype),
            "b": jnp.zeros((o,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}

    def stack(make):
        leaves = [make(k) for k in jax.random.split(next(ks), L)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    params = {
        "text_embed": (jax.random.normal(next(ks), (cfg.phoneme_vocab, d)) * 0.02).astype(dtype),
        "bert_proj": dense(next(ks), cfg.bert_dim, d),
        "text_pos_alpha": jnp.ones((), jnp.float32),
        "audio_embed": (jax.random.normal(next(ks), (v, d)) * 0.02).astype(dtype),
        "audio_pos_alpha": jnp.ones((), jnp.float32),
        "layers": stack(lambda k: {
            "qkv": dense(k, d, 3 * d),
            "out": dense(jax.random.fold_in(k, 1), d, d),
            "ffn1": dense(jax.random.fold_in(k, 2), d, f),
            "ffn2": dense(jax.random.fold_in(k, 3), f, d),
            "norm1": ln(),
            "norm2": ln(),
        }),
        "predict": {"w": (jax.random.normal(next(ks), (d, v)) * (d ** -0.5)).astype(dtype)},
        # encoder side (ssl -> semantic prompt)
        "ssl_proj": {
            "w": (jax.random.normal(next(ks), (2, cfg.ssl_dim, cfg.ssl_dim)) * 0.03).astype(dtype),
            "b": jnp.zeros((cfg.ssl_dim,), dtype),
        },
        "codebook": jax.random.normal(next(ks), (1024, cfg.ssl_dim)).astype(jnp.float32),
    }
    return params


def _quantize_dense(p: Params) -> Params:
    """Symmetric per-output-channel int8 weight quantization.

    w [..., in, out] -> int8 w + fp32 scale [..., out]; bias untouched.
    """
    w = p["w"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=-2) / 127.0, 1e-8)
    wq = jnp.round(w / s[..., None, :]).astype(jnp.int8)
    out = {"w": wq, "scale": s}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_params(params: Params) -> Params:
    """Weight-only int8 quantization of the per-layer matmuls.

    The B=1 AR decode is weight-streaming bound (24 layers x 6.3 MB bf16
    per step); int8 halves the bytes — measured 2.2x per decode step on
    v5e with no change to the graph structure (the dequant fuses into the
    matmul). Embeddings, norms, the fp32 predict head, and the encoder-
    side tensors stay unquantized. Opt out with GENIE_T2S_INT8=0.
    """
    layers = dict(params["layers"])
    for k in ("qkv", "out", "ffn1", "ffn2"):
        layers[k] = _quantize_dense(layers[k])
    out = dict(params)
    out["layers"] = layers
    return out


# ---------------------------------------------------------------------------
# Encoder: text embedding + prompt token extraction
# ---------------------------------------------------------------------------

def embed_text(params: Params, phoneme_ids: jnp.ndarray, bert: jnp.ndarray) -> jnp.ndarray:
    """[B,Tx] ids + [B,Tx,1024] bert -> positioned text states [B,Tx,512].

    x = text_embed[ids] + bert_proj(bert); x += alpha * sin_pos  (scale=False
    variant of the GPT-SoVITS SinePositionalEmbedding).
    """
    x = params["text_embed"][phoneme_ids]
    x = x + linear(params["bert_proj"], bert.astype(x.dtype))
    pe = sine_position_table(x.shape[1], x.shape[2], dtype=jnp.float32)
    x = x + (params["text_pos_alpha"] * pe).astype(x.dtype)[None]
    return x


def extract_prompt_tokens(params: Params, ssl_content: jnp.ndarray) -> jnp.ndarray:
    """HuBERT features [B,Ts,768] -> semantic prompt ids [B,Ts//2].

    Conv(768,768,k2,s2) projection followed by nearest-codebook lookup
    (the quantizer encode path of the ONNX encoder). Distances in fp32 —
    codebook assignment must be exact.
    """
    w = params["ssl_proj"]["w"].astype(jnp.float32)  # [2, 768, 768]
    x = jax.lax.conv_general_dilated(
        ssl_content.astype(jnp.float32), w,
        window_strides=(2,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + params["ssl_proj"]["b"].astype(jnp.float32)
    cb = params["codebook"].astype(jnp.float32)  # [1024, 768]
    # argmin_j ||x - c_j||^2 = argmin_j (||c_j||^2 - 2 x.c_j)
    dots = jnp.einsum("btc,kc->btk", x, cb)
    c2 = jnp.sum(cb * cb, axis=-1)
    return jnp.argmin(c2[None, None, :] - 2.0 * dots, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Transformer core
# ---------------------------------------------------------------------------

def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _layer_prefill(lp: Params, h: jnp.ndarray, mask: jnp.ndarray, num_heads: int):
    """Post-LN transformer layer over the full prefill sequence.

    Returns (hidden, (k, v)) with k/v shaped [B, H, T, Dh].
    """
    qkv = linear(lp["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(t, num_heads) for t in (q, k, v))
    att = attention(q, k, v, mask)
    h = layer_norm(lp["norm1"], h + linear(lp["out"], _merge_heads(att)))
    ff = linear(lp["ffn2"], jax.nn.relu(linear(lp["ffn1"], h)))
    h = layer_norm(lp["norm2"], h + ff)
    return h, (k, v)


def _layer_decode(lp: Params, h: jnp.ndarray, k_cache, v_cache, pos, kv_mask,
                  num_heads: int, use_flash: bool = False):
    """One-token decode layer. h: [B,1,D]; pos: scalar (the write position
    is row-uniform: static text/prompt buckets + step), so the cache update
    is a cheap dynamic_update_slice, not a scatter.

    Cache layout is **kv-major** [B,H,Dh,S] (default path): TPU tiles the
    last two dims (8, 128); with Dh=32 in lanes the cache would pad 32->128
    and every step's attention would read 4x the bytes. Dh-in-sublanes /
    S-in-lanes tiles exactly, and the step's cache write is a 1-wide lane
    column. The opt-in Pallas flash path keeps the [B,H,S,Dh] layout its
    kernel expects.
    """
    qkv = linear(lp["qkv"], h)
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, num_heads)        # [B,H,1,Dh]
    k_new = _split_heads(k_new, num_heads)  # [B,H,1,Dh]
    v_new = _split_heads(v_new, num_heads)
    if use_flash:
        from ..ops.flash_decode import flash_decode_attention

        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k_new, pos, axis=2)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v_new, pos, axis=2)
        att = flash_decode_attention(q[:, :, 0], k_cache, v_cache, kv_mask)[:, :, None]
    else:
        # kv-major caches [B,H,Dh,S]; write the new token's column
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, jnp.swapaxes(k_new, -1, -2), pos, axis=3)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, jnp.swapaxes(v_new, -1, -2), pos, axis=3)
        scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
        scores = jnp.einsum("bhqd,bhds->bhqs", q, k_cache,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(kv_mask[:, None, None, :], scores,
                           jnp.float32(-1e10))
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        att = jnp.einsum("bhqs,bhds->bhqd", probs, v_cache,
                         preferred_element_type=q.dtype)
    h = layer_norm(lp["norm1"], h + linear(lp["out"], _merge_heads(att)))
    ff = linear(lp["ffn2"], jax.nn.relu(linear(lp["ffn1"], h)))
    h = layer_norm(lp["norm2"], h + ff)
    return h, k_cache, v_cache


def _layer_decode_buffered(lp: Params, h: jnp.ndarray, k_big, v_big,
                           k_buf, v_buf, buf_mask, kv_mask, num_heads: int,
                           k_scale=None, v_scale=None, kv_kernel_ctx=None):
    """One-token decode layer against a read-only big cache + write buffer.

    Per-step dynamic_update_slice into a lane column of the full cache is
    NOT in-place on TPU (Mosaic copies the buffer: measured ~2.7 ms/step
    at B=8, dominating decode). Here the big caches [B,H,Dh,S] are never
    written inside the step; the current segment's K/V columns live in a
    small buffer [B,H,Dh,W] and the softmax runs over the concatenation
    [big | buffer | self]. Returns (h, k_new [B,H,Dh], v_new [B,H,Dh]) —
    the caller stacks the new columns into the buffer once per step and
    merges buffers into the big cache once per W steps (amortized copy).

    ``k_scale``/``v_scale`` [B,H,S]: per-column fp32 dequant scales when
    the big caches hold int8 codes (models/slots.py kv_int8 mode). The
    dequant never materializes bf16 caches in HBM: the K scale folds into
    the fp32 scores after the int8-operand dot; the V scale multiplies
    the dequantized V values inside the probs@V dot's operand fusion
    (folding it into the probabilities instead measurably breaks that
    fusion on v5e: +8 ms per 32-step segment at the 8x896 slot geometry).
    HBM only ever streams the int8 bytes.

    ``kv_kernel_ctx`` (TPU serving path): ``(x_len, p_len, keys_written,
    ring_head, sx, sp, ring)`` — routes the big-cache attention through
    the Pallas int8 kernel (ops/int8_decode.py), which recomputes the
    visibility mask from these scalars and returns flash partials; the
    exact bf16 buffer + self columns merge via one log-sum-exp step
    (numerically identical to the monolithic softmax). On non-TPU
    backends pass None: the pure-XLA dequant path below runs instead.
    """
    qkv = linear(lp["qkv"], h)
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, num_heads)          # [B,H,1,Dh]
    k_new = _split_heads(k_new, num_heads)[:, :, 0]   # [B,H,Dh]
    v_new = _split_heads(v_new, num_heads)[:, :, 0]
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    if k_scale is not None and kv_kernel_ctx is not None:
        from ..ops.int8_decode import int8_big_attention

        x_len, p_len, keys_written, ring_head, sx, sp, ring = kv_kernel_ctx
        o1, m1, l1 = int8_big_attention(
            q[:, :, 0], k_big, k_scale, v_big, v_scale,
            x_len, p_len, keys_written, ring_head, sx=sx, sp=sp, ring=ring)
        s_buf = jnp.einsum("bhqd,bhdw->bhqw", q, k_buf,
                           preferred_element_type=jnp.float32) * scale
        s_buf = jnp.where(buf_mask[None, None, None, :], s_buf,
                          jnp.float32(-1e10))[:, :, 0]          # [B,H,W]
        s_self = jnp.sum(q[:, :, 0].astype(jnp.float32)
                         * k_new.astype(jnp.float32),
                         axis=-1, keepdims=True) * scale         # [B,H,1]
        s_rest = jnp.concatenate([s_buf, s_self], axis=-1)       # [B,H,W+1]
        m_tot = jnp.maximum(m1, jnp.max(s_rest, axis=-1))        # [B,H]
        a1 = jnp.exp(m1 - m_tot)
        p_rest = jnp.exp(s_rest - m_tot[..., None])
        l_tot = l1 * a1 + jnp.sum(p_rest, axis=-1)
        W = s_buf.shape[-1]
        att_f = (o1 * a1[..., None]
                 + jnp.einsum("bhw,bhdw->bhd",
                              p_rest[..., :W].astype(q.dtype),
                              v_buf, preferred_element_type=jnp.float32)
                 + p_rest[..., W:] * v_new.astype(jnp.float32))
        att = (att_f / l_tot[..., None]).astype(q.dtype)[:, :, None]
        h = layer_norm(lp["norm1"], h + linear(lp["out"], _merge_heads(att)))
        ff = linear(lp["ffn2"], jax.nn.relu(linear(lp["ffn1"], h)))
        h = layer_norm(lp["norm2"], h + ff)
        return h, k_new, v_new
    # The big cache may arrive as ONE region (the classic full-cache read)
    # or as SEVERAL regions — e.g. the slot machine's (ctx slice, live ring
    # window), which reads only the columns that can be visible instead of
    # the whole padded cache (decode is KV-read bound at the slot
    # geometry). Regions concatenate in SCORE space: softmax over
    # [regions... | buffer | self] is one distribution either way.
    kb_parts = k_big if isinstance(k_big, (tuple, list)) else (k_big,)
    vb_parts = v_big if isinstance(v_big, (tuple, list)) else (v_big,)
    mask_parts = kv_mask if isinstance(kv_mask, (tuple, list)) else (kv_mask,)
    ks_parts = (k_scale if isinstance(k_scale, (tuple, list))
                else (k_scale,) * len(kb_parts))
    vs_parts = (v_scale if isinstance(v_scale, (tuple, list))
                else (v_scale,) * len(kb_parts))
    s_parts, v_parts = [], []
    for kb, vb, msk, ks, vs in zip(kb_parts, vb_parts, mask_parts,
                                   ks_parts, vs_parts):
        if ks is not None:
            kb = kb.astype(q.dtype)
        if vs is not None:
            vb = vb.astype(q.dtype) * vs[:, :, None, :].astype(q.dtype)
        s = jnp.einsum("bhqd,bhds->bhqs", q, kb,
                       preferred_element_type=jnp.float32) * scale
        if ks is not None:
            s = s * ks[:, :, None, :]
        s_parts.append(jnp.where(msk[:, None, None, :], s,
                                 jnp.float32(-1e10)))
        v_parts.append(vb)
    s_buf = jnp.einsum("bhqd,bhdw->bhqw", q, k_buf,
                       preferred_element_type=jnp.float32) * scale
    s_buf = jnp.where(buf_mask[None, None, None, :], s_buf, jnp.float32(-1e10))
    s_self = jnp.sum(q.astype(jnp.float32) * k_new[:, :, None, :],
                     axis=-1, keepdims=True) * scale     # [B,H,1,1]
    W = s_buf.shape[-1]
    probs = jax.nn.softmax(
        jnp.concatenate(s_parts + [s_buf, s_self], axis=-1), axis=-1
    ).astype(q.dtype)
    att = 0.0
    off = 0
    for s, vb in zip(s_parts, v_parts):
        n = s.shape[-1]
        att = att + jnp.einsum("bhqs,bhds->bhqd", probs[..., off:off + n],
                               vb, preferred_element_type=q.dtype)
        off += n
    att = (att
           + jnp.einsum("bhqw,bhdw->bhqd", probs[..., off:off + W],
                        v_buf, preferred_element_type=q.dtype)
           + probs[..., off + W:] * v_new[:, :, None, :])
    h = layer_norm(lp["norm1"], h + linear(lp["out"], _merge_heads(att)))
    ff = linear(lp["ffn2"], jax.nn.relu(linear(lp["ffn1"], h)))
    h = layer_norm(lp["norm2"], h + ff)
    return h, k_new, v_new


# ---------------------------------------------------------------------------
# Generate: prefill + on-device AR decode
# ---------------------------------------------------------------------------

class GenerateResult(NamedTuple):
    tokens: jnp.ndarray   # [B, max_steps] int32 semantic tokens (incl. final EOS/0)
    counts: jnp.ndarray   # [B] int32 number of emitted tokens
    steps: jnp.ndarray    # [] int32 loop iterations executed


def _prefill_mask(Sx: int, Sp: int, x_len: jnp.ndarray, p_len: jnp.ndarray) -> jnp.ndarray:
    """[B, S_pre, S_pre] bool attention mask for the packed prefill sequence."""
    S = Sx + Sp
    qi = jnp.arange(S)[None, :, None]
    kj = jnp.arange(S)[None, None, :]
    x_len = x_len[:, None, None]
    p_len = p_len[:, None, None]
    k_is_text = (kj < x_len)
    k_is_prompt = (kj >= Sx) & (kj < Sx + p_len)
    q_is_text = qi < Sx
    # text query: attends text block only; audio query: text + causal prompt
    causal = kj <= qi
    return jnp.where(q_is_text, k_is_text, k_is_text | (k_is_prompt & causal))


def prefill(
    params: Params,
    cfg: T2SConfig,
    x: jnp.ndarray,          # [B, Sx, D] positioned text states
    x_len: jnp.ndarray,      # [B]
    prompts: jnp.ndarray,    # [B, Sp] semantic prompt ids (right-padded)
    p_len: jnp.ndarray,      # [B]
    cache_len: int,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run the packed sequence through all layers, build the KV cache.

    Returns (logits_first [B, V] fp32, (k_cache, v_cache) each
    [L, B, H, cache_len, Dh]).
    """
    B, Sx, D = x.shape
    Sp = prompts.shape[1]
    H, L = cfg.num_heads, cfg.num_layers

    y_emb = params["audio_embed"][prompts]
    pe = sine_position_table(Sp, D, dtype=jnp.float32)
    y = y_emb + (params["audio_pos_alpha"] * pe).astype(y_emb.dtype)[None]
    h = jnp.concatenate([x, y], axis=1)                       # [B, S_pre, D]
    mask = _prefill_mask(Sx, Sp, x_len, p_len)[:, None]       # [B,1,S,S]

    def body(hid, lp):
        hid, (k, v) = _layer_prefill(lp, hid, mask, H)
        return hid, (k, v)

    h, (ks, vs) = jax.lax.scan(body, h, params["layers"])
    # ks/vs: [L, B, H, S_pre, Dh] -> pad to cache_len
    pad = cache_len - (Sx + Sp)
    k_cache = jnp.pad(ks, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    v_cache = jnp.pad(vs, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))

    # logits at the last valid prompt position of each row
    last_idx = Sx + p_len - 1                                  # [B]
    h_last = h[jnp.arange(B), last_idx]                        # [B, D]
    logits = jnp.dot(h_last.astype(jnp.float32), params["predict"]["w"].astype(jnp.float32))
    return logits, (k_cache, v_cache)


def generate(
    params: Params,
    cfg: T2SConfig,
    scfg: SamplingConfig,
    key: jax.Array,
    x: jnp.ndarray,
    x_len: jnp.ndarray,
    prompts: jnp.ndarray,
    p_len: jnp.ndarray,
    max_steps: int,
    cache_len: int,
    min_steps=0,
    use_flash: bool = False,
    layer_unroll: int = 1,
    max_steps_dyn=None,
    solo_buffered: bool = True,
) -> GenerateResult:
    """Prefill + sample + full AR decode in one XLA program.

    ``min_steps``: EOS may not fire before this many tokens (0 = reference
    behavior; also used to pin decode length in benchmarks). May be a
    TRACED scalar — serving passes it dynamically so a min-steps ladder
    shares one compiled graph.
    ``max_steps``: STATIC decode cap — sizes the token buffer, the Gumbel
    table and (via the caller) the KV cache. ``max_steps_dyn``: optional
    traced per-call cap <= max_steps; the loop exits there while the
    graph stays keyed on the static cap only (dynamic-ladder dispatch,
    same scheme as the slot machine's per-row max_steps).
    ``use_flash``: route decode attention through the Pallas kernel
    (ops/flash_decode.py; TPU only).
    ``layer_unroll``: unroll factor of the per-step layer scan. Measured
    runtime-neutral on v5e at B<=8 while multiplying compile time, so the
    default stays 1; exposed for larger-batch tuning.
    ``solo_buffered``: route B=1 through the write-buffered KV path (the
    default; 0.328 vs 0.477 ms/step on v5e at serving knobs). False keeps
    the legacy per-step cache-update loop (parity escape hatch)."""
    ms_dyn = max_steps if max_steps_dyn is None else (
        jnp.minimum(jnp.asarray(max_steps_dyn, jnp.int32), max_steps))
    B, Sx, D = x.shape
    Sp = prompts.shape[1]
    H, L, V = cfg.num_heads, cfg.num_layers, cfg.semantic_vocab
    Dh = cfg.head_dim

    if not ((B == 1 and not solo_buffered) or use_flash):
        # Buffered path: the per-segment merge copies a whole W-wide buffer
        # into the big cache, so the decode region must be a (nonzero)
        # multiple of the write-chunk width or the dynamic_update_slice
        # fails at trace time for tiny max_steps/cache_len. Pad up; the
        # extra columns stay masked out of attention.
        dec_region = max(cache_len - Sx - Sp, 1)
        cache_len = Sx + Sp + -(-dec_region // _WRITE_CHUNK) * _WRITE_CHUNK

    logits0, (k_cache, v_cache) = prefill(params, cfg, x, x_len, prompts, p_len, cache_len)
    if not use_flash:
        # kv-major decode layout (see _layer_decode): one transpose of the
        # prefilled caches, amortized over the whole AR loop
        k_cache = jnp.swapaxes(k_cache, -1, -2)   # [L,B,H,Dh,S]
        v_cache = jnp.swapaxes(v_cache, -1, -2)

    # histogram of emitted tokens for repetition penalty (prompt included)
    hist0 = jnp.zeros((B, V), jnp.int32)
    prompt_valid = jnp.arange(Sp)[None, :] < p_len[:, None]
    hist0 = hist0.at[jnp.arange(B)[:, None], prompts].add(prompt_valid.astype(jnp.int32))

    # All Gumbel noise for the loop drawn up front: one big vectorized
    # threefry kernel instead of a split+gumbel chain per step (the
    # while_loop body's fixed overhead is the B=1 latency floor).
    gumbel = jax.random.gumbel(key, (max_steps, B, V), dtype=jnp.float32)

    # first token: EOS forbidden (GPT-SoVITS masks EOS on the first draw)
    forbid_eos = jnp.zeros((V,), bool).at[cfg.eos_id].set(True)
    tok0 = sample_token(None, logits0, hist0, scfg, forbid=forbid_eos,
                        noise=gumbel[0])  # [B]

    tokens = jnp.zeros((B, max_steps), jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)
    hist0 = hist0 + jax.nn.one_hot(tok0, V, dtype=jnp.int32)

    kv_positions = jnp.arange(cache_len)[None, :]              # [1, S]
    pe_full = sine_position_table(cache_len, D, dtype=jnp.float32)

    def embed_step(tokens, step):
        """Input embedding for the token sampled at ``step - 1``."""
        cur_tok = tokens[jnp.arange(B), step - 1]
        audio_pos = p_len + step - 1                           # [B]
        emb = params["audio_embed"][cur_tok]                   # [B, D]
        pos_emb = pe_full[audio_pos]                           # [B, D]
        return (emb + (params["audio_pos_alpha"] * pos_emb).astype(emb.dtype))[:, None]

    def sample_update(step, h, done, tokens, counts, hist):
        """Predict head + sampling + EOS/token/hist bookkeeping for one step."""
        logits = jnp.dot(
            h[:, 0].astype(jnp.float32), params["predict"]["w"].astype(jnp.float32)
        )                                                      # [B, V]
        # below min_steps EOS is masked out of sampling entirely
        step_forbid = forbid_eos & (step < min_steps)
        noise = jax.lax.dynamic_index_in_dim(
            gumbel, jnp.minimum(step, max_steps - 1), keepdims=False)
        nxt = sample_token(None, logits, hist, scfg, forbid=step_forbid,
                           noise=noise)
        argmax_eos = jnp.argmax(logits, axis=-1) == cfg.eos_id
        now_done = (argmax_eos | (nxt == cfg.eos_id)) & (step >= min_steps)

        active = ~done & (step < ms_dyn)
        nxt = jnp.where(active, nxt, cfg.eos_id)               # freeze finished rows
        write = jnp.minimum(step, max_steps - 1)
        tokens = tokens.at[:, write].set(
            jnp.where(active, nxt, tokens[:, write]))
        # one-hot add, not a scatter: a [B,V] vector op is cheaper on the
        # VPU than a 1-element-per-row scatter every step
        hist = hist + jax.nn.one_hot(nxt, V, dtype=jnp.int32) * (
            active).astype(jnp.int32)[:, None]
        counts = jnp.where(active, step + 1, counts)
        done = done | now_done | (step + 1 >= ms_dyn)
        return done, tokens, counts, hist

    if (B == 1 and not solo_buffered) or use_flash:
        # Solo/flash path: per-step dynamic_update_slice into the cache.
        # Mosaic copies the cache buffer on the lane-column update. At the
        # serving knobs (int8 weights, full layer unroll, 24L/512) that
        # copy is NOT cheap even at B=1 — measured 0.477 vs 0.328 ms/step
        # carry vs buffered (scripts/exp_solo_buffered.py, v5e) — so B=1
        # defaults to the buffered path below; this branch serves the
        # Pallas flash kernel and the explicit solo_buffered=False escape.
        def cond(carry):
            step, done, *_ = carry
            return (step < ms_dyn) & ~jnp.all(done)

        def body(carry):
            step, done, tokens, counts, hist, k_cache, v_cache = carry
            h = embed_step(tokens, step)
            # keys visible: valid text, valid prompt, decoded tokens so far
            kv_mask = (
                (kv_positions < x_len[:, None])
                | ((kv_positions >= Sx) & (kv_positions < Sx + p_len[:, None]))
                | ((kv_positions >= Sx + Sp) & (kv_positions <= Sx + Sp + step - 1))
            )
            pos_b = Sx + Sp + step - 1  # row-uniform write position (scalar)

            def layer_body(h, inputs):
                lp, kc, vc = inputs
                h, kc, vc = _layer_decode(lp, h, kc, vc, pos_b, kv_mask, H,
                                          use_flash=use_flash)
                return h, (kc, vc)

            h, (k_cache, v_cache) = jax.lax.scan(
                layer_body, h, (params["layers"], k_cache, v_cache),
                unroll=layer_unroll)
            done, tokens, counts, hist = sample_update(
                step, h, done, tokens, counts, hist)
            return step + 1, done, tokens, counts, hist, k_cache, v_cache

        done0 = jnp.zeros((B,), bool)
        counts0 = jnp.ones((B,), jnp.int32)
        step, done, tokens, counts, hist, k_cache, v_cache = jax.lax.while_loop(
            cond, body, (jnp.int32(1), done0, tokens, counts0, hist0, k_cache, v_cache)
        )
        return GenerateResult(tokens=tokens, counts=counts, steps=step)

    # Batched path: write-buffered KV. Per-step lane-column updates of the
    # big caches are not in-place on TPU (Mosaic copies the whole buffer —
    # measured ~2.7 ms/step at B=8, dominating decode), and routing the
    # caches through the layer scan's ys re-stacks them every step. Here
    # the big caches are READ-ONLY scan xs; each step's K/V columns come
    # out as tiny scan ys [L,B,H,Dh] appended to a segment buffer
    # [L,B,H,Dh,W]; attention softmaxes over [big | buffer | self]; the
    # buffer merges into the big cache once per W steps (one amortized
    # copy) — only when a later segment will read it.
    W = _WRITE_CHUNK

    def inner(i, carry):
        seg_base, done, tokens, counts, hist, k_big, v_big, k_buf, v_buf = carry
        step = seg_base + i
        h = embed_step(tokens, step)
        # big-cache visibility: text, prompt, and MERGED decode columns
        # (positions before this segment); the segment's own columns are
        # covered by the buffer mask
        kv_mask = (
            (kv_positions < x_len[:, None])
            | ((kv_positions >= Sx) & (kv_positions < Sx + p_len[:, None]))
            | ((kv_positions >= Sx + Sp)
               & (kv_positions < Sx + Sp + seg_base - 1))
        )
        buf_mask = jnp.arange(W) < i                            # cols written

        def layer_body(h, inputs):
            lp, kb, vb, kbuf, vbuf = inputs
            h, k_new, v_new = _layer_decode_buffered(
                lp, h, kb, vb, kbuf, vbuf, buf_mask, kv_mask, H)
            return h, (k_new, v_new)

        h, (k_cols, v_cols) = jax.lax.scan(
            layer_body, h, (params["layers"], k_big, v_big, k_buf, v_buf),
            unroll=layer_unroll)
        k_buf = jax.lax.dynamic_update_slice_in_dim(
            k_buf, k_cols[..., None], i, axis=4)
        v_buf = jax.lax.dynamic_update_slice_in_dim(
            v_buf, v_cols[..., None], i, axis=4)
        done, tokens, counts, hist = sample_update(
            step, h, done, tokens, counts, hist)
        return seg_base, done, tokens, counts, hist, k_big, v_big, k_buf, v_buf

    def cond(carry):
        seg, done, *_ = carry
        return (seg * W + 1 < ms_dyn) & ~jnp.all(done)

    def body(carry):
        seg, done, tokens, counts, hist, k_big, v_big = carry
        seg_base = seg * W + 1
        k_buf = jnp.zeros((L, B, H, Dh, W), k_big.dtype)
        v_buf = jnp.zeros((L, B, H, Dh, W), v_big.dtype)
        _, done, tokens, counts, hist, k_big, v_big, k_buf, v_buf = \
            jax.lax.fori_loop(
                0, W, inner,
                (seg_base, done, tokens, counts, hist, k_big, v_big,
                 k_buf, v_buf))

        # merge the segment's columns into the big caches — one whole-cache
        # copy per W steps, and only if a later segment will read them
        def merge(caches):
            kb, vb = caches
            base = Sx + Sp + seg_base - 1
            kb = jax.lax.dynamic_update_slice(kb, k_buf, (0, 0, 0, 0, base))
            vb = jax.lax.dynamic_update_slice(vb, v_buf, (0, 0, 0, 0, base))
            return kb, vb

        k_big, v_big = jax.lax.cond(
            (seg_base + W < ms_dyn) & ~jnp.all(done),
            merge, lambda c: c, (k_big, v_big))
        return seg + 1, done, tokens, counts, hist, k_big, v_big

    done0 = jnp.zeros((B,), bool)
    counts0 = jnp.ones((B,), jnp.int32)
    seg, done, tokens, counts, hist, k_cache, v_cache = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), done0, tokens, counts0, hist0, k_cache, v_cache))
    return GenerateResult(tokens=tokens, counts=counts,
                          steps=jnp.minimum(seg * W + 1, ms_dyn))


def finalize_tokens_device(tokens: jnp.ndarray, counts: jnp.ndarray,
                           eos_id: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device equivalent of :func:`finalize_semantic_tokens`.

    Returns (codes [B, max_steps] zero-padded, codes_len [B]). Keeping this
    inside the decode jit removes the mid-pipeline host round trip (the
    dominant latency on tunneled TPU hosts).
    """
    B, S = tokens.shape
    pos = jnp.arange(S)[None, :]
    in_range = pos < counts[:, None]
    # reference quirk: the final emitted token becomes semantic code 0
    tokens = jnp.where(pos == counts[:, None] - 1, 0, tokens)
    # trim at the first remaining token >= eos
    bad = (tokens >= eos_id) & in_range
    first_bad = jnp.min(jnp.where(bad, pos, S), axis=1)
    codes_len = jnp.minimum(counts, first_bad)
    codes = jnp.where(pos < codes_len[:, None], tokens, 0)
    return codes, codes_len


def generate_e2e(
    params: Params,
    cfg: T2SConfig,
    scfg: SamplingConfig,
    key: jax.Array,
    phones: jnp.ndarray,      # [B, Sx] packed [ref_text | text] ids
    bert: Optional[jnp.ndarray],  # [B, Sx, bert_dim] or None (all-zero BERT)
    x_len: jnp.ndarray,
    prompts: jnp.ndarray,
    p_len: jnp.ndarray,
    max_steps: int,
    cache_len: int,
    min_steps=0,
    use_flash: bool = False,
    layer_unroll: int = 1,
    max_steps_dyn=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-dispatch T2S: embed + prefill + AR decode + EOS finalize.

    Returns (codes [B, max_steps], codes_len [B]) ready for the vocoder.
    ``min_steps``/``max_steps_dyn`` may be traced scalars (see
    :func:`generate`) — serving ladders then share one compiled graph.
    """
    if bert is None:
        bert = jnp.zeros(phones.shape + (cfg.bert_dim,), jnp.float32)
    x = embed_text(params, phones, bert)
    res = generate(params, cfg, scfg, key, x, x_len, prompts, p_len,
                   max_steps=max_steps, cache_len=cache_len, min_steps=min_steps,
                   use_flash=use_flash, layer_unroll=layer_unroll,
                   max_steps_dyn=max_steps_dyn)
    return finalize_tokens_device(res.tokens, res.counts, cfg.eos_id)


# ---------------------------------------------------------------------------
# Training (teacher-forced) — fine-tuning support; also exercised by the
# multi-chip dryrun (dp x tp sharded train step in parallel/train.py)
# ---------------------------------------------------------------------------

def forward_train(
    params: Params,
    cfg: T2SConfig,
    phones: jnp.ndarray,      # [B, Sx]
    bert: jnp.ndarray,        # [B, Sx, bert_dim]
    x_len: jnp.ndarray,       # [B]
    semantic: jnp.ndarray,    # [B, Sy] target semantic tokens (incl. prompt)
    sem_len: jnp.ndarray,     # [B]
) -> jnp.ndarray:
    """Teacher-forced logits over the audio block: [B, Sy, V].

    Position t predicts semantic[t + 1]; the standard GPT-SoVITS T2S
    training objective (next-token CE over audio positions, EOS appended).
    """
    x = embed_text(params, phones, bert)
    B, Sx, D = x.shape
    Sy = semantic.shape[1]
    y_emb = params["audio_embed"][semantic]
    pe = sine_position_table(Sy, D, dtype=jnp.float32)
    y = y_emb + (params["audio_pos_alpha"] * pe).astype(y_emb.dtype)[None]
    h = jnp.concatenate([x, y], axis=1)
    mask = _prefill_mask(Sx, Sy, x_len, sem_len)[:, None]

    def body(hid, lp):
        hid, _ = _layer_prefill(lp, hid, mask, cfg.num_heads)
        return hid, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    h_audio = h[:, Sx:]
    return jnp.dot(h_audio.astype(jnp.float32),
                   params["predict"]["w"].astype(jnp.float32))


def train_loss(params, cfg: T2SConfig, batch) -> jnp.ndarray:
    """Masked next-token cross-entropy. batch keys: phones, bert, x_len,
    semantic, sem_len. Targets: semantic shifted left, EOS at the end."""
    logits = forward_train(params, cfg, batch["phones"], batch["bert"],
                           batch["x_len"], batch["semantic"], batch["sem_len"])
    B, Sy, V = logits.shape
    targets = jnp.concatenate(
        [batch["semantic"][:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    # position sem_len-1 predicts EOS
    pos = jnp.arange(Sy)[None, :]
    targets = jnp.where(pos == batch["sem_len"][:, None] - 1, cfg.eos_id, targets)
    valid = (pos < batch["sem_len"][:, None]).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def finalize_semantic_tokens(tokens, counts, eos_id: int = 1024):
    """Host-side post-processing matching the reference quirks.

    The reference zeroes the final emitted token (``y[0, -1] = 0``,
    ``Core/Inference.py:108``) — replacing the EOS with semantic code 0 and
    keeping it — then trims anything >= 1024 that remains
    (``Core/Inference.py:41-44``). Returns a list of 1-D numpy arrays.
    """
    import numpy as np

    tokens = np.asarray(tokens)
    counts = np.asarray(counts)
    out = []
    for row, cnt in zip(tokens, counts):
        seq = row[: int(cnt)].copy()
        if len(seq):
            seq[-1] = 0
        bad = np.nonzero(seq >= eos_id)[0]
        if len(bad):
            seq = seq[: bad[0]]
        out.append(seq)
    return out
