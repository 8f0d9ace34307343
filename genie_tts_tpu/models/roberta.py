"""chinese-roberta-wwm-ext-large — per-phoneme BERT features, jitted JAX.

Role of the reference's RoBERTa ONNX session
(``/root/reference/src/genie_tts/ModelManager.py:132-153``, invoked at
``GetPhonesAndBert.py:64-76``): Chinese text -> 1024-d features from the
third-to-last hidden layer, CLS/SEP stripped, repeat-interleaved per
phoneme by ``word2ph`` (the repeat is fused into the jitted graph here,
as it is fused into the reference's ONNX graph).

Standard BERT-large geometry: embeddings (word + position + type, LN),
24 post-LN layers (16 heads, FFN 4096 GELU).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import RobertaConfig
from ..ops.layers import attention, linear
from ..ops.layers import layer_norm as _ln_base


def layer_norm(p, x):
    return _ln_base(p, x, eps=1e-12)  # BERT-family epsilon

Params = Dict


def encoder_layer(lp, x, mask, cfg: RobertaConfig):
    B, T, D = x.shape
    H = cfg.num_heads
    q = linear(lp["q"], x).reshape(B, T, H, D // H).transpose(0, 2, 1, 3)
    k = linear(lp["k"], x).reshape(B, T, H, D // H).transpose(0, 2, 1, 3)
    v = linear(lp["v"], x).reshape(B, T, H, D // H).transpose(0, 2, 1, 3)
    att = attention(q, k, v, mask).transpose(0, 2, 1, 3).reshape(B, T, D)
    x = layer_norm(lp["norm1"], x + linear(lp["out"], att))
    ff = linear(lp["ffn2"], jax.nn.gelu(linear(lp["ffn1"], x), approximate=False))
    return layer_norm(lp["norm2"], x + ff)


def hidden_states(params: Params, input_ids: jnp.ndarray,
                  attention_mask: jnp.ndarray, cfg: RobertaConfig) -> jnp.ndarray:
    """[B,T] ids -> all layer outputs [L+1, B, T, D]."""
    B, T = input_ids.shape
    pos = jnp.arange(T)[None, :]
    x = (params["word_embed"][input_ids]
         + params["pos_embed"][pos]
         + params["type_embed"][jnp.zeros_like(input_ids)])
    x = layer_norm(params["embed_norm"], x)
    mask = (attention_mask[:, None, None, :] > 0)

    def body(h, lp):
        h = encoder_layer(lp, h, mask, cfg)
        return h, h

    _, states = jax.lax.scan(lambda h, lp: body(h, lp), x, params["layers"])
    return jnp.concatenate([x[None], states], axis=0)


def phone_features(params: Params, input_ids: jnp.ndarray,
                   attention_mask: jnp.ndarray, repeats: jnp.ndarray,
                   cfg: RobertaConfig, max_phones: int) -> jnp.ndarray:
    """Per-phoneme features with the word2ph repeat fused in.

    input_ids/attention_mask: [1, T_tok]; repeats: [T_tok - 2] (per content
    token, CLS/SEP stripped). Returns [max_phones, D]; rows beyond
    sum(repeats) are zero.
    """
    states = hidden_states(params, input_ids, attention_mask, cfg)
    feats = states[cfg.feature_layer][0, 1:-1]          # [T_chars, D]
    T = feats.shape[0]
    ends = jnp.cumsum(repeats)                          # [T_chars]
    starts = ends - repeats
    # phone position p takes the char c with starts[c] <= p < ends[c]
    p_idx = jnp.arange(max_phones)
    char_of_p = jnp.searchsorted(ends, p_idx, side="right").clip(0, T - 1)
    out = feats[char_of_p]
    valid = (p_idx < ends[-1])[:, None]
    return jnp.where(valid, out, 0.0).astype(jnp.float32)


def init_params(key: jax.Array, cfg: RobertaConfig, dtype=jnp.bfloat16) -> Params:
    ks = iter(jax.random.split(key, 8))
    D, F = cfg.embed_dim, cfg.ffn_dim

    def dense(k, i, o):
        return {"w": (jax.random.normal(k, (i, o)) * (i ** -0.5)).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    def ln():
        return {"scale": jnp.ones((D,), jnp.float32), "bias": jnp.zeros((D,), jnp.float32)}

    def layer(k):
        kk = jax.random.split(k, 6)
        return {"q": dense(kk[0], D, D), "k": dense(kk[1], D, D),
                "v": dense(kk[2], D, D), "out": dense(kk[3], D, D),
                "norm1": ln(), "ffn1": dense(kk[4], D, F),
                "ffn2": dense(kk[5], F, D), "norm2": ln()}

    leaves = [layer(k) for k in jax.random.split(next(ks), cfg.num_layers)]
    return {
        "word_embed": (jax.random.normal(next(ks), (cfg.vocab_size, D)) * 0.02).astype(dtype),
        "pos_embed": (jax.random.normal(next(ks), (cfg.max_position, D)) * 0.02).astype(dtype),
        "type_embed": (jax.random.normal(next(ks), (cfg.type_vocab, D)) * 0.02).astype(dtype),
        "embed_norm": {"scale": jnp.ones((D,), jnp.float32), "bias": jnp.zeros((D,), jnp.float32)},
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *leaves),
    }
