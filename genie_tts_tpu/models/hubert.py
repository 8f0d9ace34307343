"""chinese-hubert-base SSL feature extractor — jitted JAX.

Role of the reference's HuBERT ONNX session
(``/root/reference/src/genie_tts/ModelManager.py:41-42``, invoked at
``Audio/ReferenceAudio.py:48-52``): 16 kHz reference audio ->
``ssl_content`` [B, T, 768] consumed by the T2S encoder's VQ prompt path
and (quantized) by the SoVITS latent path.

Standard HuBERT-base geometry: 7-layer conv waveform frontend (stride
320 total, GroupNorm on the first layer, GELU), feature projection
(LN + 512->768), convolutional relative position embedding (k128, 16
groups, weight-norm fused at convert time), then 12 post-norm
transformer layers (12 heads, FFN 3072).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import HubertConfig
from ..ops.layers import attention, layer_norm, linear

Params = Dict


def _group_norm(p, x, groups: int = 512):
    # per-channel norm over time (groups == channels for HuBERT layer 0)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.var(xf, axis=1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def feature_extractor(params, audio: jnp.ndarray, cfg: HubertConfig) -> jnp.ndarray:
    """[B, S] waveform -> [B, S//320, 512] conv features."""
    x = audio[..., None]  # NWC
    for i, (k, s) in enumerate(zip(cfg.conv_kernels, cfg.conv_strides)):
        p = params["conv_layers"][i]
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), window_strides=(s,), padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"), preferred_element_type=x.dtype,
        )
        if i == 0:
            x = _group_norm(p["norm"], x)
        x = jax.nn.gelu(x, approximate=False)
    return x


def encoder_layer(lp, x, cfg: HubertConfig):
    """Post-norm transformer layer."""
    B, T, D = x.shape
    H = cfg.num_heads
    q = linear(lp["q"], x).reshape(B, T, H, D // H).transpose(0, 2, 1, 3)
    k = linear(lp["k"], x).reshape(B, T, H, D // H).transpose(0, 2, 1, 3)
    v = linear(lp["v"], x).reshape(B, T, H, D // H).transpose(0, 2, 1, 3)
    att = attention(q, k, v).transpose(0, 2, 1, 3).reshape(B, T, D)
    x = layer_norm(lp["norm1"], x + linear(lp["out"], att))
    ff = linear(lp["ffn2"], jax.nn.gelu(linear(lp["ffn1"], x), approximate=False))
    return layer_norm(lp["norm2"], x + ff)


def apply(params: Params, audio: jnp.ndarray, cfg: HubertConfig) -> jnp.ndarray:
    """16 kHz waveform [B, S] -> SSL features [B, S//320, 768]."""
    x = feature_extractor(params, audio, cfg)
    x = layer_norm(params["fp_norm"], x)
    x = linear(params["fp_proj"], x)

    # conv positional embedding (even kernel: trim the trailing frame)
    pos = jax.lax.conv_general_dilated(
        x, params["pos_conv"]["w"].astype(x.dtype), window_strides=(1,),
        padding=[(cfg.conv_pos_kernel // 2, cfg.conv_pos_kernel // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=cfg.conv_pos_groups, preferred_element_type=x.dtype,
    ) + params["pos_conv"]["b"]
    pos = jax.nn.gelu(pos[:, : x.shape[1]], approximate=False)
    x = layer_norm(params["enc_norm"], x + pos)

    def body(h, lp):
        return encoder_layer(lp, h, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def init_params(key: jax.Array, cfg: HubertConfig, dtype=jnp.bfloat16) -> Params:
    ks = iter(jax.random.split(key, 16))
    D, F = cfg.embed_dim, cfg.ffn_dim
    C = cfg.conv_dims[0]

    def dense(k, i, o):
        return {"w": (jax.random.normal(k, (i, o)) * (i ** -0.5)).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    def ln(n):
        return {"scale": jnp.ones((n,), jnp.float32), "bias": jnp.zeros((n,), jnp.float32)}

    conv_layers = []
    in_c = 1
    for i, (k_w, _) in enumerate(zip(cfg.conv_kernels, cfg.conv_strides)):
        p = {"w": (jax.random.normal(next(ks), (k_w, in_c, C)) * ((in_c * k_w) ** -0.5)).astype(dtype)}
        if i == 0:
            p["norm"] = {"scale": jnp.ones((C,), jnp.float32), "bias": jnp.zeros((C,), jnp.float32)}
        conv_layers.append(p)
        in_c = C

    def layer(k):
        kk = jax.random.split(k, 6)
        return {
            "q": dense(kk[0], D, D), "k": dense(kk[1], D, D), "v": dense(kk[2], D, D),
            "out": dense(kk[3], D, D), "norm1": ln(D),
            "ffn1": dense(kk[4], D, F), "ffn2": dense(kk[5], F, D), "norm2": ln(D),
        }

    leaves = [layer(k) for k in jax.random.split(next(ks), cfg.num_layers)]
    return {
        "conv_layers": conv_layers,
        "fp_norm": ln(C),
        "fp_proj": dense(next(ks), C, D),
        "pos_conv": {
            "w": (jax.random.normal(next(ks), (cfg.conv_pos_kernel, D // cfg.conv_pos_groups, D))
                  * 0.02).astype(dtype),
            "b": jnp.zeros((D,), dtype),
        },
        "enc_norm": ln(D),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *leaves),
    }
