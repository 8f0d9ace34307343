"""ERes2NetV2 speaker-verification encoder — V2ProPlus cloning, JAX.

Role of the reference's ``speaker_encoder.onnx``
(``/root/reference/src/genie_tts/Core/Resources.py:57-60``): 16 kHz
waveform -> 80-mel Kaldi fbank -> 2-D CNN -> 20480-d embedding
(channels x freq flattened, mean over time; 2048 ch x 10 freq bins).

Geometry follows the 3D-Speaker ERes2NetV2 recipe used by GPT-SoVITS
V2Pro (baseWidth 24, scale 4, expansion 4, m_channels 64, blocks
[3,4,6,3]): Res2Net bottlenecks with hierarchical 3x3 stages; the last
two stages use attentional feature fusion (AFF) both inside blocks and
for the layer3->layer4 skip. BatchNorms are folded into convs at convert
time, so params here carry plain conv kernels.

NOTE: written from the published architecture; the convert-time key map
will be validated against real checkpoints (conversion shapes asserted).
"""
from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp

Params = Dict

M_CHANNELS = 64
BASE_WIDTH = 24
SCALE = 4
EXPANSION = 4
NUM_BLOCKS = (3, 4, 6, 3)
FEAT_DIM = 80
EMB_DIM = 20480  # (m*8*expansion) * (80/8) = 2048 * 10


def conv2d(p, x, stride=1, padding=1):
    """x: [B, H, W, C_in]; w: [kh, kw, in, out] (+optional folded bias)."""
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def conv1x1(p, x, stride=1):
    return conv2d(p, x, stride=stride, padding=0)


def aff(p, x, ds_y):
    """Attentional feature fusion: gate from concat, blend x and ds_y."""
    xa = jnp.concatenate([x, ds_y], axis=-1)
    h = conv1x1(p["att1"], xa)
    h = jax.nn.silu(h)
    h = conv1x1(p["att2"], h)
    gate = 1.0 + jnp.tanh(h)
    return x * gate + ds_y * (2.0 - gate)


def _res2_stage(p, x, width: int, use_aff: bool):
    """Hierarchical Res2Net 3x3 stage over `SCALE` channel groups."""
    groups = jnp.split(x, SCALE, axis=-1)
    outs: List[jnp.ndarray] = []
    sp = None
    for i in range(SCALE):
        if i == 0:
            sp = groups[0]
        elif use_aff:
            sp = aff(p["fuse"][i - 1], sp, groups[i])
        else:
            sp = sp + groups[i]
        sp = jax.nn.relu(conv2d(p["convs"][i], sp, padding=1))
        outs.append(sp)
    return jnp.concatenate(outs, axis=-1)


def res2_block(p, x, stride: int, use_aff: bool):
    out = jax.nn.relu(conv1x1(p["conv1"], x, stride=stride))
    out = _res2_stage(p, out, 0, use_aff)
    out = conv1x1(p["conv3"], out)
    if "shortcut" in p:
        sc = conv1x1(p["shortcut"], x, stride=stride)
    else:
        sc = x
    return jax.nn.relu(out + sc)


def apply(params: Params, fbank: jnp.ndarray) -> jnp.ndarray:
    """[B, T, 80] Kaldi fbank -> [B, 20480] embedding."""
    # layout: freq as H, time as W, NHWC
    x = fbank.transpose(0, 2, 1)[..., None]              # [B, 80, T, 1]
    x = jax.nn.relu(conv2d(params["conv1"], x, padding=1))
    strides = (1, 2, 2, 2)
    for li, (blocks, stride) in enumerate(zip(NUM_BLOCKS, strides)):
        use_aff = li >= 2
        for bi in range(blocks):
            x = res2_block(params[f"layer{li + 1}"][bi], x,
                           stride if bi == 0 else 1, use_aff)
        if li == 2:
            out3 = x
    out4 = x
    out3_ds = conv2d(params["layer3_ds"], out3, stride=2, padding=1)
    fused = aff(params["fuse34"], out4, out3_ds)          # [B, 10, T/8, 2048]
    B, F, T, C = fused.shape
    flat = fused.transpose(0, 3, 1, 2).reshape(B, C * F, T)
    return jnp.mean(flat, axis=-1)                        # [B, 20480]


# ---------------------------------------------------------------------------
# Init (random; conversion from torch lands with real checkpoints)
# ---------------------------------------------------------------------------

def _conv_p(key, kh, kw, cin, cout, dtype):
    fan = kh * kw * cin
    return {"w": (jax.random.normal(key, (kh, kw, cin, cout)) * fan ** -0.5).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _block_p(key, in_c, planes, stride, use_aff, dtype):
    width = int(math.floor(planes * BASE_WIDTH / 64.0))
    ks = iter(jax.random.split(key, 4 + 2 * SCALE + 2 * SCALE))
    p = {
        "conv1": _conv_p(next(ks), 1, 1, in_c, width * SCALE, dtype),
        "convs": [_conv_p(next(ks), 3, 3, width, width, dtype) for _ in range(SCALE)],
        "conv3": _conv_p(next(ks), 1, 1, width * SCALE, planes * EXPANSION, dtype),
    }
    if use_aff:
        p["fuse"] = [
            {"att1": _conv_p(next(ks), 1, 1, 2 * width, max(width // 4, 4), dtype),
             "att2": _conv_p(next(ks), 1, 1, max(width // 4, 4), width, dtype)}
            for _ in range(SCALE - 1)]
    if stride != 1 or in_c != planes * EXPANSION:
        p["shortcut"] = _conv_p(next(ks), 1, 1, in_c, planes * EXPANSION, dtype)
    return p


def init_params(key: jax.Array, dtype=jnp.bfloat16) -> Params:
    ks = iter(jax.random.split(key, 16))
    params: Params = {"conv1": _conv_p(next(ks), 3, 3, 1, M_CHANNELS, dtype)}
    in_c = M_CHANNELS
    strides = (1, 2, 2, 2)
    for li, (blocks, stride) in enumerate(zip(NUM_BLOCKS, strides)):
        planes = M_CHANNELS * (2 ** li)
        layer_key = next(ks)
        layer = []
        for bi in range(blocks):
            layer.append(_block_p(jax.random.fold_in(layer_key, bi), in_c, planes,
                                  stride if bi == 0 else 1, li >= 2, dtype))
            in_c = planes * EXPANSION
        params[f"layer{li + 1}"] = layer
    c4 = M_CHANNELS * 8 * EXPANSION
    c3 = M_CHANNELS * 4 * EXPANSION
    params["layer3_ds"] = _conv_p(next(ks), 3, 3, c3, c4, dtype)
    params["fuse34"] = {
        "att1": _conv_p(next(ks), 1, 1, 2 * c4, c4 // 4, dtype),
        "att2": _conv_p(next(ks), 1, 1, c4 // 4, c4, dtype),
    }
    return params
