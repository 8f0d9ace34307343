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
# Torch checkpoint conversion (3D-Speaker ERes2NetV2 naming, BN folding)
# ---------------------------------------------------------------------------

def _fold_bn(w, bn_prefix, sd, eps: float = 1e-5):
    """Fold BatchNorm into the preceding conv: returns (w', b') with the
    torch conv layout [out, in, kh, kw] preserved."""
    import numpy as np

    gamma = np.asarray(sd[f"{bn_prefix}.weight"], np.float64)
    beta = np.asarray(sd[f"{bn_prefix}.bias"], np.float64)
    mean = np.asarray(sd[f"{bn_prefix}.running_mean"], np.float64)
    var = np.asarray(sd[f"{bn_prefix}.running_var"], np.float64)
    scale = gamma / np.sqrt(var + eps)
    w = np.asarray(w, np.float64) * scale[:, None, None, None]
    b = beta - mean * scale
    return w.astype(np.float32), b.astype(np.float32)


def _conv_bn(sd, conv_key, bn_key):
    """Folded conv+BN -> {'w': [kh,kw,in,out], 'b': [out]} (NHWC/HWIO)."""
    import numpy as np

    w, b = _fold_bn(sd[f"{conv_key}.weight"], bn_key, sd)
    if f"{conv_key}.bias" in sd:
        # conv bias flows through BN: y = scale*(conv+bias - mean)+beta
        gamma = np.asarray(sd[f"{bn_key}.weight"], np.float64)
        var = np.asarray(sd[f"{bn_key}.running_var"], np.float64)
        b = b + np.asarray(sd[f"{conv_key}.bias"], np.float64) * (
            gamma / np.sqrt(var + 1e-5))
        b = b.astype(np.float32)
    return {"w": np.transpose(w, (2, 3, 1, 0)), "b": b}


def _aff_from(sd, prefix):
    """AFF local_att Sequential(conv,BN,SiLU,conv,BN) -> {att1, att2}."""
    return {
        "att1": _conv_bn(sd, f"{prefix}.local_att.0", f"{prefix}.local_att.1"),
        "att2": _conv_bn(sd, f"{prefix}.local_att.3", f"{prefix}.local_att.4"),
    }


def convert_from_torch(sd) -> Params:
    """3D-Speaker ERes2NetV2 torch state dict -> param tree.

    Expected keys per block ``layer{L}.{i}``: conv1/bn1, convs.{j}/bns.{j}
    (j < SCALE), conv3/bn3, optional shortcut.0/shortcut.1 (Sequential
    conv+BN), and (layers 3-4) fuse_models.{j}.local_att.{0,1,3,4}.
    Top level: conv1/bn1, layer3_ds, fuse_mode34. All BatchNorms are
    folded into the convs; kernels land HWIO for NHWC compute.
    Raises KeyError with the missing key if a checkpoint deviates.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "shape")}
    params: Params = {"conv1": _conv_bn(sd, "conv1", "bn1")}
    for li, blocks in enumerate(NUM_BLOCKS):
        layer = []
        for bi in range(blocks):
            pre = f"layer{li + 1}.{bi}"
            n_convs = len([k for k in sd
                           if k.startswith(f"{pre}.convs.")
                           and k.endswith(".weight")])
            if n_convs != SCALE:
                raise KeyError(
                    f"{pre}: expected {SCALE} res2 convs, found {n_convs} — "
                    "checkpoint is not baseWidth=24/scale=4 ERes2NetV2")
            block = {
                "conv1": _conv_bn(sd, f"{pre}.conv1", f"{pre}.bn1"),
                "convs": [_conv_bn(sd, f"{pre}.convs.{j}", f"{pre}.bns.{j}")
                          for j in range(SCALE)],
                "conv3": _conv_bn(sd, f"{pre}.conv3", f"{pre}.bn3"),
            }
            if f"{pre}.shortcut.0.weight" in sd:
                block["shortcut"] = _conv_bn(
                    sd, f"{pre}.shortcut.0", f"{pre}.shortcut.1")
            if f"{pre}.fuse_models.0.local_att.0.weight" in sd:
                block["fuse"] = [
                    _aff_from(sd, f"{pre}.fuse_models.{j}")
                    for j in range(SCALE - 1)]
            layer.append(block)
        params[f"layer{li + 1}"] = layer
    ds = {"w": np.transpose(sd["layer3_ds.weight"], (2, 3, 1, 0))}
    if "layer3_ds.bias" in sd:
        ds["b"] = sd["layer3_ds.bias"].astype(np.float32)
    params["layer3_ds"] = ds
    params["fuse34"] = _aff_from(sd, "fuse_mode34")
    return params


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
