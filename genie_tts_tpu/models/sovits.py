"""SoVITS synthesizer (VITS flow + HiFi-GAN) — TPU-native.

Re-implements the capability of the reference's ~8.5k-node ONNX vocoder
graph (`/root/reference/src/genie_tts/Data/v2/Models/vits_fp32.onnx`,
structure recoverable from the key manifest
`Data/v2/Keys/vits_onnx_keys.txt`; invoked at
`/root/reference/src/genie_tts/Core/Inference.py:47-61`) as one jitted
function: semantic codes + phonemes + speaker conditioning -> 32 kHz
waveform.

Pipeline (GPT-SoVITS V2 geometry):
  quantizer codebook decode (1024x768, 25 Hz) -> 2x frame upsample (50 Hz)
  -> enc_p: ssl_proj, 3-layer rel-attn encoder_ssl | text embedding +
     6-layer encoder_text, MRTE cross-attention (512ch) + speaker add,
     3-layer encoder2, proj -> (m, logs)
  -> z_p = m + noise * exp(logs) * noise_scale
  -> 4 residual-coupling flow layers (reverse) with WaveNet conditioning
  -> HiFi-GAN generator: conv_pre + speaker cond, 5 transposed-conv
     upsample stages (10,8,2,2,2 -> hop 640), 15 MRF resblocks, conv_post.

Speaker conditioning:
  * V2: ``ge`` [B, 512, 1] computed in-model by the MelStyleEncoder
    (:func:`mel_style_encode`) from the reference linear spectrogram.
  * V2ProPlus: ``ge`` [B, 1024, 1] / ``ge_mrte`` [B, 512, 1] supplied by
    the external prompt encoder (models/prompt_encoder.py).

Weight-normed convs (``weight_g``/``weight_v``) are fused into plain
kernels at convert time; params here are always fused.

All conv activations use NWC layout ([B, T, C]) so XLA maps them onto the
MXU; masks are multiplicative [B, T, 1].
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import SoVITSConfig
from ..ops.folded import (conv_fold_meta, fold_conv_weights, fold_signal,
                          fold_tconv_weights, folded_conv, tconv_fold_meta,
                          unfold_signal)
from ..ops.layers import (conv1d, conv1d_ncw, conv1d_ncw_shiftdot,
                          conv_transpose1d, conv_transpose1d_ncw)

Params = Dict

LRELU_SLOPE = 0.1


# ---------------------------------------------------------------------------
# VITS-style relative-position attention encoder
# ---------------------------------------------------------------------------

def _vits_layer_norm(p, x):
    """LayerNorm over channels (gamma/beta), fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * p["gamma"] + p["beta"]
    return y.astype(x.dtype)


def _rel_to_abs(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,T,2T-1] relative logits -> [B,H,T,T] absolute (VITS trick)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, t * 2 * t)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t + 1, 2 * t - 1)
    return x[:, :, :t, t - 1:]


def _abs_to_rel(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,T,T] absolute weights -> [B,H,T,2T-1] relative."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t * (2 * t - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (t, 0)))
    x = x.reshape(b, h, t, 2 * t)
    return x[:, :, :, 1:]


def _get_rel_embeddings(emb: jnp.ndarray, t: int, window: int) -> jnp.ndarray:
    """Slice/pad the [1, 2*window+1, Dh] table to [1, 2t-1, Dh]."""
    pad = max(t - window - 1, 0)
    start = max(window + 1 - t, 0)
    emb = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return emb[:, start: start + 2 * t - 1]


def rel_attention(p, x: jnp.ndarray, mask: jnp.ndarray, n_heads: int,
                  window: int = 4) -> jnp.ndarray:
    """Self-attention with VITS relative position embeddings.

    x: [B, T, C]; mask: [B, T, T] bool (True = attend).
    """
    B, T, C = x.shape
    Dh = C // n_heads
    q = conv1d(p["q"], x).reshape(B, T, n_heads, Dh).transpose(0, 2, 1, 3)
    k = conv1d(p["k"], x).reshape(B, T, n_heads, Dh).transpose(0, 2, 1, 3)
    v = conv1d(p["v"], x).reshape(B, T, n_heads, Dh).transpose(0, 2, 1, 3)

    scale = Dh ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    rel_k = _get_rel_embeddings(p["emb_rel_k"].astype(q.dtype), T, window)
    rel_logits = jnp.einsum("bhqd,mrd->bhqr", q, rel_k,
                            preferred_element_type=jnp.float32)
    scores = scores + _rel_to_abs(rel_logits) * scale

    scores = jnp.where(mask[:, None], scores, jnp.float32(-1e4))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=v.dtype)
    rel_v = _get_rel_embeddings(p["emb_rel_v"].astype(v.dtype), T, window)
    rel_w = _abs_to_rel(probs).astype(v.dtype)
    out = out + jnp.einsum("bhqr,mrd->bhqd", rel_w, rel_v,
                           preferred_element_type=v.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    return conv1d(p["o"], out)


def _enc_ffn(p, x, mask_t):
    h = conv1d(p["conv1"], x * mask_t, padding=(p["conv1"]["w"].shape[0] - 1) // 2)
    h = jax.nn.relu(h)
    return conv1d(p["conv2"], h * mask_t, padding=(p["conv2"]["w"].shape[0] - 1) // 2)


def vits_encoder(p_stack, x: jnp.ndarray, mask_t: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """Stack of post-norm rel-attention blocks, scanned over layers.

    x: [B, T, C]; mask_t: [B, T, 1] float validity mask.
    """
    attn_mask = (mask_t[:, :, 0:1] * mask_t[:, None, :, 0]) > 0  # [B,T,T]
    x = x * mask_t

    def body(h, lp):
        y = rel_attention(lp["attn"], h * mask_t, attn_mask, n_heads)
        h = _vits_layer_norm(lp["norm1"], h + y)
        y = _enc_ffn(lp["ffn"], h, mask_t)
        h = _vits_layer_norm(lp["norm2"], h + y)
        return h, None

    x, _ = jax.lax.scan(body, x, p_stack)
    return x * mask_t


# ---------------------------------------------------------------------------
# MRTE cross-attention (speaker/text -> content fusion)
# ---------------------------------------------------------------------------

def mrte(p, ssl_enc, ssl_mask_t, text_enc, text_mask_t, ge, n_heads: int = 4):
    """ssl_enc [B,Ty,192], text_enc [B,Tx,192], ge [B,C,1] -> [B,Ty,192]."""
    B, Ty, _ = ssl_enc.shape
    Tx = text_enc.shape[1]
    c = conv1d(p["c_pre"], ssl_enc * ssl_mask_t)          # [B,Ty,512]
    t = conv1d(p["text_pre"], text_enc * text_mask_t)     # [B,Tx,512]
    C = c.shape[-1]
    Dh = C // n_heads
    q = conv1d(p["attn_q"], c).reshape(B, Ty, n_heads, Dh).transpose(0, 2, 1, 3)
    k = conv1d(p["attn_k"], t).reshape(B, Tx, n_heads, Dh).transpose(0, 2, 1, 3)
    v = conv1d(p["attn_v"], t).reshape(B, Tx, n_heads, Dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (Dh ** -0.5)
    attn_mask = (ssl_mask_t[:, :, 0:1] * text_mask_t[:, None, :, 0]) > 0
    scores = jnp.where(attn_mask[:, None], scores, jnp.float32(-1e4))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=v.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, Ty, C)
    x = conv1d(p["attn_o"], o) + c + ge[:, :, 0][:, None, :].astype(c.dtype)
    return conv1d(p["c_post"], x * ssl_mask_t)


# ---------------------------------------------------------------------------
# WaveNet conditioning stack + residual coupling flow
# ---------------------------------------------------------------------------

def wavenet(p, x, mask_t, g, n_layers: int, hidden: int, kernel: int):
    """WN: gated dilated convs (dilation 1) with speaker conditioning.

    x: [B,T,hidden]; g: [B,C_gin,1]. cond_layer maps g once for all layers.
    """
    # cond over the [B,1,C_gin] "sequence": one 1x1 conv -> [B,1,2*hidden*L]
    g_all = conv1d(p["cond_layer"], g.transpose(0, 2, 1).astype(x.dtype))
    out = jnp.zeros_like(x)
    pad = (kernel - 1) // 2
    for i in range(n_layers):
        x_in = conv1d(p["in_layers"][i], x * mask_t, padding=pad)
        g_i = g_all[:, :, i * 2 * hidden: (i + 1) * 2 * hidden]
        acts = x_in + g_i
        t_act = jnp.tanh(acts[..., :hidden])
        s_act = jax.nn.sigmoid(acts[..., hidden:])
        h = t_act * s_act
        rs = conv1d(p["res_skip_layers"][i], h)
        if i < n_layers - 1:
            x = (x + rs[..., :hidden]) * mask_t
            out = out + rs[..., hidden:]
        else:
            out = out + rs
    return out * mask_t


def flow_reverse(p_stack, x, mask_t, g, cfg: SoVITSConfig):
    """Residual coupling block, reverse direction.

    x: [B,T,192]. Forward order is (coupling, flip) x4; reverse undoes it:
    for each coupling (last->first): channel-flip, then inverse coupling.
    """
    half = cfg.inter_channels // 2

    def inv_coupling(x, lp):
        x = jnp.flip(x, axis=-1)  # undo the Flip flow
        x0, x1 = x[..., :half], x[..., half:]
        h = conv1d(lp["pre"], x0) * mask_t
        h = wavenet(lp["enc"], h, mask_t, g, cfg.wn_layers,
                    cfg.hidden_channels, cfg.wn_kernel)
        m = conv1d(lp["post"], h) * mask_t
        x1 = (x1 - m) * mask_t
        return jnp.concatenate([x0, x1], axis=-1), None

    x, _ = jax.lax.scan(inv_coupling, x, p_stack, reverse=True)
    return x


# ---------------------------------------------------------------------------
# HiFi-GAN generator (MRF)
# ---------------------------------------------------------------------------

def _use_shiftdot(batch: int, channels: int, kernel: int) -> bool:
    """Per-site choice between XLA's conv lowering and the shift+dot
    formulation (ops.layers.conv1d_ncw_shiftdot) for the HiFi-GAN tail.

    Measured on v5e. Per-site (scripts/exp_hifigan_convs.py): shift+dot
    wins for small-channel/short-kernel sites (k=3 at C<=64, conv_post)
    and loses for wide kernels at larger C (k=11 C=64: 0.6x). Whole-graph
    (scripts/exp_hifigan_policy.py): those wins hold at B<=4 (B=1 F=304:
    23.3 -> 15.9 ms; B=4: 72.5 -> 55.4) but invert at B=8 (62.9 -> 89.2),
    where XLA's batched conv lowering already saturates — so the policy is
    also batch-gated. Override for experiments with
    GENIE_HIFIGAN_SHIFTDOT=never|always.
    """
    import os

    mode = os.environ.get("GENIE_HIFIGAN_SHIFTDOT", "")
    if mode == "never":
        return False
    if mode == "always":
        return True
    return batch <= 4 and (kernel <= 3 or channels <= 32)


def _res_conv(p, x, kernel: int, dilation: int, padding: int):
    if _use_shiftdot(x.shape[0], x.shape[1], kernel):
        return conv1d_ncw_shiftdot(p, x, padding=padding, dilation=dilation)
    return conv1d_ncw(p, x, padding=padding, dilation=dilation)


def _resblock(p, x, kernel: int, dilations: Tuple[int, ...], mask_t):
    """MRF residual block in NCW layout ([B, C, T]). ``mask_t`` ([B, 1, T])
    zeroes pad positions after every conv so bucketed (padded) execution is
    bit-equivalent to exact-length."""
    for d, c1, c2 in zip(dilations, p["convs1"], p["convs2"]):
        h = jax.nn.leaky_relu(x, LRELU_SLOPE)
        h = _res_conv(c1, h, kernel, d, (kernel * d - d) // 2) * mask_t
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        h = _res_conv(c2, h, kernel, 1, (kernel - 1) // 2) * mask_t
        x = x + h
    return x


def _folded_resblock(p, x, kernel: int, dilations: Tuple[int, ...], r: int,
                     mask_c):
    """MRF residual block on a folded signal [B, r*C, M] (ops/folded.py).
    Bit-equivalent to _resblock in exact arithmetic: every folded conv is
    a pure re-indexing of the fine taps, and the coarse mask zeroes whole
    columns exactly where the fine mask zeroes their r samples."""
    for d, c1, c2 in zip(dilations, p["convs1"], p["convs2"]):
        h = jax.nn.leaky_relu(x, LRELU_SLOPE)
        q0, _ = conv_fold_meta(kernel, d, (kernel * d - d) // 2, r)
        h = folded_conv(c1, h, q0) * mask_c
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        q0, _ = conv_fold_meta(kernel, 1, (kernel - 1) // 2, r)
        h = folded_conv(c2, h, q0) * mask_c
        x = x + h
    return x


def fold_decoder(dec, cfg: SoVITSConfig, start_stage: int = 2,
                 r0: int = 1):
    """Re-index the HiFi-GAN tail weights into folded (space-to-channel)
    form (ops/folded.py). Host-side, once per character load.

    Stages ``start_stage..`` and conv_post are replaced by dense folded
    weights ("fups"/"fresblocks"/"fpost"); the wide head stages keep the
    fine layout. ``r0`` extra-folds the tail input (fold r0 at stage
    ``start_stage``, growing by each stride), trading FLOPs for wider
    MXU operands. All fold geometry is recoverable from static shapes at
    trace time, so no non-array leaves enter the params pytree.
    """
    import numpy as np

    if start_stage >= len(cfg.upsample_rates):
        return dec          # nothing to fold (tiny/test geometries)
    head_scale = int(np.prod(cfg.upsample_rates[:start_stage]))
    if r0 < 1 or head_scale % r0 != 0:
        raise ValueError(
            f"GENIE_HIFI_FOLD={r0} is invalid: the extra tail fold must be "
            f">=1 and divide the head-stage scale {head_scale} "
            f"(= prod of upsample_rates[:{start_stage}] = "
            f"{tuple(cfg.upsample_rates[:start_stage])})")
    n_k = len(cfg.resblock_kernels)
    out = {
        "conv_pre": dec["conv_pre"], "cond": dec["cond"],
        "ups": list(dec["ups"][:start_stage]),
        "resblocks": list(dec["resblocks"][:start_stage * n_k]),
    }
    r = r0
    fups, fres = [], []
    for i in range(start_stage, len(cfg.upsample_rates)):
        u, k = cfg.upsample_rates[i], cfg.upsample_kernels[i]
        up = dec["ups"][i]
        fups.append(fold_tconv_weights(
            np.asarray(up["w"]), np.asarray(up["b"]) if "b" in up else None,
            u, (k - u) // 2, r))
        r *= u
        for j in range(n_k):
            rb = dec["resblocks"][i * n_k + j]
            kern = cfg.resblock_kernels[j]
            dils = cfg.resblock_dilations[j]
            fres.append({
                "convs1": [fold_conv_weights(
                    np.asarray(c["w"]),
                    np.asarray(c["b"]) if "b" in c else None,
                    d, (kern * d - d) // 2, r)
                    for c, d in zip(rb["convs1"], dils)],
                "convs2": [fold_conv_weights(
                    np.asarray(c["w"]),
                    np.asarray(c["b"]) if "b" in c else None,
                    1, (kern - 1) // 2, r)
                    for c in rb["convs2"]],
            })
    cp = dec["conv_post"]
    k_post = int(np.asarray(cp["w"]).shape[0])
    out["fpost"] = fold_conv_weights(
        np.asarray(cp["w"]), np.asarray(cp["b"]) if "b" in cp else None,
        1, (k_post - 1) // 2, r)
    # keep the fine conv_post weights so the forward can recover the fold
    # geometry (kernel/padding) from static shapes instead of hardcoding it
    out["conv_post"] = dec["conv_post"]
    out["fups"] = fups
    out["fresblocks"] = fres
    return jax.tree.map(jnp.asarray, out)


def hifigan(p, x, ge, cfg: SoVITSConfig, frames_len=None):
    """z [B,T,192] + ge [B,C_gin,1] -> waveform [B, T*hop].

    Runs internally in NCW layout ([B, C, T]): the upsampled tail stages
    have few channels and very long T, and TPU (8, 128) tiling in NWC
    would pad channels 16 -> 128 (8x HBM). NCW keeps T in lanes.

    ``frames_len`` [B]: valid latent frames per row; positions beyond are
    masked at every stage so conv biases in the pad region cannot bleed
    into valid samples.

    If ``p`` carries folded tail weights ("fups", from fold_decoder), the
    low-channel tail stages run in the folded domain: time phases move
    into channels so every conv is a dense >=128-wide matmul on the MXU
    instead of a starved VPU conv.
    """
    T = x.shape[1]
    if frames_len is None:
        frames_len = jnp.full((x.shape[0],), T, jnp.int32)

    def make_mask(length_scale):
        return (jnp.arange(T * length_scale)[None, None, :]
                < frames_len[:, None, None] * length_scale).astype(x.dtype)

    x = x.transpose(0, 2, 1)                       # [B, 192, T]
    mask = make_mask(1)
    x = conv1d_ncw(p["conv_pre"], x, padding=3)
    x = (x + conv1d_ncw(p["cond"], ge.astype(x.dtype))) * mask
    n_k = len(cfg.resblock_kernels)
    n_stages = len(cfg.upsample_rates)
    start = n_stages - len(p["fups"]) if "fups" in p else n_stages
    scale = 1
    for i in range(start):
        u, k = cfg.upsample_rates[i], cfg.upsample_kernels[i]
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d_ncw(p["ups"][i], x, stride=u, padding=(k - u) // 2)
        scale *= u
        mask = make_mask(scale)
        x = x * mask
        acc = None
        for j in range(n_k):
            r = _resblock(p["resblocks"][i * n_k + j], x,
                          cfg.resblock_kernels[j], cfg.resblock_dilations[j], mask)
            acc = r if acc is None else acc + r
        x = acc / n_k
    if start < n_stages:
        # folded tail — all geometry below is static (shapes/config only)
        c_in = cfg.upsample_initial >> start
        r = p["fups"][0]["w"].shape[1] // c_in     # = r0, statically
        if r > 1:
            x = fold_signal(x, r)
        # coarse column count and valid-column count are invariant over
        # the tail: each tconv scales fine length and fold by the same u.
        cols_per_frame = scale // r
        assert scale % r == 0
        mask_c = (jnp.arange(x.shape[2])[None, None, :]
                  < frames_len[:, None, None] * cols_per_frame).astype(x.dtype)
        for i in range(start, n_stages):
            u, k = cfg.upsample_rates[i], cfg.upsample_kernels[i]
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            q0, _ = tconv_fold_meta(k, u, (k - u) // 2, r)
            x = folded_conv(p["fups"][i - start], x, q0) * mask_c
            r *= u
            acc = None
            for j in range(n_k):
                rr = _folded_resblock(
                    p["fresblocks"][(i - start) * n_k + j], x,
                    cfg.resblock_kernels[j], cfg.resblock_dilations[j],
                    r, mask_c)
                acc = rr if acc is None else acc + rr
            x = acc / n_k
        x = jax.nn.leaky_relu(x, 0.01)             # torch-default slope
        k_post = p["conv_post"]["w"].shape[0]      # fine kernel, static
        q0, _ = conv_fold_meta(k_post, 1, (k_post - 1) // 2, r)
        x = folded_conv(p["fpost"], x, q0) * mask_c
        x = unfold_signal(x, r)                    # [B, 1, T*hop]
        return jnp.tanh(x.astype(jnp.float32))[:, 0, :]
    # final activation uses the torch default slope 0.01, not LRELU_SLOPE —
    # verified against the reference graph (vits_fp32.onnx node
    # /vq_model/dec/LeakyRelu_5, alpha=0.01; HiFi-GAN's F.leaky_relu(x))
    x = jax.nn.leaky_relu(x, 0.01)
    if _use_shiftdot(x.shape[0], x.shape[1], 7):
        x = conv1d_ncw_shiftdot(p["conv_post"], x, padding=3) * mask
    else:
        x = conv1d_ncw(p["conv_post"], x, padding=3) * mask
    return jnp.tanh(x.astype(jnp.float32))[:, 0, :]


# ---------------------------------------------------------------------------
# MelStyleEncoder (V2 in-model reference encoder)
# ---------------------------------------------------------------------------

def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def mel_style_encode(p, spec: jnp.ndarray, mask_t: jnp.ndarray, n_heads: int = 2):
    """Linear spectrogram [B,T,spec_channels] -> style vector [B,gin,1].

    spectral FCs + Mish -> 2x Conv1dGLU temporal blocks -> residual
    self-attention -> fc -> masked mean pool.
    """
    x = _mish(jnp.dot(spec, p["spectral0"]["w"]) + p["spectral0"]["b"])
    x = _mish(jnp.dot(x, p["spectral3"]["w"]) + p["spectral3"]["b"])
    x = x * mask_t  # keep pad positions zero so temporal convs match exact-length
    for glu in p["temporal"]:
        h = conv1d(glu, x, padding=(glu["w"].shape[0] - 1) // 2)
        a, b = jnp.split(h, 2, axis=-1)
        x = (x + a * jax.nn.sigmoid(b)) * mask_t
    # residual multi-head self-attention
    B, T, C = x.shape
    Dh = C // n_heads
    q = (jnp.dot(x, p["w_qs"]["w"]) + p["w_qs"]["b"]).reshape(B, T, n_heads, Dh).transpose(0, 2, 1, 3)
    k = (jnp.dot(x, p["w_ks"]["w"]) + p["w_ks"]["b"]).reshape(B, T, n_heads, Dh).transpose(0, 2, 1, 3)
    v = (jnp.dot(x, p["w_vs"]["w"]) + p["w_vs"]["b"]).reshape(B, T, n_heads, Dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / (Dh ** 0.5)
    amask = (mask_t[:, :, 0:1] * mask_t[:, None, :, 0]) > 0
    scores = jnp.where(amask[:, None], scores, jnp.float32(-1e4))
    o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1).astype(v.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, C)
    x = x + (jnp.dot(o, p["attn_fc"]["w"]) + p["attn_fc"]["b"])
    x = jnp.dot(x, p["fc"]["w"]) + p["fc"]["b"]          # [B,T,gin]
    w = jnp.sum(x * mask_t, axis=1) / jnp.maximum(jnp.sum(mask_t, axis=1), 1.0)
    return w[:, :, None]                                  # [B,gin,1]


# ---------------------------------------------------------------------------
# Full synthesis
# ---------------------------------------------------------------------------

def quantizer_decode(params, codes: jnp.ndarray) -> jnp.ndarray:
    """Semantic codes [B,Ts] -> latent [B, 2*Ts, 768] (25 Hz -> 50 Hz)."""
    q = params["quantizer_embed"][codes]                  # [B,Ts,768]
    return jnp.repeat(q, 2, axis=1)


def text_encode(params, cfg: SoVITSConfig, ssl_latent, y_mask_t, text_ids, text_mask_t, ge_mrte):
    """enc_p: latent+text+speaker -> (m, logs). All [B,T,*] NWC."""
    p = params["enc_p"]
    dt = ssl_latent.dtype
    y = conv1d(p["ssl_proj"], ssl_latent * y_mask_t) * y_mask_t
    y = vits_encoder(p["encoder_ssl"], y, y_mask_t, cfg.n_heads)
    t = p["text_embed"][text_ids].astype(dt)
    t = vits_encoder(p["encoder_text"], t * text_mask_t, text_mask_t, cfg.n_heads)
    y = mrte(p["mrte"], y, y_mask_t, t, text_mask_t, ge_mrte)
    y = vits_encoder(p["encoder2"], y, y_mask_t, cfg.n_heads)
    stats = conv1d(p["proj"], y) * y_mask_t
    m, logs = jnp.split(stats, 2, axis=-1)
    return m, logs


def synthesize_latent(
    params: Params,
    cfg: SoVITSConfig,
    key: jax.Array,
    codes: jnp.ndarray,        # [B, Ts] semantic tokens (25 Hz)
    codes_len: jnp.ndarray,    # [B]
    text_ids: jnp.ndarray,     # [B, Tx]
    text_len: jnp.ndarray,     # [B]
    ge: jnp.ndarray,           # [B, gin, 1] speaker cond for flow/dec
    ge_mrte: jnp.ndarray,      # [B, 512, 1] speaker cond for MRTE
    noise_scale: float = 0.5,
) -> jnp.ndarray:
    """Codes -> pre-vocoder latent z [B, 2*Ts, 192] (masked).

    The latent stage (enc_p attention + flow) is global over the utterance;
    the HiFi-GAN generator is translation-local (finite receptive field)
    and can be applied to halo-padded chunks of z for streaming synthesis
    and bounded memory (:func:`vocode_frames`).
    """
    latent = quantizer_decode(params, codes)              # [B, T50, 768]
    B, T50, _ = latent.shape
    y_mask_t = (jnp.arange(T50)[None, :] < 2 * codes_len[:, None]).astype(latent.dtype)[..., None]
    text_mask_t = (jnp.arange(text_ids.shape[1])[None, :] < text_len[:, None]).astype(latent.dtype)[..., None]

    m, logs = text_encode(params, cfg, latent, y_mask_t, text_ids, text_mask_t, ge_mrte)
    noise = jax.random.normal(key, m.shape, dtype=jnp.float32)
    z_p = (m.astype(jnp.float32) + noise * jnp.exp(logs.astype(jnp.float32)) * noise_scale).astype(latent.dtype)
    z = flow_reverse(params["flow"], z_p * y_mask_t, y_mask_t, ge, cfg)
    return z * y_mask_t


def synthesize_latent_rows(
    params: Params,
    cfg: SoVITSConfig,
    keys: jax.Array,           # [B, 2] uint32 — one PRNG key PER ROW
    codes: jnp.ndarray,
    codes_len: jnp.ndarray,
    text_ids: jnp.ndarray,
    text_len: jnp.ndarray,
    ge: jnp.ndarray,
    ge_mrte: jnp.ndarray,
    noise_scale: float = 0.5,
    noise_frames: int = 0,
) -> jnp.ndarray:
    """:func:`synthesize_latent` with PER-ROW flow-noise keys.

    Incremental window vocoding (the slot batcher's streaming finisher)
    recomputes a request's prefix latent as its decode grows, in batches
    whose composition changes between pumps. With a single batch key the
    noise at a given (row, position) depends on the row's index and the
    padded length, so windows of one utterance vocoded in different pumps
    would see DIFFERENT noise realizations — audible seams at window
    joins. Per-row keys + a FIXED generation size make the noise a pure
    function of (request key, position). JAX's counter-based threefry is
    row-major prefix-stable across array growth (verified in
    tests/test_slot_windows.py), so per-row keys alone suffice;
    ``noise_frames`` additionally pins the generated size and slices the
    prefix — a guard if a future PRNG implementation loses that property
    (set it to the deployment's max frame bucket).
    """
    latent = quantizer_decode(params, codes)
    B, T50, _ = latent.shape
    y_mask_t = (jnp.arange(T50)[None, :] < 2 * codes_len[:, None]).astype(latent.dtype)[..., None]
    text_mask_t = (jnp.arange(text_ids.shape[1])[None, :] < text_len[:, None]).astype(latent.dtype)[..., None]

    m, logs = text_encode(params, cfg, latent, y_mask_t, text_ids,
                          text_mask_t, ge_mrte)
    nf = max(noise_frames, T50)
    noise = jax.vmap(
        lambda k: jax.random.normal(
            k, (nf,) + m.shape[2:], dtype=jnp.float32)[:T50])(keys)
    z_p = (m.astype(jnp.float32) + noise * jnp.exp(logs.astype(jnp.float32)) * noise_scale).astype(latent.dtype)
    z = flow_reverse(params["flow"], z_p * y_mask_t, y_mask_t, ge, cfg)
    return z * y_mask_t


def vocode_frames(params: Params, cfg: SoVITSConfig, z: jnp.ndarray,
                  ge: jnp.ndarray, frames_valid: jnp.ndarray) -> jnp.ndarray:
    """HiFi-GAN over a latent window. z [B, Tc, 192] -> [B, Tc*hop]."""
    return hifigan(params["dec"], z, ge, cfg, frames_len=frames_valid)


def vocode_window_rows(params: Params, cfg: SoVITSConfig, z: jnp.ndarray,
                       ge: jnp.ndarray, starts: jnp.ndarray,
                       frames_valid: jnp.ndarray, win: int) -> jnp.ndarray:
    """HiFi-GAN over a PER-ROW window of the latent.

    z [B, F, 192]; starts [B] (window start frame per row, pre-clamped to
    F - win); frames_valid [B] (total valid frames per row). Returns
    [B, win*hop]. Rows at different emit positions vocode as one batch —
    the slot batcher's window pump."""
    zw = jax.vmap(
        lambda zr, s: jax.lax.dynamic_slice(zr, (s, 0), (win, zr.shape[1])))(
            z, starts)
    valid = jnp.clip(frames_valid - starts, 0, win)
    return hifigan(params["dec"], zw, ge, cfg, frames_len=valid)


def vocode_frames_chunked(params: Params, cfg: SoVITSConfig, z: jnp.ndarray,
                          ge: jnp.ndarray, frames_valid: jnp.ndarray,
                          chunk: int, halo: int) -> jnp.ndarray:
    """In-graph chunked HiFi-GAN with invalid-window SKIP.

    Equivalent to the host-side chunked dispatch
    (``engine._vocode_dispatch``: halo-padded windows, halo trimmed from
    the output) but inside one jit, for the fused solo path. Two wins
    over one whole-``F`` hifigan call: chunk-sized windows are faster on
    v5e (measured 133 vs 207 ms at F=512), and ``lax.cond`` skips windows
    past ``frames_valid`` entirely — the fused graph's decode cap can be
    a coarse static bucket while vocode work stays proportional to the
    EMITTED length (dynamic-ladder serving).

    ``frames_valid`` must be a scalar-like [1] (B=1 path) — the skip
    predicate is batch-uniform.
    """
    B, F, _ = z.shape
    hop = cfg.hop_length
    if F <= chunk + 2 * halo:
        return vocode_frames(params, cfg, z, ge, frames_valid)
    out = jnp.zeros((B, F * hop), jnp.float32)
    fv = jnp.max(frames_valid)
    for start in range(0, F, chunk):
        s0 = max(start - halo, 0)
        s1 = min(start + chunk + halo, F)
        zc = jax.lax.slice_in_dim(z, s0, s1, axis=1)
        valid = jnp.clip(frames_valid - s0, 0, s1 - s0)
        n = min(chunk, F - start)

        def vocode_window(out, zc=zc, valid=valid, s0=s0, start=start, n=n):
            a = vocode_frames(params, cfg, zc, ge, valid)
            piece = jax.lax.slice_in_dim(
                a, (start - s0) * hop, (start - s0 + n) * hop, axis=1)
            return jax.lax.dynamic_update_slice(
                out, piece.astype(out.dtype), (0, start * hop))

        out = jax.lax.cond(fv > start, vocode_window, lambda o: o, out)
    return out


def synthesize(
    params: Params,
    cfg: SoVITSConfig,
    key: jax.Array,
    codes: jnp.ndarray,
    codes_len: jnp.ndarray,
    text_ids: jnp.ndarray,
    text_len: jnp.ndarray,
    ge: jnp.ndarray,
    ge_mrte: jnp.ndarray,
    noise_scale: float = 0.5,
) -> jnp.ndarray:
    """Full SoVITS decode -> waveform [B, 2*Ts*hop]. Frames beyond
    codes_len produce garbage; callers trim to 2*codes_len*hop samples."""
    z = synthesize_latent(params, cfg, key, codes, codes_len, text_ids,
                          text_len, ge, ge_mrte, noise_scale)
    return hifigan(params["dec"], z, ge, cfg, frames_len=2 * codes_len)


def reference_embedding(params, cfg: SoVITSConfig, spec: jnp.ndarray, spec_len: jnp.ndarray):
    """V2 path: linear spectrogram of ref audio -> ge [B, gin, 1]."""
    mask_t = (jnp.arange(spec.shape[1])[None, :] < spec_len[:, None]).astype(spec.dtype)[..., None]
    return mel_style_encode(params["ref_enc"], spec, mask_t)


# ---------------------------------------------------------------------------
# Random init (tests / benches; real weights come from convert/)
# ---------------------------------------------------------------------------

def _key_stream(key):
    i = 0
    while True:
        yield jax.random.fold_in(key, i)
        i += 1


def _dense(k, i, o, dtype):
    return {"w": (jax.random.normal(k, (i, o)) * (i ** -0.5)).astype(dtype),
            "b": jnp.zeros((o,), dtype)}


def _conv(k, width, i, o, dtype, bias=True):
    p = {"w": (jax.random.normal(k, (width, i, o)) * ((i * width) ** -0.5)).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((o,), dtype)
    return p


def _enc_stack(key, n_layers, C, F, n_heads, kernel, dtype):
    def one(k):
        ks = jax.random.split(k, 8)
        Dh = C // n_heads
        return {
            "attn": {
                "q": _conv(ks[0], 1, C, C, dtype), "k": _conv(ks[1], 1, C, C, dtype),
                "v": _conv(ks[2], 1, C, C, dtype), "o": _conv(ks[3], 1, C, C, dtype),
                "emb_rel_k": (jax.random.normal(ks[6], (1, 9, Dh)) * Dh ** -0.5).astype(dtype),
                "emb_rel_v": (jax.random.normal(ks[7], (1, 9, Dh)) * Dh ** -0.5).astype(dtype),
            },
            "norm1": {"gamma": jnp.ones((C,), jnp.float32), "beta": jnp.zeros((C,), jnp.float32)},
            "ffn": {"conv1": _conv(ks[4], kernel, C, F, dtype),
                    "conv2": _conv(ks[5], kernel, F, C, dtype)},
            "norm2": {"gamma": jnp.ones((C,), jnp.float32), "beta": jnp.zeros((C,), jnp.float32)},
        }
    leaves = [one(k) for k in jax.random.split(key, n_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)


def init_params(key: jax.Array, cfg: SoVITSConfig, dtype=jnp.bfloat16) -> Params:
    ks = _key_stream(key)
    C, F, H = cfg.hidden_channels, cfg.filter_channels, cfg.n_heads
    gin = cfg.gin_channels
    half = cfg.inter_channels // 2

    def flow_layer(k):
        kk = jax.random.split(k, 3 + 2 * cfg.wn_layers)
        return {
            "pre": _conv(kk[0], 1, half, C, dtype),
            "post": _conv(kk[1], 1, C, half, dtype),
            "enc": {
                "cond_layer": _conv(kk[2], 1, gin, 2 * C * cfg.wn_layers, dtype),
                "in_layers": [_conv(kk[3 + i], cfg.wn_kernel, C, 2 * C, dtype)
                              for i in range(cfg.wn_layers)],
                "res_skip_layers": [
                    _conv(kk[3 + cfg.wn_layers + i], 1, C,
                          2 * C if i < cfg.wn_layers - 1 else C, dtype)
                    for i in range(cfg.wn_layers)],
            },
        }

    flow_leaves = [flow_layer(k) for k in jax.random.split(next(ks), cfg.flow_layers)]
    flow_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *flow_leaves)

    ups, resblocks = [], []
    ch = cfg.upsample_initial
    for i, (u, k_up) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        ups.append(_conv(next(ks), k_up, ch, ch // 2, dtype))
        ch //= 2
        for kern, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            resblocks.append({
                "convs1": [_conv(next(ks), kern, ch, ch, dtype) for _ in dils],
                "convs2": [_conv(next(ks), kern, ch, ch, dtype) for _ in dils],
            })

    params = {
        "quantizer_embed": jax.random.normal(next(ks), (cfg.vq_codes, cfg.vq_dim)).astype(jnp.float32),
        "enc_p": {
            "ssl_proj": _conv(next(ks), 1, cfg.vq_dim, C, dtype),
            "text_embed": (jax.random.normal(next(ks), (732, C)) * 0.02).astype(dtype),
            "encoder_ssl": _enc_stack(next(ks), cfg.n_layers // 2, C, F, H, cfg.kernel_size, dtype),
            "encoder_text": _enc_stack(next(ks), cfg.n_layers, C, F, H, cfg.kernel_size, dtype),
            "encoder2": _enc_stack(next(ks), cfg.n_layers // 2, C, F, H, cfg.kernel_size, dtype),
            "mrte": {
                "c_pre": _conv(next(ks), 1, C, cfg.mrte_channels, dtype),
                "text_pre": _conv(next(ks), 1, C, cfg.mrte_channels, dtype),
                "attn_q": _conv(next(ks), 1, cfg.mrte_channels, cfg.mrte_channels, dtype),
                "attn_k": _conv(next(ks), 1, cfg.mrte_channels, cfg.mrte_channels, dtype),
                "attn_v": _conv(next(ks), 1, cfg.mrte_channels, cfg.mrte_channels, dtype),
                "attn_o": _conv(next(ks), 1, cfg.mrte_channels, cfg.mrte_channels, dtype),
                "c_post": _conv(next(ks), 1, cfg.mrte_channels, C, dtype),
            },
            "proj": _conv(next(ks), 1, C, cfg.inter_channels * 2, dtype),
        },
        "flow": flow_stack,
        "dec": {
            "conv_pre": _conv(next(ks), 7, cfg.inter_channels, cfg.upsample_initial, dtype),
            "cond": _conv(next(ks), 1, gin, cfg.upsample_initial, dtype),
            "ups": ups,
            "resblocks": resblocks,
            "conv_post": _conv(next(ks), 7, ch, 1, dtype, bias=False),
        },
        "ref_enc": {
            "spectral0": _dense(next(ks), cfg.spec_channels, 128, dtype),
            "spectral3": _dense(next(ks), 128, 128, dtype),
            "temporal": [_conv(next(ks), 5, 128, 256, dtype) for _ in range(2)],
            "w_qs": _dense(next(ks), 128, 128, dtype),
            "w_ks": _dense(next(ks), 128, 128, dtype),
            "w_vs": _dense(next(ks), 128, 128, dtype),
            "attn_fc": _dense(next(ks), 128, 128, dtype),
            "fc": _dense(next(ks), 128, gin, dtype),
        },
    }
    return params
