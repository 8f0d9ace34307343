"""Folded (space-to-channel) conv exactness vs the fine-rate reference.

The folded HiFi-GAN tail (ops/folded.py) must be numerically identical
(fp32; pure weight re-indexing) to conv1d_ncw / conv_transpose1d_ncw on
the geometries HiFi-GAN uses (reference graph: GPT-SoVITS Generator,
SURVEY.md §2.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.ops.folded import (
    conv_fold_meta, fold_conv_weights, fold_signal, fold_tconv_weights,
    folded_conv, tconv_fold_meta, unfold_signal,
)
from genie_tts_tpu.ops.layers import conv1d_ncw, conv_transpose1d_ncw


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("k,d,r", [
    (3, 1, 2), (3, 1, 8), (7, 3, 2), (7, 3, 4), (11, 5, 4), (11, 5, 8),
    (7, 1, 16), (1, 1, 4),
])
def test_folded_conv_matches_fine(k, d, r):
    rng = np.random.default_rng(0)
    Ci, Co, M = 16, 16, 24
    T = M * r
    pad = (k - 1) * d // 2
    w, b = _rand(rng, k, Ci, Co), _rand(rng, Co)
    x = _rand(rng, 2, Ci, T)
    ref = conv1d_ncw({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                     jnp.asarray(x), padding=pad, dilation=d)
    fp = jax.tree.map(jnp.asarray, fold_conv_weights(w, b, d, pad, r))
    q0, Q = conv_fold_meta(k, d, pad, r)
    assert fp["w"].shape[0] == Q
    got = unfold_signal(folded_conv(fp, fold_signal(jnp.asarray(x), r), q0), r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,u,r_in", [
    (16, 10, 1), (16, 8, 1), (8, 2, 1), (8, 2, 2), (2, 2, 1),
    (2, 2, 4), (2, 2, 8), (4, 2, 2),
])
def test_folded_tconv_matches_fine(k, u, r_in):
    rng = np.random.default_rng(1)
    Ci, Co, M = 8, 8, 12
    T = M * r_in
    pad = (k - u) // 2
    w, b = _rand(rng, k, Ci, Co), _rand(rng, Co)
    x = _rand(rng, 2, Ci, T)
    ref = conv_transpose1d_ncw({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                               jnp.asarray(x), stride=u, padding=pad)
    assert ref.shape[2] == T * u  # geometry must preserve length
    fp = jax.tree.map(jnp.asarray, fold_tconv_weights(w, b, u, pad, r_in))
    q0, Q = tconv_fold_meta(k, u, pad, r_in)
    assert fp["w"].shape[0] == Q
    got = unfold_signal(
        folded_conv(fp, fold_signal(jnp.asarray(x), r_in), q0), u * r_in)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _make_dec(rng, cfg, inter, gin):
    def conv(k, i, o, bias=True):
        p = {"w": jnp.asarray(_rand(rng, k, i, o))}
        if bias:
            p["b"] = jnp.asarray(_rand(rng, o))
        return p

    ups, resblocks = [], []
    ch = cfg.upsample_initial
    for u, k in zip(cfg.upsample_rates, cfg.upsample_kernels):
        ups.append(conv(k, ch, ch // 2))
        ch //= 2
        for kern, dils in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            resblocks.append({
                "convs1": [conv(kern, ch, ch) for _ in dils],
                "convs2": [conv(kern, ch, ch) for _ in dils],
            })
    return {"conv_pre": conv(7, inter, cfg.upsample_initial),
            "cond": conv(1, gin, cfg.upsample_initial),
            "ups": ups, "resblocks": resblocks,
            "conv_post": conv(7, ch, 1, bias=False)}


@pytest.mark.parametrize("r0", [1, 2])
def test_folded_hifigan_matches_fine(r0):
    """Full folded tail vs the fine hifigan at the production upsample
    geometry (rates 10,8,2,2,2 / kernels 16,16,8,2,2), tiny channels,
    ragged frames_len."""
    from genie_tts_tpu.config import SoVITSConfig
    from genie_tts_tpu.models import sovits

    cfg = SoVITSConfig(
        inter_channels=16, gin_channels=8,
        upsample_rates=(10, 8, 2, 2, 2), upsample_kernels=(16, 16, 8, 2, 2),
        upsample_initial=32,
        resblock_kernels=(3, 11), resblock_dilations=((1, 3, 5), (1, 3, 5)))
    rng = np.random.default_rng(3)
    dec = _make_dec(rng, cfg, 16, 8)
    B, T = 2, 6
    x = jnp.asarray(_rand(rng, B, T, 16))
    ge = jnp.asarray(_rand(rng, B, 8, 1))
    frames_len = jnp.array([T, T - 2], jnp.int32)
    ref = sovits.hifigan(dec, x, ge, cfg, frames_len)
    fdec = sovits.fold_decoder(dec, cfg, start_stage=2, r0=r0)
    got = sovits.hifigan(fdec, x, ge, cfg, frames_len)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fold_unfold_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(_rand(rng, 3, 16, 40))
    for r in (2, 4, 8):
        np.testing.assert_array_equal(
            np.asarray(unfold_signal(fold_signal(x, r), r)), np.asarray(x))
