"""Whole-window HiFi-GAN A/B: fine (shiftdot policy) vs folded tail.

The folded tail (ops/folded.py + models/sovits.fold_decoder) moves time
phases into channels so the low-channel tail stages (C=64/32/16/1) run
as dense >=128-wide MXU matmuls. This measures the whole hifigan call at
production geometry (512 initial channels, rates 10,8,2,2,2) per
(variant, B, F) — the decision input for the serving default.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_hifigan_folded.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import SoVITSConfig
from genie_tts_tpu.models import sovits


def timed(fn, n=10, warm=3):
    for _ in range(warm):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def make_dec(rng, cfg, dtype):
    def conv(k, i, o, bias=True):
        p = {"w": jnp.asarray(rng.standard_normal((k, i, o)) * 0.05, dtype)}
        if bias:
            p["b"] = jnp.asarray(rng.standard_normal(o) * 0.05, dtype)
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
    return {"conv_pre": conv(7, cfg.inter_channels, cfg.upsample_initial),
            "cond": conv(1, cfg.gin_channels, cfg.upsample_initial),
            "ups": ups, "resblocks": resblocks,
            "conv_post": conv(7, ch, 1, bias=False)}


def main():
    cfg = SoVITSConfig()
    rng = np.random.default_rng(0)
    dec = make_dec(rng, cfg, jnp.bfloat16)
    variants = {
        "fine": dec,
        "folded_r1": sovits.fold_decoder(dec, cfg, start_stage=2, r0=1),
        "folded_r2": sovits.fold_decoder(dec, cfg, start_stage=2, r0=2),
        "folded_s1_r1": sovits.fold_decoder(dec, cfg, start_stage=1, r0=1),
    }
    run = jax.jit(partial(sovits.hifigan, cfg=cfg), static_argnames=())
    for F in (304, 512):
        for B in (1, 8):
            z = jnp.asarray(rng.standard_normal(
                (B, F, cfg.inter_channels)), jnp.bfloat16)
            ge = jnp.asarray(rng.standard_normal(
                (B, cfg.gin_channels, 1)), jnp.bfloat16)
            valid = jnp.full((B,), F, jnp.int32)
            row = []
            for name, p in variants.items():
                t = timed(lambda p=p: run(p, z, ge, frames_len=valid))
                row.append(f"{name}={t*1000:.2f}ms")
            print(f"B={B} F={F}: " + "  ".join(row), flush=True)


if __name__ == "__main__":
    main()
