"""Whole-window HiFi-GAN A/B for the shiftdot policy.

Run per mode (the policy is read at trace time):
  GENIE_HIFIGAN_SHIFTDOT=never|default|always \
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_hifigan_policy.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference)


def timed(fn, n=10, warm=3):
    for _ in range(warm):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    mode = os.environ.get("GENIE_HIFIGAN_SHIFTDOT", "default")
    cfg = RuntimeConfig()
    engine = TTSEngine(cfg)
    vcfg = SoVITSConfig()
    char = make_random_character(t2s_cfg=T2SConfig(), sovits_cfg=vcfg,
                                 dtype=jnp.bfloat16)
    ref = make_random_reference(char, engine, ref_seconds=5.0)
    for F in (304, 512):
        for B in (1, 2, 4, 8):
            z = jnp.asarray(
                np.random.default_rng(0).standard_normal(
                    (B, F, vcfg.inter_channels)), jnp.bfloat16)
            ge = jnp.tile(ref.ge_dev, (B, 1, 1))
            valid = jnp.full((B,), F, jnp.int32)

            def do():
                return engine._vocode(char.sovits_params, vcfg, z, ge, valid)

            t = timed(do)
            print(f"mode={mode} hifigan B={B} F={F}: {t*1000:.1f} ms "
                  f"({t/B*1000:.1f} ms/utt-window)", flush=True)


if __name__ == "__main__":
    main()
