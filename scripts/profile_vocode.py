"""Profile the codes->waveform tail (the slot finisher's dominant cost).

BENCH_r02 showed slot serving at ~4-6 utt/s while the decode machine
itself can sustain >30: the finisher vocode (latent + chunked HiFi-GAN)
costs ~108 ms/utt at B=1 on v5e. This script splits that time:

  - synthesize_latent at the 256-codes bucket, B = 1/2/4/8
  - vocode_frames at the chunk window (vocode_chunk + 2*halo), B = 1/2/4/8
  - HiFi-GAN stage-by-stage (separate jits per prefix depth)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_vocode.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.models import sovits
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference)


def timed(fn, n=10, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    cfg = RuntimeConfig()
    engine = TTSEngine(cfg)
    tcfg, vcfg = T2SConfig(), SoVITSConfig()
    char = make_random_character(t2s_cfg=tcfg, sovits_cfg=vcfg,
                                 dtype=jnp.bfloat16)
    ref = make_random_reference(char, engine, ref_seconds=5.0)
    key = jax.random.PRNGKey(0)

    C_BUCKET = 256           # codes bucket a 206-code utterance lands in
    T_BUCKET = 64
    n_codes = 206

    codes = jnp.zeros((1, C_BUCKET), jnp.int32)
    text = jnp.zeros((1, T_BUCKET), jnp.int32)

    for B in (1, 2, 4, 8):
        codes_b = jnp.tile(codes, (B, 1))
        lens_b = jnp.full((B,), n_codes, jnp.int32)
        text_b = jnp.tile(text, (B, 1))
        tlen_b = jnp.full((B,), 40, jnp.int32)
        ge_b = jnp.tile(ref.ge_dev, (B, 1, 1))
        gm_b = jnp.tile(ref.ge_mrte_dev, (B, 1, 1))

        def do_latent():
            return engine._latent(char.sovits_params, vcfg, key, codes_b,
                                  lens_b, text_b, tlen_b, ge_b, gm_b, 0.5)

        t = timed(do_latent, n=10)
        print(f"latent B={B} codes={C_BUCKET}: {t*1000:.1f} ms "
              f"({t/B*1000:.1f} ms/utt)", flush=True)

    F = cfg.vocode_chunk + 2 * cfg.vocode_halo   # one mid chunk window
    for B in (1, 2, 4, 8):
        z = jnp.zeros((B, F, vcfg.inter_channels), jnp.bfloat16)
        ge_b = jnp.tile(ref.ge_dev, (B, 1, 1))
        valid = jnp.full((B,), F, jnp.int32)

        def do_voc():
            return engine._vocode(char.sovits_params, vcfg, z, ge_b, valid)

        t = timed(do_voc, n=10)
        print(f"hifigan B={B} frames={F}: {t*1000:.1f} ms "
              f"({t/B*1000:.1f} ms/utt-chunk)", flush=True)

    # whole finisher (dispatch+fetch) as the slot batcher runs it
    codes_np = np.zeros(n_codes, np.int32)
    phones = np.arange(1, 40, dtype=np.int32)
    for B in (1, 2, 4, 8):
        items = [(ref, phones, codes_np)] * B

        def do_fin():
            return engine.vocode_codes_batch(char, items)

        t = timed(do_fin, n=5)
        print(f"finisher B={B} (206 codes): {t*1000:.1f} ms "
              f"({t/B*1000:.1f} ms/utt)", flush=True)

    # ---- HiFi-GAN stage split at B=1 (prefix jits; includes one d2h) ----
    p = char.sovits_params["dec"] if "dec" in char.sovits_params else None
    if p is None:
        for k in char.sovits_params:
            print("param key:", k)
        return

    def prefix(depth):
        @jax.jit
        def run(params, z, ge):
            from genie_tts_tpu.models.sovits import LRELU_SLOPE, _resblock
            from genie_tts_tpu.ops.layers import (
                conv1d_ncw, conv_transpose1d_ncw)
            x = z.transpose(0, 2, 1)
            T = z.shape[1]
            mask = jnp.ones((1, 1, T), x.dtype)
            x = conv1d_ncw(params["conv_pre"], x, padding=3)
            x = x + conv1d_ncw(params["cond"], ge.astype(x.dtype))
            n_k = len(vcfg.resblock_kernels)
            scale = 1
            for i, (u, k) in enumerate(zip(vcfg.upsample_rates[:depth],
                                           vcfg.upsample_kernels[:depth])):
                x = jax.nn.leaky_relu(x, LRELU_SLOPE)
                x = conv_transpose1d_ncw(params["ups"][i], x, stride=u,
                                         padding=(k - u) // 2)
                scale *= u
                acc = None
                for j in range(n_k):
                    r = _resblock(params["resblocks"][i * n_k + j], x,
                                  vcfg.resblock_kernels[j],
                                  vcfg.resblock_dilations[j], 1.0)
                    acc = r if acc is None else acc + r
                x = acc / n_k
            return x.sum()
        return run

    z1 = jnp.zeros((1, F, vcfg.inter_channels), jnp.bfloat16)
    for depth in range(0, len(vcfg.upsample_rates) + 1):
        run = prefix(depth)

        def do():
            return run(p, z1, ref.ge_dev)

        t = timed(do, n=10)
        print(f"hifigan prefix depth={depth}: {t*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
