"""A/B the slot decode segment: bf16 KV vs int8 KV (XLA) vs int8+Pallas.

Reproduces the numbers documented in ops/int8_decode.py and
RuntimeConfig.slot_kv_int8 (v5e, 24L/512, 8x896 slot geometry, W=32):
bf16 ~36 ms/segment, int8 pure-XLA ~45, int8 + kernel ~41.

Honest timing on the tunneled backend: chain N donated dispatches and
fetch DATA once (block_until_ready returns early on donated chains
there — see the repo's benchmarking notes).

Run per mode (the flags are read at import/trace time):
  GENIE_SLOT_KV_INT8=0                        python scripts/exp_int8_kv.py
  GENIE_SLOT_KV_INT8=1 GENIE_KV_KERNEL=0      python scripts/exp_int8_kv.py
  GENIE_SLOT_KV_INT8=1                        python scripts/exp_int8_kv.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.frontend.g2p_ja import japanese_to_phones
from genie_tts_tpu.ops.sampling import (SamplingConfig, SamplingRows,
                                        rows_from_config)
from genie_tts_tpu.runtime.buckets import pad_to
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference)
from genie_tts_tpu.runtime.slot_batcher import SlotBatcher, _kv_kernel_enabled


def main():
    cfg = RuntimeConfig()
    print(f"kv_int8={cfg.slot_kv_int8} kernel={_kv_kernel_enabled(cfg)}",
          flush=True)
    engine = TTSEngine(cfg)
    tcfg, vcfg = T2SConfig(), SoVITSConfig()
    char = make_random_character(t2s_cfg=tcfg, sovits_cfg=vcfg,
                                 dtype=jnp.bfloat16, eos_boost=1.6,
                                 int8=cfg.t2s_int8)
    ref = make_random_reference(char, engine, ref_seconds=5.0)
    sb = SlotBatcher(engine, char)
    phones = np.asarray(
        japanese_to_phones("きょうはとてもいいてんきですね。"), np.int32)
    packed = np.concatenate([ref.phones, phones]).astype(np.int32)
    key = jax.random.PRNGKey(0)
    samp = rows_from_config(SamplingConfig(), 1)
    samp1 = SamplingRows(*(a[0] for a in samp))
    for b in range(sb.n_slots):
        ck, cv, t0_, h_ = sb._prefill_join(
            char.t2s_params, key=key, phones=pad_to(packed, sb.sx)[None],
            bert=None, x_len=np.array([len(packed)], np.int32),
            prompts=ref.prompts_dev(sb.sp),
            p_len=np.array([len(ref.prompt_tokens)], np.int32), samp=samp)
        sb._kc, sb._vc, sb._ks, sb._vs, sb._small = sb._insert(
            sb._kc, sb._vc, sb._ks, sb._vs, sb._small, np.int32(b),
            ck, cv, t0_, h_, np.int32(len(packed)),
            np.int32(len(ref.prompt_tokens)),
            np.int32(10_000), np.int32(sb.ring), samp1)  # never finish

    def seg(k):
        (sb._kc, sb._vc, sb._ks, sb._vs, sb._small, st) = sb._decode_seg(
            char.t2s_params, sb._kc, sb._vc, sb._ks, sb._vs, sb._small, k)
        return st

    for i in range(3):
        _ = np.asarray(seg(jax.random.fold_in(key, i)))     # warm + compile
    for N in (8, 16):
        t0 = time.perf_counter()
        for i in range(N):
            out = seg(jax.random.fold_in(key, 100 + i))
        _ = np.asarray(out)                                  # honest fetch
        t = time.perf_counter() - t0
        print(f"{N} chained segments + fetch: {t*1000:.1f} ms total -> "
              f"{t/N*1000:.2f} ms/segment ({t/N/sb.W*1000:.3f} ms/step)",
              flush=True)
    sb.stop()


if __name__ == "__main__":
    main()
