"""Profile the slot-serving components on real hardware.

Measures (blocking, steady-state) device time of each piece of the
slot-batched serving path, to locate the gap between batched capability
(14.71 utt/s in BENCH_r02) and slot serving (4.08 utt/s):

  - prefill_join (B=1) at the slot geometry
  - insert_slot
  - decode_segment at occupancy 1..8
  - finisher vocode (latent + chunked HiFi-GAN) at batch 1/2/4/8
  - the closed-loop 6-client stage with host-phase timers

Run:  GENIE_BENCH_N=1 python scripts/profile_slots.py
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from genie_tts_tpu.config import RuntimeConfig, T2SConfig, SoVITSConfig
from genie_tts_tpu.frontend.g2p_ja import japanese_to_phones
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference)
from genie_tts_tpu.runtime.slot_batcher import SlotBatcher


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
                                 dtype=jnp.bfloat16, eos_boost=1.6,
                                 int8=cfg.t2s_int8)
    ref = make_random_reference(char, engine, ref_seconds=5.0)
    sb = SlotBatcher(engine, char)

    text = "きょうはとてもいいてんきですね。"
    phones = np.asarray(japanese_to_phones(text), np.int32)
    bert = np.zeros((len(phones), tcfg.bert_dim), np.float32)

    # ---- prefill_join (B=1)
    packed = np.concatenate([ref.phones, phones]).astype(np.int32)
    from genie_tts_tpu.runtime.buckets import pad_to
    key = jax.random.PRNGKey(0)

    from genie_tts_tpu.ops.sampling import SamplingConfig, SamplingRows, \
        rows_from_config
    samp = rows_from_config(SamplingConfig(), 1)
    samp1 = SamplingRows(*(a[0] for a in samp))

    def do_prefill():
        return sb._prefill_join(
            char.t2s_params, key=key,
            phones=pad_to(packed, sb.sx)[None], bert=None,
            x_len=np.array([len(packed)], np.int32),
            prompts=ref.prompts_dev(sb.sp),
            p_len=np.array([len(ref.prompt_tokens)], np.int32),
            samp=samp)

    t_prefill = timed(do_prefill, n=20)
    print(f"prefill_join B=1: {t_prefill*1000:.2f} ms", flush=True)

    # ---- insert_slot
    ctx_k, ctx_v, tok0, hist = do_prefill()

    def do_insert():
        sb._kc, sb._vc, sb._ks, sb._vs, sb._small = sb._insert(
            sb._kc, sb._vc, sb._ks, sb._vs, sb._small,
            np.int32(0), ctx_k, ctx_v, tok0,
            hist, np.int32(len(packed)), np.int32(len(ref.prompt_tokens)),
            np.int32(150), np.int32(206), samp1)
        return sb._small.done

    t_insert = timed(do_insert, n=20)
    print(f"insert_slot: {t_insert*1000:.2f} ms", flush=True)

    # ---- decode_segment at occupancy k (occupancy only changes masks, the
    # program is the same; measure once to confirm shape-independence)
    for occ in (1, 4, 8):
        sb._reset_state()
        for b in range(occ):
            ck, cv, t0_, h_ = do_prefill()
            sb._kc, sb._vc, sb._ks, sb._vs, sb._small = sb._insert(
                sb._kc, sb._vc, sb._ks, sb._vs, sb._small,
                np.int32(b), ck, cv, t0_, h_,
                np.int32(len(packed)), np.int32(len(ref.prompt_tokens)),
                np.int32(10_000), np.int32(sb.ring), samp1)  # never finish

        def do_seg():
            (sb._kc, sb._vc, sb._ks, sb._vs, sb._small,
             seg_tok) = sb._decode_seg(
                char.t2s_params, sb._kc, sb._vc, sb._ks, sb._vs,
                sb._small, key)
            return seg_tok

        t_seg = timed(do_seg, n=8)
        print(f"decode_segment W={sb.W} occ={occ}: {t_seg*1000:.2f} ms "
              f"({t_seg/sb.W*1000:.3f} ms/step)", flush=True)

    # ---- finisher vocode for ~206 codes at batch 1/2/4/8
    codes = np.zeros(206, np.int32)
    for k in (1, 2, 4, 8):
        items = [(ref, phones, codes)] * k

        def do_vocode():
            return engine.vocode_codes_batch(char, items)

        t_voc = timed(do_vocode, n=5)
        print(f"finisher vocode B={k} (206 codes): {t_voc*1000:.1f} ms "
              f"({t_voc/k*1000:.1f} ms/utt)", flush=True)

    # ---- closed-loop 6 clients x 6 reqs with phase accounting
    import threading
    sb2 = SlotBatcher(engine, char)
    sb2.warmup(ref, phones, max_steps=206)

    lat, lock = [], threading.Lock()
    N_CLIENTS, N_REQ = 6, 6

    def client(cid):
        for j in range(N_REQ):
            t1 = time.perf_counter()
            sb2.synthesize(ref, phones, bert, timeout=900,
                           min_steps=150, max_steps=206)
            with lock:
                lat.append(time.perf_counter() - t1)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    print(f"closed-loop 6x6: {N_CLIENTS*N_REQ/wall:.2f} utt/s, "
          f"p50 {np.percentile(lat,50)*1000:.0f} ms", flush=True)

    from genie_tts_tpu.utils.metrics import metrics
    snap = metrics.snapshot()
    for k in sorted(snap):
        if "slot" in k:
            print(f"  {k}: {snap[k]}", flush=True)
    sb2.stop()
    sb.stop()


if __name__ == "__main__":
    main()
