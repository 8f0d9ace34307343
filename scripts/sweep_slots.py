"""Sweep slot-serving knobs on real hardware (VERDICT r3: slots >= 10 utt/s).

Stages (each env-gated so a sweep can run piecemeal):
  GENIE_SWEEP=latent   — finisher internals: latent vs chunked HiFi-GAN
                         device time at B=1/2/4/8 (where do the 42-93
                         ms/utt go?)
  GENIE_SWEEP=ring     — decode_segment step cost at ring 256 vs 512
                         (the 896-wide static KV is ~0.3 ms/step over the
                         batched path's 590)
  GENIE_SWEEP=closed   — closed-loop 6x6 at parameter combos:
                         (slot_steps, finisher_batch, wait_segs, pcm16)

Run: GENIE_SWEEP=latent python scripts/sweep_slots.py
"""
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.frontend.g2p_ja import japanese_to_phones
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference)


def timed(fn, n=8, warm=2):
    for _ in range(warm):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def setup(cfg=None):
    cfg = cfg or RuntimeConfig()
    engine = TTSEngine(cfg)
    tcfg, vcfg = T2SConfig(), SoVITSConfig()
    char = make_random_character(t2s_cfg=tcfg, sovits_cfg=vcfg,
                                 dtype=jnp.bfloat16, eos_boost=1.6,
                                 int8=cfg.t2s_int8)
    ref = make_random_reference(char, engine, ref_seconds=5.0)
    text = "きょうはとてもいいてんきですね。"
    phones = np.asarray(japanese_to_phones(text), np.int32)
    bert = np.zeros((len(phones), tcfg.bert_dim), np.float32)
    return cfg, engine, char, ref, phones, bert


def stage_latent():
    cfg, engine, char, ref, phones, bert = setup()
    vcfg = char.sovits_cfg
    codes = np.zeros(206, np.int32)
    from genie_tts_tpu.runtime.buckets import pad_to, pick_bucket
    fb = pick_bucket(206, cfg.frame_buckets)
    tb = pick_bucket(len(phones), cfg.phoneme_buckets)
    for B in (1, 2, 4, 8):
        cb = jnp.asarray(np.stack([pad_to(codes, fb)] * B))
        cl = jnp.asarray(np.full(B, 206, np.int32))
        tx = jnp.asarray(np.stack([pad_to(phones, tb)] * B))
        tl = jnp.asarray(np.full(B, len(phones), np.int32))
        ge = jnp.asarray(np.stack([ref.ge] * B))
        gm = jnp.asarray(np.stack([ref.ge_mrte] * B))
        key = jax.random.PRNGKey(0)

        def do_latent():
            return engine._latent(char.sovits_params, vcfg, key,
                                  cb, cl, tx, tl, ge, gm, 0.5)

        z = do_latent()
        t_lat = timed(do_latent)
        F = z.shape[1]

        def do_voc():
            return engine._vocode(
                char.sovits_params, vcfg, z, ge,
                jnp.asarray(np.full(B, F, np.int32)))

        t_voc = timed(do_voc)
        print(f"B={B}: latent {t_lat*1000:.1f} ms  hifigan(F={F}) "
              f"{t_voc*1000:.1f} ms  -> {(t_lat+t_voc)/B*1000:.1f} ms/utt",
              flush=True)


def stage_ring():
    from genie_tts_tpu.runtime.slot_batcher import SlotBatcher
    from genie_tts_tpu.ops.sampling import (SamplingConfig, SamplingRows,
                                            rows_from_config)
    from genie_tts_tpu.runtime.buckets import pad_to

    for ring in (512, 256):
        cfg = RuntimeConfig(slot_ring=ring)
        _, engine, char, ref, phones, bert = setup(cfg)
        sb = SlotBatcher(engine, char)
        packed = np.concatenate([ref.phones, phones]).astype(np.int32)
        key = jax.random.PRNGKey(0)
        samp = rows_from_config(SamplingConfig(), 1)
        samp1 = SamplingRows(*(a[0] for a in samp))
        for b in range(8):
            ck, cv, t0_, h_ = sb._prefill_join(
                char.t2s_params, key=key,
                phones=pad_to(packed, sb.sx)[None], bert=None,
                x_len=np.array([len(packed)], np.int32),
                prompts=ref.prompts_dev(sb.sp),
                p_len=np.array([len(ref.prompt_tokens)], np.int32),
                samp=samp)
            sb._kc, sb._vc, sb._ks, sb._vs, sb._small = sb._insert(
                sb._kc, sb._vc, sb._ks, sb._vs, sb._small,
                np.int32(b), ck, cv, t0_, h_,
                np.int32(len(packed)), np.int32(len(ref.prompt_tokens)),
                np.int32(10_000), np.int32(sb.ring), samp1)

        def do_seg():
            (sb._kc, sb._vc, sb._ks, sb._vs, sb._small,
             seg_tok) = sb._decode_seg(
                char.t2s_params, sb._kc, sb._vc, sb._ks, sb._vs,
                sb._small, key)
            return seg_tok

        t = timed(do_seg)
        print(f"ring={ring}: decode_segment W={sb.W} occ=8: "
              f"{t*1000:.2f} ms ({t/sb.W*1000:.3f} ms/step)", flush=True)


def stage_closed():
    from genie_tts_tpu.runtime.slot_batcher import SlotBatcher

    combos = [
        dict(slot_steps=32, slot_finisher_batch=4, slot_finisher_wait_segs=2,
             pcm16=False),   # bench r3a baseline
        dict(slot_steps=32, slot_finisher_batch=4, slot_finisher_wait_segs=2,
             pcm16=True),
        dict(slot_steps=32, slot_finisher_batch=6, slot_finisher_wait_segs=3,
             pcm16=True),
        dict(slot_steps=16, slot_finisher_batch=6, slot_finisher_wait_segs=4,
             pcm16=True),
    ]
    for combo in combos:
        pcm16 = combo.pop("pcm16")
        cfg = RuntimeConfig(**combo)
        _, engine, char, ref, phones, bert = setup(cfg)
        sb = SlotBatcher(engine, char, pcm16=pcm16)
        sb.warmup(ref, phones, max_steps=206)
        lat, lock = [], threading.Lock()
        N_CLIENTS, N_REQ = 6, 6

        def client(cid):
            for j in range(N_REQ):
                t1 = time.perf_counter()
                sb.synthesize(ref, phones, bert, timeout=900,
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
        ups = N_CLIENTS * N_REQ / wall
        p50 = float(np.percentile(lat, 50)) * 1000
        print(f"{combo} pcm16={pcm16}: {ups:.2f} utt/s, p50 {p50:.0f} ms",
              flush=True)
        sb.stop()


if __name__ == "__main__":
    stage = os.environ.get("GENIE_SWEEP", "latent")
    {"latent": stage_latent, "ring": stage_ring,
     "closed": stage_closed}[stage]()
