"""Decompose the slot-serving device costs that set the 6-client bar.

profile_slots.py (r5) measured: segment W=32 full-read 49.3 ms
(1.54 ms/step), finisher vocode 58-80 ms/utt with an anomalous B=8
(618 ms total), closed-loop 6.86 utt/s. This experiment isolates:

  1. decode_segment at every (ctx_win, ring_win) the scheduler can pick,
     and W in {16, 32, 64} — serving dispatches windows, so the full-read
     number was the wrong one to stare at;
  2. the finisher split: latent (enc_p+flow) vs chunked HiFi-GAN, and
     what the B=8 bucket does differently;
  3. an op-level profile of one windowed segment (jax.profiler trace,
     top self-time ops parsed from the perfetto JSON).

Run on the TPU from the repo root: python scripts/exp_slot_costs.py
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference)
from genie_tts_tpu.runtime.slot_batcher import SlotBatcher
from genie_tts_tpu.frontend.g2p_ja import japanese_to_phones


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

    from genie_tts_tpu.runtime.buckets import pad_to
    from genie_tts_tpu.ops.sampling import (SamplingConfig, SamplingRows,
                                            rows_from_config)
    samp = rows_from_config(SamplingConfig(), 1)
    samp1 = SamplingRows(*(a[0] for a in samp))
    packed = np.concatenate([ref.phones, phones]).astype(np.int32)
    key = jax.random.PRNGKey(0)

    def do_prefill():
        return sb._prefill_join(
            char.t2s_params, key=key,
            phones=pad_to(packed, sb.sx)[None], bert=None,
            x_len=np.array([len(packed)], np.int32),
            prompts=ref.prompts_dev(sb.sp),
            p_len=np.array([len(ref.prompt_tokens)], np.int32),
            samp=samp)

    def fill(n_rows):
        sb._reset_state()
        for b in range(n_rows):
            ck, cv, t0_, h_ = do_prefill()
            sb._kc, sb._vc, sb._ks, sb._vs, sb._small = sb._insert(
                sb._kc, sb._vc, sb._ks, sb._vs, sb._small,
                np.int32(b), ck, cv, t0_, h_,
                np.int32(len(packed)), np.int32(len(ref.prompt_tokens)),
                np.int32(10_000), np.int32(sb.ring), samp1)

    # ---- 1. segment cost by window pair (the ladder serving dispatches)
    import functools
    combos = [(None, None)] + [(c, r) for c in sb._ctx_ladder
                               for r in sb._ring_ladder]
    fill(8)
    for cw, rw in combos:
        def do_seg(cw=cw, rw=rw):
            (sb._kc, sb._vc, sb._ks, sb._vs, sb._small, seg_tok) = \
                sb._decode_seg(char.t2s_params, sb._kc, sb._vc, sb._ks,
                               sb._vs, sb._small, key, ctx_win=cw,
                               ring_win=rw)
            return seg_tok
        t = timed(do_seg, n=8)
        print(f"segment W={sb.W} ctx={cw} ring={rw}: {t*1000:.2f} ms "
              f"({t/sb.W*1000:.3f} ms/step)", flush=True)

    # ---- 1b. W sweep at the serving window (ctx 256, ring 256)
    from genie_tts_tpu.models import slots as slots_mod
    from genie_tts_tpu.runtime.slot_batcher import _seg_jit, _kv_kernel_enabled
    for W in (8, 16, 32, 64):
        if sb.ring % W:
            continue
        seg = functools.partial(
            _seg_jit, tcfg=char.t2s_cfg, W=W, sx=sb.sx, sp=sb.sp,
            ring=sb.ring, unroll=sb._unroll,
            kv_kernel=_kv_kernel_enabled(cfg))
        fill(8)

        def do_w(seg=seg):
            (sb._kc, sb._vc, sb._ks, sb._vs, sb._small, seg_tok) = seg(
                char.t2s_params, sb._kc, sb._vc, sb._ks, sb._vs, sb._small,
                key, ctx_win=256, ring_win=256)
            return seg_tok
        t = timed(do_w, n=8)
        print(f"segment W={W} ctx=256 ring=256: {t*1000:.2f} ms "
              f"({t/W*1000:.3f} ms/step)", flush=True)

    # ---- 2. finisher split: latent vs chunked HiFi-GAN per batch size
    codes = np.zeros(206, np.int32)
    t_bucket = 256
    for B in (1, 2, 4, 8):
        items = [(ref, phones, codes)] * B
        lens = np.full(B, 206, np.int32)
        codes_b = np.stack([pad_to(codes, 256) for _ in range(B)])
        text_b = np.stack([pad_to(phones.astype(np.int32), t_bucket)] * B)
        t_lens = np.full(B, len(phones), np.int32)
        ge_b = jnp.concatenate([ref.ge_dev] * B, axis=0)
        gm_b = jnp.concatenate([ref.ge_mrte_dev] * B, axis=0)

        def do_latent():
            return engine._latent(char.sovits_params, vcfg,
                                  jax.random.PRNGKey(0), codes_b, lens,
                                  text_b, t_lens, ge_b, gm_b, 0.5)
        t_lat = timed(do_latent, n=5)
        z = do_latent()

        def do_hifi():
            pieces, spans = engine._vocode_dispatch(char, z, ge_b, lens,
                                                    pcm16=True)
            return pieces
        t_hifi = timed(do_hifi, n=5)
        print(f"finisher B={B}: latent {t_lat*1000:.1f} ms "
              f"({t_lat/B*1000:.1f}/utt), hifigan {t_hifi*1000:.1f} ms "
              f"({t_hifi/B*1000:.1f}/utt)", flush=True)

    # ---- 3. op-level trace of one windowed segment
    fill(8)
    tracedir = "/tmp/slot_trace"
    with jax.profiler.trace(tracedir):
        for _ in range(4):
            (sb._kc, sb._vc, sb._ks, sb._vs, sb._small, seg_tok) = \
                sb._decode_seg(char.t2s_params, sb._kc, sb._vc, sb._ks,
                               sb._vs, sb._small, key, ctx_win=256,
                               ring_win=256)
        jax.block_until_ready(seg_tok)
    # parse the perfetto trace: top device self-time ops
    paths = glob.glob(tracedir + "/**/*.trace.json.gz", recursive=True)
    if paths:
        with gzip.open(sorted(paths)[-1], "rt") as f:
            tr = json.load(f)
        by_name = defaultdict(float)
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                # device lanes only (TensorFlow Op / XLA Ops tracks)
                cat = str(ev.get("args", {}).get("l", "")) + ev.get("name", "")
                by_name[ev["name"]] += ev["dur"]
        top = sorted(by_name.items(), key=lambda kv: -kv[1])[:25]
        total = sum(by_name.values())
        print(f"trace total accounted {total/1e3:.1f} ms across "
              f"{len(by_name)} names; top ops:")
        for name, us in top:
            print(f"  {us/1e3:8.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
