"""Closed-loop 6x6 slot-serving measurement with phase accounting.

The r5 scheduler experiments iterate on this: it reproduces the bench
slots6 stage (6 blocking clients x 6 requests, min 150 / max 206 steps)
and prints the scheduler's metrics snapshot — segment dispatch/fetch
walls, join/flush host time, occupancy — so policy changes are judged
on numbers, not vibes.

Run on the TPU from the repo root: python scripts/exp_closed_loop.py
"""
import sys
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.frontend.g2p_ja import japanese_to_phones
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference)
from genie_tts_tpu.runtime.slot_batcher import SlotBatcher
from genie_tts_tpu.utils.metrics import metrics


def main():
    cfg = RuntimeConfig()
    engine = TTSEngine(cfg)
    tcfg, vcfg = T2SConfig(), SoVITSConfig()
    char = make_random_character(t2s_cfg=tcfg, sovits_cfg=vcfg,
                                 dtype=jnp.bfloat16, eos_boost=1.6,
                                 int8=cfg.t2s_int8)
    ref = make_random_reference(char, engine, ref_seconds=5.0)
    text = "きょうはとてもいいてんきですね。"
    phones = np.asarray(japanese_to_phones(text), np.int32)
    bert = np.zeros((len(phones), tcfg.bert_dim), np.float32)

    sb = SlotBatcher(engine, char, pcm16=True)
    sb.warmup(ref, phones, max_steps=206)
    metrics.reset()

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
    print(f"closed-loop 6x6: {N_CLIENTS*N_REQ/wall:.2f} utt/s, "
          f"p50 {np.percentile(lat,50)*1000:.0f} ms, "
          f"p90 {np.percentile(lat,90)*1000:.0f} ms", flush=True)
    snap = metrics.snapshot()
    for cat, entries in sorted(snap.items()):
        if not isinstance(entries, dict):
            continue
        for k in sorted(entries):
            if "slot" in k or "vocode" in k or "finisher" in k:
                print(f"  {cat}.{k}: {entries[k]}", flush=True)
    sb.stop()


if __name__ == "__main__":
    main()
