"""TTFA under load: 6 concurrent streaming clients through the slot
machine (mirrors the bench slots6-streaming stage). Prints TTFA
percentiles + throughput + scheduler metrics.

Run on the TPU from the repo root: python scripts/exp_stream_ttfa.py
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
    sb.warmup(ref, phones, max_steps=206, streaming=True)
    metrics.reset()

    ttfa, total, lock = [], [], threading.Lock()
    N_CLIENTS, N_REQ = 6, 4

    def client(cid):
        for j in range(N_REQ):
            t1 = time.perf_counter()
            first = None
            for _piece in sb.synthesize_stream(ref, phones, bert,
                                               timeout=900, min_steps=150,
                                               max_steps=206):
                if first is None:
                    first = time.perf_counter() - t1
            with lock:
                ttfa.append(first)
                total.append(time.perf_counter() - t1)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    print(f"stream 6x4: {N_CLIENTS*N_REQ/wall:.2f} utt/s, "
          f"ttfa p50 {np.percentile(ttfa,50)*1000:.0f} ms, "
          f"p90 {np.percentile(ttfa,90)*1000:.0f} ms, "
          f"total p50 {np.percentile(total,50)*1000:.0f} ms", flush=True)
    snap = metrics.snapshot()
    for cat, entries in sorted(snap.items()):
        if not isinstance(entries, dict):
            continue
        for k in sorted(entries):
            if "slot" in k or "window" in k or "ttfa" in k:
                print(f"  {cat}.{k}: {entries[k]}", flush=True)
    sb.stop()


if __name__ == "__main__":
    main()
