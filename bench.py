"""Benchmark: 100-sentence Japanese latency suite on one TPU chip.

Mirrors the reference's README benchmark (100 JA sentences of ~20 chars,
mean first-inference latency 1.13 s on an i7-13620H CPU,
`/root/reference/README.md:44-51`). Full pipeline per utterance: host JA
G2P -> bucketed T2S prefill + on-device AR decode (pinned at 50 semantic
tokens ~= 2 s of audio, 25 Hz) -> SoVITS vocode -> host fetch.

Prints ONE JSON line: utterances/sec/chip, vs_baseline = ratio over the
reference's 1/1.13s = 0.885 utt/s.
"""
import json
import sys
import time

import numpy as np

BASELINE_UTT_PER_SEC = 1.0 / 1.13   # reference README headline
DECODE_STEPS = 50                    # ~2 s of audio at 25 Hz semantic rate

JA_SENTENCES = [
    "きょうはとてもいいてんきですね。",
    "あしたのあさ、こうえんへいきましょう。",
    "このほんはとてもおもしろかったです。",
    "でんしゃがすこしおくれているようです。",
    "つぎのえきでのりかえてください。",
    "コーヒーをいっぱいおねがいします。",
    "きのうのよるはゆっくりやすみました。",
    "らいしゅうのてんきがしんぱいです。",
    "このみせのりょうりはおいしいです。",
    "ちょっとまってください、すぐいきます。",
]


def build_suite(n=100):
    return [JA_SENTENCES[i % len(JA_SENTENCES)] for i in range(n)]


def _install_watchdog(result_holder):
    """Emit a degraded JSON line if the (tunneled) device hangs the run."""
    import os
    import signal

    budget = int(os.environ.get("GENIE_BENCH_TIMEOUT_S", "3300"))

    def on_alarm(signum, frame):
        print(json.dumps(result_holder.get("result") or {
            "metric": "ja100_utterances_per_sec_per_chip", "value": 0.0,
            "unit": "utt/s", "vs_baseline": 0.0,
            "extra": {"error": f"watchdog timeout after {budget}s"}}),
            flush=True)
        os._exit(1)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(budget)


def main():
    import jax
    import jax.numpy as jnp

    holder = {}
    _install_watchdog(holder)

    from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
    from genie_tts_tpu.frontend.g2p_ja import japanese_to_phones
    from genie_tts_tpu.models import t2s
    from genie_tts_tpu.ops.sampling import SamplingConfig
    from genie_tts_tpu.runtime.engine import (
        TTSEngine, make_random_character, make_random_reference,
    )

    backend = jax.default_backend()
    cfg = RuntimeConfig()
    engine = TTSEngine(cfg)
    tcfg = T2SConfig()
    vcfg = SoVITSConfig()
    char = make_random_character(t2s_cfg=tcfg, sovits_cfg=vcfg, dtype=jnp.bfloat16)
    ref = make_random_reference(char, engine, ref_seconds=5.0)
    scfg = SamplingConfig()

    suite = build_suite(100)

    def synth(text, seed):
        phones = np.asarray(japanese_to_phones(text), np.int32)
        bert = np.zeros((len(phones), tcfg.bert_dim), np.float32)
        return engine.synthesize_utterance(
            char, ref, phones, bert, sampling=scfg, seed=seed,
            fixed_steps=DECODE_STEPS)

    # warmup / compile all buckets
    t0 = time.perf_counter()
    for s in suite[:3]:
        synth(s, 0)
    compile_s = time.perf_counter() - t0

    lat = []
    t0 = time.perf_counter()
    for i, s in enumerate(suite):
        t1 = time.perf_counter()
        audio = synth(s, i)
        lat.append(time.perf_counter() - t1)
    wall = time.perf_counter() - t0

    lat = np.array(lat)
    audio_secs = 2 * DECODE_STEPS / 50.0  # 2 s per utterance
    utt_per_sec = len(suite) / wall
    holder["result"] = {
        "metric": "ja100_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3), "unit": "utt/s",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
        "extra": {"partial": True,
                  "p50_latency_ms": round(float(np.percentile(lat, 50)) * 1000, 1)},
    }

    # Optional serving-mode metrics. Each is best-effort: the headline JSON
    # must print even if the (tunneled) device degrades mid-run.
    pipelined_utt_per_sec = None
    batched_utt_per_sec = None
    try:
        # pipelined single-client throughput (dispatch-ahead, no batching)
        pipe_items = []
        for s in suite:
            ph = np.asarray(japanese_to_phones(s), np.int32)
            pipe_items.append((ph, np.zeros((len(ph), tcfg.bert_dim), np.float32)))
        engine.synthesize_pipelined(char, ref, pipe_items[:4],
                                    fixed_steps=DECODE_STEPS, window=2)
        t0 = time.perf_counter()
        engine.synthesize_pipelined(char, ref, pipe_items,
                                    fixed_steps=DECODE_STEPS, window=2)
        pipelined_utt_per_sec = len(pipe_items) / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        print(f"# pipelined stage skipped: {e}", file=sys.stderr)
    try:
        # batched throughput (continuous-batching serving mode), B=8
        phones8 = np.asarray(japanese_to_phones(suite[0]), np.int32)
        bert8 = np.zeros((len(phones8), tcfg.bert_dim), np.float32)
        items = [(ref, phones8, bert8)] * 8
        engine.synthesize_batch(char, items, seed=0, fixed_steps=DECODE_STEPS)
        t0 = time.perf_counter()
        n_b = 4
        for i in range(n_b):
            engine.synthesize_batch(char, items, seed=i, fixed_steps=DECODE_STEPS)
        batched_utt_per_sec = 8 * n_b / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        print(f"# batched stage skipped: {e}", file=sys.stderr)
    result = {
        "metric": "ja100_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
        "extra": {
            "backend": backend,
            "p50_latency_ms": round(float(np.percentile(lat, 50)) * 1000, 1),
            "p90_latency_ms": round(float(np.percentile(lat, 90)) * 1000, 1),
            "rtf": round(float(np.median(lat)) / audio_secs, 4),
            "pipelined_utt_per_sec": (round(pipelined_utt_per_sec, 2)
                                      if pipelined_utt_per_sec else None),
            "batched_b8_utt_per_sec": (round(batched_utt_per_sec, 2)
                                       if batched_utt_per_sec else None),
            "batched_rtf_per_chip": (round(1.0 / (batched_utt_per_sec * audio_secs), 4)
                                     if batched_utt_per_sec else None),
            "decode_steps": DECODE_STEPS,
            "compile_s": round(compile_s, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
