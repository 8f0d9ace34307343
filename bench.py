"""Benchmark: 100-sentence Japanese suite on one TPU chip — honest edition.

Mirrors the reference's README benchmark (100 JA sentences of ~20 chars,
mean first-inference latency 1.13 s on an i7-13620H CPU,
`/root/reference/README.md:44-51`), with the decode running the REAL
serving path: EOS-terminated `lax.while_loop` decode (no pinned step
count). Random weights terminate almost immediately, so a `min_steps`
ladder (100/150/200, ~4-8 s of audio like real speech) masks EOS below a
floor while leaving the EOS machinery, variable lengths, and bucketing
live; max_steps = min_steps + 56 bounds lengths to speech-like scales
(random weights sit at an AR fixed point whose EOS logit is effectively
constant, so unbounded decode would always hit the 500-step cap). RTF is
computed against EMITTED audio seconds, never an assumed duration; TTFA
is measured through the intra-utterance streaming path.

Prints ONE JSON line: utterances/sec/chip, vs_baseline = ratio over the
reference's 1/1.13s = 0.885 utt/s.
"""
import json
import sys
import time

import numpy as np

BASELINE_UTT_PER_SEC = 1.0 / 1.13   # reference README headline
MIN_STEPS_LADDER = (100, 150, 200)  # ~4-8 s of audio at 25 Hz semantic rate

JA_SENTENCES = [
    # 100 DISTINCT sentences (~12-24 kana like the reference's ~20-char
    # suite, README.md:44-51) so the timed loop exercises real content
    # diversity — G2P runs INSIDE the timed loop on each of these.
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
    "まいあさろくじにおきてさんぽします。",
    "ともだちとえいがをみにいきました。",
    "しゅくだいがまだおわっていません。",
    "このみちをまっすぐいってください。",
    "おひるごはんになにをたべましたか。",
    "バスていはあのかどをまがったさきです。",
    "なつやすみはうみへいくつもりです。",
    "へやのそうじをてつだってくれますか。",
    "くすりをのんではやくねてください。",
    "かばんのなかにかさがはいっています。",
    "えきまえのパンやはとてもにんきです。",
    "こんばんはほしがきれいにみえます。",
    "じゅぎょうはくじからはじまります。",
    "おとうとはサッカーがとくいです。",
    "はるになるとさくらがさきます。",
    "このかわのみずはとてもつめたいです。",
    "たんじょうびにケーキをつくりました。",
    "ねこがまどのそばでねむっています。",
    "あたらしいくつをかいにいきたいです。",
    "でんわばんごうをおしえてください。",
    "としょかんでしずかにほんをよみます。",
    "ゆうがたからあめがふるそうです。",
    "おじいさんはまいにちはたけへいきます。",
    "このもんだいはすこしむずかしいです。",
    "おちゃをもういっぱいいかがですか。",
    "ひこうきはよていどおりしゅっぱつします。",
    "いもうとはピアノをならっています。",
    "さいふをいえにわすれてしまいました。",
    "やまのうえからまちがみえます。",
    "こんしゅうまつはいそがしくなりそうです。",
    "にわにきれいなはながさいています。",
    "しんぶんをよむじかんがありません。",
    "おんがくをききながらべんきょうします。",
    "ふゆはゆきがたくさんふります。",
    "たまごとぎゅうにゅうをかってきてね。",
    "かいぎはごごさんじにはじまります。",
    "うんどうのあとはみずをのみましょう。",
    "このへやはひあたりがよくてあたたかいです。",
    "よるおそくまでしごとをしました。",
    "いぬのさんぽはわたしのやくめです。",
    "りんごをよっつとみかんをふたつください。",
    "あのたてもののさんがいにすんでいます。",
    "てがみのへんじをまっています。",
    "しゅうでんにまにあってよかったです。",
    "やさいをたくさんたべるようにしています。",
    "カレーのにおいがしてきました。",
    "プールでひとじかんおよぎました。",
    "かぜがつよいのでぼうしをおさえました。",
    "おまつりでわたあめをかいました。",
    "じてんしゃでがっこうにかよっています。",
    "テストのけっかがきょうわかります。",
    "おかあさんのりょうりがいちばんすきです。",
    "くもがおおいけれどあめはふりません。",
    "やくそくのじかんにおくれないでね。",
    "あかちゃんがやっとあるけるようになりました。",
    "せんせいにしつもんをしました。",
    "うみのちかくのまちでそだちました。",
    "ごはんのまえにてをあらいましょう。",
    "でんきをけしてからでかけてください。",
    "あきはもみじがとてもきれいです。",
    "おとなりさんからおみやげをもらいました。",
    "つくえのうえをきちんとかたづけました。",
    "なんじにむかえにいけばいいですか。",
    "はじめてのスキーはたのしかったです。",
    "かぎがみつからなくてこまっています。",
    "まいばんねるまえにほんをよみます。",
    "ちずをみながらまちをあるきました。",
    "きっぷはじどうはんばいきでかえます。",
    "ひるやすみにこうえんでおべんとうをたべました。",
    "そらがきゅうにくらくなってきました。",
    "おかしのつくりかたをおしえてください。",
    "びょういんはえきのむこうがわにあります。",
    "なまえをよばれたらへんじをしてください。",
    "ふくをせんたくしてそとにほしました。",
    "らいねんはがいこくへりょこうしたいです。",
    "このえはだれがかいたのですか。",
    "とけいがとまっているのにきづきました。",
    "バナナはんぶんこにしてたべよう。",
    "しゃしんをとってもいいですか。",
    "おゆがわいたらおちゃをいれます。",
    "かようびはピアノのレッスンがあります。",
    "みせのまえにながいれつができています。",
    "ひさしぶりにおばあちゃんにあいました。",
    "すずしいかぜがまどからはいってきます。",
    "レポートのしめきりはあさってです。",
    "ほんだなのいちばんうえにおいてください。",
    "ゆめのなかでそらをとんでいました。",
    "こたえがわかるひとはてをあげてください。",
    "もうすこしゆっくりはなしてください。",
    "えきからいえまであるいてじゅっぷんです。",
]
assert len(JA_SENTENCES) == len(set(JA_SENTENCES)) == 100


def build_suite(n=100):
    import os

    n = int(os.environ.get("GENIE_BENCH_N", n))  # CPU smoke runs use 3-5
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



def _stage(msg):
    import sys, time as _t
    print(f"# [{_t.strftime('%H:%M:%S')}] stage: {msg}", file=sys.stderr, flush=True)

def main():
    import jax
    import jax.numpy as jnp

    holder = {}
    _install_watchdog(holder)

    from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
    from genie_tts_tpu.frontend.g2p_ja import japanese_to_phones
    from genie_tts_tpu.ops.sampling import SamplingConfig
    from genie_tts_tpu.runtime.engine import (
        TTSEngine, make_random_character, make_random_reference,
    )

    import os

    backend = jax.default_backend()
    cfg = RuntimeConfig()
    engine = TTSEngine(cfg)

    def _calibrate():
        """Fixed-work device probes anchoring round-over-round variance:
        a 2048^3 bf16 matmul (MXU roofline) and a 256 MB copy (HBM +
        tunnel overhead). Same binaries have measured 25-35% apart across
        bench sessions (PARITY.md); these numbers let a reader normalize
        the headline metrics against the session's actual device/host
        speed instead of guessing."""
        a = jnp.ones((2048, 2048), jnp.bfloat16)
        mm = jax.jit(lambda a: a @ a)
        cp = jax.jit(lambda x: x + 1)
        big = jnp.ones((128, 1024, 1024), jnp.bfloat16)  # 256 MB
        jax.block_until_ready((mm(a), cp(big)))
        mm_ts, cp_ts = [], []
        for _ in range(10):
            t0 = time.perf_counter(); jax.block_until_ready(mm(a))
            mm_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); jax.block_until_ready(cp(big))
            cp_ts.append(time.perf_counter() - t0)
        # device->host fetch cost: ~26 ms latency + ~26 ms/MB bandwidth
        # measured on the tunneled v5e (r5). Serving throughput/TTFA are
        # bounded by this path (every audio result crosses it), so record
        # both points: a 16 KB fetch (pure latency) and a 1 MB fetch.
        sm = jax.jit(lambda x, s: x + s)
        small = jnp.zeros((8192,), jnp.int16)
        big16 = jnp.zeros((524288,), jnp.int16)
        jax.block_until_ready((sm(small, np.int16(0)), sm(big16, np.int16(0))))
        lat_ts, bw_ts = [], []
        for i in range(5):
            y = jax.block_until_ready(sm(small, np.int16(i)))
            t0 = time.perf_counter(); np.asarray(y)
            lat_ts.append(time.perf_counter() - t0)
            y = jax.block_until_ready(sm(big16, np.int16(i)))
            t0 = time.perf_counter(); np.asarray(y)
            bw_ts.append(time.perf_counter() - t0)
        return {
            "matmul2048_ms": round(float(np.median(mm_ts)) * 1e3, 3),
            "hbm_copy256mb_ms": round(float(np.median(cp_ts)) * 1e3, 3),
            "d2h_16kb_ms": round(float(np.median(lat_ts)) * 1e3, 2),
            "d2h_1mb_ms": round(float(np.median(bw_ts)) * 1e3, 2),
        }

    calib = _calibrate()
    print(f"# calib: {calib}", file=sys.stderr, flush=True)
    if os.environ.get("GENIE_BENCH_TINY"):  # CPU smoke: exercise every
        # stage of this script quickly; numbers are meaningless
        tcfg = T2SConfig(embed_dim=64, num_layers=2, num_heads=4,
                         ffn_dim=128, ssl_dim=24, max_decode_steps=256)
        vcfg = SoVITSConfig(
            spec_channels=33, inter_channels=16, hidden_channels=16,
            filter_channels=32, n_layers=2, mrte_channels=16, ssl_dim=24,
            vq_codes=32, vq_dim=24, gin_channels=16, flow_layers=2,
            wn_layers=2, upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4),
            upsample_initial=32, resblock_kernels=(3,),
            resblock_dilations=((1, 3),), n_fft=64, hop_length=8,
            win_length=64)
    else:
        tcfg = T2SConfig()
        vcfg = SoVITSConfig()
    sr = vcfg.sample_rate
    # eos_boost: random weights never emit EOS on their own (the AR loop
    # hits a fixed point); boosting the EOS logit variance makes decode
    # lengths stochastic at realistic scales so the EOS path is real
    # int8 mirrors the serving default (model_manager applies it at
    # character-load time when RuntimeConfig.t2s_int8)
    char = make_random_character(t2s_cfg=tcfg, sovits_cfg=vcfg,
                                 dtype=jnp.bfloat16, eos_boost=1.6,
                                 int8=cfg.t2s_int8)
    ref = make_random_reference(char, engine, ref_seconds=5.0)
    scfg = SamplingConfig()

    suite = build_suite(100)
    # warmup/bucket planning needs phone lengths ahead of time; the TIMED
    # loops run the G2P frontend per request anyway (synth below) — the
    # serving path a client hits includes the frontend
    phones_cache = {s: np.asarray(japanese_to_phones(s), np.int32)
                    for s in suite}

    def synth(text, seed, min_steps):
        phones = np.asarray(japanese_to_phones(text), np.int32)  # in-loop G2P
        bert = np.zeros((len(phones), tcfg.bert_dim), np.float32)
        return engine.synthesize_utterance(
            char, ref, phones, bert, sampling=scfg, seed=seed,
            min_steps=min_steps, max_steps=min_steps + 56, pcm16=True)

    _stage("warmup/compile")
    # ---- warmup: compile every graph the suite will hit — exactly what
    # engine.warmup's bucket sweep does for a server. The fused path keys
    # on (x_bucket, t_bucket, step CAP) with min/max steps riding the
    # dispatch as traced scalars, and the whole MIN_STEPS_LADDER buckets
    # to ONE cap (pick_bucket(156|206|256, step_caps) = 256) — so one
    # representative sentence per bucket pair covers the suite and the
    # ladder adds NOTHING to the reachable graph set. (r4's warmup ran
    # reps x ladder = 3x redundant synths; the r4 "22.6 s cold start"
    # was two-thirds re-executing already-warm graphs.)
    from genie_tts_tpu.runtime.buckets import pick_bucket

    reps, caps = {}, set()
    for s in suite:
        n = len(phones_cache[s])
        key = (pick_bucket(len(ref.phones) + n, cfg.phoneme_buckets),
               pick_bucket(n, cfg.phoneme_buckets),
               pick_bucket(MIN_STEPS_LADDER[0] + 56, cfg.step_caps))
        caps.update(pick_bucket(ms + 56, cfg.step_caps)
                    for ms in MIN_STEPS_LADDER)
        reps.setdefault(key, s)
    assert len(caps) == 1, f"ladder spans step caps {caps}: warm each"
    t0 = time.perf_counter()
    jobs = [(rep, MIN_STEPS_LADDER[0]) for rep in reps.values()]
    per_job = {}

    def _warm(job):
        t1 = time.perf_counter()
        synth(job[0], seed=0, min_steps=job[1])
        per_job[job[0][:24]] = round(time.perf_counter() - t1, 1)

    if backend == "cpu":
        # XLA:CPU segfaults when a compile races other threads' compute
        # (tests/conftest.py forensics) — warm serially there
        for job in jobs:
            _warm(job)
    else:
        # compiles run in C++ with the GIL released; overlapping the
        # bucket reps halves the cold-start wall time
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as ex:
            for _ in ex.map(_warm, jobs):
                pass
    compile_s = time.perf_counter() - t0
    print(f"# warmup: {len(jobs)} distinct graphs, per-graph wall "
          f"{per_job}", file=sys.stderr, flush=True)

    _stage("headline")
    # ---- headline: 100 EOS-terminated utterances, variable lengths
    lat, audio_s = [], []
    t0 = time.perf_counter()
    for i, s in enumerate(suite):
        t1 = time.perf_counter()
        audio = synth(s, seed=i, min_steps=MIN_STEPS_LADDER[i % 3])
        lat.append(time.perf_counter() - t1)
        audio_s.append(len(audio) / sr)
    wall = time.perf_counter() - t0

    lat = np.array(lat)
    audio_s = np.array(audio_s)
    utt_per_sec = len(suite) / wall
    rtf = float(np.sum(lat) / np.sum(audio_s))  # vs EMITTED audio
    holder["result"] = {
        "metric": "ja100_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3), "unit": "utt/s",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
        "extra": {"partial": True, "rtf": round(rtf, 4)},
    }

    _stage("solo TTFA")
    # ---- TTFA through the intra-utterance streaming path (the serving
    # metric that matters for interactivity)
    import os as _os
    fast = bool(_os.environ.get("GENIE_BENCH_FAST"))
    ttfa_p50_ms = ttfa200_p50_ms = None

    def ttfa_run(min_steps, n):
        ttfas = []
        for i, s in enumerate(suite[:n]):
            phones = phones_cache[s]
            bert = np.zeros((len(phones), tcfg.bert_dim), np.float32)
            t1 = time.perf_counter()
            gen = engine.synthesize_utterance_stream(
                char, ref, phones, bert, sampling=scfg, seed=100 + i,
                min_steps=min_steps, max_steps=min_steps + 56, pcm16=True)
            next(gen)
            ttfas.append(time.perf_counter() - t1)
            for _ in gen:
                pass
        return float(np.percentile(ttfas, 50)) * 1000

    try:
        n = 3 if fast else 20
        ttfa_p50_ms = ttfa_run(100, n)
        # length-INDEPENDENCE check (segmented streaming): TTFA at the
        # 200-step ladder should match the 100-step number, not double it
        ttfa200_p50_ms = ttfa_run(200, max(n // 2, 3))
    except Exception as e:  # noqa: BLE001
        print(f"# ttfa stage skipped: {e}", file=sys.stderr)

    _stage("batched B=8")
    # ---- batched B=8 (continuous-batching steady state), EOS-terminated
    batched_utt_per_sec = batched_rtf = None
    try:
        if fast:
            raise RuntimeError("skipped (GENIE_BENCH_FAST)")
        items = []
        for i in range(8):
            ph = phones_cache[suite[i % len(suite)]]
            items.append((ref, ph, np.zeros((len(ph), tcfg.bert_dim), np.float32)))
        engine.synthesize_batch(char, items, seed=0, min_steps=150,
                                max_steps=206)  # compile
        t0 = time.perf_counter()
        n_b, secs = 4, 0.0
        for i in range(n_b):
            outs = engine.synthesize_batch(char, items, seed=1 + i,
                                           min_steps=150, max_steps=206)
            secs += sum(len(a) / sr for a in outs)
        t_batch = time.perf_counter() - t0
        batched_utt_per_sec = 8 * n_b / t_batch
        batched_rtf = t_batch / secs
    except Exception as e:  # noqa: BLE001
        print(f"# batched stage skipped: {e}", file=sys.stderr)

    _stage("serving6")
    # ---- concurrent serving through the ContinuousBatcher (6 clients)
    serving_utt_per_sec = serving_p50_ms = None
    try:
        if fast:
            raise RuntimeError("skipped (GENIE_BENCH_FAST)")
        import threading

        from genie_tts_tpu.runtime.batcher import ContinuousBatcher

        batcher = ContinuousBatcher(engine, max_batch=8, window_ms=30.0)
        req_lat = []
        lat_lock = threading.Lock()
        N_CLIENTS, N_REQ = 6, 6

        def client(cid):
            for j in range(N_REQ):
                s = suite[(cid * N_REQ + j) % len(suite)]
                t1 = time.perf_counter()   # G2P inside the timed request,
                ph = np.asarray(japanese_to_phones(s), np.int32)  # same
                bert = np.zeros((len(ph), tcfg.bert_dim), np.float32)  # as
                batcher.synthesize(char, ref, ph, bert, sampling=scfg,  # slots6
                                   timeout=600, max_steps=206, min_steps=150)
                with lat_lock:
                    req_lat.append(time.perf_counter() - t1)

        # compile pass: warm EVERY batch bucket the stage can hit — a
        # mid-stage compile stalls one batch, staggers the clients, and
        # the window then never re-coalesces them (convoy collapse:
        # measured 8 -> 2 utt/s when B=2/4 compiled mid-run)
        for b in (1, 2, 4, 8):
            warm_items = []
            for i in range(b):
                ph = phones_cache[suite[i % len(suite)]]
                warm_items.append(
                    (ref, ph, np.zeros((len(ph), tcfg.bert_dim), np.float32)))
            engine.synthesize_batch(char, warm_items, seed=0, min_steps=150,
                                    max_steps=206)
        req_lat.clear()
        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(N_CLIENTS)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        t_serve = time.perf_counter() - t0
        serving_utt_per_sec = (N_CLIENTS * N_REQ) / t_serve
        serving_p50_ms = float(np.percentile(req_lat, 50)) * 1000
        batcher.stop()
    except Exception as e:  # noqa: BLE001
        print(f"# serving stage skipped: {e}", file=sys.stderr)

    _stage("slots6")
    # ---- in-flight slot serving (the default /tts path): 6 clients whose
    # requests JOIN the persistent decode machine between ~32-step segments
    slots_utt_per_sec = slots_p50_ms = slots_occupancy = None
    try:
        if fast:
            raise RuntimeError("skipped (GENIE_BENCH_FAST)")
        import threading

        from genie_tts_tpu.runtime.slot_batcher import SlotBatcher

        # pcm16 mirrors the serving default (api.get_slot_batcher):
        # int16 finisher fetches halve the ~1 MB/utt d2h tunnel bytes
        slot_b = SlotBatcher(engine, char, pcm16=True)
        req_lat = []
        lat_lock = threading.Lock()
        N_CLIENTS, N_REQ = 6, 6

        def s_client(cid):
            for j in range(N_REQ):
                s = suite[(cid * N_REQ + j) % len(suite)]
                t1 = time.perf_counter()   # G2P inside the timed request
                ph = np.asarray(japanese_to_phones(s), np.int32)
                bert = np.zeros((len(ph), tcfg.bert_dim), np.float32)
                slot_b.synthesize(ref, ph, bert, timeout=900,
                                  min_steps=150, max_steps=206)
                with lat_lock:
                    req_lat.append(time.perf_counter() - t1)

        # compile pass: vocode ladder + prefill/insert/segment graphs
        slot_b.warmup(ref, phones_cache[suite[0]], max_steps=206)
        from genie_tts_tpu.utils.metrics import metrics as _metrics

        _metrics.reset()
        req_lat.clear()
        t0 = time.perf_counter()
        threads = [threading.Thread(target=s_client, args=(i,))
                   for i in range(N_CLIENTS)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        t_serve = time.perf_counter() - t0
        slots_utt_per_sec = (N_CLIENTS * N_REQ) / t_serve
        slots_p50_ms = float(np.percentile(req_lat, 50)) * 1000
        occ = _metrics.snapshot().get("gauges", {}).get("slot_occupancy")
        slots_occupancy = occ["mean"] if occ else None
    except Exception as e:  # noqa: BLE001
        slot_b = None
        print(f"# slot serving stage skipped: {e}", file=sys.stderr)

    _stage("slots6 streaming TTFA")
    # ---- TTFA UNDER LOAD: 6 concurrent STREAMING clients through the
    # slot machine (per-row window pump). The serving promise is first
    # audio in <150 ms while the chip is saturated — solo-stream TTFA
    # (above) does not demonstrate that.
    slots_ttfa_p50_ms = slots_stream_utt_per_sec = None
    try:
        if fast or slot_b is None:
            raise RuntimeError("skipped")
        import threading

        slot_b.warmup(ref, phones_cache[suite[0]], max_steps=206,
                      streaming=True)   # window-pump graphs
        ttfa_lat, all_lat = [], []
        lat_lock = threading.Lock()
        N_CLIENTS, N_REQ = 6, 4

        def stream_client(cid):
            for j in range(N_REQ):
                s = suite[(cid * N_REQ + j) % len(suite)]
                t1 = time.perf_counter()
                ph = np.asarray(japanese_to_phones(s), np.int32)
                bert = np.zeros((len(ph), tcfg.bert_dim), np.float32)
                first = None
                for _piece in slot_b.synthesize_stream(
                        ref, ph, bert, timeout=900, min_steps=150,
                        max_steps=206):
                    if first is None:
                        first = time.perf_counter() - t1
                with lat_lock:
                    ttfa_lat.append(first)
                    all_lat.append(time.perf_counter() - t1)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=stream_client, args=(i,))
                   for i in range(N_CLIENTS)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        t_serve = time.perf_counter() - t0
        slots_stream_utt_per_sec = (N_CLIENTS * N_REQ) / t_serve
        slots_ttfa_p50_ms = float(np.percentile(
            [x for x in ttfa_lat if x is not None], 50)) * 1000
    except Exception as e:  # noqa: BLE001
        print(f"# slot streaming TTFA stage skipped: {e}", file=sys.stderr)

    _stage("open-loop")
    # ---- open-loop (staggered arrivals, ~6.7 req/s offered): the join-
    # latency showcase — a window batch makes arrivals wait out the batch
    # in flight; slot joins land at the next ~32-step segment
    open_window_p50_ms = open_slots_p50_ms = None
    try:
        if fast or slot_b is None:
            raise RuntimeError("skipped")
        import threading

        def open_loop(submit, n=30, gap=0.15):
            lat, threads = [], []
            lock = threading.Lock()

            def one(i):
                t1 = time.perf_counter()
                submit(i)
                with lock:
                    lat.append(time.perf_counter() - t1)

            for i in range(n):
                th = threading.Thread(target=one, args=(i,))
                th.start()
                threads.append(th)
                time.sleep(gap)
            for th in threads:
                th.join()
            return float(np.percentile(lat, 50)) * 1000

        def sub_window(i):
            ph = phones_cache[suite[i % len(suite)]]
            bert = np.zeros((len(ph), tcfg.bert_dim), np.float32)
            batcher.synthesize(char, ref, ph, bert, sampling=scfg,
                               timeout=600, max_steps=206, min_steps=150)

        # MIXED per-request sampling: per-row SamplingRows in the slot
        # state mean non-default configs still join the machine (they
        # used to fall through to the collapsing window path)
        samp_mix = (scfg, SamplingConfig(top_k=5, temperature=0.8),
                    SamplingConfig(top_p=0.7, repetition_penalty=1.1))

        def sub_slots(i):
            ph = phones_cache[suite[i % len(suite)]]
            bert = np.zeros((len(ph), tcfg.bert_dim), np.float32)
            slot_b.synthesize(ref, ph, bert, timeout=600,
                              max_steps=206, min_steps=150,
                              sampling=samp_mix[i % 3])

        open_window_p50_ms = open_loop(sub_window)
        open_slots_p50_ms = open_loop(sub_slots)
        batcher.stop()
        slot_b.stop()
    except Exception as e:  # noqa: BLE001
        print(f"# open-loop stage skipped: {e}", file=sys.stderr)

    _stage("decode probe")
    # ---- steady-state decode ms/step at full occupancy (honest timing:
    # chain donated segment dispatches, fetch data once — block_until_ready
    # returns early on donated chains on tunneled backends)
    decode_ms_per_step = None
    try:
        if fast or slot_b is None:
            raise RuntimeError("skipped")
        from genie_tts_tpu.models import slots as slots_mod
        from genie_tts_tpu.ops.sampling import SamplingRows, rows_from_config
        from genie_tts_tpu.runtime.buckets import pad_to as _pad_to

        sb = slot_b
        st = slots_mod.init_slots(
            tcfg, sb.n_slots, sb.sx, sb.sp, sb.ring,
            dtype=char.t2s_params["audio_embed"].dtype,
            kv_int8=cfg.slot_kv_int8)
        kc, vc, ks, vs = st.k_cache, st.v_cache, st.k_scale, st.v_scale
        from genie_tts_tpu.runtime.slot_batcher import _strip_big
        small = _strip_big(st)
        samp = rows_from_config(scfg, 1)
        ph0 = phones_cache[suite[0]]
        packed = np.concatenate([ref.phones, ph0]).astype(np.int32)
        for b in range(sb.n_slots):
            ck, cv, t0_, h_ = sb._prefill_join(
                char.t2s_params, key=jax.random.PRNGKey(b),
                phones=_pad_to(packed, sb.sx)[None], bert=None,
                x_len=np.array([len(packed)], np.int32),
                prompts=ref.prompts_dev(sb.sp),
                p_len=np.array([len(ref.prompt_tokens)], np.int32),
                samp=samp)
            kc, vc, ks, vs, small = sb._insert(
                kc, vc, ks, vs, small, np.int32(b), ck, cv, t0_, h_,
                np.int32(len(packed)), np.int32(len(ref.prompt_tokens)),
                np.int32(10_000), np.int32(sb.ring),
                SamplingRows(*(a[0] for a in samp)))
        cw, rw = sb._pick_windows() if all(
            r is None for r in sb._slots) else (None, None)
        # mirror the serving window pick for a mid-stream machine
        if sb.windowed_kv:
            cw = next((w for w in sb._ctx_ladder
                       if w >= len(packed) + len(ref.prompt_tokens)), None)
            rw = sb._ring_ladder[0] if sb._ring_ladder else None
            if cw is None:
                cw = rw = None
        n_seg = 8
        for i in range(2):   # warm exec then timed chain
            t0 = time.perf_counter()
            for s_i in range(n_seg):
                kc, vc, ks, vs, small, seg_tok = sb._decode_seg(
                    char.t2s_params, kc, vc, ks, vs, small,
                    jax.random.PRNGKey(s_i), ctx_win=cw, ring_win=rw)
            np.asarray(seg_tok)
            decode_ms_per_step = (time.perf_counter() - t0) / (
                n_seg * sb.W) * 1000
        del kc, vc, ks, vs
    except Exception as e:  # noqa: BLE001
        print(f"# decode-probe stage skipped: {e}", file=sys.stderr)

    result = {
        "metric": "ja100_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
        "extra": {
            "backend": backend,
            "rtf": round(rtf, 4),
            "audio_s_per_utt": round(float(np.mean(audio_s)), 2),
            "p50_latency_ms": round(float(np.percentile(lat, 50)) * 1000, 1),
            "p90_latency_ms": round(float(np.percentile(lat, 90)) * 1000, 1),
            "ttfa_p50_ms": round(ttfa_p50_ms, 1) if ttfa_p50_ms else None,
            "ttfa200_p50_ms": (round(ttfa200_p50_ms, 1)
                               if ttfa200_p50_ms else None),
            "batched_b8_utt_per_sec": (round(batched_utt_per_sec, 2)
                                       if batched_utt_per_sec else None),
            "batched_rtf_per_chip": (round(batched_rtf, 4)
                                     if batched_rtf else None),
            "serving6_utt_per_sec": (round(serving_utt_per_sec, 2)
                                     if serving_utt_per_sec else None),
            "serving6_p50_ms": (round(serving_p50_ms, 1)
                                if serving_p50_ms else None),
            "slots6_utt_per_sec": (round(slots_utt_per_sec, 2)
                                   if slots_utt_per_sec else None),
            "slots6_p50_ms": (round(slots_p50_ms, 1)
                              if slots_p50_ms else None),
            "slots6_occupancy": slots_occupancy,
            "slots6_ttfa_p50_ms": (round(slots_ttfa_p50_ms, 1)
                                   if slots_ttfa_p50_ms else None),
            "slots6_stream_utt_per_sec": (
                round(slots_stream_utt_per_sec, 2)
                if slots_stream_utt_per_sec else None),
            "decode_ms_per_step": (round(decode_ms_per_step, 3)
                                   if decode_ms_per_step else None),
            "open_window_p50_ms": (round(open_window_p50_ms, 1)
                                   if open_window_p50_ms else None),
            "open_slots_p50_ms": (round(open_slots_p50_ms, 1)
                                  if open_slots_p50_ms else None),
            "min_steps_ladder": list(MIN_STEPS_LADDER),
            "compile_s": round(compile_s, 1),
        },
    }
    holder["result"] = result
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
