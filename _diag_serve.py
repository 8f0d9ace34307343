import time, threading, numpy as np, jax.numpy as jnp
from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.frontend.g2p_ja import japanese_to_phones
from genie_tts_tpu.ops.sampling import SamplingConfig
from genie_tts_tpu.runtime.engine import TTSEngine, make_random_character, make_random_reference
from genie_tts_tpu.runtime.batcher import ContinuousBatcher
from genie_tts_tpu.utils.metrics import metrics
import bench

cfg = RuntimeConfig()
engine = TTSEngine(cfg)
tcfg, vcfg = T2SConfig(), SoVITSConfig()
char = make_random_character(t2s_cfg=tcfg, sovits_cfg=vcfg, dtype=jnp.bfloat16, eos_boost=1.6, int8=cfg.t2s_int8)
ref = make_random_reference(char, engine, ref_seconds=5.0)
scfg = SamplingConfig()
suite = bench.JA_SENTENCES
pc = {s: np.asarray(japanese_to_phones(s), np.int32) for s in suite}
for b in (1, 2, 4, 8):
    items = [(ref, pc[suite[i % len(suite)]], np.zeros((len(pc[suite[i % len(suite)]]), tcfg.bert_dim), np.float32)) for i in range(b)]
    engine.synthesize_batch(char, items, seed=0, min_steps=150, max_steps=206)
print("warm done", flush=True)

batcher = ContinuousBatcher(engine, max_batch=8, window_ms=30.0)
lat = []; lock = threading.Lock()
def client(cid):
    for j in range(4):
        s = suite[(cid * 4 + j) % len(suite)]
        ph = pc[s]
        t1 = time.perf_counter()
        batcher.synthesize(char, ref, ph, np.zeros((len(ph), tcfg.bert_dim), np.float32), sampling=scfg, timeout=600, max_steps=206, min_steps=150)
        with lock: lat.append(time.perf_counter() - t1)
client(0)
metrics.reset()
t0 = time.perf_counter()
ts = [threading.Thread(target=client, args=(i,)) for i in range(6)]
[t.start() for t in ts]; [t.join() for t in ts]
wall = time.perf_counter() - t0
sizes = list(metrics._stats["batch_size"].samples)
print(f"utt/s {24/wall:.2f} p50 {np.percentile(lat,50)*1000:.0f}ms sizes={sizes}")
