"""B=1 decode: carry-routed caches vs write-buffered path, on-chip.

Round-4 ablation (scripts/ablate_decode.py) located 0.77 ms/step of the
B=1 decode in KV-cache writes routed through the layer scan's xs->ys
restack. The batched path already avoids that (read-only big caches +
[L,B,H,Dh,W] write buffer merged per W steps, B=8: 3.4 -> 0.91 ms/step).
This measures the same trick at B=1 at production geometry with the
engine's exact knobs (int8 weights, full layer unroll).

Marginal ms/step = (t(300 steps) - t(100 steps)) / 200, min_steps pinned
so the loop never early-exits.
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from genie_tts_tpu.config import T2SConfig
from genie_tts_tpu.models import t2s
from genie_tts_tpu.ops.sampling import SamplingConfig

tcfg = T2SConfig()
scfg = SamplingConfig()
D = tcfg.embed_dim

params = jax.jit(t2s.init_params, static_argnames=("cfg", "dtype"))(
    jax.random.PRNGKey(0), cfg=tcfg, dtype=jnp.bfloat16)
params = t2s.quantize_params(params)
params = jax.block_until_ready(params)

B, Sx, Sp = 1, 64, 256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, Sx, D)), jnp.bfloat16)
x_len = jnp.full((B,), Sx, jnp.int32)
prompts = jnp.asarray(rng.integers(0, 1024, (B, Sp)), jnp.int32)
p_len = jnp.full((B,), Sp, jnp.int32)

CACHE = Sx + Sp + 512


def make(n_steps, unroll, buffered):
    @jax.jit
    def run(params, key):
        res = t2s.generate(
            params, tcfg, scfg, key, x, x_len, prompts, p_len,
            max_steps=n_steps, cache_len=CACHE, min_steps=n_steps,
            layer_unroll=unroll, solo_buffered=buffered)
        return res.tokens
    return run


def timed(run, reps=7):
    out = run(params, jax.random.PRNGKey(0)); np.asarray(out)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = run(params, jax.random.PRNGKey(r + 1)); np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def calib():
    """Fixed-work probe: 2048^3 bf16 matmul ms (host/chip variance anchor)."""
    a = jnp.ones((2048, 2048), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    jax.block_until_ready(f(a))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter(); jax.block_until_ready(f(a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


print(f"backend={jax.default_backend()}  calib_matmul2048_ms={calib():.3f}",
      flush=True)
import os
VARIANTS = {
    "prod": [("carry_u24", tcfg.num_layers, False),
             ("buffered_u24", tcfg.num_layers, True)],
    "scan": [("carry_u1", 1, False), ("buffered_u1", 1, True)],
}[os.environ.get("EXP_VARIANTS", "prod")]
for name, unroll, buffered in VARIANTS:
    t100 = timed(make(100, unroll, buffered))
    t300 = timed(make(300, unroll, buffered))
    m = (t300 - t100) / 200 * 1000
    print(f"{name}: marginal {m:.3f} ms/step  (t100={t100*1e3:.1f} "
          f"t300={t300*1e3:.1f})", flush=True)
