"""A/B the per-step sampling stack inside the AR decode loop.

Monkeypatches models.t2s.sample_token with variants and re-times the
whole jitted decode, isolating which sampling component costs per-step
time on the real device. Run alone on the TPU.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import RuntimeConfig, T2SConfig
from genie_tts_tpu.models import t2s
from genie_tts_tpu.ops import sampling as S
from genie_tts_tpu.runtime.engine import TTSEngine


def sample_argmax(key, logits, counts, cfg, forbid=None):
    logits = logits.astype(jnp.float32)
    if forbid is not None:
        logits = jnp.where(forbid[None, :], jnp.float32(-1e10), logits)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_no_topk(key, logits, counts, cfg, forbid=None):
    logits = logits.astype(jnp.float32)
    logits = S.apply_repetition_penalty(logits, counts, cfg.repetition_penalty)
    if forbid is not None:
        logits = jnp.where(forbid[None, :], jnp.float32(-1e10), logits)
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)


def sample_sort_topk(key, logits, counts, cfg, forbid=None):
    logits = logits.astype(jnp.float32)
    logits = S.apply_repetition_penalty(logits, counts, cfg.repetition_penalty)
    if forbid is not None:
        logits = jnp.where(forbid[None, :], jnp.float32(-1e10), logits)
    kth = jnp.sort(logits, axis=-1)[..., -cfg.top_k][..., None]
    logits = jnp.where(logits < kth, jnp.float32(-1e10), logits)
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits + gumbel, axis=-1).astype(jnp.int32)


VARIANTS = {
    "current_laxtopk": S.sample_token,
    "argmax_only": sample_argmax,
    "penalty_gumbel_no_topk": sample_no_topk,
    "sort_topk": sample_sort_topk,
}


def time_variant(fn, B, n_steps, reps=5):
    t2s.sample_token = fn
    engine = TTSEngine(RuntimeConfig())
    tcfg = T2SConfig()
    scfg = S.SamplingConfig()
    params = jax.jit(t2s.init_params, static_argnames=("cfg", "dtype"))(
        jax.random.PRNGKey(0), cfg=tcfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    Sx, Sp = 64, 256
    phones = jnp.asarray(rng.integers(1, 732, (B, Sx)), jnp.int32)
    prompts = jnp.asarray(rng.integers(0, 1024, (B, Sp)), jnp.int32)
    xl = jnp.full((B,), Sx, jnp.int32)
    pl = jnp.full((B,), Sp, jnp.int32)

    def go(seed):
        out = engine._generate_e2e(
            params, tcfg, scfg, jax.random.PRNGKey(seed), phones, None, xl,
            prompts, pl, max_steps=n_steps, cache_len=Sx + Sp + 500,
            min_steps=n_steps)
        np.asarray(out[0])

    go(0)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        go(r + 1)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    orig = t2s.sample_token
    results = {}
    try:
        for name, fn in VARIANTS.items():
            t100 = time_variant(fn, B=1, n_steps=100)
            t300 = time_variant(fn, B=1, n_steps=300)
            results[name] = {
                "t100_ms": round(t100 * 1000, 1),
                "t300_ms": round(t300 * 1000, 1),
                "marginal_ms": round((t300 - t100) / 200 * 1000, 3),
            }
            print(f"# {name}: {results[name]}", flush=True)
    finally:
        t2s.sample_token = orig
    print(json.dumps(results))


if __name__ == "__main__":
    main()
