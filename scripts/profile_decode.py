"""Profile T2S decode marginal cost on the real device.

Times generate_e2e at pinned decode lengths (min_steps == max_steps) and
reports the per-step marginal (slope), isolating decode from prefill +
dispatch fixed costs. Variants: cache length, flash kernel, batch size.

Run alone on the TPU (tunnel contention poisons timings).
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
from genie_tts_tpu.ops.sampling import SamplingConfig
from genie_tts_tpu.runtime.engine import TTSEngine


def main():
    cfg = RuntimeConfig()
    engine = TTSEngine(cfg)
    tcfg = T2SConfig()
    scfg = SamplingConfig()
    params = jax.jit(t2s.init_params, static_argnames=("cfg", "dtype"))(
        jax.random.PRNGKey(0), cfg=tcfg, dtype=jnp.bfloat16)
    if cfg.t2s_int8:        # measure the SERVING default (int8 weights,
        params = t2s.quantize_params(params)   # full layer unroll)
    unroll = engine._unroll(tcfg)
    rng = np.random.default_rng(0)

    def run(B, n_steps, cache_extra, use_flash, reps=5):
        Sx, Sp = 64, 256
        cache_len = Sx + Sp + cache_extra
        phones = rng.integers(1, 732, (B, Sx)).astype(np.int32)
        prompts = rng.integers(0, 1024, (B, Sp)).astype(np.int32)
        args = dict(max_steps=n_steps, cache_len=cache_len,
                    min_steps=n_steps, use_flash=use_flash,
                    layer_unroll=unroll)
        f = engine._generate_e2e
        # compile + 1 warm exec
        out = f(params, tcfg, scfg, jax.random.PRNGKey(0),
                jnp.asarray(phones), None, jnp.full((B,), Sx, jnp.int32),
                jnp.asarray(prompts), jnp.full((B,), Sp, jnp.int32), **args)
        np.asarray(out[0])
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            out = f(params, tcfg, scfg, jax.random.PRNGKey(r + 1),
                    jnp.asarray(phones), None, jnp.full((B,), Sx, jnp.int32),
                    jnp.asarray(prompts), jnp.full((B,), Sp, jnp.int32),
                    **args)
            np.asarray(out[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    results = {}
    for label, kw in [
        ("b1_n100_c500", dict(B=1, n_steps=100, cache_extra=500, use_flash=False)),
        ("b1_n300_c500", dict(B=1, n_steps=300, cache_extra=500, use_flash=False)),
        ("b1_n100_c100", dict(B=1, n_steps=100, cache_extra=100, use_flash=False)),
        ("b1_n100_c500_flash", dict(B=1, n_steps=100, cache_extra=500, use_flash=True)),
        ("b1_n300_c500_flash", dict(B=1, n_steps=300, cache_extra=500, use_flash=True)),
        ("b8_n100_c500", dict(B=8, n_steps=100, cache_extra=500, use_flash=False)),
        ("b8_n300_c500", dict(B=8, n_steps=300, cache_extra=500, use_flash=False)),
    ]:
        try:
            results[label] = round(run(**kw), 4)
            print(f"# {label}: {results[label]*1000:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# {label} failed: {e}", flush=True)
    if "b1_n100_c500" in results and "b1_n300_c500" in results:
        results["b1_marginal_ms_per_step"] = round(
            (results["b1_n300_c500"] - results["b1_n100_c500"]) / 200 * 1000, 3)
    if "b8_n100_c500" in results and "b8_n300_c500" in results:
        results["b8_marginal_ms_per_step"] = round(
            (results["b8_n300_c500"] - results["b8_n100_c500"]) / 200 * 1000, 3)
    if "b1_n100_c500_flash" in results and "b1_n300_c500_flash" in results:
        results["b1_flash_marginal_ms_per_step"] = round(
            (results["b1_n300_c500_flash"] - results["b1_n100_c500_flash"]) / 200 * 1000, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
