"""Decompose slot decode_segment time by geometry sweep (run alone on TPU).

Times decode_segment at several (ctx, ring) cache geometries and layer
counts to attribute the per-step cost to: big-cache KV reads (scales with
S = ctx + ring), weight streaming (scales with L), and fixed loop/sampling
overhead (the intercept). Drives the windowed-KV design decision: if the
S-coefficient dominates, slicing reads to the live window is the win.

Timing discipline: chain N donated dispatches, fetch seg_tokens once
(block_until_ready lies on tunneled backends — see repo notes).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import T2SConfig
from genie_tts_tpu.models import slots as slots_mod
from genie_tts_tpu.models import t2s
from genie_tts_tpu.ops.sampling import SamplingConfig, rows_from_config

B, W = 8, 32


def time_seg(tcfg, params, sx, sp, ring, reps=8, label="",
             ctx_win=None, ring_win=None):
    state = slots_mod.init_slots(tcfg, B, sx, sp, ring, dtype=jnp.bfloat16)
    samp = rows_from_config(SamplingConfig(), B)
    # occupy all slots mid-stream: keys_written ~ half the ring
    state = state._replace(
        active=jnp.ones((B,), bool), done=jnp.zeros((B,), bool),
        x_len=jnp.full((B,), min(100, sx), jnp.int32),
        p_len=jnp.full((B,), min(125, sp), jnp.int32),
        keys_written=jnp.full((B,), ring // 2, jnp.int32),
        counts=jnp.full((B,), ring // 2, jnp.int32),
        min_steps=jnp.full((B,), 10_000, jnp.int32),   # never EOS
        max_steps=jnp.full((B,), ring, jnp.int32),
        samp_top_k=jnp.asarray(samp.top_k), samp_top_p=jnp.asarray(samp.top_p),
        samp_temp=jnp.asarray(samp.temperature),
        samp_rep=jnp.asarray(samp.repetition_penalty),
        ring_head=jnp.int32(ring // 2),
    )

    def run(state, key):
        state, seg_tok = slots_mod.decode_segment(
            params, state, key, tcfg, seg_steps=W, sx=sx, sp=sp,
            ring_len=ring, layer_unroll=tcfg.num_layers,
            ctx_win=ctx_win, ring_win=ring_win)
        return state, seg_tok

    f = jax.jit(run, donate_argnums=0)
    state, tok = f(state, jax.random.PRNGKey(0))
    np.asarray(tok)
    t0 = time.perf_counter()
    for r in range(reps):
        state, tok = f(state, jax.random.PRNGKey(r + 1))
    np.asarray(tok)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label or f'sx{sx} sp{sp} ring{ring}'} L{tcfg.num_layers}: "
          f"{dt*1000:.2f} ms/segment  ({dt/W*1000:.3f} ms/step)", flush=True)
    return dt


def main():
    tcfg = T2SConfig()
    params = jax.jit(t2s.init_params, static_argnames=("cfg", "dtype"))(
        jax.random.PRNGKey(0), cfg=tcfg, dtype=jnp.bfloat16)
    params_q = t2s.quantize_params(params)

    print("== int8 weights (serving default) ==", flush=True)
    base = time_seg(tcfg, params_q, 192, 192, 512, label="baseline 8x896")
    print("== windowed reads (the serving ladder) ==", flush=True)
    time_seg(tcfg, params_q, 192, 192, 512, ctx_win=256, ring_win=256,
             label="win ctx256 ring256")
    time_seg(tcfg, params_q, 192, 192, 512, ctx_win=256, ring_win=384,
             label="win ctx256 ring384")
    time_seg(tcfg, params_q, 192, 192, 512, ctx_win=256, ring_win=128,
             label="win ctx256 ring128")
    print("== smaller buckets (upper bound on window savings) ==",
          flush=True)
    small_ring = time_seg(tcfg, params_q, 192, 192, 256)
    small_ctx = time_seg(tcfg, params_q, 96, 96, 512)

    # S-coefficient: ms/step per 128 cache columns
    d_ring = (base - small_ring) / W * 1000 / 2      # 256 cols
    d_ctx = (base - small_ctx) / W * 1000 / 1.5      # 192 cols
    print(f"S-coeff via ring: {d_ring:.4f} ms/step/128col; "
          f"via ctx: {d_ctx:.4f} ms/step/128col", flush=True)


if __name__ == "__main__":
    main()
