"""HiFi-GAN conv-strategy experiments (slot finisher compute).

profile_vocode.py shows the finisher's HiFi-GAN window (304 frames) at
23.6 ms B=1 / 62.7 ms B=8, with the late low-channel stages dominating
(prefix deltas: up3 3.7 ms, up4 2.5 ms, up5 5.6 ms, post ~6.5 ms at B=1)
— far above the roofline (~0.3 ms of HBM traffic). Suspects: XLA's
lowering of NCW transposed convs (lhs_dilation zero-insertion) and of
small-channel dilated convs.

Candidates measured here, each validated numerically against the
current implementation first:
  A. transposed conv: current NCW lhs-dilated  vs  phase-decomposed
     einsum (out[m*u+p] = sum_s x[m-s] @ W[s*u+p] -> one [B*T, S*Ci] x
     [S*Ci, u*Co] matmul, no zero-insertion)
  B. dilated resblock conv: current NCW conv  vs  shift+dot einsum
     ("jbct,jcd->bdt" over J tap-shifted copies)
  C. whole hifigan window: current  vs  all-phase/shift variant

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_hifigan_convs.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import SoVITSConfig
from genie_tts_tpu.ops.layers import conv1d_ncw, conv_transpose1d_ncw


def timed(fn, n=20, warm=3):
    for _ in range(warm):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# -- candidate implementations ----------------------------------------------

def conv_transpose1d_ncw_phase(params, x, stride: int, padding: int = 0):
    """Phase-decomposed transposed conv, NCW. out length matches torch:
    (T-1)*stride + width - 2*padding."""
    w = params["w"].astype(x.dtype)          # [k, Ci, Co]
    k, Ci, Co = w.shape
    u = stride
    S = -(-k // u)                            # taps per phase
    B, _, T = x.shape
    wp = jnp.pad(w, ((0, S * u - k), (0, 0), (0, 0)))
    wp = wp.reshape(S, u, Ci, Co)             # wp[s, p] = W[s*u + p]
    # xs[s][m] = x[m - s], m in [0, T + S - 1)
    Tm = T + S - 1
    xs = jnp.stack([
        jax.lax.dynamic_slice_in_dim(
            jnp.pad(x, ((0, 0), (0, 0), (s, S - 1 - s))), 0, Tm, axis=2)
        for s in range(S)])                   # [S, B, Ci, Tm]
    y = jnp.einsum("sbct,scdp->bdtp", xs,
                   wp.transpose(0, 2, 3, 1),
                   preferred_element_type=x.dtype)   # [B, Co, Tm, u]
    y = y.reshape(B, Co, Tm * u)
    out_len = (T - 1) * u + k - 2 * padding
    y = jax.lax.slice_in_dim(y, padding, padding + out_len, axis=2)
    if "b" in params:
        y = y + params["b"][None, :, None]
    return y


def conv1d_ncw_shiftdot(params, x, padding: int = 0, dilation: int = 1):
    """k-tap dilated conv as J shifted copies + one contraction."""
    w = params["w"].astype(x.dtype)           # [k, Ci, Co]
    k, Ci, Co = w.shape
    B, _, T = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    xs = jnp.stack([
        jax.lax.dynamic_slice_in_dim(xp, j * dilation, T, axis=2)
        for j in range(k)])                   # [k, B, Ci, T]
    y = jnp.einsum("jbct,jcd->bdt", xs, w,
                   preferred_element_type=x.dtype)
    if "b" in params:
        y = y + params["b"][None, :, None]
    return y


def main():
    rng = np.random.default_rng(0)
    cfg = SoVITSConfig()

    # stage shapes for a 304-frame finisher window
    stages = []
    T = 304
    C = cfg.upsample_initial
    for u, k in zip(cfg.upsample_rates, cfg.upsample_kernels):
        stages.append((C, C // 2, k, u, T))
        T *= u
        C //= 2

    print("== A. transposed conv: lhs-dilated vs phase-decomposed ==")
    for B in (1, 4, 8):
        for (Ci, Co, k, u, T) in stages:
            x = jnp.asarray(rng.standard_normal((B, Ci, T)), jnp.bfloat16)
            p = {"w": jnp.asarray(rng.standard_normal((k, Ci, Co)) * 0.05,
                                  jnp.bfloat16),
                 "b": jnp.asarray(rng.standard_normal(Co) * 0.01,
                                  jnp.bfloat16)}
            pad = (k - u) // 2
            f_cur = jax.jit(lambda p, x: conv_transpose1d_ncw(p, x, u, pad))
            f_new = jax.jit(lambda p, x: conv_transpose1d_ncw_phase(p, x, u, pad))
            a, b = f_cur(p, x), f_new(p, x)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32))))
            t_cur = timed(lambda: f_cur(p, x))
            t_new = timed(lambda: f_new(p, x))
            print(f"B={B} C{Ci}->{Co} k={k} u={u} T={T}: "
                  f"cur {t_cur*1e3:.2f} ms  phase {t_new*1e3:.2f} ms  "
                  f"(x{t_cur/t_new:.2f})  maxerr {err:.4f}", flush=True)

    print("== B. dilated conv: NCW conv vs shift+dot ==")
    res_shapes = [(64, 48640), (32, 97280), (16, 194560)]
    for B in (1, 8):
        for (C, T) in res_shapes:
            for k, d in ((3, 1), (7, 2), (11, 5)):
                x = jnp.asarray(rng.standard_normal((B, C, T)), jnp.bfloat16)
                p = {"w": jnp.asarray(rng.standard_normal((k, C, C)) * 0.05,
                                      jnp.bfloat16),
                     "b": jnp.asarray(rng.standard_normal(C) * 0.01,
                                      jnp.bfloat16)}
                pad = (k * d - d) // 2
                f_cur = jax.jit(lambda p, x: conv1d_ncw(p, x, padding=pad,
                                                        dilation=d))
                f_new = jax.jit(lambda p, x: conv1d_ncw_shiftdot(
                    p, x, padding=pad, dilation=d))
                a, b = f_cur(p, x), f_new(p, x)
                err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                            - b.astype(jnp.float32))))
                t_cur = timed(lambda: f_cur(p, x))
                t_new = timed(lambda: f_new(p, x))
                print(f"B={B} C={C} T={T} k={k} d={d}: "
                      f"cur {t_cur*1e3:.2f} ms  shiftdot {t_new*1e3:.2f} ms "
                      f"(x{t_cur/t_new:.2f})  maxerr {err:.4f}", flush=True)

    print("== C. conv_post (C16->1 k7) ==")
    for B in (1, 8):
        C, T = 16, 194560
        x = jnp.asarray(rng.standard_normal((B, C, T)), jnp.bfloat16)
        p = {"w": jnp.asarray(rng.standard_normal((7, C, 1)) * 0.05,
                              jnp.bfloat16),
             "b": jnp.asarray(rng.standard_normal(1) * 0.01, jnp.bfloat16)}
        f_cur = jax.jit(lambda p, x: conv1d_ncw(p, x, padding=3))
        f_new = jax.jit(lambda p, x: conv1d_ncw_shiftdot(p, x, padding=3))
        a, b = f_cur(p, x), f_new(p, x)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        t_cur = timed(lambda: f_cur(p, x))
        t_new = timed(lambda: f_new(p, x))
        print(f"B={B}: cur {t_cur*1e3:.2f} ms  shiftdot {t_new*1e3:.2f} ms "
              f"(x{t_cur/t_new:.2f})  maxerr {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
