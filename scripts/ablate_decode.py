"""B=1 decode-step anatomy: ablate cache-restack / sampling / attention.

Times pinned-length while_loops mirroring t2s.generate's solo path with
components removed, to locate where the marginal ms/step goes.

Measured on v5e (2026-08-18, 24L/512, cache 820, int8 weights):
  full      1.383 ms/step   (mirror overestimates the engine path, which
  nosample  1.390 ms/step    dispatches donated buffers; relative deltas
  nocache   0.614 ms/step    are the signal)
  noattn    0.292 ms/step
Findings: sampling (top-k/p + hist) is FREE (fused into the step's tail);
KV-cache *writes* routed through the layer scan's carry dominate
(full - nocache = 0.77 ms: Mosaic copies the kv-major cache buffer on
each lane-column dynamic_update_slice); attention reads cost
nocache - noattn = 0.32 ms; the qkv/ffn matmul floor is 0.29 ms.
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
from genie_tts_tpu.ops.sampling import SamplingConfig, sample_token

tcfg = T2SConfig()
scfg = SamplingConfig()
H, L, V, D, Dh = tcfg.num_heads, tcfg.num_layers, tcfg.semantic_vocab, tcfg.embed_dim, tcfg.head_dim

params = jax.jit(t2s.init_params, static_argnames=("cfg", "dtype"))(
    jax.random.PRNGKey(0), cfg=tcfg, dtype=jnp.bfloat16)
params = t2s.quantize_params(params)

B, Sx, Sp = 1, 64, 256
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, Sx, D)), jnp.bfloat16)
x_len = jnp.full((B,), Sx, jnp.int32)
prompts = jnp.asarray(rng.integers(0, 1024, (B, Sp)), jnp.int32)
p_len = jnp.full((B,), Sp, jnp.int32)


def make_run(n_steps, cache_extra, mode):
    cache_len = Sx + Sp + cache_extra

    @partial(jax.jit, static_argnames=())
    def run(params, key):
        logits0, (k_cache, v_cache) = t2s.prefill(
            params, tcfg, x, x_len, prompts, p_len, cache_len)
        k_cache = jnp.swapaxes(k_cache, -1, -2)
        v_cache = jnp.swapaxes(v_cache, -1, -2)
        gumbel = jax.random.gumbel(key, (n_steps, B, V), dtype=jnp.float32)
        hist0 = jnp.zeros((B, V), jnp.int32)
        tokens = jnp.zeros((B, n_steps), jnp.int32)
        kv_positions = jnp.arange(cache_len)[None, :]
        pe_full = __import__("genie_tts_tpu.ops.layers", fromlist=["sine_position_table"]).sine_position_table(cache_len, D, dtype=jnp.float32)

        def embed_step(tokens, step):
            cur_tok = tokens[jnp.arange(B), step - 1]
            audio_pos = p_len + step - 1
            emb = params["audio_embed"][cur_tok]
            pos_emb = pe_full[audio_pos]
            return (emb + (params["audio_pos_alpha"] * pos_emb).astype(emb.dtype))[:, None]

        def body(carry):
            step, tokens, hist, k_cache, v_cache = carry
            h = embed_step(tokens, step)
            kv_mask = (
                (kv_positions < x_len[:, None])
                | ((kv_positions >= Sx) & (kv_positions < Sx + p_len[:, None]))
                | ((kv_positions >= Sx + Sp) & (kv_positions <= Sx + Sp + step - 1)))
            pos_b = Sx + Sp + step - 1

            if mode == "noattn":
                def layer_body(h, lp):
                    from genie_tts_tpu.ops.layers import linear, layer_norm
                    qkv = linear(lp["qkv"], h)
                    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
                    att = q[:, :, :D // 1] * 0 + q  # placeholder, no cache read
                    h = layer_norm(lp["norm1"], h + linear(lp["out"], att))
                    ff = linear(lp["ffn2"], jax.nn.relu(linear(lp["ffn1"], h)))
                    h = layer_norm(lp["norm2"], h + ff)
                    return h, None
                h, _ = jax.lax.scan(layer_body, h, params["layers"])
            elif mode == "nocache":
                def layer_body(h, inputs):
                    lp, kc, vc = inputs
                    h2, _, _ = t2s._layer_decode(lp, h, kc, vc, pos_b, kv_mask, H)
                    return h2, None
                h, _ = jax.lax.scan(layer_body, h, (params["layers"], k_cache, v_cache))
            else:
                def layer_body(h, inputs):
                    lp, kc, vc = inputs
                    h, kc, vc = t2s._layer_decode(lp, h, kc, vc, pos_b, kv_mask, H)
                    return h, (kc, vc)
                h, (k_cache, v_cache) = jax.lax.scan(
                    layer_body, h, (params["layers"], k_cache, v_cache))

            logits = jnp.dot(h[:, 0].astype(jnp.float32),
                             params["predict"]["w"].astype(jnp.float32))
            if mode == "nosample":
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                noise = jax.lax.dynamic_index_in_dim(
                    gumbel, jnp.minimum(step, n_steps - 1), keepdims=False)
                nxt = sample_token(None, logits, hist, scfg, noise=noise)
                hist = hist + jax.nn.one_hot(nxt, V, dtype=jnp.int32)
            write = jnp.minimum(step, n_steps - 1)
            tokens = tokens.at[:, write].set(nxt)
            return step + 1, tokens, hist, k_cache, v_cache

        def cond(carry):
            return carry[0] < n_steps

        step, tokens, hist, k_cache, v_cache = jax.lax.while_loop(
            cond, body, (jnp.int32(1), tokens, hist0, k_cache, v_cache))
        return tokens

    return run


def timed(run, reps=5):
    out = run(params, jax.random.PRNGKey(0)); np.asarray(out)
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        out = run(params, jax.random.PRNGKey(r + 1)); np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


results = {}
for mode in ["full", "nosample", "nocache", "noattn"]:
    t100 = timed(make_run(100, 500, mode))
    t300 = timed(make_run(300, 500, mode))
    m = (t300 - t100) / 200 * 1000
    results[mode] = round(m, 3)
    print(f"{mode}: marginal {m:.3f} ms/step  (t100={t100*1e3:.1f} t300={t300*1e3:.1f})", flush=True)
print(results)
