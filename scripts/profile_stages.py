"""Per-stage TPU timing: frontend / embed / prefill / decode / vocode /
transfers. Run on the real chip: python scripts/profile_stages.py"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.frontend.g2p_ja import japanese_to_phones
from genie_tts_tpu.models import t2s
from genie_tts_tpu.ops.sampling import SamplingConfig
from genie_tts_tpu.runtime.buckets import pad_to, pick_bucket
from genie_tts_tpu.runtime.engine import TTSEngine, make_random_character, make_random_reference

DECODE_STEPS = 50


def timeit(label, fn, n=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out) if out is not None else None
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:34s} {dt:8.2f} ms")
    return dt


def main():
    cfg = RuntimeConfig()
    engine = TTSEngine(cfg)
    tcfg, vcfg = T2SConfig(), SoVITSConfig()
    char = make_random_character(t2s_cfg=tcfg, sovits_cfg=vcfg, dtype=jnp.bfloat16)
    ref = make_random_reference(char, engine, ref_seconds=5.0)
    scfg = SamplingConfig()

    text = "きょうはとてもいいてんきですね。"
    phones = np.asarray(japanese_to_phones(text), np.int32)
    bert = np.zeros((len(phones), tcfg.bert_dim), np.float32)
    all_phones = np.concatenate([ref.phones, phones]).astype(np.int32)
    all_bert = np.concatenate([ref.bert, bert]).astype(np.float32)
    x_len = len(all_phones)
    x_bucket = pick_bucket(x_len, cfg.phoneme_buckets)
    p_len = len(ref.prompt_tokens)
    p_bucket = pick_bucket(p_len, cfg.prompt_buckets)
    cache_len = x_bucket + p_bucket + DECODE_STEPS
    print(f"x_len={x_len} bucket={x_bucket}; p_len={p_len} bucket={p_bucket}; cache={cache_len}")

    timeit("frontend G2P (host)", lambda: japanese_to_phones(text))

    phones_dev = jnp.asarray(pad_to(all_phones, x_bucket))[None]
    bert_dev = jnp.asarray(pad_to(all_bert, x_bucket, axis=0))[None]
    prompts_dev = jnp.asarray(pad_to(ref.prompt_tokens.astype(np.int32), p_bucket))[None]
    key = jax.random.PRNGKey(0)

    timeit("h2d transfer (phones+bert)", lambda: jax.device_put(
        (pad_to(all_phones, x_bucket), pad_to(all_bert, x_bucket, axis=0))))

    x = engine._embed_text(char.t2s_params, phones_dev, bert_dev)
    timeit("embed_text", lambda: jax.block_until_ready(
        engine._embed_text(char.t2s_params, phones_dev, bert_dev)))

    prefill_jit = jax.jit(t2s.prefill, static_argnames=("cfg", "cache_len"))
    timeit("prefill only", lambda: jax.block_until_ready(prefill_jit(
        char.t2s_params, tcfg, x, jnp.array([x_len]), prompts_dev,
        jnp.array([p_len]), cache_len=cache_len)))

    def gen():
        r = engine._generate(char.t2s_params, tcfg, scfg, key, x,
                             jnp.array([x_len]), prompts_dev, jnp.array([p_len]),
                             max_steps=DECODE_STEPS, cache_len=cache_len,
                             min_steps=DECODE_STEPS)
        return jax.block_until_ready(r.tokens)

    t_gen = timeit(f"prefill+decode x{DECODE_STEPS}", gen, n=10)

    res = engine._generate(char.t2s_params, tcfg, scfg, key, x, jnp.array([x_len]),
                           prompts_dev, jnp.array([p_len]),
                           max_steps=DECODE_STEPS, cache_len=cache_len,
                           min_steps=DECODE_STEPS)
    codes = t2s.finalize_semantic_tokens(res.tokens, res.counts, tcfg.eos_id)[0]
    c_bucket = pick_bucket(len(codes), cfg.frame_buckets)
    t_bucket = pick_bucket(len(phones), cfg.phoneme_buckets)
    codes_dev = jnp.asarray(pad_to(codes.astype(np.int32), c_bucket))[None]
    text_dev = jnp.asarray(pad_to(phones, t_bucket))[None]
    ge_dev = jnp.asarray(ref.ge)[None]
    gm_dev = jnp.asarray(ref.ge_mrte)[None]

    def voc():
        a = engine._synthesize(char.sovits_params, vcfg, key, codes_dev,
                               jnp.array([len(codes)]), text_dev,
                               jnp.array([len(phones)]), ge_dev, gm_dev, 0.5)
        return jax.block_until_ready(a)

    t_voc = timeit(f"vocoder ({c_bucket} frames bucket)", voc, n=10)

    audio = voc()
    timeit("d2h transfer (audio)", lambda: np.asarray(audio))

    print(f"\ndecode steps/s: {DECODE_STEPS / (t_gen / 1000):.0f}")


if __name__ == "__main__":
    main()
