"""Full-model e2e parity vs the hand-built torch oracle (tests/torch_oracle.py).

The north-star claim — converted checkpoints produce the same semantic
tokens and waveform as the reference pipeline
(``/root/reference/src/genie_tts/Core/Inference.py:63-109``) — verified
end-to-end on GPT-SoVITS-shaped random checkpoints:

* strict path: in-memory fp32 conversion, greedy decode -> token ids must
  be IDENTICAL; vocoder waveform allclose at fp32 tolerance;
* deployment path: ``convert_character`` -> safetensors (fp16 on disk) ->
  model manager -> ``TTSEngine.synthesize_utterance`` with bucketing; token
  ids still identical (the T2S checkpoint round-trips fp16 losslessly),
  waveform within fp16 weight-quantization tolerance.

The fixture pre-rounds every tensor to fp16 so fp16-on-disk storage is
lossless except for weight-norm kernels fused at convert time.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig  # noqa: E402
from genie_tts_tpu.convert import torch_convert as tc  # noqa: E402
from genie_tts_tpu.models import sovits, t2s  # noqa: E402
from genie_tts_tpu.ops.audio import linear_spectrogram  # noqa: E402
from genie_tts_tpu.ops.sampling import SamplingConfig  # noqa: E402

from torch_oracle import (  # noqa: E402
    T2SOracle, mel_style_encoder, sovits_oracle, torch_spectrogram,
    vq_extract_prompt,
)

L_T2S = 4          # stacked layers are homogeneous; 4 exercises every detail
L_PROD = 24        # production GPT-SoVITS V2 depth (slow-marked tests)
MAX_STEPS = 24
TCFG = T2SConfig(num_layers=L_T2S, max_decode_steps=MAX_STEPS)
VCFG = SoVITSConfig()

GREEDY = SamplingConfig(top_k=1, top_p=1.0, temperature=1.0,
                        repetition_penalty=1.35)


def _half(t):
    return (t.half().float() if t.is_floating_point() else t)


def _build_t2s_ckpt(g, n_layers=L_T2S):
    def R(*s, scale=0.05):
        return _half(torch.randn(*s, generator=g) * scale)

    ck = {
        "model.ar_text_embedding.word_embeddings.weight": R(732, 512),
        "model.ar_audio_embedding.word_embeddings.weight": R(1025, 512),
        "model.ar_text_position.alpha": torch.ones(1),
        "model.ar_audio_position.alpha": torch.ones(1) * 1.25,
        "model.bert_proj.weight": R(512, 1024),
        "model.bert_proj.bias": R(512),
        "model.ar_predict_layer.weight": R(1025, 512, scale=0.15),
    }
    for i in range(n_layers):
        p = f"model.h.layers.{i}"
        ck[f"{p}.self_attn.in_proj_weight"] = R(1536, 512)
        ck[f"{p}.self_attn.in_proj_bias"] = R(1536)
        ck[f"{p}.self_attn.out_proj.weight"] = R(512, 512)
        ck[f"{p}.self_attn.out_proj.bias"] = R(512)
        ck[f"{p}.linear1.weight"] = R(2048, 512)
        ck[f"{p}.linear1.bias"] = R(2048)
        ck[f"{p}.linear2.weight"] = R(512, 2048)
        ck[f"{p}.linear2.bias"] = R(512)
        ck[f"{p}.norm1.weight"] = torch.ones(512)
        ck[f"{p}.norm1.bias"] = torch.zeros(512)
        ck[f"{p}.norm2.weight"] = torch.ones(512)
        ck[f"{p}.norm2.bias"] = torch.zeros(512)
    return ck


def _build_sovits_pth(g):
    """Full v2 geometry (mirrors scripts/make_verify_fixtures.py)."""
    sd = {}

    def R(*s, scale=0.05):
        return _half(torch.randn(*s, generator=g) * scale)

    def T(key, *s, scale=0.05):
        sd[key] = R(*s, scale=scale)

    def conv(key, co, ci, k):
        T(f"{key}.weight", co, ci, k)
        T(f"{key}.bias", co)

    def wn(key, co, ci, k):
        T(f"{key}.weight_v", co, ci, k)
        sd[f"{key}.weight_g"] = _half(
            torch.abs(torch.randn(co, 1, 1, generator=g) * 0.3) + 0.7)
        T(f"{key}.bias", co)

    C, F, MR = 192, 768, 512
    T("quantizer.vq.layers.0._codebook.embed", 1024, 768, scale=0.5)
    T("ssl_proj.weight", 768, 768, 2)
    T("ssl_proj.bias", 768)
    conv("enc_p.ssl_proj", C, 768, 1)
    T("enc_p.text_embedding.weight", 732, C, scale=0.2)
    for enc, n in (("encoder_ssl", 3), ("encoder_text", 6), ("encoder2", 3)):
        for i in range(n):
            for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
                conv(f"enc_p.{enc}.attn_layers.{i}.{nm}", C, C, 1)
            T(f"enc_p.{enc}.attn_layers.{i}.emb_rel_k", 1, 9, C // 2)
            T(f"enc_p.{enc}.attn_layers.{i}.emb_rel_v", 1, 9, C // 2)
            for li in (1, 2):
                sd[f"enc_p.{enc}.norm_layers_{li}.{i}.gamma"] = torch.ones(C)
                sd[f"enc_p.{enc}.norm_layers_{li}.{i}.beta"] = torch.zeros(C)
            conv(f"enc_p.{enc}.ffn_layers.{i}.conv_1", F, C, 3)
            conv(f"enc_p.{enc}.ffn_layers.{i}.conv_2", C, F, 3)
    for nm, co, ci in (("c_pre", MR, C), ("text_pre", MR, C), ("c_post", C, MR)):
        conv(f"enc_p.mrte.{nm}", co, ci, 1)
    for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
        conv(f"enc_p.mrte.cross_attention.{nm}", MR, MR, 1)
    conv("enc_p.proj", 384, C, 1)
    for i in (0, 2, 4, 6):
        conv(f"flow.flows.{i}.pre", C, 96, 1)
        conv(f"flow.flows.{i}.post", 96, C, 1)
        wn(f"flow.flows.{i}.enc.cond_layer", 2 * C * 4, 512, 1)
        for j in range(4):
            wn(f"flow.flows.{i}.enc.in_layers.{j}", 2 * C, C, 5)
            wn(f"flow.flows.{i}.enc.res_skip_layers.{j}",
               2 * C if j < 3 else C, C, 1)
    conv("dec.conv_pre", 512, C, 7)
    conv("dec.cond", 512, 512, 1)
    ch = 512
    for i, (u, k) in enumerate(zip((10, 8, 2, 2, 2), (16, 16, 8, 2, 2))):
        sd[f"dec.ups.{i}.weight_v"] = R(ch, ch // 2, k)
        sd[f"dec.ups.{i}.weight_g"] = _half(
            torch.abs(torch.randn(ch, 1, 1, generator=g) * 0.3) + 0.7)
        T(f"dec.ups.{i}.bias", ch // 2)
        ch //= 2
        for j, kern in enumerate((3, 7, 11)):
            b = i * 3 + j
            for d in range(3):
                wn(f"dec.resblocks.{b}.convs1.{d}", ch, ch, kern)
                wn(f"dec.resblocks.{b}.convs2.{d}", ch, ch, kern)
    sd["dec.conv_post.weight"] = R(1, ch, 7)
    for nm, o, i_ in (("spectral.0.fc", 128, 1025), ("spectral.3.fc", 128, 128),
                      ("fc.fc", 512, 128)):
        T(f"ref_enc.{nm}.weight", o, i_)
        T(f"ref_enc.{nm}.bias", o)
    for i in range(2):
        conv(f"ref_enc.temporal.{i}.conv1.conv", 256, 128, 5)
    for nm in ("w_qs", "w_ks", "w_vs", "fc"):
        T(f"ref_enc.slf_attn.{nm}.weight", 128, 128)
        T(f"ref_enc.slf_attn.{nm}.bias", 128)
    return sd


@pytest.fixture(scope="module")
def fx():
    g = torch.Generator().manual_seed(7)
    ckpt_sd = _build_t2s_ckpt(g)
    pth_sd = _build_sovits_pth(g)
    ckpt_np = {k: v.numpy() for k, v in ckpt_sd.items()}
    pth_np = {k: v.numpy() for k, v in pth_sd.items()}
    # in-memory fp32 conversion (strict parity path)
    f32 = lambda tree: jax.tree.map(  # noqa: E731
        lambda x: jnp.asarray(x, jnp.float32), tree)
    tparams = f32(tc.convert_t2s(ckpt_np, pth_np, TCFG))
    vparams = f32(tc.convert_sovits(pth_np, VCFG))

    rng = np.random.default_rng(11)
    data = {
        "ref_phones": rng.integers(1, 732, 14).astype(np.int32),
        "text_phones": rng.integers(1, 732, 21).astype(np.int32),
        "ref_bert": rng.standard_normal((14, 1024)).astype(np.float16).astype(np.float32),
        "text_bert": rng.standard_normal((21, 1024)).astype(np.float16).astype(np.float32),
        "ssl": (rng.standard_normal((1, 50, 768)) * 0.5).astype(np.float32),
    }
    t32k = np.arange(32000) / 32000.0
    data["ref_audio"] = (0.3 * np.sin(2 * np.pi * 220 * t32k)
                         + 0.1 * np.sin(2 * np.pi * 521 * t32k)).astype(np.float32)
    return {"ckpt_sd": ckpt_sd, "pth_sd": pth_sd, "ckpt_np": ckpt_np,
            "pth_np": pth_np, "tparams": tparams, "vparams": vparams,
            **data}


def _oracle_prompts(fx_):
    return vq_extract_prompt(fx_["pth_sd"],
                             torch.as_tensor(fx_["ssl"]))


@pytest.mark.slow
def test_vq_prompt_parity(fx):
    ours = t2s.extract_prompt_tokens(fx["tparams"], jnp.asarray(fx["ssl"]))
    ref = _oracle_prompts(fx)
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


@pytest.mark.slow
def test_ref_embedding_parity(fx):
    spec = linear_spectrogram(jnp.asarray(fx["ref_audio"])[None])
    ge = sovits.reference_embedding(fx["vparams"], VCFG, spec,
                                    jnp.array([spec.shape[1]]))
    sd = {k.removeprefix("vq_model."): v for k, v in fx["pth_sd"].items()}
    ge_ref = mel_style_encoder(
        sd, torch_spectrogram(torch.as_tensor(fx["ref_audio"])[None]).transpose(1, 2))
    np.testing.assert_allclose(np.asarray(ge)[0], ge_ref[0].numpy(),
                               rtol=1e-3, atol=2e-4)


def _jax_greedy_tokens(fx_, tparams, tcfg=TCFG):
    prompts = np.asarray(
        t2s.extract_prompt_tokens(tparams, jnp.asarray(fx_["ssl"])))
    phones = np.concatenate([fx_["ref_phones"], fx_["text_phones"]])
    bert = np.concatenate([fx_["ref_bert"], fx_["text_bert"]])
    Sx, Sp = len(phones), prompts.shape[1]
    codes, codes_len = t2s.generate_e2e(
        tparams, tcfg, GREEDY, jax.random.PRNGKey(0),
        jnp.asarray(phones)[None], jnp.asarray(bert)[None],
        jnp.array([Sx]), jnp.asarray(prompts), jnp.array([Sp]),
        max_steps=MAX_STEPS, cache_len=Sx + Sp + MAX_STEPS)
    n = int(codes_len[0])
    return np.asarray(codes[0, :n]), prompts


def _oracle_tokens(fx_, n_layers=L_T2S):
    oracle = T2SOracle(fx_["ckpt_sd"], n_layers, 512, 16, 2048)
    prompts = _oracle_prompts(fx_)
    phones = np.concatenate([fx_["ref_phones"], fx_["text_phones"]])
    bert = np.concatenate([fx_["ref_bert"], fx_["text_bert"]])
    codes, emitted = oracle.generate(
        torch.as_tensor(phones, dtype=torch.long)[None],
        torch.as_tensor(bert)[None], prompts, MAX_STEPS)
    return codes, emitted


@pytest.mark.slow
def test_t2s_greedy_token_parity(fx):
    ours, _ = _jax_greedy_tokens(fx, fx["tparams"])
    ref, emitted = _oracle_tokens(fx)
    assert len(emitted) > 3, "degenerate decode; reseed the fixture"
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.slow
def test_sovits_waveform_parity(fx):
    codes, _ = _oracle_tokens(fx)
    assert len(codes) > 0
    codes_j = jnp.asarray(codes.astype(np.int32))[None]
    text = fx["text_phones"]
    spec = linear_spectrogram(jnp.asarray(fx["ref_audio"])[None])
    ge = sovits.reference_embedding(fx["vparams"], VCFG, spec,
                                    jnp.array([spec.shape[1]]))
    audio = sovits.synthesize(
        fx["vparams"], VCFG, jax.random.PRNGKey(0), codes_j,
        jnp.array([len(codes)]), jnp.asarray(text)[None],
        jnp.array([len(text)]), ge, ge[:, :512], noise_scale=0.0)
    ref_audio, _ = sovits_oracle(
        fx["pth_sd"], torch.as_tensor(codes.astype(np.int64))[None],
        torch.as_tensor(text, dtype=torch.long)[None],
        torch.as_tensor(fx["ref_audio"])[None], noise_scale=0.0)
    ours = np.asarray(audio[0, : ref_audio.shape[-1]])
    ref = ref_audio[0].numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=3e-4)


@pytest.mark.slow
def test_engine_e2e_deployment_path(fx, tmp_path):
    """convert_character -> disk -> model manager -> engine, bucketed.

    T2S safetensors round-trip fp16 losslessly (fixture pre-rounded), so
    token ids must be identical even through the deployment path; the
    SoVITS waveform tolerance absorbs weight-norm fusion fp16 storage.
    """
    import torch as _torch

    from genie_tts_tpu.runtime.engine import ReferenceFeatures, TTSEngine
    from genie_tts_tpu.runtime.model_manager import ModelManager

    out = tmp_path / "char"
    _torch.save({"weight": fx["ckpt_sd"]}, tmp_path / "model.ckpt")
    _torch.save({"weight": fx["pth_sd"]}, tmp_path / "model.pth")
    version = tc.convert_character(
        tmp_path / "model.ckpt", tmp_path / "model.pth", out,
        language="Japanese", t2s_cfg=TCFG)
    assert version == "v2"

    # t2s_int8=False: this test pins exact layout/mask/token parity; the
    # int8 serving default is a documented approximation covered by
    # tests/test_int8_quality.py
    mgr = ModelManager(RuntimeConfig(t2s_int8=False))
    # fp32 compute for parity (bf16 — the TPU serving dtype — cannot
    # represent every fp16 weight exactly)
    char = mgr.load_character("parity", str(out), "Japanese",
                              compute_dtype=jnp.float32)
    assert char.t2s_cfg.num_layers == L_T2S
    assert char.t2s_cfg.max_decode_steps == MAX_STEPS

    engine = TTSEngine(RuntimeConfig())
    prompt_tokens = engine.compute_prompt_tokens(char, fx["ssl"][0])
    ref_prompts = _oracle_prompts(fx)
    np.testing.assert_array_equal(prompt_tokens, ref_prompts[0].numpy())

    ge = engine.compute_v2_speaker_embedding(char, fx["ref_audio"])
    ref = ReferenceFeatures(
        phones=fx["ref_phones"], bert=fx["ref_bert"],
        prompt_tokens=prompt_tokens, ge=ge, ge_mrte=ge[:512])
    audio = engine.synthesize_utterance(
        char, ref, fx["text_phones"], fx["text_bert"],
        sampling=GREEDY, seed=0, noise_scale=0.0)

    codes, _ = _oracle_tokens(fx)
    ref_audio, _ = sovits_oracle(
        fx["pth_sd"], torch.as_tensor(codes.astype(np.int64))[None],
        torch.as_tensor(fx["text_phones"], dtype=torch.long)[None],
        torch.as_tensor(fx["ref_audio"])[None], noise_scale=0.0)
    ref_np = ref_audio[0].numpy()
    assert audio.shape == ref_np.shape, (
        f"engine emitted {audio.shape} vs oracle {ref_np.shape}: "
        "token streams diverged through the deployment path")
    # fp16-stored fused weight-norm kernels bound the error here
    err = np.max(np.abs(audio - ref_np))
    assert err < 2e-2, f"waveform deviates by {err}"


def _slot_greedy_tokens(fx_, tparams, kv_int8):
    """Greedy decode through the SLOT machine (models/slots.py) at the
    d=512 fixture geometry, with exact or int8 KV caches."""
    from genie_tts_tpu.models import slots
    from genie_tts_tpu.ops.sampling import SamplingRows, rows_from_config
    from genie_tts_tpu.runtime.buckets import pad_to

    prompts = np.asarray(
        t2s.extract_prompt_tokens(tparams, jnp.asarray(fx_["ssl"])))
    phones = np.concatenate([fx_["ref_phones"], fx_["text_phones"]])
    bert = np.concatenate([fx_["ref_bert"], fx_["text_bert"]])
    SX_, SP_, W_ = 48, 32, 8
    ring = -(-MAX_STEPS // W_) * W_
    samp = rows_from_config(GREEDY, 1)
    ctx_k, ctx_v, tok0, hist = slots.prefill_join(
        tparams, TCFG, jax.random.PRNGKey(0),
        jnp.asarray(pad_to(phones.astype(np.int32), SX_))[None],
        jnp.asarray(pad_to(bert.astype(np.float32), SX_, axis=0))[None],
        jnp.array([len(phones)]),
        jnp.asarray(pad_to(prompts[0].astype(np.int32), SP_))[None],
        jnp.array([prompts.shape[1]]), samp)
    state = slots.init_slots(TCFG, 2, SX_, SP_, ring, dtype=jnp.float32,
                             kv_int8=kv_int8)
    state = slots.insert_slot(
        state, jnp.int32(0), ctx_k, ctx_v, tok0, hist,
        jnp.int32(len(phones)), jnp.int32(prompts.shape[1]),
        jnp.int32(0), jnp.int32(MAX_STEPS),
        SamplingRows(*(a[0] for a in samp)))
    got = [int(tok0[0])]
    for seg in range(ring // W_):
        state, seg_tok = slots.decode_segment(
            tparams, state, jax.random.PRNGKey(100 + seg), TCFG,
            W_, SX_, SP_, ring)
        got.extend(np.asarray(seg_tok)[0])
        if bool(np.asarray(state.done)[0]):
            break
    count = int(np.asarray(state.counts)[0])
    toks = np.array(got[:count])
    return t2s.finalize_semantic_tokens(
        toks[None], np.array([count]), TCFG.eos_id)[0]


@pytest.mark.slow
def test_slot_kv_int8_quality(fx):
    """Quality gate for the int8 slot KV cache at d=512 geometry.

    ``RuntimeConfig.slot_kv_int8`` stores the slot machine's merged K/V
    columns as int8 codes + per-column fp32 scales (half the per-step HBM
    stream). Gate: greedy token streams through the slot machine with
    int8 KV vs exact fp32 KV on the GPT-SoVITS-shaped d=512 fixture must
    agree >= 0.95 positionally with emitted length within 20%. The exact
    slot stream itself must equal t2s.generate's (the existing strict
    slot-parity contract, re-checked here at d=512).

    Flip-to-off criterion: if the bound fails on a real converted
    checkpoint, serve with GENIE_SLOT_KV_INT8=0 (documented in config.py).
    """
    ref_toks, _ = _jax_greedy_tokens(fx, fx["tparams"])
    exact_toks = _slot_greedy_tokens(fx, fx["tparams"], kv_int8=False)
    np.testing.assert_array_equal(exact_toks, ref_toks)

    q_toks = _slot_greedy_tokens(fx, fx["tparams"], kv_int8=True)
    n = min(len(q_toks), len(exact_toks))
    assert n > 8, "degenerate decode; reseed the fixture"
    agree = float(np.mean(q_toks[:n] == exact_toks[:n]))
    assert agree >= 0.95, f"kv-int8 greedy agreement {agree:.3f} < 0.95"
    assert abs(len(q_toks) - len(exact_toks)) <= 0.2 * len(exact_toks), (
        f"kv-int8 emitted {len(q_toks)} tokens vs exact {len(exact_toks)}")


@pytest.mark.slow
def test_int8_serving_default_quality(fx):
    """Quality gate for the int8 serving default at d=512 geometry.

    The serving default (``RuntimeConfig.t2s_int8``) quantizes the T2S
    decoder weights at load time in the SERVING compute dtype (bf16).
    The old gate (tests/test_int8_quality.py) bounded token agreement at
    0.5 on a toy model — far too weak for a default that changes emitted
    token streams. This gate runs the same GPT-SoVITS-shaped d=512
    fixture as the strict parity tests and requires, vs the fp32 greedy
    reference stream:

    * >= 0.95 positional greedy-token agreement vs plain-bf16 greedy —
      bf16 IS the serving compute dtype, so this isolates what
      quantization changes in what serving would otherwise emit,
    * vs fp32: at most 2 extra positional mismatches over plain bf16
      (bf16 rounding alone can shift a token by one position, which
      positional counting scores twice; int8 must not add drift),
    * emitted length within 20% of fp32,
    * vocoded waveform of the int8 stream within bounded relative RMS of
      the fp32-stream waveform over the shared prefix.

    Flip-to-off criterion: if any bound fails on a real converted
    checkpoint, serve with GENIE_T2S_INT8=0 (documented in config.py).
    """
    bf16 = jax.tree.map(
        lambda l: l.astype(jnp.bfloat16)
        if l.dtype == jnp.float32 else l, fx["tparams"])
    ref_toks, _ = _jax_greedy_tokens(fx, fx["tparams"])
    bf_toks, _ = _jax_greedy_tokens(fx, bf16)
    q_toks, _ = _jax_greedy_tokens(fx, t2s.quantize_params(bf16))
    assert len(ref_toks) > 8, "degenerate decode; reseed the fixture"

    def mismatches(a, b):
        n = min(len(a), len(b))
        return int(np.sum(a[:n] != b[:n])), n

    bf_bad, _ = mismatches(ref_toks, bf_toks)
    q_bad, _ = mismatches(ref_toks, q_toks)
    q_vs_bf_bad, n = mismatches(bf_toks, q_toks)
    agree = 1.0 - q_vs_bf_bad / n
    assert agree >= 0.95, (
        f"int8 vs bf16 greedy agreement {agree:.3f} < 0.95")
    assert abs(len(q_toks) - len(ref_toks)) <= 0.2 * len(ref_toks), (
        f"int8 emitted {len(q_toks)} tokens vs fp32 {len(ref_toks)}")
    assert q_bad <= bf_bad + 2, (
        f"quantization added {q_bad - bf_bad} mismatches over bf16 "
        f"(bf16: {bf_bad}/{n}, int8: {q_bad}/{n})")

    def vocode(codes):
        codes_j = jnp.asarray(codes.astype(np.int32))[None]
        text = fx["text_phones"]
        spec = linear_spectrogram(jnp.asarray(fx["ref_audio"])[None])
        ge = sovits.reference_embedding(fx["vparams"], VCFG, spec,
                                        jnp.array([spec.shape[1]]))
        return np.asarray(sovits.synthesize(
            fx["vparams"], VCFG, jax.random.PRNGKey(0), codes_j,
            jnp.array([codes_j.shape[1]]), jnp.asarray(text)[None],
            jnp.array([len(text)]), ge, ge[:, :512], noise_scale=0.0))[0]

    n = min(len(q_toks), len(ref_toks))
    wav_q, wav_ref = vocode(q_toks[:n]), vocode(ref_toks[:n])
    m = min(len(wav_q), len(wav_ref))
    rel = (np.sqrt(np.mean((wav_q[:m] - wav_ref[:m]) ** 2))
           / max(np.sqrt(np.mean(wav_ref[:m] ** 2)), 1e-9))
    # identical token prefixes vocode identically (the vocoder is never
    # quantized); any mismatch localizes to the divergent frames
    bound = 0.05 if q_bad == 0 else 0.6
    assert rel < bound, f"int8-stream waveform rel-RMS {rel:.3f}"


# ---------------------------------------------------------------------------
# PRODUCTION geometry (24L x d512 — the full GPT-SoVITS V2 T2S depth).
# Slow-marked: the torch oracle and the fp32 decode each run the whole
# 24-layer stack per AR step on CPU.
# ---------------------------------------------------------------------------

TCFG24 = T2SConfig(num_layers=L_PROD, max_decode_steps=MAX_STEPS)


@pytest.fixture(scope="module")
def fx24(fx):
    """24-layer T2S checkpoint; SSL/phoneme/BERT inputs shared with fx."""
    g = torch.Generator().manual_seed(17)
    ckpt_sd = _build_t2s_ckpt(g, n_layers=L_PROD)
    # VQ front-end tensors come from the SoVITS .pth (shared with fx) so
    # prompt extraction stays byte-identical across the two fixtures
    ckpt_np = {k: v.numpy() for k, v in ckpt_sd.items()}
    tparams = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                           tc.convert_t2s(ckpt_np, fx["pth_np"], TCFG24))
    return {**fx, "ckpt_sd": ckpt_sd, "ckpt_np": ckpt_np,
            "tparams": tparams}


@pytest.mark.slow
def test_t2s_greedy_token_parity_production_geometry(fx24):
    """Strict token parity at the PRODUCTION 24L/512 T2S geometry.

    The 4-layer strict test (test_t2s_greedy_token_parity) exercises every
    structural detail; this pins the claim at the depth real checkpoints
    ship (reference graph: Data/v2/Keys/t2s_onnx_keys.txt, 24 layers) —
    numerical drift across 24 post-LN layers must not flip a greedy token.
    """
    ours, _ = _jax_greedy_tokens(fx24, fx24["tparams"], tcfg=TCFG24)
    ref, emitted = _oracle_tokens(fx24, n_layers=L_PROD)
    assert len(emitted) > 3, "degenerate decode; reseed the fixture"
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.slow
def test_int8_serving_default_quality_production_geometry(fx24):
    """int8 serving-default gate at the PRODUCTION 24L/512 geometry.

    The d512/4L gate (test_int8_serving_default_quality) isolates the
    quantization mechanics; 24 layers accumulate 6x the quantization
    noise, so the serving default must re-pass the same bounds at full
    depth: >= 0.95 positional greedy agreement vs plain-bf16 (the serving
    compute dtype), emitted length within 20% of fp32, and no more than
    2 extra fp32 mismatches over what bf16 rounding alone causes.
    Flip-to-off criterion: GENIE_T2S_INT8=0 (config.py).
    """
    bf16 = jax.tree.map(
        lambda l: l.astype(jnp.bfloat16)
        if l.dtype == jnp.float32 else l, fx24["tparams"])
    ref_toks, _ = _jax_greedy_tokens(fx24, fx24["tparams"], tcfg=TCFG24)
    bf_toks, _ = _jax_greedy_tokens(fx24, bf16, tcfg=TCFG24)
    q_toks, _ = _jax_greedy_tokens(fx24, t2s.quantize_params(bf16),
                                   tcfg=TCFG24)
    assert len(ref_toks) > 8, "degenerate decode; reseed the fixture"

    def mismatches(a, b):
        n = min(len(a), len(b))
        return int(np.sum(a[:n] != b[:n])), n

    bf_bad, _ = mismatches(ref_toks, bf_toks)
    q_bad, _ = mismatches(ref_toks, q_toks)
    q_vs_bf_bad, n = mismatches(bf_toks, q_toks)
    agree = 1.0 - q_vs_bf_bad / n
    assert agree >= 0.95, (
        f"int8 vs bf16 greedy agreement {agree:.3f} < 0.95 at 24L")
    assert abs(len(q_toks) - len(ref_toks)) <= 0.2 * len(ref_toks), (
        f"int8 emitted {len(q_toks)} tokens vs fp32 {len(ref_toks)} at 24L")
    assert q_bad <= bf_bad + 2, (
        f"quantization added {q_bad - bf_bad} mismatches over bf16 at 24L "
        f"(bf16: {bf_bad}/{n}, int8: {q_bad}/{n})")


@pytest.mark.slow
def test_slot_windowed_decode_production_geometry(fx24):
    """The slot machine's WINDOWED KV read path at 24L/512: the serving
    default (ctx/ring read windows, models/slots.py) must reproduce
    t2s.generate's greedy stream exactly at production depth."""
    from genie_tts_tpu.models import slots
    from genie_tts_tpu.ops.sampling import SamplingRows, rows_from_config
    from genie_tts_tpu.runtime.buckets import pad_to

    tparams = fx24["tparams"]
    ref_toks, prompts = _jax_greedy_tokens(fx24, tparams, tcfg=TCFG24)
    phones = np.concatenate([fx24["ref_phones"], fx24["text_phones"]])
    bert = np.concatenate([fx24["ref_bert"], fx24["text_bert"]])
    SX_, SP_, W_ = 48, 32, 8
    ring = -(-MAX_STEPS // W_) * W_
    samp = rows_from_config(GREEDY, 1)
    ctx_k, ctx_v, tok0, hist = slots.prefill_join(
        tparams, TCFG24, jax.random.PRNGKey(0),
        jnp.asarray(pad_to(phones.astype(np.int32), SX_))[None],
        jnp.asarray(pad_to(bert.astype(np.float32), SX_, axis=0))[None],
        jnp.array([len(phones)]),
        jnp.asarray(pad_to(prompts[0].astype(np.int32), SP_))[None],
        jnp.array([prompts.shape[1]]), samp)
    state = slots.init_slots(TCFG24, 2, SX_, SP_, ring, dtype=jnp.float32)
    state = slots.insert_slot(
        state, jnp.int32(0), ctx_k, ctx_v, tok0, hist,
        jnp.int32(len(phones)), jnp.int32(prompts.shape[1]),
        jnp.int32(0), jnp.int32(MAX_STEPS),
        SamplingRows(*(a[0] for a in samp)))
    got = [int(tok0[0])]
    merged = 0
    for seg in range(ring // W_):
        state, seg_tok = slots.decode_segment(
            tparams, state, jax.random.PRNGKey(100 + seg), TCFG24,
            W_, SX_, SP_, ring,
            ctx_win=64, ring_win=min(max(merged + W_, W_), ring))
        merged += W_
        got.extend(np.asarray(seg_tok)[0])
        if bool(np.asarray(state.done)[0]):
            break
    count = int(np.asarray(state.counts)[0])
    toks = t2s.finalize_semantic_tokens(
        np.array(got[:count])[None], np.array([count]), TCFG24.eos_id)[0]
    np.testing.assert_array_equal(toks, ref_toks)
