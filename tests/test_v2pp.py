"""V2ProPlus end-to-end: prompt encoder conditioning + cloning path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genie_tts_tpu as genie
from genie_tts_tpu import api
from genie_tts_tpu.config import HubertConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.convert.io import save_character_config, save_params
from genie_tts_tpu.models import hubert as hubert_model
from genie_tts_tpu.models import prompt_encoder, sovits, sv, t2s
from genie_tts_tpu.runtime.model_manager import model_manager
from genie_tts_tpu.utils.wavio import read_wav, write_wav

pytestmark = pytest.mark.slow  # module fixture compiles full model graphs (minutes on CPU)

GIN = 24
TCFG = T2SConfig(
    phoneme_vocab=732, semantic_vocab=33, embed_dim=32, num_layers=2,
    num_heads=4, ffn_dim=64, bert_dim=1024, ssl_dim=24, eos_id=32,
    max_decode_steps=10,
)
VCFG = SoVITSConfig(
    spec_channels=33, inter_channels=16, hidden_channels=16, filter_channels=32,
    n_heads=2, n_layers=2, kernel_size=3, mrte_channels=16, ssl_dim=24,
    vq_codes=32, vq_dim=24, gin_channels=GIN, sv_dim=64,
    flow_layers=2, wn_layers=2, wn_kernel=5,
    upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4), upsample_initial=32,
    resblock_kernels=(3,), resblock_dilations=((1, 3),),
    n_fft=64, hop_length=8, win_length=64, version="v2ProPlus",
)
HCFG = HubertConfig(
    conv_dims=(8,) * 7, embed_dim=24, num_layers=1, num_heads=2, ffn_dim=32,
    conv_pos_kernel=8, conv_pos_groups=2,
)


@pytest.fixture(scope="module")
def char_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("v2pp")
    save_params(t2s.init_params(jax.random.PRNGKey(0), TCFG, jnp.float32),
                d / "t2s.safetensors")
    save_params(sovits.init_params(jax.random.PRNGKey(1), VCFG, jnp.float32),
                d / "vits.safetensors")
    save_params(prompt_encoder.init_params(
        jax.random.PRNGKey(2), VCFG, jnp.float32, gin=GIN,
        mrte_dim=VCFG.mrte_channels), d / "prompt_encoder.safetensors")
    cfg = dataclasses.asdict(VCFG)
    save_character_config(
        d / "config.json", version="v2ProPlus", language="Japanese",
        extra={"t2s": dataclasses.asdict(TCFG), "sovits": cfg})
    return d


@pytest.fixture(scope="module", autouse=True)
def hooks():
    model_manager.set_hubert(
        hubert_model.init_params(jax.random.PRNGKey(3), HCFG, jnp.float32), HCFG)
    api._hubert_jit = None
    rng = np.random.default_rng(0)
    sv.set_sv_fn(lambda audio: rng.standard_normal(VCFG.sv_dim).astype(np.float32))
    yield
    sv.set_sv_fn(None)
    api._hubert_jit = None


def test_v2pp_checkpoint_requires_prompt_encoder(char_dir, tmp_path):
    import shutil

    broken = tmp_path / "broken"
    shutil.copytree(char_dir, broken)
    (broken / "prompt_encoder.safetensors").unlink()
    with pytest.raises(FileNotFoundError, match="prompt_encoder"):
        genie.load_character("broken", broken, "ja")


def test_v2pp_e2e(char_dir, tmp_path):
    rng = np.random.default_rng(1)
    ref = tmp_path / "ref.wav"
    write_wav(ref, rng.standard_normal(32000 * 4).astype(np.float32) * 0.05, 32000)
    genie.load_character("pp", char_dir, "ja")
    model = model_manager.get("pp")
    assert model.version == "v2ProPlus"
    assert model.prompt_encoder_params is not None
    # gin_channels honored from config.json override
    assert model.sovits_cfg.gin_channels == GIN

    genie.set_reference_audio("pp", ref, "こんにちは", "ja")
    out = tmp_path / "pp.wav"
    genie.tts("pp", "こんにちは。", save_path=out)
    audio, sr = read_wav(out)
    assert sr == 32000 and len(audio) > 0
    assert np.isfinite(audio).all()


class TestV2ppConvertPath:
    """convert_character on a v2pp-shaped torch checkpoint: key-based
    version detection (vq_model.sv_emb/ge_to512), prompt-encoder emission,
    and no ref_enc bound into the synthesizer params."""

    def _build_pth(self, torch, g):
        sd = {}

        def R(*s, scale=0.05):
            return torch.randn(*s, generator=g) * scale

        def conv(key, co, ci, k):
            sd[f"{key}.weight"] = R(co, ci, k)
            sd[f"{key}.bias"] = R(co)

        def wn(key, co, ci, k):
            sd[f"{key}.weight_v"] = R(co, ci, k)
            sd[f"{key}.weight_g"] = torch.abs(R(co, 1, 1, scale=0.3)) + 0.7
            sd[f"{key}.bias"] = R(co)

        C, F = VCFG.hidden_channels, VCFG.filter_channels
        MR, GINc = VCFG.mrte_channels, GIN
        sd["quantizer.vq.layers.0._codebook.embed"] = R(VCFG.vq_codes, VCFG.vq_dim)
        conv("ssl_proj", VCFG.ssl_dim, VCFG.ssl_dim, 2)
        conv("enc_p.ssl_proj", C, VCFG.ssl_dim, 1)
        sd["enc_p.text_embedding.weight"] = R(732, C)
        for enc, n in (("encoder_ssl", VCFG.n_layers // 2),
                       ("encoder_text", VCFG.n_layers),
                       ("encoder2", VCFG.n_layers // 2)):
            for i in range(n):
                for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
                    conv(f"enc_p.{enc}.attn_layers.{i}.{nm}", C, C, 1)
                sd[f"enc_p.{enc}.attn_layers.{i}.emb_rel_k"] = R(1, 9, C // VCFG.n_heads)
                sd[f"enc_p.{enc}.attn_layers.{i}.emb_rel_v"] = R(1, 9, C // VCFG.n_heads)
                for li in (1, 2):
                    sd[f"enc_p.{enc}.norm_layers_{li}.{i}.gamma"] = torch.ones(C)
                    sd[f"enc_p.{enc}.norm_layers_{li}.{i}.beta"] = torch.zeros(C)
                conv(f"enc_p.{enc}.ffn_layers.{i}.conv_1", F, C, 3)
                conv(f"enc_p.{enc}.ffn_layers.{i}.conv_2", C, F, 3)
        for nm, co, ci in (("c_pre", MR, C), ("text_pre", MR, C), ("c_post", C, MR)):
            conv(f"enc_p.mrte.{nm}", co, ci, 1)
        for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
            conv(f"enc_p.mrte.cross_attention.{nm}", MR, MR, 1)
        conv("enc_p.proj", 2 * VCFG.inter_channels, C, 1)
        half = VCFG.inter_channels // 2
        for i in range(0, 2 * VCFG.flow_layers, 2):
            conv(f"flow.flows.{i}.pre", C, half, 1)
            conv(f"flow.flows.{i}.post", half, C, 1)
            wn(f"flow.flows.{i}.enc.cond_layer", 2 * C * VCFG.wn_layers, GINc, 1)
            for j in range(VCFG.wn_layers):
                wn(f"flow.flows.{i}.enc.in_layers.{j}", 2 * C, C, VCFG.wn_kernel)
                wn(f"flow.flows.{i}.enc.res_skip_layers.{j}",
                   2 * C if j < VCFG.wn_layers - 1 else C, C, 1)
        ch = VCFG.upsample_initial
        conv("dec.conv_pre", ch, VCFG.inter_channels, 7)
        conv("dec.cond", ch, GINc, 1)
        for i, (u, k) in enumerate(zip(VCFG.upsample_rates, VCFG.upsample_kernels)):
            sd[f"dec.ups.{i}.weight_v"] = R(ch, ch // 2, k)
            sd[f"dec.ups.{i}.weight_g"] = torch.abs(R(ch, 1, 1, scale=0.3)) + 0.7
            sd[f"dec.ups.{i}.bias"] = R(ch // 2)
            ch //= 2
            for j, kern in enumerate(VCFG.resblock_kernels):
                b = i * len(VCFG.resblock_kernels) + j
                for d in range(len(VCFG.resblock_dilations[j])):
                    wn(f"dec.resblocks.{b}.convs1.{d}", ch, ch, kern)
                    wn(f"dec.resblocks.{b}.convs2.{d}", ch, ch, kern)
        sd["dec.conv_post.weight"] = R(1, ch, 7)
        # prompt-encoder tensors (the v2pp marker keys)
        for nm, o, i_ in (("spectral.0.fc", 128, VCFG.spec_channels),
                          ("spectral.3.fc", 128, 128), ("fc.fc", GINc, 128)):
            sd[f"ref_enc.{nm}.weight"] = R(o, i_)
            sd[f"ref_enc.{nm}.bias"] = R(o)
        for i in range(2):
            conv(f"ref_enc.temporal.{i}.conv1.conv", 256, 128, 5)
        for nm in ("w_qs", "w_ks", "w_vs", "fc"):
            sd[f"ref_enc.slf_attn.{nm}.weight"] = R(128, 128)
            sd[f"ref_enc.slf_attn.{nm}.bias"] = R(128)
        sd["sv_emb.weight"] = R(GINc, VCFG.sv_dim)
        sd["sv_emb.bias"] = R(GINc)
        sd["ge_to512.weight"] = R(VCFG.mrte_channels, GINc)
        sd["ge_to512.bias"] = R(VCFG.mrte_channels)
        sd["prelu.weight"] = torch.full((GINc,), 0.25)
        # real checkpoints carry the vq_model. prefix
        return {f"vq_model.{k}": v for k, v in sd.items()}

    def test_convert_detects_and_emits(self, tmp_path):
        torch = pytest.importorskip("torch")
        from genie_tts_tpu.convert.torch_convert import convert_character

        g = torch.Generator().manual_seed(5)
        pth = self._build_pth(torch, g)
        ck = {}
        d = TCFG.embed_dim
        ck["model.ar_text_embedding.word_embeddings.weight"] = torch.randn(732, d, generator=g) * 0.05
        ck["model.ar_audio_embedding.word_embeddings.weight"] = torch.randn(TCFG.semantic_vocab, d, generator=g) * 0.05
        ck["model.ar_text_position.alpha"] = torch.ones(1)
        ck["model.ar_audio_position.alpha"] = torch.ones(1)
        ck["model.bert_proj.weight"] = torch.randn(d, 1024, generator=g) * 0.05
        ck["model.bert_proj.bias"] = torch.randn(d, generator=g) * 0.05
        ck["model.ar_predict_layer.weight"] = torch.randn(TCFG.semantic_vocab, d, generator=g) * 0.05
        for i in range(TCFG.num_layers):
            p = f"model.h.layers.{i}"
            ck[f"{p}.self_attn.in_proj_weight"] = torch.randn(3 * d, d, generator=g) * 0.05
            ck[f"{p}.self_attn.in_proj_bias"] = torch.randn(3 * d, generator=g) * 0.05
            ck[f"{p}.self_attn.out_proj.weight"] = torch.randn(d, d, generator=g) * 0.05
            ck[f"{p}.self_attn.out_proj.bias"] = torch.randn(d, generator=g) * 0.05
            ck[f"{p}.linear1.weight"] = torch.randn(TCFG.ffn_dim, d, generator=g) * 0.05
            ck[f"{p}.linear1.bias"] = torch.randn(TCFG.ffn_dim, generator=g) * 0.05
            ck[f"{p}.linear2.weight"] = torch.randn(d, TCFG.ffn_dim, generator=g) * 0.05
            ck[f"{p}.linear2.bias"] = torch.randn(d, generator=g) * 0.05
            ck[f"{p}.norm1.weight"] = torch.ones(d)
            ck[f"{p}.norm1.bias"] = torch.zeros(d)
            ck[f"{p}.norm2.weight"] = torch.ones(d)
            ck[f"{p}.norm2.bias"] = torch.zeros(d)
        torch.save({"weight": ck}, tmp_path / "m.ckpt")
        torch.save({"weight": pth}, tmp_path / "m.pth")

        out = tmp_path / "charpp"
        version = convert_character(tmp_path / "m.ckpt", tmp_path / "m.pth",
                                    out, language="Japanese",
                                    t2s_cfg=TCFG, sovits_cfg=VCFG)
        assert version == "v2ProPlus"
        assert (out / "prompt_encoder.safetensors").is_file()
        from genie_tts_tpu.convert.io import load_params

        vits = load_params(out / "vits.safetensors")
        assert "ref_enc" not in vits  # style encoder lives in the prompt encoder
        pe = load_params(out / "prompt_encoder.safetensors")
        assert "sv_emb" in pe and "ge_to512" in pe

        # e2e through the public API on the converted checkpoint
        genie.load_character("ppconv", out, "ja")
        rng = np.random.default_rng(2)
        ref = tmp_path / "refpp.wav"
        write_wav(ref, rng.standard_normal(32000).astype(np.float32) * 0.05, 32000)
        genie.set_reference_audio("ppconv", ref, "こんにちは", "ja")
        outwav = tmp_path / "ppconv.wav"
        genie.tts("ppconv", "てすとです。", save_path=outwav)
        audio, sr = read_wav(outwav)
        assert sr == 32000 and len(audio) > 0 and np.isfinite(audio).all()


def test_real_sv_asset_path(tmp_path, monkeypatch):
    """get_sv_fn loads a converted ERes2NetV2 checkpoint from
    GENIE_SV_MODEL and produces the 20480-d embedding (no injected stub)."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tests")
    from test_eres2net_convert import _build_sd

    from genie_tts_tpu.convert.io import save_params as _save
    from genie_tts_tpu.models import eres2net
    from genie_tts_tpu.models import sv as sv_mod

    params = eres2net.convert_from_torch(
        {k: v.numpy() for k, v in _build_sd(seed=9).items()})
    path = tmp_path / "speaker_encoder.safetensors"
    _save(params, path)
    monkeypatch.setenv("GENIE_SV_MODEL", str(path))
    prior = sv_mod._custom_fn
    sv_mod.set_sv_fn(None)
    sv_mod._loaded_fn = None
    try:
        fn = sv_mod.get_sv_fn()
        assert fn is not None
        emb = fn(np.random.default_rng(3).standard_normal(16000).astype(np.float32))
        assert emb.shape == (20480,) and np.isfinite(emb).all()
    finally:
        sv_mod._loaded_fn = None
        sv_mod.set_sv_fn(prior)
