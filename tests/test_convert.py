"""Converter tests: layout transforms verified against torch as the oracle,
plus schema round-trip through safetensors."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from genie_tts_tpu.config import SoVITSConfig, T2SConfig  # noqa: E402
from genie_tts_tpu.convert import torch_convert as tc  # noqa: E402
from genie_tts_tpu.convert.io import (  # noqa: E402
    flatten_tree, load_params, save_params, unflatten_tree,
)
from genie_tts_tpu.ops.layers import conv1d, conv_transpose1d, linear  # noqa: E402


def to_np(t):
    return t.detach().numpy()


class TestLayoutParity:
    def test_linear(self):
        m = torch.nn.Linear(6, 4)
        x = torch.randn(2, 5, 6)
        ref = to_np(m(x))
        p = {"w": to_np(m.weight).T, "b": to_np(m.bias)}
        out = np.asarray(linear(jax.tree.map(jnp.asarray, p), jnp.asarray(to_np(x))))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("k,s,pad,dil,groups", [
        (1, 1, 0, 1, 1), (3, 1, 1, 1, 1), (5, 1, 2, 1, 1),
        (3, 1, 3, 3, 1), (2, 2, 0, 1, 1), (4, 1, 2, 1, 2),
    ])
    def test_conv1d(self, k, s, pad, dil, groups):
        m = torch.nn.Conv1d(4, 8, k, stride=s, padding=pad, dilation=dil, groups=groups)
        x = torch.randn(2, 4, 16)
        ref = to_np(m(x)).transpose(0, 2, 1)  # NCW -> NWC
        p = {"w": to_np(m.weight).transpose(2, 1, 0), "b": to_np(m.bias)}
        out = np.asarray(conv1d(
            jax.tree.map(jnp.asarray, p), jnp.asarray(to_np(x).transpose(0, 2, 1)),
            stride=s, padding=pad, dilation=dil, groups=groups))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("k,s", [(16, 10), (16, 8), (8, 2), (2, 2), (4, 2)])
    def test_conv_transpose1d(self, k, s):
        pad = (k - s) // 2
        m = torch.nn.ConvTranspose1d(6, 3, k, stride=s, padding=pad)
        x = torch.randn(1, 6, 12)
        ref = to_np(m(x)).transpose(0, 2, 1)
        p = {"w": to_np(m.weight).transpose(2, 0, 1), "b": to_np(m.bias)}
        out = np.asarray(conv_transpose1d(
            jax.tree.map(jnp.asarray, p), jnp.asarray(to_np(x).transpose(0, 2, 1)),
            stride=s, padding=pad))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_weight_norm_fusion_conv(self):
        m = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 5, padding=2))
        x = torch.randn(1, 4, 10)
        ref = to_np(m(x)).transpose(0, 2, 1)
        sd = {k: to_np(v) for k, v in m.state_dict().items()}
        p = tc._wn_conv({"c.weight_g": sd["weight_g"], "c.weight_v": sd["weight_v"],
                         "c.bias": sd["bias"]}, "c")
        out = np.asarray(conv1d(jax.tree.map(jnp.asarray, p),
                                jnp.asarray(to_np(x).transpose(0, 2, 1)), padding=2))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_weight_norm_fusion_conv_transpose(self):
        m = torch.nn.utils.weight_norm(torch.nn.ConvTranspose1d(6, 3, 16, stride=8, padding=4))
        x = torch.randn(1, 6, 9)
        ref = to_np(m(x)).transpose(0, 2, 1)
        sd = {k: to_np(v) for k, v in m.state_dict().items()}
        p = tc._wn_conv({"c.weight_g": sd["weight_g"], "c.weight_v": sd["weight_v"],
                         "c.bias": sd["bias"]}, "c", transpose_conv=True)
        out = np.asarray(conv_transpose1d(jax.tree.map(jnp.asarray, p),
                                          jnp.asarray(to_np(x).transpose(0, 2, 1)),
                                          stride=8, padding=4))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_t2s_transformer_layer_parity(self):
        """Post-LN torch TransformerEncoderLayer == our _layer_prefill."""
        from genie_tts_tpu.models.t2s import _layer_prefill

        D, H = 16, 4
        m = torch.nn.TransformerEncoderLayer(
            D, H, dim_feedforward=32, dropout=0.0, batch_first=True,
            norm_first=False)
        m.eval()
        x = torch.randn(2, 6, D)
        with torch.no_grad():
            ref = to_np(m(x))
        sd = {k: to_np(v) for k, v in m.state_dict().items()}
        lp = {
            "qkv": {"w": sd["self_attn.in_proj_weight"].T, "b": sd["self_attn.in_proj_bias"]},
            "out": {"w": sd["self_attn.out_proj.weight"].T, "b": sd["self_attn.out_proj.bias"]},
            "ffn1": {"w": sd["linear1.weight"].T, "b": sd["linear1.bias"]},
            "ffn2": {"w": sd["linear2.weight"].T, "b": sd["linear2.bias"]},
            "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
            "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        }
        lp = jax.tree.map(jnp.asarray, lp)
        mask = jnp.ones((2, 1, 6, 6), bool)
        out, _ = _layer_prefill(lp, jnp.asarray(to_np(x)), mask, H)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


class TestCheckpointIO:
    def test_flatten_unflatten_roundtrip(self):
        tree = {"a": {"b": np.ones((2, 2))}, "ups": [{"w": np.zeros(3)}, {"w": np.ones(3)}]}
        flat = flatten_tree(tree)
        assert set(flat) == {"a/b", "ups/0/w", "ups/1/w"}
        rec = unflatten_tree(flat)
        assert isinstance(rec["ups"], list)
        np.testing.assert_array_equal(rec["ups"][1]["w"], np.ones(3))

    def test_save_load_dtypes(self, tmp_path):
        tree = {"layer": {"w": np.random.randn(4, 4).astype(np.float32),
                          "scale": np.ones(4, np.float32)},
                "codebook": np.random.randn(8, 4).astype(np.float32)}
        save_params(tree, tmp_path / "x.safetensors")
        back = load_params(tmp_path / "x.safetensors")
        assert back["layer"]["w"].dtype == jnp.bfloat16
        assert back["layer"]["scale"].dtype == jnp.float32   # norm scale stays fp32
        assert back["codebook"].dtype == jnp.float32          # codebook exact
        np.testing.assert_allclose(np.asarray(back["codebook"]),
                                   tree["codebook"], atol=1e-6)


def _rand_sd(shapes):
    g = torch.Generator().manual_seed(0)
    return {k: torch.randn(*v, generator=g).numpy() for k, v in shapes.items()}


class TestFullConversion:
    def test_t2s_schema_matches_model(self):
        from genie_tts_tpu.models import t2s as t2s_model

        cfg = T2SConfig(num_layers=2)
        shapes = {
            "model.ar_text_embedding.word_embeddings.weight": (732, 512),
            "model.ar_audio_embedding.word_embeddings.weight": (1025, 512),
            "model.ar_text_position.alpha": (1,),
            "model.ar_audio_position.alpha": (1,),
            "model.bert_proj.weight": (512, 1024), "model.bert_proj.bias": (512,),
            "model.ar_predict_layer.weight": (1025, 512),
        }
        for i in range(2):
            p = f"model.h.layers.{i}"
            shapes.update({
                f"{p}.self_attn.in_proj_weight": (1536, 512),
                f"{p}.self_attn.in_proj_bias": (1536,),
                f"{p}.self_attn.out_proj.weight": (512, 512),
                f"{p}.self_attn.out_proj.bias": (512,),
                f"{p}.linear1.weight": (2048, 512), f"{p}.linear1.bias": (2048,),
                f"{p}.linear2.weight": (512, 2048), f"{p}.linear2.bias": (512,),
                f"{p}.norm1.weight": (512,), f"{p}.norm1.bias": (512,),
                f"{p}.norm2.weight": (512,), f"{p}.norm2.bias": (512,),
            })
        pth_shapes = {
            "vq_model.ssl_proj.weight": (768, 768, 2), "vq_model.ssl_proj.bias": (768,),
            "vq_model.quantizer.vq.layers.0._codebook.embed": (1024, 768),
        }
        params = tc.convert_t2s(_rand_sd(shapes), _rand_sd(pth_shapes), cfg)
        params = jax.tree.map(jnp.asarray, params)
        # run a forward pass to validate all shapes wire up
        ids = jnp.zeros((1, 4), jnp.int32)
        bert = jnp.zeros((1, 4, 1024))
        x = t2s_model.embed_text(params, ids, bert)
        logits, _ = t2s_model.prefill(params, cfg, x, jnp.array([4]),
                                      jnp.zeros((1, 3), jnp.int32), jnp.array([3]),
                                      cache_len=16)
        assert logits.shape == (1, 1025)
        toks = t2s_model.extract_prompt_tokens(params, jnp.zeros((1, 6, 768)))
        assert toks.shape == (1, 3)


class TestSoVITSConversion:
    """convert_sovits: GPT-SoVITS-named state dict -> runnable synthesizer."""

    CFG = SoVITSConfig(
        spec_channels=33, inter_channels=16, hidden_channels=16,
        filter_channels=32, n_heads=2, n_layers=2, kernel_size=3,
        mrte_channels=16, ssl_dim=24, vq_codes=20, vq_dim=24, gin_channels=16,
        flow_layers=2, wn_layers=2, wn_kernel=5,
        upsample_rates=(2, 2), upsample_kernels=(4, 4), upsample_initial=32,
        resblock_kernels=(3,), resblock_dilations=((1, 3),),
        n_fft=64, hop_length=4, win_length=64,
    )

    def _torch_sd(self):
        g = torch.Generator().manual_seed(0)
        sd = {}

        def t(key, *shape):
            sd[key] = torch.randn(*shape, generator=g).numpy() * 0.1

        def conv(key, cout, cin, k):
            t(f"{key}.weight", cout, cin, k)
            t(f"{key}.bias", cout)

        def wn(key, cout, cin, k):
            t(f"{key}.weight_v", cout, cin, k)
            sd[f"{key}.weight_g"] = np.abs(
                torch.randn(cout, 1, 1, generator=g).numpy()) + 0.5
            t(f"{key}.bias", cout)

        C, F, H = 16, 32, 2
        cfg = self.CFG
        t("quantizer.vq.layers.0._codebook.embed", cfg.vq_codes, cfg.vq_dim)
        conv("enc_p.ssl_proj", C, cfg.vq_dim, 1)
        t("enc_p.text_embedding.weight", 732, C)
        for enc, n in (("encoder_ssl", 1), ("encoder_text", 2), ("encoder2", 1)):
            for i in range(n):
                for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
                    conv(f"enc_p.{enc}.attn_layers.{i}.{nm}", C, C, 1)
                t(f"enc_p.{enc}.attn_layers.{i}.emb_rel_k", 1, 9, C // H)
                t(f"enc_p.{enc}.attn_layers.{i}.emb_rel_v", 1, 9, C // H)
                for ln_i in (1, 2):
                    t(f"enc_p.{enc}.norm_layers_{ln_i}.{i}.gamma", C)
                    t(f"enc_p.{enc}.norm_layers_{ln_i}.{i}.beta", C)
                conv(f"enc_p.{enc}.ffn_layers.{i}.conv_1", F, C, 3)
                conv(f"enc_p.{enc}.ffn_layers.{i}.conv_2", C, F, 3)
        for nm, cout, cin in (("c_pre", cfg.mrte_channels, C),
                              ("text_pre", cfg.mrte_channels, C),
                              ("c_post", C, cfg.mrte_channels)):
            conv(f"enc_p.mrte.{nm}", cout, cin, 1)
        for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
            conv(f"enc_p.mrte.cross_attention.{nm}", cfg.mrte_channels,
                 cfg.mrte_channels, 1)
        conv("enc_p.proj", 2 * cfg.inter_channels, C, 1)
        half = cfg.inter_channels // 2
        for i in (0, 2):
            conv(f"flow.flows.{i}.pre", C, half, 1)
            conv(f"flow.flows.{i}.post", half, C, 1)
            wn(f"flow.flows.{i}.enc.cond_layer",
               2 * C * cfg.wn_layers, cfg.gin_channels, 1)
            for j in range(cfg.wn_layers):
                wn(f"flow.flows.{i}.enc.in_layers.{j}", 2 * C, C, 5)
                co = 2 * C if j < cfg.wn_layers - 1 else C
                wn(f"flow.flows.{i}.enc.res_skip_layers.{j}", co, C, 1)
        conv("dec.conv_pre", cfg.upsample_initial, cfg.inter_channels, 7)
        conv("dec.cond", cfg.upsample_initial, cfg.gin_channels, 1)
        ch = cfg.upsample_initial
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
            sd[f"dec.ups.{i}.weight_v"] = torch.randn(ch, ch // 2, k, generator=g).numpy() * 0.1
            sd[f"dec.ups.{i}.weight_g"] = np.abs(torch.randn(ch, 1, 1, generator=g).numpy()) + 0.5
            t(f"dec.ups.{i}.bias", ch // 2)
            ch //= 2
            for d in range(2):
                wn(f"dec.resblocks.{i}.convs1.{d}", ch, ch, 3)
                wn(f"dec.resblocks.{i}.convs2.{d}", ch, ch, 3)
        t("dec.conv_post.weight", 1, ch, 7)
        # ref_enc (MelStyleEncoder)
        for nm, o, i_ in (("spectral.0.fc", 128, self.CFG.spec_channels),
                          ("spectral.3.fc", 128, 128), ("fc.fc", cfg.gin_channels, 128)):
            t(f"ref_enc.{nm}.weight", o, i_)
            t(f"ref_enc.{nm}.bias", o)
        for i in range(2):
            conv(f"ref_enc.temporal.{i}.conv1.conv", 256, 128, 5)
        for nm in ("w_qs", "w_ks", "w_vs", "fc"):
            t(f"ref_enc.slf_attn.{nm}.weight", 128, 128)
            t(f"ref_enc.slf_attn.{nm}.bias", 128)
        return sd

    def test_convert_and_synthesize(self):
        from genie_tts_tpu.models import sovits as sovits_model

        params = tc.convert_sovits(self._torch_sd(), self.CFG)
        params = jax.tree.map(jnp.asarray, params)
        assert "ref_enc" in params
        audio = sovits_model.synthesize(
            params, self.CFG, jax.random.PRNGKey(0),
            jnp.zeros((1, 6), jnp.int32), jnp.array([6]),
            jnp.zeros((1, 4), jnp.int32), jnp.array([4]),
            jnp.zeros((1, self.CFG.gin_channels, 1)),
            jnp.zeros((1, self.CFG.mrte_channels, 1)))
        assert audio.shape == (1, 2 * 6 * 4)
        assert np.isfinite(np.asarray(audio)).all()

    def test_ref_enc_runs(self):
        from genie_tts_tpu.models import sovits as sovits_model

        params = jax.tree.map(jnp.asarray, tc.convert_sovits(self._torch_sd(), self.CFG))
        spec = jnp.zeros((1, 8, self.CFG.spec_channels))
        ge = sovits_model.reference_embedding(params, self.CFG, spec, jnp.array([8]))
        assert ge.shape == (1, self.CFG.gin_channels, 1)


class TestConvertCharacterDriver:
    """Full driver: torch .ckpt/.pth files -> loadable character dir."""

    def test_end_to_end(self, tmp_path):
        import genie_tts_tpu as genie
        from genie_tts_tpu.runtime.model_manager import model_manager

        tcfg = T2SConfig(phoneme_vocab=732, semantic_vocab=33, embed_dim=32,
                         num_layers=2, num_heads=4, ffn_dim=64, bert_dim=1024,
                         ssl_dim=24, eos_id=32, max_decode_steps=8)
        vcfg = TestSoVITSConversion.CFG

        g = torch.Generator().manual_seed(1)
        ckpt_sd = {}
        def t2(key, *shape):
            ckpt_sd[f"model.{key}"] = torch.randn(*shape, generator=g) * 0.1
        t2("ar_text_embedding.word_embeddings.weight", 732, 32)
        t2("ar_audio_embedding.word_embeddings.weight", 33, 32)
        t2("ar_text_position.alpha", 1)
        t2("ar_audio_position.alpha", 1)
        t2("bert_proj.weight", 32, 1024); t2("bert_proj.bias", 32)
        t2("ar_predict_layer.weight", 33, 32)
        for i in range(2):
            p = f"h.layers.{i}"
            t2(f"{p}.self_attn.in_proj_weight", 96, 32)
            t2(f"{p}.self_attn.in_proj_bias", 96)
            t2(f"{p}.self_attn.out_proj.weight", 32, 32)
            t2(f"{p}.self_attn.out_proj.bias", 32)
            t2(f"{p}.linear1.weight", 64, 32); t2(f"{p}.linear1.bias", 64)
            t2(f"{p}.linear2.weight", 32, 64); t2(f"{p}.linear2.bias", 32)
            t2(f"{p}.norm1.weight", 32); t2(f"{p}.norm1.bias", 32)
            t2(f"{p}.norm2.weight", 32); t2(f"{p}.norm2.bias", 32)
        ckpt_path = tmp_path / "model.ckpt"
        torch.save({"weight": ckpt_sd}, ckpt_path)

        pth_sd = {k: torch.from_numpy(np.asarray(v))
                  for k, v in TestSoVITSConversion()._torch_sd().items()}
        pth_sd["ssl_proj.weight"] = torch.randn(24, 24, 2, generator=g) * 0.1
        pth_sd["ssl_proj.bias"] = torch.randn(24, generator=g) * 0.1
        pth_path = tmp_path / "model.pth"
        torch.save({"weight": pth_sd}, pth_path)

        out_dir = tmp_path / "converted"
        tc.convert_character(ckpt_path, pth_path, out_dir, language="ja",
                             version="v2", t2s_cfg=tcfg, sovits_cfg=vcfg)
        assert (out_dir / "t2s.safetensors").exists()
        assert (out_dir / "config.json").exists()

        genie.load_character("converted_tiny", out_dir, "ja")
        model = model_manager.get("converted_tiny")
        assert model is not None
        assert model.t2s_cfg.num_layers == 2  # config round-tripped
        genie.unload_character("converted_tiny")

    def test_failure_cleans_output(self, tmp_path):
        bad_ckpt = tmp_path / "bad.ckpt"
        torch.save({"weight": {}}, bad_ckpt)
        bad_pth = tmp_path / "bad.pth"
        torch.save({"weight": {}}, bad_pth)
        out = tmp_path / "out"
        with pytest.raises(KeyError):
            tc.convert_character(bad_ckpt, bad_pth, out, version="v2")
        assert not out.exists()  # reference cleanup-on-error behavior
