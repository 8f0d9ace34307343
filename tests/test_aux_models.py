"""HuBERT / RoBERTa / prompt-encoder model tests (tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import HubertConfig, RobertaConfig, SoVITSConfig
from genie_tts_tpu.models import hubert, prompt_encoder, roberta

HCFG = HubertConfig(
    conv_dims=(8,) * 7, embed_dim=16, num_layers=2, num_heads=2, ffn_dim=32,
    conv_pos_kernel=8, conv_pos_groups=2,
)
RCFG = RobertaConfig(
    vocab_size=100, embed_dim=16, num_layers=4, num_heads=2, ffn_dim=32,
    max_position=64,
)
VCFG = SoVITSConfig(spec_channels=33, sv_dim=64)


@pytest.mark.slow
class TestHubert:
    def test_output_shape(self):
        params = hubert.init_params(jax.random.PRNGKey(0), HCFG, jnp.float32)
        audio = jnp.asarray(np.random.default_rng(0).standard_normal(3200), jnp.float32)
        out = hubert.apply(params, audio[None], HCFG)
        # stride 5*2^6 = 320 -> 3200 samples / 320 = 10 frames (minus rf edge)
        assert out.shape[0] == 1 and out.shape[2] == HCFG.embed_dim
        assert 8 <= out.shape[1] <= 10
        assert np.isfinite(np.asarray(out)).all()


class TestRoberta:
    def test_phone_features_repeat(self):
        params = roberta.init_params(jax.random.PRNGKey(0), RCFG, jnp.float32)
        # 4 content tokens + CLS/SEP
        ids = jnp.asarray([[2, 10, 11, 12, 13, 3]], jnp.int32)
        mask = jnp.ones_like(ids)
        repeats = jnp.asarray([2, 1, 3, 2], jnp.int32)
        out = roberta.phone_features(params, ids, mask, repeats, RCFG, max_phones=12)
        out = np.asarray(out)
        assert out.shape == (12, RCFG.embed_dim)
        # rows 0-1 repeat char 0; rows 3-5 repeat char 2
        np.testing.assert_array_equal(out[0], out[1])
        np.testing.assert_array_equal(out[3], out[4])
        np.testing.assert_array_equal(out[4], out[5])
        assert not np.allclose(out[1], out[2])
        # beyond sum(repeats)=8: zeros
        assert np.all(out[8:] == 0)

    def test_hidden_states_count(self):
        params = roberta.init_params(jax.random.PRNGKey(0), RCFG, jnp.float32)
        ids = jnp.zeros((1, 5), jnp.int32)
        states = roberta.hidden_states(params, ids, jnp.ones_like(ids), RCFG)
        assert states.shape[0] == RCFG.num_layers + 1


class TestPromptEncoder:
    def test_shapes(self):
        params = prompt_encoder.init_params(jax.random.PRNGKey(0), VCFG,
                                            jnp.float32, gin=24)
        spec = jnp.asarray(np.random.default_rng(0).standard_normal((1, 10, 33)),
                           jnp.float32)
        sv = jnp.zeros((1, VCFG.sv_dim))
        ge, ge_adv = prompt_encoder.apply(params, spec, jnp.array([10]), sv)
        assert ge.shape == (1, 24, 1)
        assert ge_adv.shape == (1, 512, 1)
        assert np.isfinite(np.asarray(ge)).all()

    def test_convert_from_torch_schema(self):
        torch = pytest.importorskip("torch")
        g = torch.Generator().manual_seed(0)
        sd = {}
        def lin(k, i, o):
            sd[f"{k}.weight"] = torch.randn(o, i, generator=g).numpy()
            sd[f"{k}.bias"] = torch.randn(o, generator=g).numpy()
        lin("ref_enc.spectral.0.fc", 33, 128)
        lin("ref_enc.spectral.3.fc", 128, 128)
        for i in range(2):
            sd[f"ref_enc.temporal.{i}.conv1.conv.weight"] = torch.randn(256, 128, 5, generator=g).numpy()
            sd[f"ref_enc.temporal.{i}.conv1.conv.bias"] = torch.randn(256, generator=g).numpy()
        for n in ("w_qs", "w_ks", "w_vs", "fc"):
            lin(f"ref_enc.slf_attn.{n}", 128, 128)
        lin("ref_enc.fc.fc", 128, 24)
        lin("sv_emb", 64, 24)
        lin("ge_to512", 24, 512)
        sd["prelu.weight"] = torch.randn(24, generator=g).numpy()

        params = prompt_encoder.convert_from_torch(sd)
        params = jax.tree.map(jnp.asarray, params)
        spec = jnp.zeros((1, 6, 33))
        ge, ge_adv = prompt_encoder.apply(params, spec, jnp.array([6]),
                                          jnp.zeros((1, 64)))
        assert ge.shape == (1, 24, 1) and ge_adv.shape == (1, 512, 1)
