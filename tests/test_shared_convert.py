"""Shared-model converters validated against real transformers modules."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from genie_tts_tpu.config import HubertConfig, RobertaConfig  # noqa: E402
from genie_tts_tpu.convert.shared_models import convert_hubert, convert_roberta  # noqa: E402
from genie_tts_tpu.models import hubert as hubert_jax  # noqa: E402
from genie_tts_tpu.models import roberta as roberta_jax  # noqa: E402


class TestHubertParity:
    def test_matches_transformers(self):
        from transformers import HubertConfig as HFConfig, HubertModel

        hf_cfg = HFConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, conv_dim=(8,) * 7,
            conv_kernel=(10, 3, 3, 3, 3, 2, 2), conv_stride=(5, 2, 2, 2, 2, 2, 2),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
            do_stable_layer_norm=False, feat_extract_norm="group",
            hidden_dropout=0.0, attention_dropout=0.0, layerdrop=0.0,
            feat_proj_dropout=0.0, activation_dropout=0.0,
        )
        model = HubertModel(hf_cfg).eval()
        audio = torch.randn(1, 3200)
        with torch.no_grad():
            ref = model(audio).last_hidden_state.numpy()

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        cfg = HubertConfig(conv_dims=(8,) * 7, embed_dim=32, num_layers=2,
                           num_heads=2, ffn_dim=64, conv_pos_kernel=16,
                           conv_pos_groups=2)
        params = jax.tree.map(jnp.asarray, convert_hubert(sd, cfg))
        out = np.asarray(hubert_jax.apply(params, jnp.asarray(audio.numpy()), cfg))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


class TestRobertaParity:
    def test_matches_transformers(self):
        from transformers import BertConfig, BertModel

        hf_cfg = BertConfig(
            vocab_size=100, hidden_size=32, num_hidden_layers=3,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        model = BertModel(hf_cfg, add_pooling_layer=False).eval()
        ids = torch.randint(0, 100, (1, 10))
        mask = torch.ones_like(ids)
        with torch.no_grad():
            ref = model(ids, attention_mask=mask,
                        output_hidden_states=True).hidden_states

        sd = {k: v.numpy() for k, v in model.state_dict().items()}
        cfg = RobertaConfig(vocab_size=100, embed_dim=32, num_layers=3,
                            num_heads=2, ffn_dim=64, max_position=64)
        params = jax.tree.map(jnp.asarray, convert_roberta(sd, cfg))
        states = np.asarray(roberta_jax.hidden_states(
            params, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()), cfg))
        assert states.shape[0] == len(ref)
        for i in (0, 1, 3):
            np.testing.assert_allclose(states[i], ref[i].numpy(),
                                       rtol=2e-3, atol=2e-3)
