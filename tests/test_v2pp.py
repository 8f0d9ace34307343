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
