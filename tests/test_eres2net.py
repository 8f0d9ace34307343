"""ERes2NetV2 SV encoder + Kaldi fbank tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.models import eres2net, sv
from genie_tts_tpu.ops.audio import kaldi_fbank


class TestKaldiFbank:
    def test_shape(self):
        audio = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8000)),
                            jnp.float32)
        fb = kaldi_fbank(audio)
        # 8000 samples @16k: frames = 1 + (8000-400)//160 = 48
        assert fb.shape == (1, 48, 80)
        assert np.isfinite(np.asarray(fb)).all()

    def test_tone_concentrates_energy(self):
        t = np.arange(16000) / 16000
        audio = jnp.asarray(np.sin(2 * np.pi * 1000 * t)[None], jnp.float32)
        fb = np.asarray(kaldi_fbank(audio))[0].mean(axis=0)
        # peak mel bin should correspond to ~1 kHz (HTK mel bin ~30/80 at 16k)
        peak = int(fb.argmax())
        assert 20 <= peak <= 45


@pytest.mark.slow
class TestERes2NetV2:
    def test_embedding_shape(self):
        params = eres2net.init_params(jax.random.PRNGKey(0), jnp.float32)
        audio = np.random.default_rng(0).standard_normal(8000).astype(np.float32)
        fn = sv.make_sv_fn(params)
        emb = fn(audio)
        assert emb.shape == (sv.SV_EMB_DIM,)
        assert np.isfinite(emb).all()

    def test_time_invariance_of_dim(self):
        params = eres2net.init_params(jax.random.PRNGKey(0), jnp.float32)
        fn = sv.make_sv_fn(params)
        a = fn(np.zeros(8000, np.float32) + 0.01)
        b = fn(np.zeros(12800, np.float32) + 0.01)
        assert a.shape == b.shape == (20480,)
