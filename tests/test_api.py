"""Public-API end-to-end tests on tiny checkpoints: save -> load_character
-> set_reference_audio -> tts -> wav file out, plus the HTTP server."""
import dataclasses
import json
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genie_tts_tpu as genie
from genie_tts_tpu import api
from genie_tts_tpu.config import HubertConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.convert.io import save_character_config, save_params
from genie_tts_tpu.models import hubert as hubert_model
from genie_tts_tpu.models import sovits, t2s
from genie_tts_tpu.runtime.model_manager import check_model_dir, model_manager
from genie_tts_tpu.utils.wavio import read_wav, write_wav

pytestmark = pytest.mark.slow  # module fixture compiles full model graphs (minutes on CPU)

TCFG = T2SConfig(
    phoneme_vocab=732, semantic_vocab=33, embed_dim=32, num_layers=2,
    num_heads=4, ffn_dim=64, bert_dim=1024, ssl_dim=24, eos_id=32,
    max_decode_steps=12,
)
VCFG = SoVITSConfig(
    spec_channels=33, inter_channels=16, hidden_channels=16, filter_channels=32,
    n_heads=2, n_layers=2, kernel_size=3, mrte_channels=16, ssl_dim=24,
    vq_codes=32, vq_dim=24, gin_channels=16,
    flow_layers=2, wn_layers=2, wn_kernel=5,
    upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4), upsample_initial=32,
    resblock_kernels=(3,), resblock_dilations=((1, 3),),
    n_fft=64, hop_length=8, win_length=64,
)
HCFG = HubertConfig(
    conv_dims=(8,) * 7, embed_dim=24, num_layers=1, num_heads=2, ffn_dim=32,
    conv_pos_kernel=8, conv_pos_groups=2,
)


@pytest.fixture(scope="module")
def char_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chara")
    save_params(t2s.init_params(jax.random.PRNGKey(0), TCFG, jnp.float32),
                d / "t2s.safetensors")
    save_params(sovits.init_params(jax.random.PRNGKey(1), VCFG, jnp.float32),
                d / "vits.safetensors")
    save_character_config(
        d / "config.json", version="v2", language="Japanese",
        extra={"t2s": dataclasses.asdict(TCFG),
               "sovits": dataclasses.asdict(VCFG)})
    return d


@pytest.fixture(scope="module")
def ref_wav(tmp_path_factory):
    d = tmp_path_factory.mktemp("refs")
    rng = np.random.default_rng(0)
    path = d / "ref.wav"
    write_wav(path, rng.standard_normal(32000 * 4).astype(np.float32) * 0.05, 32000)
    return path


@pytest.fixture(scope="module", autouse=True)
def tiny_hubert():
    model_manager.set_hubert(
        hubert_model.init_params(jax.random.PRNGKey(2), HCFG, jnp.float32), HCFG)
    api._hubert_jit = None
    yield
    api._hubert_jit = None


class TestModelDir:
    def test_check_missing(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="does not exist"):
            check_model_dir(tmp_path / "nope")
        (tmp_path / "t2s.safetensors").touch()
        with pytest.raises(FileNotFoundError, match="Missing files"):
            check_model_dir(tmp_path)


class TestPublicAPI:
    def test_load_and_tts_to_wav(self, char_dir, ref_wav, tmp_path):
        genie.load_character("tiny", char_dir, "ja")
        genie.set_reference_audio("tiny", ref_wav, "こんにちは", "ja")
        out = tmp_path / "out.wav"
        genie.tts("tiny", "こんにちは。げんきですか。", save_path=out)
        genie.wait_for_playback_done()
        audio, sr = read_wav(out)
        assert sr == 32000
        assert len(audio) > 0
        assert np.isfinite(audio).all()

    def test_tts_async_chunks(self, char_dir, ref_wav):
        import asyncio

        genie.load_character("tiny", char_dir, "ja")
        genie.set_reference_audio("tiny", ref_wav, "こんにちは", "ja")

        async def collect():
            chunks = []
            async for c in genie.tts_async("tiny", "こんにちは。はい。",
                                           split_sentence=True):
                chunks.append(c)
            return chunks

        chunks = asyncio.run(collect())
        assert len(chunks) >= 1
        assert all(isinstance(c, bytes) and len(c) % 2 == 0 for c in chunks)

    def test_unload_and_reload(self, char_dir):
        genie.load_character("tiny2", char_dir, "ja")
        assert model_manager.get("tiny2") is not None
        genie.unload_character("tiny2")
        assert model_manager.get("tiny2") is None

    def test_lru_self_heal(self, char_dir):
        genie.load_character("heal", char_dir, "ja")
        model_manager._cache.pop("heal")  # simulate eviction
        assert model_manager.get("heal") is not None  # auto-reload

    def test_stop_noop(self):
        genie.stop()  # must not raise

    def test_unknown_language_rejected(self, char_dir):
        with pytest.raises(ValueError):
            genie.load_character("bad", char_dir, "klingon")


@pytest.fixture(scope="module")
def server():
    from genie_tts_tpu.server.http import start_server, stop_server

    srv = start_server(host="127.0.0.1", port=18321, block=False)
    time.sleep(0.2)
    yield srv
    stop_server()


class TestServer:
    def _post(self, path, payload, timeout=240):
        req = urllib.request.Request(
            f"http://127.0.0.1:18321{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=timeout)

    def test_endpoints(self, server, char_dir, ref_wav):
        r = self._post("/load_character", {
            "character_name": "srv", "model_dir": str(char_dir),
            "language": "ja"})
        assert r.status == 200
        r = self._post("/set_reference_audio", {
            "character_name": "srv", "audio_path": str(ref_wav),
            "audio_text": "こんにちは", "language": "ja"})
        assert r.status == 200
        r = self._post("/tts", {"character_name": "srv",
                                "text": "こんにちは。", "split_sentence": True})
        assert r.status == 200
        body = r.read()
        assert len(body) > 0 and len(body) % 2 == 0  # PCM16 payload
        r = self._post("/stop", {})
        assert r.status == 200

    def test_tts_without_reference_is_500(self, server, char_dir):
        self._post("/load_character", {
            "character_name": "srv2", "model_dir": str(char_dir),
            "language": "ja"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post("/tts", {"character_name": "srv2", "text": "やあ"})
        assert ei.value.code == 500

    def test_unknown_endpoint_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post("/nope", {})
        assert ei.value.code == 404


class TestWebUI:
    def test_index_and_presets(self, tmp_path, monkeypatch):
        from genie_tts_tpu.server import webui
        monkeypatch.setattr(webui, "PRESETS_PATH", tmp_path / "p.json")
        assert webui.load_presets() == {}
        webui.save_preset("a", {"character_name": "x"})
        assert webui.load_presets()["a"]["character_name"] == "x"
        webui.delete_preset("a")
        assert webui.load_presets() == {}
        assert "<html" in webui.INDEX_HTML

    def test_server_serves_index(self, server):
        import urllib.request
        r = urllib.request.urlopen("http://127.0.0.1:18321/", timeout=10)
        assert r.status == 200
        assert b"genie-tts-tpu" in r.read()


class TestConcurrentServer:
    def test_two_simultaneous_tts(self, server, char_dir, ref_wav):
        import threading
        self._post_helper_results = {}

        def post(path, payload, timeout=240):
            req = urllib.request.Request(
                f"http://127.0.0.1:18321{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            return urllib.request.urlopen(req, timeout=timeout)

        post("/load_character", {"character_name": "cc", "model_dir": str(char_dir),
                                 "language": "ja"})
        post("/set_reference_audio", {"character_name": "cc",
                                      "audio_path": str(ref_wav),
                                      "audio_text": "こんにちは", "language": "ja"})
        results = {}

        def worker(i):
            r = post("/tts", {"character_name": "cc",
                              "text": f"これは{i}ばんめのテスト。"})
            results[i] = (r.status, len(r.read()))

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(results) == 2
        for status, n in results.values():
            assert status == 200 and n > 0 and n % 2 == 0
