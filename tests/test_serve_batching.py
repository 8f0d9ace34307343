"""Continuous batching in the serving path (BASELINE config[4]).

Concurrent /tts requests must micro-batch on the chip: the server routes
per-sentence synthesis through the global ContinuousBatcher by default
(GENIE_SERVE_BATCHING). Contrast: the reference serves strictly solo
(``/root/reference/src/genie_tts/Server.py:87-141``).
"""
import dataclasses
import json
import threading
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
from genie_tts_tpu.runtime.model_manager import model_manager
from genie_tts_tpu.utils.metrics import metrics
from genie_tts_tpu.utils.wavio import write_wav

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

PORT = 18455


@pytest.fixture(scope="module")
def char_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("chara_b")
    save_params(t2s.init_params(jax.random.PRNGKey(0), TCFG, jnp.float32),
                d / "t2s.safetensors")
    save_params(sovits.init_params(jax.random.PRNGKey(1), VCFG, jnp.float32),
                d / "vits.safetensors")
    save_character_config(
        d / "config.json", version="v2", language="Japanese",
        extra={"t2s": dataclasses.asdict(TCFG),
               "sovits": dataclasses.asdict(VCFG)})
    return d


@pytest.fixture(scope="module", autouse=True)
def setup(tmp_path_factory, char_dir):
    model_manager.set_hubert(
        hubert_model.init_params(jax.random.PRNGKey(2), HCFG, jnp.float32), HCFG)
    api._hubert_jit = None
    ref = tmp_path_factory.mktemp("refs_b") / "ref.wav"
    rng = np.random.default_rng(0)
    write_wav(ref, rng.standard_normal(32000 * 2).astype(np.float32) * 0.05, 32000)

    # widen the batching window so concurrent test clients always coalesce
    api._batcher = None
    object.__setattr__(api.engine.cfg, "serve_batching", True)
    object.__setattr__(api.engine.cfg, "batch_window_ms", 300.0)

    from genie_tts_tpu.server.http import start_server, stop_server

    srv = start_server(host="127.0.0.1", port=PORT, block=False)
    time.sleep(0.2)
    genie.load_character("batchy", str(char_dir), "Japanese")
    genie.set_reference_audio("batchy", str(ref), "こんにちは", "Japanese")
    yield
    stop_server()
    api._batcher = None


def _post(path, payload, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def _run_concurrent(n=4):
    results = [None] * n

    def worker(i):
        r = _post("/tts", {"character_name": "batchy",
                           "text": "こんにちは、せかい。",
                           "split_sentence": False})
        results[i] = r.read()

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(r is not None and len(r) > 0 for r in results)


def test_concurrent_tts_joins_slot_machine():
    """Default /tts path: requests join the in-flight slot batcher."""
    metrics.reset()
    # first request alone compiles the slot graphs
    r = _post("/tts", {"character_name": "batchy", "text": "こんにちは。",
                       "split_sentence": False})
    assert len(r.read()) > 0
    _run_concurrent(4)
    done = metrics.snapshot()["counters"].get("slot_utterances", 0)
    assert done >= 5, f"slot batcher served {done} requests"


def test_concurrent_tts_window_batches_when_slots_off():
    """GENIE_SLOT_SERVING=0 path: requests coalesce in the window batcher."""
    metrics.reset()
    object.__setattr__(api.engine.cfg, "serve_slots", False)
    try:
        r = _post("/tts", {"character_name": "batchy", "text": "こんにちは。",
                           "split_sentence": False})
        assert len(r.read()) > 0
        _run_concurrent(4)
        sizes = list(metrics._stats["batch_size"].samples)
        assert sizes, "batcher never ran"
        assert max(sizes) >= 2, f"requests never coalesced: {sizes}"
    finally:
        object.__setattr__(api.engine.cfg, "serve_slots", True)


def test_custom_sampling_joins_slot_machine():
    """Non-default sampling no longer falls to the window batcher:
    sampling parameters are per-row slot state (VERDICT r2 item 5)."""
    metrics.reset()
    r = _post("/tts", {"character_name": "batchy", "text": "やあ、どうも。",
                       "split_sentence": False, "top_k": 3,
                       "temperature": 0.7, "repetition_penalty": 1.1})
    assert len(r.read()) > 0
    done = metrics.snapshot()["counters"].get("slot_utterances", 0)
    assert done >= 1, "custom-sampling request bypassed the slot batcher"


def test_stream_flag_bypasses_batcher():
    r = _post("/tts", {"character_name": "batchy", "text": "やあ。",
                       "split_sentence": False, "stream": True})
    assert len(r.read()) > 0


def test_stream_joins_slot_machine_with_windows():
    """With the window-pump finisher enabled, streaming requests share
    the in-flight slot machine instead of spinning solo machines."""
    metrics.reset()
    object.__setattr__(api.engine.cfg, "slot_stream_finisher", True)
    # the cached batcher was built with windows off — rebuild
    with api._slot_batchers_lock:
        stale = api._slot_batchers.pop("batchy", None)
    if stale is not None:
        stale.stop()
    try:
        r = _post("/tts", {"character_name": "batchy", "text": "やあ。",
                           "split_sentence": False, "stream": True})
        assert len(r.read()) > 0
        done = metrics.snapshot()["counters"].get("slot_utterances", 0)
        assert done >= 1, "streaming request bypassed the slot machine"
    finally:
        object.__setattr__(api.engine.cfg, "slot_stream_finisher", False)
        with api._slot_batchers_lock:
            sb = api._slot_batchers.pop("batchy", None)
        if sb is not None:
            sb.stop()


def test_warmup_sweep_compiles():
    from genie_tts_tpu.runtime.engine import make_random_reference

    char = model_manager.get("batchy")
    ref = make_random_reference(char, api.engine, ref_seconds=0.2)
    cfg = api.engine.cfg
    # shrink the ladders: the sweep now also covers the slot + finisher
    # graphs, and XLA:CPU compiles serially — full ladders take minutes
    saved = {k: getattr(cfg, k) for k in
             ("phoneme_buckets", "frame_buckets", "batch_buckets",
              "slot_batch", "slot_steps", "slot_ring",
              "slot_phoneme_bucket", "slot_prompt_bucket")}
    try:
        for k, v in dict(phoneme_buckets=(32,), frame_buckets=(64,),
                         batch_buckets=(1, 2), slot_batch=2, slot_steps=4,
                         slot_ring=8, slot_phoneme_bucket=32,
                         slot_prompt_bucket=32).items():
            object.__setattr__(cfg, k, v)
        n = api.engine.warmup(char, ref, sweep=True)
    finally:
        for k, v in saved.items():
            object.__setattr__(cfg, k, v)
    # solo ladder + latent grid + vocode windows + slot graphs (prefill x2,
    # insert, release, segment) + finisher ladder
    assert n >= len(cfg.phoneme_buckets) + len(cfg.frame_buckets) + 5
