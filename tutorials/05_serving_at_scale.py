"""Tutorial 5 — serving at scale: continuous batching + multi-chip dp.

The reference scales by running independent uvicorn workers
(`/root/reference/src/genie_tts/Server.py:164-165`). Here concurrent
requests micro-batch onto the chip, and the batch axis can shard across
a TPU mesh.

Run with tiny random weights (no downloads):
    python tutorials/05_serving_at_scale.py
"""
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.config import RuntimeConfig, SoVITSConfig, T2SConfig
from genie_tts_tpu.ops.sampling import SamplingConfig
from genie_tts_tpu.runtime.batcher import ContinuousBatcher
from genie_tts_tpu.runtime.engine import (
    TTSEngine, make_random_character, make_random_reference,
)

# tiny config so the tutorial runs in seconds on CPU
TCFG = T2SConfig(embed_dim=64, num_layers=2, num_heads=4, ffn_dim=128,
                 ssl_dim=24, semantic_vocab=33, eos_id=32, max_decode_steps=12)
VCFG = SoVITSConfig(
    spec_channels=33, inter_channels=16, hidden_channels=16,
    filter_channels=32, n_layers=2, mrte_channels=16, ssl_dim=24,
    vq_codes=32, vq_dim=24, gin_channels=16, flow_layers=2, wn_layers=2,
    upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4),
    upsample_initial=32, resblock_kernels=(3,), resblock_dilations=((1, 3),),
    n_fft=64, hop_length=8, win_length=64)


def main():
    engine = TTSEngine(RuntimeConfig())
    char = make_random_character(t2s_cfg=TCFG, sovits_cfg=VCFG,
                                 dtype=jnp.float32)
    ref = make_random_reference(char, engine, ref_seconds=0.2)

    # ---- 1. continuous batching: concurrent callers coalesce on-chip
    batcher = ContinuousBatcher(engine, max_batch=8, window_ms=50.0)
    rng = np.random.default_rng(0)

    def client(i, results):
        phones = rng.integers(1, TCFG.phoneme_vocab, 8).astype(np.int32)
        bert = np.zeros((8, TCFG.bert_dim), np.float32)
        results[i] = batcher.synthesize(char, ref, phones, bert,
                                        sampling=SamplingConfig(), timeout=300)

    results = [None] * 4
    threads = [threading.Thread(target=client, args=(i, results))
               for i in range(4)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(f"4 concurrent requests served in {time.perf_counter() - t0:.2f}s "
          f"(they ran as one batch)")
    batcher.stop()

    # ---- 2. in-flight slot batching (the server's default /tts path):
    # a persistent decode machine; requests JOIN between ~W-step segments
    # instead of waiting out a whole batch. Staggered arrivals show it off.
    from genie_tts_tpu.runtime.slot_batcher import SlotBatcher

    slot_engine = TTSEngine(RuntimeConfig(
        slot_batch=4, slot_steps=4, slot_ring=16,
        slot_phoneme_bucket=32, slot_prompt_bucket=16))
    slots = SlotBatcher(slot_engine, char)

    def slot_client(i, results):
        time.sleep(0.15 * i)  # staggered arrivals join the running batch
        phones = rng.integers(1, TCFG.phoneme_vocab, 6).astype(np.int32)
        bert = np.zeros((6, TCFG.bert_dim), np.float32)
        results[i] = slots.synthesize(ref, phones, bert, timeout=300,
                                      max_steps=12)

    results = [None] * 4
    threads = [threading.Thread(target=slot_client, args=(i, results))
               for i in range(4)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(f"4 staggered requests joined the slot machine in "
          f"{time.perf_counter() - t0:.2f}s (no window waits)")
    slots.stop()

    # ---- 3. data-parallel serving over a device mesh
    # On a v5e-8 the batch axis shards across 8 chips; on this host the
    # same code runs if enough (virtual) devices exist.
    import jax

    if len(jax.devices()) >= 2:
        from genie_tts_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=2)
        dp_engine = TTSEngine(RuntimeConfig(), mesh=mesh)
        dp_engine.replicate_character(char)
        items = [(ref, rng.integers(1, TCFG.phoneme_vocab, 8).astype(np.int32),
                  np.zeros((8, TCFG.bert_dim), np.float32)) for _ in range(4)]
        outs = dp_engine.synthesize_batch(char, items, seed=0, fixed_steps=8)
        print(f"dp=2 mesh served {len(outs)} utterances "
              f"({sum(len(a) for a in outs)} samples)")

    # ---- 4. tensor-parallel decode (Megatron shardings over tp)
    # shard_character places the T2S decoder matmuls over the mesh's tp
    # axis (QKV/FFN-in column-parallel, Out/FFN-out row-parallel); every
    # serving path then decodes tp-sharded — GSPMD inserts the
    # all-reduces. Combine axes for 2D serving (e.g. dp=4 x tp=2).
    # The HTTP server picks this up from GENIE_MESH="4x2".
    if len(jax.devices()) >= 4:
        import copy

        mesh = make_mesh(dp=2, tp=2)
        tp_engine = TTSEngine(RuntimeConfig(), mesh=mesh)
        char_tp = copy.copy(char)
        tp_engine.shard_character(char_tp)
        outs = tp_engine.synthesize_batch(char_tp, items, seed=0,
                                          fixed_steps=8)
        print(f"dp=2 x tp=2 mesh served {len(outs)} utterances "
              f"(decoder weights sharded: "
              f"{char_tp.t2s_params['layers']['qkv']['w'].sharding.spec})")
    else:
        print("need >= 4 devices for the dp=2 x tp=2 demo; run with "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8 to try "
              "it on a virtual CPU mesh")


if __name__ == "__main__":
    main()
