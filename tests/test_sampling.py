"""Sampling-stack parity: nucleus/top-k semantics vs the GPT-SoVITS rules."""
import jax
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.ops.sampling import (
    SamplingConfig, rows_from_config, sample_token, sample_token_rows,
    top_k_top_p_filter)


def test_top_p_matches_reference_semantics():
    """GPT-SoVITS order: nucleus on the FULL distribution first (drop
    tokens whose inclusive cumulative prob exceeds top_p, keep argmax),
    then top-k — verified against a plain-numpy oracle."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 12)) * 2.0, jnp.float32)
    top_k, top_p = 5, 0.6
    got = np.asarray(top_k_top_p_filter(logits, top_k, top_p)) > -1e9

    ref_keep = np.ones((2, 12), bool)
    l = np.asarray(logits, np.float64)
    for b in range(2):
        order = np.argsort(-l[b])
        probs = np.exp(l[b][order] - l[b][order].max())
        probs /= probs.sum()
        cum = np.cumsum(probs)
        remove = cum > top_p
        remove[0] = False
        ref_keep[b][order[remove]] = False
        # then top-k over the remaining
        masked = np.where(ref_keep[b], l[b], -1e10)
        kth = np.sort(masked)[::-1][top_k - 1]
        ref_keep[b] &= masked >= kth
    np.testing.assert_array_equal(got, ref_keep)


def test_rows_match_scalar_sampler_uniform():
    """Per-row sampling (slot machine) must draw the SAME token as the
    scalar-config sampler when every row carries the same config."""
    rng = np.random.default_rng(1)
    B, V = 4, 40
    logits = jnp.asarray(rng.standard_normal((B, V)) * 3.0, jnp.float32)
    counts = jnp.asarray(rng.integers(0, 3, (B, V)), jnp.int32)
    noise = jnp.asarray(rng.gumbel(size=(B, V)), jnp.float32)
    forbid = jnp.zeros((V,), bool).at[V - 1].set(True)
    for cfg in (SamplingConfig(),
                SamplingConfig(top_k=3, top_p=0.8, temperature=0.7,
                               repetition_penalty=1.2),
                SamplingConfig(top_k=0, top_p=1.0, temperature=1.0,
                               repetition_penalty=1.0)):
        want = sample_token(None, logits, counts, cfg, forbid=forbid,
                            noise=noise)
        got = sample_token_rows(None, logits, counts,
                                rows_from_config(cfg, B), forbid=forbid,
                                noise=noise)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rows_mixed_configs_match_per_row_solo():
    """Rows with DIFFERENT configs each match their own solo draw."""
    rng = np.random.default_rng(2)
    V = 40
    cfgs = [SamplingConfig(),
            SamplingConfig(top_k=2, temperature=0.5),
            SamplingConfig(top_p=0.6, repetition_penalty=2.0),
            SamplingConfig(top_k=7, top_p=0.9, temperature=1.3,
                           repetition_penalty=1.05)]
    B = len(cfgs)
    logits = jnp.asarray(rng.standard_normal((B, V)) * 3.0, jnp.float32)
    counts = jnp.asarray(rng.integers(0, 3, (B, V)), jnp.int32)
    noise = jnp.asarray(rng.gumbel(size=(B, V)), jnp.float32)
    rows = jax.tree.map(lambda *xs: np.stack(xs),
                        *[rows_from_config(c, 1) for c in cfgs])
    rows = jax.tree.map(lambda a: a.reshape(B), rows)
    got = np.asarray(sample_token_rows(None, logits, counts, rows,
                                       noise=noise))
    for b, cfg in enumerate(cfgs):
        want = sample_token(None, logits[b:b + 1], counts[b:b + 1], cfg,
                            noise=noise[b:b + 1])
        assert got[b] == int(want[0]), f"row {b} ({cfg}) diverged"
