"""Sampling-stack parity: nucleus/top-k semantics vs the GPT-SoVITS rules."""
import jax.numpy as jnp
import numpy as np

from genie_tts_tpu.ops.sampling import top_k_top_p_filter


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
