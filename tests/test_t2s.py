"""T2S model tests: prefill/decode semantics, masking, EOS handling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import T2SConfig
from genie_tts_tpu.models import t2s
from genie_tts_tpu.ops.sampling import SamplingConfig

# A tiny config so tests run in milliseconds.
CFG = T2SConfig(
    phoneme_vocab=40, semantic_vocab=33, embed_dim=32, num_layers=2,
    num_heads=4, ffn_dim=64, bert_dim=16, ssl_dim=8, eos_id=32,
    max_decode_steps=16,
)
SCFG = SamplingConfig(top_k=5, temperature=1.0, repetition_penalty=1.2)


@pytest.fixture(scope="module")
def params():
    return t2s.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def test_embed_text_shape(params):
    ids = jnp.zeros((2, 10), jnp.int32)
    bert = jnp.zeros((2, 10, CFG.bert_dim))
    x = t2s.embed_text(params, ids, bert)
    assert x.shape == (2, 10, CFG.embed_dim)


def test_extract_prompt_tokens(params):
    ssl = jnp.ones((1, 12, CFG.ssl_dim))
    toks = t2s.extract_prompt_tokens(params, ssl)
    assert toks.shape == (1, 6)  # stride-2 conv halves T
    assert toks.dtype == jnp.int32
    assert (toks >= 0).all() and (toks < 1024).all()


def test_extract_prompt_nearest_codebook(params):
    # feed codebook rows through an identity-free check: nearest code of a
    # vector equal to code j must be j when ssl_proj is bypassed
    cb = params["codebook"]
    x = cb[None, :5, :]  # [1, 5, 768-like]
    dots = jnp.einsum("btc,kc->btk", x, cb)
    c2 = jnp.sum(cb * cb, axis=-1)
    ids = jnp.argmin(c2[None, None, :] - 2 * dots, axis=-1)
    assert (ids[0] == jnp.arange(5)).all()


def test_prefill_shapes(params):
    B, Sx, Sp, S = 2, 8, 6, 32
    x = t2s.embed_text(params, jnp.zeros((B, Sx), jnp.int32), jnp.zeros((B, Sx, CFG.bert_dim)))
    logits, (kc, vc) = t2s.prefill(
        params, CFG, x, jnp.array([8, 5]), jnp.zeros((B, Sp), jnp.int32),
        jnp.array([6, 3]), cache_len=S,
    )
    assert logits.shape == (B, CFG.semantic_vocab)
    assert kc.shape == (CFG.num_layers, B, CFG.num_heads, S, CFG.embed_dim // CFG.num_heads)


def test_generate_runs_and_counts(params):
    B, Sx, Sp = 1, 8, 4
    x = t2s.embed_text(params, jnp.zeros((B, Sx), jnp.int32), jnp.zeros((B, Sx, CFG.bert_dim)))
    res = t2s.generate(
        params, CFG, SCFG, jax.random.PRNGKey(1), x, jnp.array([8]),
        jnp.zeros((B, Sp), jnp.int32), jnp.array([4]),
        max_steps=CFG.max_decode_steps, cache_len=Sx + Sp + CFG.max_decode_steps,
    )
    assert res.tokens.shape == (B, CFG.max_decode_steps)
    assert 1 <= int(res.counts[0]) <= CFG.max_decode_steps
    # all valid emitted tokens are in-vocab
    seq = np.asarray(res.tokens[0][: int(res.counts[0])])
    assert (seq >= 0).all() and (seq <= CFG.eos_id).all()


def test_first_token_never_eos(params):
    # first sampled token must never be EOS regardless of seed
    B, Sx, Sp = 1, 6, 4
    x = t2s.embed_text(params, jnp.zeros((B, Sx), jnp.int32), jnp.zeros((B, Sx, CFG.bert_dim)))
    for seed in range(5):
        res = t2s.generate(
            params, CFG, SCFG, jax.random.PRNGKey(seed), x, jnp.array([6]),
            jnp.zeros((B, Sp), jnp.int32), jnp.array([4]),
            max_steps=8, cache_len=Sx + Sp + 8,
        )
        assert int(res.tokens[0, 0]) != CFG.eos_id


def test_padding_invariance(params):
    """A row's result must not depend on pad width (mask correctness)."""
    ids = jnp.array([[3, 5, 7, 2]], jnp.int32)
    bert = jnp.zeros((1, 4, CFG.bert_dim))
    prompts = jnp.array([[1, 2, 3]], jnp.int32)

    def run(Sx, Sp):
        ids_p = jnp.pad(ids, ((0, 0), (0, Sx - 4)))
        bert_p = jnp.pad(bert, ((0, 0), (0, Sx - 4), (0, 0)))
        x = t2s.embed_text(params, ids_p, bert_p)
        logits, _ = t2s.prefill(
            params, CFG, x, jnp.array([4]), jnp.pad(prompts, ((0, 0), (0, Sp - 3))),
            jnp.array([3]), cache_len=Sx + Sp + 4,
        )
        return np.asarray(logits)

    a = run(4, 3)     # no padding
    b = run(10, 8)    # heavy padding
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_batch_row_independence(params):
    """Batched rows must produce the same logits as solo runs."""
    idsA = jnp.array([3, 5, 7, 2, 0, 0], jnp.int32)
    idsB = jnp.array([9, 1, 4, 6, 8, 2], jnp.int32)
    bert = jnp.zeros((6, CFG.bert_dim))
    prm = jnp.array([4, 5, 6, 0], jnp.int32)

    def run(ids_batch, x_len, p_len):
        B = ids_batch.shape[0]
        x = t2s.embed_text(params, ids_batch, jnp.stack([bert] * B))
        logits, _ = t2s.prefill(
            params, CFG, x, x_len, jnp.stack([prm] * B), p_len, cache_len=16,
        )
        return np.asarray(logits)

    both = run(jnp.stack([idsA, idsB]), jnp.array([4, 6]), jnp.array([3, 4]))
    solo_a = run(idsA[None], jnp.array([4]), jnp.array([3]))
    solo_b = run(idsB[None], jnp.array([6]), jnp.array([4]))
    np.testing.assert_allclose(both[0], solo_a[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(both[1], solo_b[0], rtol=2e-4, atol=2e-4)


def test_finalize_semantic_tokens():
    tokens = np.array([[5, 6, 7, 32, 0, 0]])
    counts = np.array([4])  # emitted: 5 6 7 EOS
    out = t2s.finalize_semantic_tokens(tokens, counts, eos_id=32)
    # EOS replaced by 0 and kept (reference y[0,-1]=0 quirk)
    np.testing.assert_array_equal(out[0], [5, 6, 7, 0])


def test_finalize_trims_interior_eos():
    tokens = np.array([[5, 33, 7, 32]])
    counts = np.array([4])
    out = t2s.finalize_semantic_tokens(tokens, counts, eos_id=32)
    # last zeroed, then interior >=eos trimmed
    np.testing.assert_array_equal(out[0], [5])


class TestDecodeLoopSemantics:
    """Stub-level decode-loop contract: max-step cap, EOS stop, batching."""

    def test_max_steps_cap(self, params):
        x = t2s.embed_text(params, jnp.zeros((1, 6), jnp.int32),
                           jnp.zeros((1, 6, CFG.bert_dim)))
        res = t2s.generate(params, CFG, SCFG, jax.random.PRNGKey(0), x,
                           jnp.array([6]), jnp.zeros((1, 4), jnp.int32),
                           jnp.array([4]), max_steps=5, cache_len=15)
        assert int(res.steps) <= 5
        assert int(res.counts[0]) <= 5

    def test_min_steps_blocks_eos(self, params):
        x = t2s.embed_text(params, jnp.zeros((1, 6), jnp.int32),
                           jnp.zeros((1, 6, CFG.bert_dim)))
        res = t2s.generate(params, CFG, SCFG, jax.random.PRNGKey(2), x,
                           jnp.array([6]), jnp.zeros((1, 4), jnp.int32),
                           jnp.array([4]), max_steps=10, cache_len=20,
                           min_steps=10)
        assert int(res.counts[0]) == 10
        # EOS is masked out of sampling below min_steps
        emitted = np.asarray(res.tokens[0][:10])
        assert (emitted[:-1] != CFG.eos_id).all()

    def test_per_row_done_freezes_tokens(self, params):
        # two rows; whichever stops first must keep EOS-frozen tail
        x = t2s.embed_text(params, jnp.zeros((2, 6), jnp.int32),
                           jnp.zeros((2, 6, CFG.bert_dim)))
        res = t2s.generate(params, CFG, SCFG, jax.random.PRNGKey(5), x,
                           jnp.array([6, 6]), jnp.zeros((2, 4), jnp.int32),
                           jnp.array([4, 4]), max_steps=16, cache_len=26)
        for b in range(2):
            cnt = int(res.counts[b])
            tail = np.asarray(res.tokens[b][cnt:int(res.steps)])
            if len(tail):  # frozen rows emit EOS markers after finishing
                assert (tail == CFG.eos_id).all() or (tail == 0).all()

    def test_finalize_device_matches_host(self, params):
        tokens = jnp.array([[5, 6, 33, 7, 32, 0]], jnp.int32)
        counts = jnp.array([5])
        codes, lens = t2s.finalize_tokens_device(tokens, counts, eos_id=32)
        host = t2s.finalize_semantic_tokens(np.asarray(tokens),
                                            np.asarray(counts), eos_id=32)
        np.testing.assert_array_equal(np.asarray(codes[0][: int(lens[0])]),
                                      host[0])


def test_buffered_batched_decode_matches_solo(params):
    """B>1 decode (write-buffered KV path) must match the solo loop.

    The batched path softmaxes over [merged cache | segment buffer | self]
    instead of one contiguous cache — the attended key set is identical, so
    greedy token streams must agree (fp32; summation-order drift can only
    flip exact ties).
    """
    greedy = SamplingConfig(top_k=1, temperature=1.0, repetition_penalty=1.0)
    idsA = jnp.array([3, 5, 7, 2, 11, 0], jnp.int32)
    idsB = jnp.array([9, 1, 4, 6, 8, 2], jnp.int32)
    prm = jnp.array([4, 5, 6, 0], jnp.int32)
    bert = jnp.zeros((6, CFG.bert_dim))
    steps = 40  # > 2 write-chunk segments so merges + buffer masks are hit

    def run(ids_rows, x_lens, p_lens, solo_buffered=True):
        ids_b = jnp.stack(ids_rows)
        B = ids_b.shape[0]
        x = t2s.embed_text(params, ids_b, jnp.stack([bert] * B))
        res = t2s.generate(
            params, CFG, greedy, jax.random.PRNGKey(0), x,
            jnp.array(x_lens), jnp.stack([prm] * B), jnp.array(p_lens),
            max_steps=steps, cache_len=6 + 4 + steps, min_steps=steps,
            solo_buffered=solo_buffered)
        return np.asarray(res.tokens), np.asarray(res.counts)

    tok_b, cnt_b = run([idsA, idsB], [4, 6], [3, 4])
    # solo_buffered=False pins the legacy per-step-update loop so the two
    # implementations stay compared (B=1 defaults to buffered now)
    tok_a, cnt_a = run([idsA], [4], [3], solo_buffered=False)
    tok_bb, cnt_bb = run([idsB], [6], [4], solo_buffered=False)
    assert int(cnt_b[0]) == int(cnt_a[0])
    assert int(cnt_b[1]) == int(cnt_bb[0])
    np.testing.assert_array_equal(tok_b[0, : cnt_b[0]], tok_a[0, : cnt_a[0]])
    np.testing.assert_array_equal(tok_b[1, : cnt_b[1]], tok_bb[0, : cnt_bb[0]])
    # and the new B=1 default (buffered) must match the legacy solo loop
    tok_a1, cnt_a1 = run([idsA], [4], [3])
    assert int(cnt_a1[0]) == int(cnt_a[0])
    np.testing.assert_array_equal(tok_a1[0, : cnt_a1[0]],
                                  tok_a[0, : cnt_a[0]])
