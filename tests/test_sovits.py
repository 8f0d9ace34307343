"""SoVITS synthesizer tests: shapes, masking, determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genie_tts_tpu.config import SoVITSConfig
from genie_tts_tpu.models import sovits
from genie_tts_tpu.ops.audio import linear_spectrogram

pytestmark = pytest.mark.slow  # module fixture compiles full model graphs (minutes on CPU)

# Tiny config: hop = 2*2*2 = 8, frames upsample 2x from codes
CFG = SoVITSConfig(
    spec_channels=33, inter_channels=16, hidden_channels=16, filter_channels=32,
    n_heads=2, n_layers=2, kernel_size=3, mrte_channels=16, ssl_dim=24,
    vq_codes=20, vq_dim=24, gin_channels=16,
    flow_layers=2, wn_layers=2, wn_kernel=5,
    upsample_rates=(2, 2, 2), upsample_kernels=(4, 4, 4), upsample_initial=32,
    resblock_kernels=(3,), resblock_dilations=((1, 3),),
    n_fft=64, hop_length=8, win_length=64,
)
HOP = 8


@pytest.fixture(scope="module")
def params():
    return sovits.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def test_quantizer_decode_upsamples(params):
    codes = jnp.array([[1, 2, 3]], jnp.int32)
    q = sovits.quantizer_decode(params, codes)
    assert q.shape == (1, 6, CFG.vq_dim)
    np.testing.assert_array_equal(np.asarray(q[0, 0]), np.asarray(q[0, 1]))


def test_synthesize_shape(params):
    B, Ts, Tx = 2, 10, 6
    audio = sovits.synthesize(
        params, CFG, jax.random.PRNGKey(1),
        jnp.zeros((B, Ts), jnp.int32), jnp.array([10, 7]),
        jnp.zeros((B, Tx), jnp.int32), jnp.array([6, 4]),
        jnp.zeros((B, CFG.gin_channels, 1)), jnp.zeros((B, CFG.mrte_channels, 1)),
    )
    assert audio.shape == (B, 2 * Ts * HOP)
    assert np.isfinite(np.asarray(audio)).all()


def test_synthesize_padding_invariance(params):
    """Valid-region audio must not depend on pad length of codes/text."""
    codes = jnp.array([[3, 1, 4, 1, 5]], jnp.int32)
    text = jnp.array([[10, 20, 30]], jnp.int32)
    ge = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.gin_channels, 1))
    gm = jax.random.normal(jax.random.PRNGKey(3), (1, CFG.mrte_channels, 1))

    def run(pad_c, pad_t):
        # noise_scale=0 for determinism across different noise shapes
        return np.asarray(sovits.synthesize(
            params, CFG, jax.random.PRNGKey(4),
            jnp.pad(codes, ((0, 0), (0, pad_c))), jnp.array([5]),
            jnp.pad(text, ((0, 0), (0, pad_t))), jnp.array([3]),
            ge, gm, noise_scale=0.0,
        ))[0, : 2 * 5 * HOP]

    a = run(0, 0)
    b = run(4, 3)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_reference_embedding(params):
    spec = jax.random.normal(jax.random.PRNGKey(5), (1, 12, CFG.spec_channels))
    ge = sovits.reference_embedding(params, CFG, spec, jnp.array([12]))
    assert ge.shape == (1, CFG.gin_channels, 1)
    # masked pooling: embedding from a longer-padded spec must match
    spec_pad = jnp.pad(spec, ((0, 0), (0, 5), (0, 0)))
    ge2 = sovits.reference_embedding(params, CFG, spec_pad, jnp.array([12]))
    np.testing.assert_allclose(np.asarray(ge), np.asarray(ge2), rtol=2e-3, atol=2e-4)


def test_linear_spectrogram_shape():
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((1, 800)), jnp.float32)
    spec = linear_spectrogram(audio, n_fft=64, hop=8, win_length=64)
    assert spec.shape == (1, 800 // 8, 33)
    assert np.isfinite(np.asarray(spec)).all()
    assert (np.asarray(spec) >= 0).all()


def test_flow_reverse_is_inverse_of_forward(params):
    """flow_reverse must invert the (coupling, flip) forward pass."""
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8, CFG.inter_channels))
    mask = jnp.ones((1, 8, 1))
    g = jax.random.normal(jax.random.PRNGKey(7), (1, CFG.gin_channels, 1))
    half = CFG.inter_channels // 2

    # forward direction (as in training): coupling then flip, per layer
    def fwd_coupling(x, lp):
        x0, x1 = x[..., :half], x[..., half:]
        h = sovits.conv1d(lp["pre"], x0) * mask
        h = sovits.wavenet(lp["enc"], h, mask, g, CFG.wn_layers,
                           CFG.hidden_channels, CFG.wn_kernel)
        m = sovits.conv1d(lp["post"], h) * mask
        x1 = x1 + m
        return jnp.flip(jnp.concatenate([x0, x1], axis=-1), axis=-1), None

    y, _ = jax.lax.scan(fwd_coupling, x, params["flow"])
    x_rec = sovits.flow_reverse(params["flow"], y, mask, g, CFG)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_rec), rtol=1e-4, atol=1e-5)
