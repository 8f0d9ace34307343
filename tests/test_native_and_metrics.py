"""Native audio library + metrics subsystem tests."""
import numpy as np

from genie_tts_tpu.utils.metrics import Metrics
from genie_tts_tpu.utils.native import float_to_pcm16, get_lib, resample


class TestNativeAudio:
    def test_resample_halves_length(self):
        x = np.sin(2 * np.pi * 440 * np.arange(32000) / 32000).astype(np.float32)
        y = resample(x, 32000, 16000)
        assert abs(len(y) - 16000) <= 1

    def test_resample_preserves_tone(self):
        sr_in, sr_out, f0 = 32000, 16000, 1000
        x = np.sin(2 * np.pi * f0 * np.arange(sr_in) / sr_in).astype(np.float32)
        y = resample(x, sr_in, sr_out)
        spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
        peak = np.fft.rfftfreq(len(y), 1 / sr_out)[spec.argmax()]
        assert abs(peak - f0) < 10
        assert 0.9 < np.abs(y[2000:-2000]).max() < 1.1

    def test_resample_identity(self):
        x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
        np.testing.assert_array_equal(resample(x, 16000, 16000), x)

    def test_upsample(self):
        x = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
        y = resample(x, 16000, 32000)
        assert abs(len(y) - 32000) <= 2

    def test_pcm16(self):
        x = np.array([0.0, 0.5, -0.5, 2.0, -2.0], np.float32)
        b = float_to_pcm16(x)
        out = np.frombuffer(b, "<i2")
        assert out[0] == 0
        assert abs(int(out[1]) - 16383) <= 1
        assert out[3] == 32767 and out[4] == -32767  # clipped

    def test_native_lib_builds(self):
        # informational: fallback path is also valid, but the toolchain in
        # this image should build the library
        assert get_lib() is not None


class TestMetrics:
    def test_timer_and_snapshot(self):
        m = Metrics()
        with m.timer("stage"):
            pass
        m.incr("count", 3)
        m.observe("lat", 0.5)
        snap = m.snapshot()
        assert snap["counters"]["count"] == 3
        assert snap["timers"]["stage"]["count"] == 1
        assert snap["timers"]["lat"]["p50_ms"] == 500.0

    def test_reset(self):
        m = Metrics()
        m.incr("x")
        m.reset()
        assert m.snapshot()["counters"] == {}
