"""Audio container formats + unreadable-text failure surfaces.

Reference reads every format via libsndfile (``Audio/Audio.py:24``);
here WAV/AIFF decode natively and FLAC/OGG give an actionable error when
soundfile is absent (VERDICT r1 item 7). Kanji without pyopenjtalk must
fail loudly, not drop characters (item 10).
"""
import struct

import numpy as np
import pytest

from genie_tts_tpu.utils.wavio import read_aiff, read_audio, read_wav, write_wav


def _write_aiff(path, samples: np.ndarray, sr: int, channels: int = 1,
                bits: int = 16):
    """Minimal AIFF writer for tests (big-endian PCM16)."""
    frames = len(samples) // channels
    pcm = (np.clip(samples, -1, 1) * 32767.0).astype(">i2").tobytes()
    # 80-bit extended float sample rate: normalize mantissa to the top bit
    m, e = sr, 16383 + 63
    while m < (1 << 63):
        m <<= 1
        e -= 1
    comm = struct.pack(">hIh", channels, frames, bits) + struct.pack(">HQ", e, m)
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = b"AIFF"
    for cid, chunk in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + struct.pack(">I", len(chunk)) + chunk
        if len(chunk) & 1:
            body += b"\0"
    path.write_bytes(b"FORM" + struct.pack(">I", len(body)) + body)


class TestAiff:
    def test_roundtrip_mono(self, tmp_path):
        sr = 32000
        x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr // 4) / sr)).astype(np.float32)
        p = tmp_path / "t.aiff"
        _write_aiff(p, x, sr)
        y, got_sr = read_aiff(p)
        assert got_sr == sr
        np.testing.assert_allclose(y, x, atol=1e-4)  # PCM16 quantization

    def test_stereo_downmix(self, tmp_path):
        sr = 16000
        left = np.full(100, 0.5, np.float32)
        right = np.full(100, -0.5, np.float32)
        inter = np.empty(200, np.float32)
        inter[0::2], inter[1::2] = left, right
        p = tmp_path / "s.aif"
        _write_aiff(p, inter, sr, channels=2)
        y, got_sr = read_aiff(p)
        assert got_sr == sr
        assert np.max(np.abs(y)) < 1e-4  # L+R cancel

    def test_dispatch(self, tmp_path):
        sr = 8000
        x = np.linspace(-0.9, 0.9, 64).astype(np.float32)
        wav, aiff = tmp_path / "a.wav", tmp_path / "a.aiff"
        write_wav(wav, x, sr)
        _write_aiff(aiff, x, sr)
        for p in (wav, aiff):
            y, got = read_audio(p)
            assert got == sr
            np.testing.assert_allclose(y, x, atol=1e-3)

    def test_not_aiff_raises(self, tmp_path):
        p = tmp_path / "x.aiff"
        p.write_bytes(b"garbage-not-a-form-file")
        with pytest.raises(ValueError, match="not an AIFF"):
            read_aiff(p)


class TestFlacGate:
    def test_flac_without_soundfile_actionable(self, tmp_path):
        try:
            import soundfile  # noqa: F401
            pytest.skip("soundfile installed; gate not exercised")
        except ImportError:
            pass
        p = tmp_path / "r.flac"
        p.write_bytes(b"fLaC\0\0\0\0")
        with pytest.raises(ValueError, match="soundfile"):
            read_audio(p)


class TestKanjiFailureSurface:
    def test_kana_fallback_reads_lexicon_kanji(self):
        """In-lexicon kanji now synthesize offline (ja_readings.json)."""
        from genie_tts_tpu.frontend import g2p_ja

        if g2p_ja.has_openjtalk():
            pytest.skip("pyopenjtalk present; fallback not used")
        ids = g2p_ja.japanese_to_phones("日本語のテスト")
        assert len(ids) > 5

    def test_kana_fallback_rejects_unknown_kanji(self):
        from genie_tts_tpu.frontend import g2p_ja

        if g2p_ja.has_openjtalk():
            pytest.skip("pyopenjtalk present; fallback not used")
        # 薔/鬱 are outside the bundled lexicon: must fail loudly, never drop.
        with pytest.raises(g2p_ja.UnreadableJapaneseError, match="pyopenjtalk"):
            g2p_ja.japanese_to_phones("薔薇と鬱のテスト")

    def test_kana_only_still_works(self):
        from genie_tts_tpu.frontend import g2p_ja

        ids = g2p_ja.japanese_to_phones("こんにちは、せかい。")
        assert len(ids) > 5

    def test_error_is_value_error(self):
        from genie_tts_tpu.frontend.g2p_ja import UnreadableJapaneseError

        assert issubclass(UnreadableJapaneseError, ValueError)
