"""Jitted audio signal processing: STFT spectrogram, mel, resampling.

Replaces the reference's host-side DSP (librosa-style spectrogram baked
into its ONNX graphs; soxr resampling at
``/root/reference/src/genie_tts/Audio/ReferenceAudio.py:43``) with
XLA-compiled ops so reference-audio feature extraction runs on device.

The linear spectrogram matches torch.stft with ``center=False`` after
reflect padding of (n_fft - hop)/2 on both sides — the GPT-SoVITS
convention — so V2 reference embeddings are numerically comparable.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    n = jnp.arange(win_length, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)
    return w.astype(dtype)


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length"))
def linear_spectrogram(
    audio: jnp.ndarray, n_fft: int = 2048, hop: int = 640, win_length: int = 2048
) -> jnp.ndarray:
    """Magnitude STFT. audio [B, S] -> [B, T, n_fft//2+1] fp32.

    T = S // hop (reflect-padded, center=False framing).
    """
    audio = audio.astype(jnp.float32)
    pad = (n_fft - hop) // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]                                   # [B, T, n_fft]
    frames = frames * hann_window(win_length)[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.sqrt(jnp.abs(spec) ** 2 + 1e-6)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, n_fft//2+1] (librosa-compatible)."""
    fmax = fmax or sr / 2

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(bins)))
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-10)
        down = (hi - bins) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        enorm = 2.0 / (hi - lo)
        fb[i] *= enorm
    return fb.astype(np.float32)


def _hz_to_mel_htk(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (np.exp(np.asarray(m, np.float64) / 1127.0) - 1.0)


def kaldi_mel_banks(num_bins: int, n_fft: int, sr: int,
                    low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi-style (HTK-mel, un-normalized triangular) filterbank
    [num_bins, n_fft//2+1]."""
    if high_freq <= 0:
        high_freq = sr / 2 + high_freq
    mel_lo, mel_hi = _hz_to_mel_htk(low_freq), _hz_to_mel_htk(high_freq)
    centers = np.linspace(mel_lo, mel_hi, num_bins + 2)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    mel_of_bin = _hz_to_mel_htk(bins)
    fb = np.zeros((num_bins, len(bins)), np.float32)
    for i in range(num_bins):
        left, ctr, right = centers[i], centers[i + 1], centers[i + 2]
        up = (mel_of_bin - left) / (ctr - left)
        down = (right - mel_of_bin) / (right - ctr)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    return fb


@partial(jax.jit, static_argnames=("num_bins", "sr"))
def kaldi_fbank(audio: jnp.ndarray, num_bins: int = 80, sr: int = 16000) -> jnp.ndarray:
    """Kaldi-compatible log-mel fbank (dither 0): [B, S] -> [B, T, num_bins].

    25 ms povey-windowed frames, 10 ms shift, snip_edges, preemphasis 0.97,
    per-frame mean removal — the feature front end of the ERes2NetV2
    speaker-verification model (models/sv.py).
    """
    frame_len = int(0.025 * sr)
    frame_shift = int(0.010 * sr)
    n_fft = 1
    while n_fft < frame_len:
        n_fft *= 2
    audio = audio.astype(jnp.float32) * 32768.0  # kaldi int16 scaling
    B, S = audio.shape
    n_frames = 1 + (S - frame_len) // frame_shift
    idx = jnp.arange(n_frames)[:, None] * frame_shift + jnp.arange(frame_len)[None, :]
    frames = audio[:, idx]                               # [B, T, L]
    # remove DC offset, then preemphasis
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    pre = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * pre
    # povey window = hann ** 0.85
    n = jnp.arange(frame_len, dtype=jnp.float32)
    win = (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / (frame_len - 1))) ** 0.85
    frames = frames * win
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(kaldi_mel_banks(num_bins, n_fft, sr))
    mel = jnp.einsum("btf,mf->btm", power, fb)
    return jnp.log(jnp.maximum(mel, 1e-10))


def resample_poly(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Host-side polyphase resampling (scipy), e.g. 32k <-> 16k.

    Role of soxr in the reference (``Audio/ReferenceAudio.py:43``).
    """
    if sr_in == sr_out:
        return audio
    from math import gcd

    from scipy.signal import resample_poly as _rp

    g = gcd(sr_in, sr_out)
    return _rp(audio, sr_out // g, sr_in // g).astype(np.float32)
