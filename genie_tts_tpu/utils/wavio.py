"""Pure-Python WAV read/write (role of soundfile/libsndfile in the
reference, ``/root/reference/src/genie_tts/Audio/Audio.py:24``).

Supports PCM16/24/32 and IEEE float32 RIFF WAVE, mono/stereo; reads to
float32 mono in [-1, 1]; writes PCM16 or float32.
"""
from __future__ import annotations

import struct
from pathlib import Path
from typing import Tuple, Union

import numpy as np


def read_wav(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Returns (mono float32 samples, sample_rate)."""
    raw = Path(path).read_bytes()
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_fmt, channels, sr, _, _, bits = fmt
    if audio_fmt == 0xFFFE and len(data) >= 0:  # WAVE_FORMAT_EXTENSIBLE
        audio_fmt = 1 if bits in (16, 24, 32) else 3

    if audio_fmt == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            b = np.frombuffer(data, np.uint8).reshape(-1, 3)
            x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
        elif bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth: {bits}")
    elif audio_fmt == 3:  # IEEE float
        x = np.frombuffer(data, "<f4" if bits == 32 else "<f8").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format code: {audio_fmt}")

    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(x), sr


def write_wav(path: Union[str, Path], audio: np.ndarray, sr: int,
              dtype: str = "int16") -> None:
    """Write mono float32 [-1,1] samples as PCM16 (default) or float32."""
    audio = np.asarray(audio, np.float32).reshape(-1)
    if dtype == "int16":
        payload = (np.clip(audio, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()
        audio_fmt, bits = 1, 16
    elif dtype == "float32":
        payload = audio.astype("<f4").tobytes()
        audio_fmt, bits = 3, 32
    else:
        raise ValueError(dtype)
    block = bits // 8
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, audio_fmt, 1, sr,
                                 sr * block, block, bits)
    hdr += b"data" + struct.pack("<I", len(payload))
    Path(path).write_bytes(hdr + payload)


def float_to_pcm16_bytes(audio: np.ndarray) -> bytes:
    """Streaming chunk conversion (reference:
    ``Core/TTSPlayer.py:51-53``)."""
    return (np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
            * 32767.0).astype("<i2").tobytes()
