"""Audio I/O utilities: wav read/write, resampling, silence trim.

The reference leans on librosa/torchaudio for these (`tts.py:264-265`,
`api_server.py:282-314`); here they are numpy/scipy (no heavyweight audio
deps in the serving path).  Container encoding beyond wav/pcm shells out to
ffmpeg when present (reference uses torchaudio backends the same way).
"""

from __future__ import annotations

import io
import shutil
import struct
import subprocess
import wave

import numpy as np
from scipy.signal import resample_poly


def read_wav(path_or_bytes) -> tuple[np.ndarray, int]:
    """Read a PCM wav file -> (float32 mono [-1, 1], sample_rate)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        f = wave.open(io.BytesIO(bytes(path_or_bytes)), "rb")
    else:
        f = wave.open(str(path_or_bytes), "rb")
    with f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        ch = f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported wav sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def write_wav(wav: np.ndarray, sr: int) -> bytes:
    """float32 [-1, 1] -> 16-bit PCM wav bytes."""
    pcm = (np.clip(wav, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return wav
    from math import gcd

    g = gcd(orig_sr, target_sr)
    return resample_poly(wav, target_sr // g, orig_sr // g).astype(np.float32)


def trim_silence(wav: np.ndarray, top_db: float = 20.0,
                 frame: int = 2048, hop: int = 512) -> np.ndarray:
    """librosa.effects.trim equivalent: cut leading/trailing frames more than
    top_db below the peak RMS (reference `voice_encoder.py:267`)."""
    if len(wav) < frame:
        return wav
    n_frames = 1 + (len(wav) - frame) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt(np.mean(wav[idx] ** 2, axis=1))
    ref = rms.max()
    if ref <= 0:
        return wav
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
    keep = np.where(db > -top_db)[0]
    if len(keep) == 0:
        return wav
    start = keep[0] * hop
    end = min(len(wav), keep[-1] * hop + frame)
    return wav[start:end]


def time_stretch(wav: np.ndarray, sr: int, speed: float) -> np.ndarray:
    """WSOLA time stretch: change duration by 1/speed without changing pitch.

    Implements the OpenAI-compat `speed` parameter natively (numpy) — the
    reference accepts `speed` but silently ignores it (reference
    `api_server.py:41`); ffmpeg's `atempo` is the same WSOLA family.
    speed > 1 shortens (faster speech), < 1 lengthens.  Bounded [0.25, 4].
    """
    speed = float(np.clip(speed, 0.25, 4.0))
    if abs(speed - 1.0) < 1e-3 or len(wav) == 0:
        return wav
    n = int(0.030 * sr)                      # 30 ms analysis frame
    n -= n % 2
    hop_out = n // 2                         # 50% overlap-add
    tol = int(0.0075 * sr)                   # +-7.5 ms WSOLA search
    hop_an = hop_out * speed
    if len(wav) < n + 2 * tol + int(hop_an) + hop_out:
        return wav                           # too short to stretch cleanly
    win = np.hanning(n).astype(np.float32)

    out_len = int(len(wav) / speed)
    n_frames = max((out_len - n) // hop_out + 1, 1)
    out = np.zeros(n_frames * hop_out + n, np.float32)
    norm = np.zeros_like(out)

    last = len(wav) - n                      # last valid analysis position
    prev = 0                                 # chosen analysis pos of frame k-1
    for k in range(n_frames):
        p = min(max(int(round(k * hop_an)), 0), last)
        if k == 0:
            pos = 0
        else:
            # natural continuation of the previous frame
            ref = wav[min(prev + hop_out, last):][:n]
            lo = max(p - tol, 0)
            hi = min(p + tol, last)
            if hi <= lo or len(ref) < n:
                pos = p
            else:
                # cross-correlate candidates with the continuation segment
                seg = wav[lo: hi + n]
                c = np.correlate(seg, ref, mode="valid")
                pos = min(lo + int(np.argmax(c)), last)
        out[k * hop_out: k * hop_out + n] += wav[pos: pos + n] * win
        norm[k * hop_out: k * hop_out + n] += win
        prev = pos
    out /= np.maximum(norm, 1e-6)
    return out[:out_len].astype(np.float32)


_FFMPEG = shutil.which("ffmpeg")

FORMAT_CONTENT_TYPES = {
    "mp3": "audio/mpeg",
    "wav": "audio/wav",
    "flac": "audio/flac",
    "opus": "audio/opus",
    "aac": "audio/aac",
    "pcm": "audio/pcm",
}


def encode_audio(wav: np.ndarray, sr: int, fmt: str) -> tuple[bytes, str]:
    """Encode to the requested container; wav/pcm native, the rest via
    ffmpeg with graceful fallback to wav (reference `api_server.py:282-314`)."""
    fmt = fmt.lower()
    if fmt == "pcm":
        return (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes(), "audio/pcm"
    if fmt == "wav" or _FFMPEG is None:
        if fmt not in ("wav", "pcm") and _FFMPEG is None:
            fmt = "wav"
        return write_wav(wav, sr), FORMAT_CONTENT_TYPES["wav"]

    codec = {"mp3": ["-f", "mp3"], "flac": ["-f", "flac"],
             "opus": ["-c:a", "libopus", "-f", "ogg"],
             "aac": ["-c:a", "aac", "-f", "adts"]}.get(fmt)
    if codec is None:
        return write_wav(wav, sr), FORMAT_CONTENT_TYPES["wav"]
    try:
        proc = subprocess.run(
            [_FFMPEG, "-loglevel", "error", "-f", "wav", "-i", "pipe:0",
             *codec, "pipe:1"],
            input=write_wav(wav, sr), capture_output=True, timeout=60, check=True,
        )
        return proc.stdout, FORMAT_CONTENT_TYPES.get(fmt, "application/octet-stream")
    except Exception:
        return write_wav(wav, sr), FORMAT_CONTENT_TYPES["wav"]
