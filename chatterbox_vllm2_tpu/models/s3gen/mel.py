"""Mel-spectrogram extraction (Matcha-TTS parameters).

Reference `utils/mel.py:33-81`: n_fft 1920, hop 480, win 1920, 80 mels,
fmin 0, fmax 8000, center=False with (n_fft-hop)/2 reflect pre-padding,
log-clamp normalisation.  The reference delegates the filterbank to
`librosa.filters.mel` (Slaney scale + Slaney norm); that construction is
reimplemented in numpy here since librosa isn't available — and shouldn't be
a runtime dep of an inference server anyway.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') equivalent: [n_mels, F]."""
    F = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, F)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _hann(win: int) -> np.ndarray:
    """torch.hann_window (periodic)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win) / win)).astype(np.float32)


class MelExtractor:
    """Precomputes DFT/mel matrices once; the hot path is two matmuls."""

    def __init__(self, sr=24000, n_fft=1920, n_mels=80, hop=480, win=1920,
                 fmin=0.0, fmax=8000.0):
        self.n_fft, self.hop, self.win = n_fft, hop, win
        F = n_fft // 2 + 1
        n = np.arange(n_fft)
        f = np.arange(F)[:, None]
        ang = 2.0 * np.pi * f * n[None, :] / n_fft
        w = _hann(win)
        # fold the window into the DFT matrices.  Kept as HOST arrays: if this
        # op is ever closed over by a jit, device-resident constants force a
        # device->host download at lowering time (slow through the tunnel);
        # numpy embeds by value instead.
        self.cos_m = (np.cos(ang) * w[None, :]).astype(np.float32)
        self.sin_m = (np.sin(ang) * w[None, :]).astype(np.float32)
        self.mel_m = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        """y: [B, T] in [-1, 1] -> log-mel [B, n_mels, n_frames],
        n_frames = T // hop (reference pads (n_fft-hop)/2 reflect, center=False)."""
        pad = (self.n_fft - self.hop) // 2
        yp = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = (yp.shape[1] - self.n_fft) // self.hop + 1
        idx = jnp.arange(n_frames)[:, None] * self.hop + jnp.arange(self.n_fft)[None, :]
        frames = yp[:, idx]                                   # [B, n_frames, n_fft]
        real = jnp.einsum("bnf,gf->bng", frames, self.cos_m)
        imag = jnp.einsum("bnf,gf->bng", frames, self.sin_m)
        mag = jnp.sqrt(real * real + imag * imag + 1e-9)
        mel = jnp.einsum("bng,mg->bmn", mag, self.mel_m)
        return jnp.log(jnp.maximum(mel, 1e-5))
