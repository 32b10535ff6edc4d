"""RTVC speaker encoder for T3 conditioning (reference `models/voice_encoder/`).

16 kHz wav -> 40-mel (power-2 magnitudes, no dB) -> 3-layer LSTM(256) ->
linear -> ReLU -> L2 norm -> 256-d utterance embedding; full utterances are
windowed into 160-frame partials (overlap from rate=1.3) whose embeddings are
mean-pooled and re-normalised (reference `voice_encoder.py:119-244`).

The LSTM runs as a `lax.scan` over time with stacked layer weights — the
standard TPU mapping for small recurrent nets (the sequence is only 160
steps; the matmuls batch over partials).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...config import VoiceEncoderConfig
from ..s3gen.mel import mel_filterbank


# ---------------------------------------------------------------------------
# mel frontend (reference `melspec.py`: librosa stft center=True reflect,
# mel_power=2.0, mel_type="amp" -> no dB conversion)
# ---------------------------------------------------------------------------


class VEMelExtractor:
    def __init__(self, cfg: VoiceEncoderConfig = VoiceEncoderConfig()):
        self.cfg = cfg
        self.n_fft, self.hop, self.win = 400, 160, 400
        F = self.n_fft // 2 + 1
        n = np.arange(self.n_fft)
        f = np.arange(F)[:, None]
        ang = 2.0 * np.pi * f * n[None, :] / self.n_fft
        w = np.hanning(self.win + 1)[:-1].astype(np.float32)  # librosa hann (periodic)
        self.cos_m = jnp.asarray((np.cos(ang) * w[None, :]).astype(np.float32))
        self.sin_m = jnp.asarray((np.sin(ang) * w[None, :]).astype(np.float32))
        self.mel_m = jnp.asarray(mel_filterbank(cfg.sample_rate, self.n_fft,
                                                cfg.num_mels, cfg.mel_fmin, cfg.mel_fmax))

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        """wav [T] -> mel [n_frames, num_mels] (T-major like the reference's .T)."""
        y = jnp.asarray(wav, jnp.float32)[None]
        pad = self.n_fft // 2
        yp = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = (yp.shape[1] - self.n_fft) // self.hop + 1
        idx = jnp.arange(n_frames)[:, None] * self.hop + jnp.arange(self.n_fft)[None, :]
        frames = yp[:, idx]
        real = jnp.einsum("bnf,gf->bng", frames, self.cos_m)
        imag = jnp.einsum("bnf,gf->bng", frames, self.sin_m)
        power = real * real + imag * imag                     # |stft|^2 (mel_power=2)
        mel = jnp.einsum("bng,mg->bnm", power, self.mel_m)
        return np.asarray(mel[0])


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------


def init_voice_encoder(key: jax.Array, cfg: VoiceEncoderConfig = VoiceEncoderConfig(),
                       dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 16))
    H = cfg.ve_hidden_size

    def lstm_layer(d_in):
        k1, k2, k3, k4 = jax.random.split(next(keys), 4)
        bound = H ** -0.5
        u = lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound).astype(dtype)
        return {
            "w_ih": u(k1, (d_in, 4 * H)),
            "w_hh": u(k2, (H, 4 * H)),
            "b_ih": u(k3, (4 * H,)),
            "b_hh": u(k4, (4 * H,)),
        }

    return {
        "lstm": [lstm_layer(cfg.num_mels)] + [lstm_layer(H) for _ in range(cfg.num_layers - 1)],
        "proj": {
            "w": jax.random.uniform(next(keys), (H, cfg.speaker_embed_size),
                                    jnp.float32, -H ** -0.5, H ** -0.5).astype(dtype),
            "b": jnp.zeros((cfg.speaker_embed_size,), dtype),
        },
    }


def _lstm_layer_apply(p: dict, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, T, D] -> (outputs [B, T, H], last hidden [B, H]).
    torch LSTM gate order: i, f, g, o."""
    B, T, _ = x.shape
    H = p["w_hh"].shape[0]
    x_proj = x @ p["w_ih"] + p["b_ih"] + p["b_hh"]            # [B, T, 4H]

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ p["w_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    (h_last, _), outs = jax.lax.scan(step, init, x_proj.transpose(1, 0, 2))
    return outs.transpose(1, 0, 2), h_last


def voice_encoder_forward(params: dict, mels: jnp.ndarray,
                          final_relu: bool = True) -> jnp.ndarray:
    """[B, T, 40] partial mels -> [B, 256] L2-normalised embeddings."""
    x = mels
    h_last = None
    for layer in params["lstm"]:
        x, h_last = _lstm_layer_apply(layer, x)
    from ...ops.quant_matmul import QuantTensor, quant_einsum

    w = params["proj"]["w"]
    last = x[:, -1, :]
    raw = (quant_einsum(last, w) if isinstance(w, QuantTensor)
           else last @ w) + params["proj"]["b"]
    if final_relu:
        raw = jax.nn.relu(raw)
    norm = jnp.sqrt(jnp.sum(raw * raw, axis=1, keepdims=True))
    return raw / jnp.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# partials / full pipeline (host-side numpy, matching reference windowing)
# ---------------------------------------------------------------------------


def _get_num_wins(n_frames: int, step: int, min_coverage: float, win_size: int):
    n_wins, remainder = divmod(max(n_frames - win_size + step, 0), step)
    if n_wins == 0 or (remainder + (win_size - step)) / win_size >= min_coverage:
        n_wins += 1
    return n_wins, win_size + step * (n_wins - 1)


def embeds_from_wavs(
    params: dict,
    wavs: list[np.ndarray],
    sample_rate: int,
    cfg: VoiceEncoderConfig = VoiceEncoderConfig(),
    mel_extractor: VEMelExtractor | None = None,
    rate: float = 1.3,
    min_coverage: float = 0.8,
) -> np.ndarray:
    """[B] wavs -> [B, 256] utterance embeddings (reference `embeds_from_wavs`,
    `rate=1.3` default; resampling is the caller's job — our audio frontend
    hands in 16 kHz)."""
    assert sample_rate == cfg.sample_rate, "resample before calling"
    mx = mel_extractor or VEMelExtractor(cfg)
    frame_step = int(np.round((cfg.sample_rate / rate) / cfg.ve_partial_frames))

    all_partials, counts = [], []
    for wav in wavs:
        mel = mx(wav)                                         # [T, 40]
        n_p, target = _get_num_wins(len(mel), frame_step, min_coverage, cfg.ve_partial_frames)
        if target > len(mel):
            mel = np.concatenate([mel, np.zeros((target - len(mel), cfg.num_mels), np.float32)])
        for i in range(n_p):
            all_partials.append(mel[i * frame_step : i * frame_step + cfg.ve_partial_frames])
        counts.append(n_p)

    batch = jnp.asarray(np.stack(all_partials))
    partial_embeds = np.asarray(voice_encoder_forward(params, batch, cfg.ve_final_relu))

    out = []
    start = 0
    for n_p in counts:
        e = partial_embeds[start : start + n_p].mean(axis=0)
        out.append(e / np.linalg.norm(e))
        start += n_p
    return np.stack(out).astype(np.float32)


def convert_voice_encoder(sd: dict, cfg: VoiceEncoderConfig = VoiceEncoderConfig()) -> dict:
    """Reference ve.safetensors names -> our pytree (lstm.weight_ih_l{k} etc.)."""

    def g(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    layers = []
    for k in range(cfg.num_layers):
        layers.append({
            "w_ih": jnp.asarray(g(f"lstm.weight_ih_l{k}").T),
            "w_hh": jnp.asarray(g(f"lstm.weight_hh_l{k}").T),
            "b_ih": jnp.asarray(g(f"lstm.bias_ih_l{k}")),
            "b_hh": jnp.asarray(g(f"lstm.bias_hh_l{k}")),
        })
    return {
        "lstm": layers,
        "proj": {"w": jnp.asarray(g("proj.weight").T), "b": jnp.asarray(g("proj.bias"))},
    }
