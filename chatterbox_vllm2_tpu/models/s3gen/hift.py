"""HiFT vocoder: mel -> F0 -> harmonic sine source -> NSF + iSTFT -> 24 kHz wav.

Reference `hifigan.py:286-474` (HiFTNet) and `f0_predictor.py:19-55`.
TPU-native notes:
  * The n_fft=16 STFT/iSTFT pair is implemented as tiny DFT matmuls plus an
    overlap-add expressed as 4 shifted adds (n_fft = 4*hop) — no FFT op
    needed, fully fusable by XLA.
  * Weight-norm convs are folded at load time (plain convs here).
  * The sine source's random harmonic phases and noise come from an explicit
    PRNG key (the reference uses global torch RNG).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...config import HiftConfig
from .layers import (
    conv1d,
    conv_transpose1d,
    init_conv1d,
    init_conv_transpose1d,
    init_linear,
    linear,
    snake,
)


# ---------------------------------------------------------------------------
# tiny-DFT STFT / iSTFT (n_fft=16, hop=4)
# ---------------------------------------------------------------------------


def hann_periodic(n: int) -> np.ndarray:
    """scipy get_window('hann', n, fftbins=True)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def _dft_mats(n_fft: int):
    F = n_fft // 2 + 1
    n = np.arange(n_fft)
    f = np.arange(F)[:, None]
    ang = 2.0 * np.pi * f * n[None, :] / n_fft
    return np.cos(ang).astype(np.float32), -np.sin(ang).astype(np.float32)


def stft_small(x: jnp.ndarray, n_fft: int, hop: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """torch.stft(center=True, reflect) equivalent. x: [B, T] ->
    (real, imag) each [B, F, n_frames] with n_frames = T//hop + 1."""
    window = jnp.asarray(hann_periodic(n_fft))
    cos_m, nsin_m = (jnp.asarray(m) for m in _dft_mats(n_fft))
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (xp.shape[1] - n_fft) // hop + 1
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :])
    frames = xp[:, idx] * window[None, None, :]           # [B, n_frames, n_fft]
    real = jnp.einsum("bnf,gf->bgn", frames, cos_m)
    imag = jnp.einsum("bnf,gf->bgn", frames, nsin_m)
    return real, imag


def istft_small(real: jnp.ndarray, imag: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """torch.istft(center=True) equivalent for n_fft = 4*hop.
    real/imag: [B, F, n_frames] -> [B, (n_frames-1)*hop]."""
    assert n_fft == 4 * hop
    window = jnp.asarray(hann_periodic(n_fft))
    F = n_fft // 2 + 1
    # inverse rFFT as matmul: x[n] = (1/N) * sum_f w_f (Re cos + Im sin)
    n = np.arange(n_fft)
    f = np.arange(F)[:, None]
    ang = 2.0 * np.pi * f * n[None, :] / n_fft
    wf = np.ones((F, 1), np.float32) * 2.0
    wf[0] = wf[-1] = 1.0
    icos = (np.cos(ang) * wf / n_fft).astype(np.float32)
    isin = (-np.sin(ang) * wf / n_fft).astype(np.float32)
    frames = (jnp.einsum("bgn,gf->bnf", real, jnp.asarray(icos))
              + jnp.einsum("bgn,gf->bnf", imag, jnp.asarray(isin)))
    frames = frames * window[None, None, :]               # [B, n_frames, n_fft]

    B, n_frames, _ = frames.shape
    # overlap-add: frame i spans [i*hop, i*hop + n_fft); split into 4 hop-chunks
    chunks = frames.reshape(B, n_frames, 4, hop)
    out_blocks = n_frames + 3                             # blocks of size hop
    ola = jnp.zeros((B, out_blocks, hop), frames.dtype)
    wsq = window * window
    wsq_chunks = wsq.reshape(4, hop)
    wsum = jnp.zeros((out_blocks, hop), frames.dtype)
    for c in range(4):
        ola = ola.at[:, c : c + n_frames].add(chunks[:, :, c])
        wsum = wsum.at[c : c + n_frames].add(
            jnp.broadcast_to(wsq_chunks[c], (n_frames, hop)))
    y = (ola / jnp.maximum(wsum, 1e-11)[None]).reshape(B, -1)
    # center crop: torch.istft removes n_fft//2 from each end
    pad = n_fft // 2
    return y[:, pad : pad + (n_frames - 1) * hop]


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


def init_f0_predictor(key, in_channels=80, cond_channels=512, dtype=jnp.float32):
    keys = jax.random.split(key, 6)
    return {
        "convs": [init_conv1d(keys[i], in_channels if i == 0 else cond_channels,
                              cond_channels, 3, dtype) for i in range(5)],
        "classifier": init_linear(keys[5], cond_channels, 1, dtype),
    }


def f0_predictor_apply(p, mel):
    """mel: [B, 80, T] -> f0 [B, T] (reference `f0_predictor.py:52-55`)."""
    x = mel
    for conv in p["convs"]:
        x = jax.nn.elu(conv1d(conv, x, padding=(1, 1)))
    return jnp.abs(linear(p["classifier"], x.transpose(0, 2, 1))[..., 0])


def sine_source(
    f0_up: jnp.ndarray,       # [B, T_wav] upsampled F0 (Hz)
    key: jax.Array,
    cfg: HiftConfig,
) -> jnp.ndarray:
    """SineGen + SourceModuleHnNSF merge prep: returns the per-harmonic sine
    waves [B, T_wav, H+1] (reference `hifigan.py:200-231`)."""
    H = cfg.nb_harmonics + 1
    B, T = f0_up.shape
    per_row = (jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key)
               and key.ndim == 1)
    if per_row:
        # per-row keys: each sample's phase/noise depends only on its own
        # key (and its static mel bucket), so a seeded request reproduces
        # regardless of what it is batched with
        def draw(k):
            kp, kn = jax.random.split(k)
            ph = jax.random.uniform(kp, (H, 1), jnp.float32, -np.pi, np.pi)
            return ph.at[0].set(0.0), jax.random.normal(kn, (H, T), jnp.float32)

        phase, noise_u = jax.vmap(draw)(key)                         # [B,H,1],[B,H,T]
    else:
        k_phase, k_noise = jax.random.split(key)
        phase = jax.random.uniform(k_phase, (B, H, 1), jnp.float32, -np.pi, np.pi)
        phase = phase.at[:, 0, :].set(0.0)
        noise_u = jax.random.normal(k_noise, (B, H, T), jnp.float32)
    harmonics = jnp.arange(1, H + 1, dtype=jnp.float32)[None, :, None]
    F_mat = f0_up[:, None, :] * harmonics / cfg.sampling_rate       # [B, H, T]
    theta = 2.0 * np.pi * (jnp.cumsum(F_mat, axis=-1) % 1.0)
    sine = cfg.nsf_alpha * jnp.sin(theta + phase)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[:, None, :]
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    noise = noise_amp * noise_u
    return (sine * uv + noise).transpose(0, 2, 1)                    # [B, T, H]


def init_resblock(key, channels, kernel, dilations, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 2 * len(dilations)))
    return {
        "convs1": [init_conv1d(next(keys), channels, channels, kernel, dtype)
                   for _ in dilations],
        "convs2": [init_conv1d(next(keys), channels, channels, kernel, dtype)
                   for _ in dilations],
        "alpha1": [jnp.ones((channels,), dtype) for _ in dilations],
        "alpha2": [jnp.ones((channels,), dtype) for _ in dilations],
        "_meta": {"kernel": kernel, "dilations": tuple(dilations)},
    }


def resblock_apply(p, x):
    k = p["_meta"]["kernel"]
    for conv1_, conv2_, a1, a2, d in zip(
        p["convs1"], p["convs2"], p["alpha1"], p["alpha2"], p["_meta"]["dilations"]
    ):
        pad1 = (k * d - d) // 2
        xt = snake({"alpha": a1}, x)
        xt = conv1d(conv1_, xt, padding=(pad1, pad1), dilation=d)
        xt = snake({"alpha": a2}, xt)
        pad2 = (k - 1) // 2
        xt = conv1d(conv2_, xt, padding=(pad2, pad2))
        x = x + xt
    return x


def init_hift(key: jax.Array, cfg: HiftConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 64))
    base = cfg.base_channels
    n_src = cfg.istft_n_fft + 2
    ups, source_downs, source_res, resblocks = [], [], [], []
    down_cum = list(np.cumprod([1] + list(cfg.upsample_rates[::-1][:-1])))[::-1]
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        c_out = base // (2 ** (i + 1))
        ups.append(init_conv_transpose1d(next(keys), base // (2 ** i), c_out, k, dtype))
        du = int(down_cum[i])
        if du == 1:
            source_downs.append(init_conv1d(next(keys), n_src, c_out, 1, dtype))
        else:
            source_downs.append(init_conv1d(next(keys), n_src, c_out, du * 2, dtype))
        source_res.append(init_resblock(next(keys), c_out,
                                        cfg.source_resblock_kernel_sizes[i],
                                        cfg.source_resblock_dilation_sizes[i], dtype))
        for kk, dd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            resblocks.append(init_resblock(next(keys), c_out, kk, dd, dtype))
    return {
        "f0_predictor": init_f0_predictor(next(keys), cfg.in_channels, 512, dtype),
        "source_linear": init_linear(next(keys), cfg.nb_harmonics + 1, 1, dtype),
        "conv_pre": init_conv1d(next(keys), cfg.in_channels, base, 7, dtype),
        "ups": ups,
        "source_downs": source_downs,
        "source_resblocks": source_res,
        "resblocks": resblocks,
        "conv_post": init_conv1d(next(keys), base // (2 ** len(cfg.upsample_rates)),
                                 n_src, 7, dtype),
    }


def hift_apply(
    params: dict,
    cfg: HiftConfig,
    mel: jnp.ndarray,          # [B, 80, T_mel]
    key: jax.Array,
    cache_source: jnp.ndarray | None = None,   # [B, 1, T_cache] streaming source
    cache_len: jnp.ndarray | None = None,      # [] int32 — valid cache samples
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (wav [B, T_mel*300], source [B, 1, T_wav]).

    Streaming (reference `hifigan.py:462-474` cache_source semantics): pass
    the previous call's returned source to keep the harmonic excitation
    phase-continuous across chunks.  `cache_len` makes the valid-cache length
    dynamic (cache_source may be a right-padded static-shape buffer); without
    it the whole cache_source buffer is taken as valid."""
    B, _, T_mel = mel.shape
    total_up = int(np.prod(cfg.upsample_rates)) * cfg.istft_hop_len    # 480

    f0 = f0_predictor_apply(params["f0_predictor"], mel)               # [B, T_mel]
    f0_up = jnp.repeat(f0, total_up, axis=-1)                          # [B, T_wav]
    sines = sine_source(f0_up, key, cfg)                               # [B, T, H+1]
    s = jnp.tanh(linear(params["source_linear"], sines))[..., 0]       # [B, T_wav]
    s = s[:, None, :]                                                  # [B, 1, T]
    if cache_source is not None and cache_source.shape[-1] > 0:
        n = min(cache_source.shape[-1], s.shape[-1])
        if cache_len is None:
            s = s.at[:, :, :n].set(cache_source[:, :, :n])
        else:
            keep = (jnp.arange(n) < cache_len)[None, None, :]
            s = s.at[:, :, :n].set(
                jnp.where(keep, cache_source[:, :, :n], s[:, :, :n]))

    s_real, s_imag = stft_small(s[:, 0, :], cfg.istft_n_fft, cfg.istft_hop_len)
    s_stft = jnp.concatenate([s_real, s_imag], axis=1)                 # [B, 18, F_t]

    num_kernels = len(cfg.resblock_kernel_sizes)
    x = conv1d(params["conv_pre"], mel, padding=(3, 3))
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
        x = conv_transpose1d(params["ups"][i], x, stride=u, padding=(k - u) // 2)
        if i == len(cfg.upsample_rates) - 1:
            # reflection pad (1, 0) (reference `hifigan.py:378,422`)
            x = jnp.concatenate([x[:, :, 1:2], x], axis=-1)
        sd = params["source_downs"][i]
        kd = sd["w"].shape[-1]
        if kd == 1:
            si = conv1d(sd, s_stft)
        else:
            stride = kd // 2
            si = conv1d(sd, s_stft, stride=stride, padding=(stride // 2, stride // 2))
        si = resblock_apply(params["source_resblocks"][i], si)
        x = x + si
        xs = None
        for j in range(num_kernels):
            r = resblock_apply(params["resblocks"][i * num_kernels + j], x)
            xs = r if xs is None else xs + r
        x = xs / num_kernels

    x = jax.nn.leaky_relu(x, 0.01)
    x = conv1d(params["conv_post"], x, padding=(3, 3))
    F = cfg.istft_n_fft // 2 + 1
    magnitude = jnp.minimum(jnp.exp(x[:, :F, :]), 1e2)
    phase = jnp.sin(x[:, F:, :])
    real = magnitude * jnp.cos(phase)
    imag = magnitude * jnp.sin(phase)
    wav = istft_small(real, imag, cfg.istft_n_fft, cfg.istft_hop_len)
    wav = jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)
    return wav, s
