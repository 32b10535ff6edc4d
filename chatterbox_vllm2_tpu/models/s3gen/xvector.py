"""CAMPPlus x-vector speaker embedding for S3Gen conditioning.

Reference `models/s3gen/xvector.py:340-428`: Kaldi 80-bin fbank (+ per-utt
mean subtraction) -> FCM 2-D residual frontend -> dense TDNN blocks with CAM
attention -> stats pooling -> 192-d embedding.

The Kaldi fbank (torchaudio.compliance.kaldi.fbank defaults: povey window,
25 ms / 10 ms, preemphasis 0.97, remove_dc_offset, snip_edges, FFT padded to
512, HTK-style mel from 20 Hz to Nyquist, no filter normalisation) is
reimplemented in numpy/JAX since torchaudio isn't a dependency.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...config import CampPlusConfig


# ---------------------------------------------------------------------------
# Kaldi fbank
# ---------------------------------------------------------------------------


def _povey_window(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))) ** 0.85


def _kaldi_mel_banks(num_bins: int, fft_size: int, sr: float,
                     low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    if high_freq <= 0:
        high_freq = sr / 2 + high_freq
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    mel_low, mel_high = mel(low_freq), mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    fft_freqs = np.arange(fft_size // 2 + 1) * sr / fft_size
    fft_mels = mel(fft_freqs)
    banks = np.zeros((num_bins, fft_size // 2 + 1), np.float32)
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        banks[b] = np.maximum(0.0, np.minimum(up, down))
    return banks


class KaldiFbank:
    def __init__(self, sr: int = 16000, num_bins: int = 80,
                 frame_len_ms: float = 25.0, frame_shift_ms: float = 10.0):
        self.sr = sr
        self.frame_len = int(sr * frame_len_ms / 1000)    # 400
        self.shift = int(sr * frame_shift_ms / 1000)      # 160
        self.fft_size = 1
        while self.fft_size < self.frame_len:
            self.fft_size *= 2                            # 512
        self.window = jnp.asarray(_povey_window(self.frame_len).astype(np.float32))
        F = self.fft_size // 2 + 1
        n = np.arange(self.fft_size)
        f = np.arange(F)[:, None]
        ang = 2.0 * np.pi * f * n[None, :] / self.fft_size
        self.cos_m = jnp.asarray(np.cos(ang).astype(np.float32))
        self.sin_m = jnp.asarray(np.sin(ang).astype(np.float32))
        self.mel = jnp.asarray(_kaldi_mel_banks(num_bins, self.fft_size, sr))

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        """wav [T] float (any scale; kaldi convention multiplies by 2^15) ->
        [n_frames, num_bins] log-mel with per-utterance mean removed."""
        y = jnp.asarray(wav, jnp.float32) * 32768.0
        n_frames = 1 + (len(wav) - self.frame_len) // self.shift
        idx = (np.arange(n_frames)[:, None] * self.shift
               + np.arange(self.frame_len)[None, :])
        frames = y[idx]
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)   # remove_dc_offset
        pre = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - 0.97 * pre                                 # preemphasis
        frames = frames * self.window[None, :]
        pad = self.fft_size - self.frame_len
        frames = jnp.pad(frames, ((0, 0), (0, pad)))
        real = frames @ self.cos_m.T
        imag = frames @ self.sin_m.T
        power = real * real + imag * imag
        mel = power @ self.mel.T
        logmel = jnp.log(jnp.maximum(mel, 1.1921e-07))               # kaldi epsilon
        logmel = logmel - jnp.mean(logmel, axis=0, keepdims=True)    # reference CMN
        return np.asarray(logmel)


# ---------------------------------------------------------------------------
# network layers (inference-mode BatchNorm folded as scale/shift)
# ---------------------------------------------------------------------------


def _bn_apply(p, x, channel_axis=1):
    shape = [1] * x.ndim
    shape[channel_axis] = -1
    inv = jax.lax.rsqrt(p["var"].reshape(shape) + 1e-5)
    out = (x - p["mean"].reshape(shape)) * inv
    if "w" in p:
        out = out * p["w"].reshape(shape) + p["b"].reshape(shape)
    return out


def _conv2d(p, x, stride=(1, 1), padding=(1, 1)):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    return y


def _conv1d(p, x, stride=1, padding=0, dilation=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"))
    if "b" in p:
        y = y + p["b"][None, :, None]
    return y


def _res_block(p, x, stride):
    out = jax.nn.relu(_bn_apply(p["bn1"], _conv2d(p["conv1"], x, stride=(stride, 1))))
    out = _bn_apply(p["bn2"], _conv2d(p["conv2"], out))
    if "shortcut_conv" in p:
        sc = _bn_apply(p["shortcut_bn"],
                       _conv2d(p["shortcut_conv"], x, stride=(stride, 1), padding=(0, 0)))
    else:
        sc = x
    return jax.nn.relu(out + sc)


def _fcm_apply(p, x):
    """x: [B, F, T] -> [B, 32*(F//8), T] (reference FCM, `xvector.py:94-127`)."""
    y = x[:, None, :, :]
    y = jax.nn.relu(_bn_apply(p["bn1"], _conv2d(p["conv1"], y)))
    for i, blk in enumerate(p["layer1"]):
        y = _res_block(blk, y, stride=2 if i == 0 else 1)
    for i, blk in enumerate(p["layer2"]):
        y = _res_block(blk, y, stride=2 if i == 0 else 1)
    y = jax.nn.relu(_bn_apply(p["bn2"], _conv2d(p["conv2"], y, stride=(2, 1))))
    B, C, F, T = y.shape
    return y.reshape(B, C * F, T)


def _cam_layer(p, x, kernel, dilation):
    pad = (kernel - 1) // 2 * dilation
    y = _conv1d(p["local"], x, padding=pad, dilation=dilation)
    # context: global mean + 100-frame segment average pooling
    T = x.shape[-1]
    seg_len = 100
    n_seg = -(-T // seg_len)
    pad_t = n_seg * seg_len - T
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad_t)))
    seg = xp.reshape(x.shape[0], x.shape[1], n_seg, seg_len)
    seg_counts = jnp.clip(T - jnp.arange(n_seg) * seg_len, 0, seg_len)
    seg_mean = jnp.sum(seg, axis=-1) / seg_counts[None, None, :]
    seg_up = jnp.repeat(seg_mean, seg_len, axis=-1)[:, :, :T]
    context = jnp.mean(x, axis=-1, keepdims=True) + seg_up
    m = jax.nn.sigmoid(_conv1d(p["linear2"], jax.nn.relu(_conv1d(p["linear1"], context))))
    return y * m


def _dense_tdnn_layer(p, x, kernel, dilation):
    y = jax.nn.relu(_bn_apply(p["bn1"], x))
    y = _conv1d(p["linear1"], y)
    y = jax.nn.relu(_bn_apply(p["bn2"], y))
    return _cam_layer(p["cam"], y, kernel, dilation)


def campplus_apply(params: dict, cfg: CampPlusConfig, feats: jnp.ndarray) -> jnp.ndarray:
    """feats: [B, T, 80] fbank(+CMN) -> [B, 192] x-vector."""
    x = feats.transpose(0, 2, 1)                          # [B, F, T]
    x = _fcm_apply(params["head"], x)
    # tdnn: conv k5 stride 2, pad 2, then batchnorm-relu
    x = _conv1d(params["tdnn"]["conv"], x, stride=2, padding=2)
    x = jax.nn.relu(_bn_apply(params["tdnn"]["bn"], x))
    for blk, (kernel, dilation) in zip(params["blocks"], ((3, 1), (3, 2), (3, 2))):
        for layer in blk["layers"]:
            x = jnp.concatenate([x, _dense_tdnn_layer(layer, x, kernel, dilation)], axis=1)
        x = jax.nn.relu(_bn_apply(blk["transit_bn"], x))
        x = _conv1d(blk["transit_conv"], x)
    x = jax.nn.relu(_bn_apply(params["out_bn"], x))
    # stats pooling: mean + unbiased std over time
    mean = jnp.mean(x, axis=-1)
    var = jnp.sum((x - mean[..., None]) ** 2, axis=-1) / (x.shape[-1] - 1)
    stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)[:, :, None]
    y = _conv1d(params["dense"]["conv"], stats)[:, :, 0]
    return _bn_apply(params["dense"]["bn"], y, channel_axis=1)


# ---------------------------------------------------------------------------
# random init (tests / no-checkpoint environments)
# ---------------------------------------------------------------------------


def init_campplus_params(key: jax.Array, cfg: CampPlusConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 512))

    def conv2d(c_in, c_out, k=3, bias=False):
        w = jax.random.normal(next(keys), (c_out, c_in, k, k), jnp.float32) * 0.05
        p = {"w": w.astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((c_out,), dtype)
        return p

    def conv1d_p(c_in, c_out, k=1, bias=False):
        w = jax.random.normal(next(keys), (c_out, c_in, k), jnp.float32) * 0.05
        p = {"w": w.astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((c_out,), dtype)
        return p

    def bn(c, affine=True):
        p = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
        if affine:
            p["w"] = jnp.ones((c,), dtype)
            p["b"] = jnp.zeros((c,), dtype)
        return p

    def res(c_in, c, shortcut):
        p = {"conv1": conv2d(c_in, c), "bn1": bn(c), "conv2": conv2d(c, c), "bn2": bn(c)}
        if shortcut:
            p["shortcut_conv"] = conv2d(c_in, c, k=1)
            p["shortcut_bn"] = bn(c)
        return p

    def dense_layer(c_in, growth, bn_ch):
        return {
            "bn1": bn(c_in),
            "linear1": conv1d_p(c_in, bn_ch),
            "bn2": bn(bn_ch),
            "cam": {
                "local": conv1d_p(bn_ch, growth, k=3, bias=True),
                "linear1": conv1d_p(bn_ch, bn_ch // 2, bias=True),
                "linear2": conv1d_p(bn_ch // 2, growth, bias=True),
            },
        }

    g, bs = cfg.growth_rate, cfg.bn_size
    ch = 32 * (cfg.feat_dim // 8)
    blocks = []
    c = cfg.init_channels
    for n_layers in (12, 24, 16):
        layers = []
        for j in range(n_layers):
            layers.append(dense_layer(c + j * g, g, bs * g))
        c = c + n_layers * g
        blocks.append({
            "layers": layers,
            "transit_bn": bn(c),
            "transit_conv": conv1d_p(c, c // 2),
        })
        c //= 2
    return {
        "head": {
            "conv1": conv2d(1, 32), "bn1": bn(32),
            "layer1": [res(32, 32, True), res(32, 32, False)],
            "layer2": [res(32, 32, True), res(32, 32, False)],
            "conv2": conv2d(32, 32), "bn2": bn(32),
        },
        "tdnn": {"conv": conv1d_p(ch, cfg.init_channels, k=5), "bn": bn(cfg.init_channels)},
        "blocks": blocks,
        "out_bn": bn(c),
        "dense": {"conv": conv1d_p(2 * c, cfg.embedding_size),
                  "bn": bn(cfg.embedding_size, affine=False)},
    }


# ---------------------------------------------------------------------------
# converter (reference state-dict names, prefix e.g. "speaker_encoder.")
# ---------------------------------------------------------------------------


def convert_campplus(sd: dict, prefix: str = "") -> dict:
    def g(k):
        v = sd[prefix + k]
        return jnp.asarray(np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v))

    def conv(k, bias=False):
        p = {"w": g(k + ".weight")}
        if bias and prefix + k + ".bias" in sd:
            p["b"] = g(k + ".bias")
        return p

    def bn(k, affine=True):
        p = {"mean": g(k + ".running_mean"), "var": g(k + ".running_var")}
        if affine and prefix + k + ".weight" in sd:
            p["w"] = g(k + ".weight")
            p["b"] = g(k + ".bias")
        return p

    def res(k):
        p = {"conv1": conv(k + ".conv1"), "bn1": bn(k + ".bn1"),
             "conv2": conv(k + ".conv2"), "bn2": bn(k + ".bn2")}
        if prefix + k + ".shortcut.0.weight" in sd:
            p["shortcut_conv"] = conv(k + ".shortcut.0")
            p["shortcut_bn"] = bn(k + ".shortcut.1")
        return p

    def dense_layer(k):
        return {
            "bn1": bn(k + ".nonlinear1.batchnorm"),
            "linear1": conv(k + ".linear1"),
            "bn2": bn(k + ".nonlinear2.batchnorm"),
            "cam": {
                "local": conv(k + ".cam_layer.linear_local", bias=True),
                "linear1": conv(k + ".cam_layer.linear1", bias=True),
                "linear2": conv(k + ".cam_layer.linear2", bias=True),
            },
        }

    blocks = []
    for bi, n_layers in enumerate((12, 24, 16)):
        blocks.append({
            "layers": [dense_layer(f"xvector.block{bi + 1}.tdnnd{j + 1}")
                       for j in range(n_layers)],
            "transit_bn": bn(f"xvector.transit{bi + 1}.nonlinear.batchnorm"),
            "transit_conv": conv(f"xvector.transit{bi + 1}.linear"),
        })
    return {
        "head": {
            "conv1": conv("head.conv1"), "bn1": bn("head.bn1"),
            "layer1": [res(f"head.layer1.{i}") for i in range(2)],
            "layer2": [res(f"head.layer2.{i}") for i in range(2)],
            "conv2": conv("head.conv2"), "bn2": bn("head.bn2"),
        },
        "tdnn": {"conv": conv("xvector.tdnn.linear"),
                 "bn": bn("xvector.tdnn.nonlinear.batchnorm")},
        "blocks": blocks,
        "out_bn": bn("xvector.out_nonlinear.batchnorm"),
        "dense": {"conv": conv("xvector.dense.linear"),
                  "bn": bn("xvector.dense.nonlinear.batchnorm", affine=False)},
    }
