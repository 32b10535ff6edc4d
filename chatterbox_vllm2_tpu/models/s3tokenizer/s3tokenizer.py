"""S3 speech tokenizer v2 (25 Hz, vocab 6561 = 3^8 FSQ).

The reference wraps the `s3tokenizer` pip package's S3TokenizerV2
("speech_tokenizer_v2_25hz") and only adds a fused log-mel frontend
(reference `models/s3tokenizer/s3tokenizer.py:22-168`).  That package isn't
vendored in the reference repo, so this is a from-scratch port of the
published architecture:

  128-bin whisper-style log-mel (16 kHz, n_fft 400, hop 160)
  -> conv1 k3 s2 + GELU -> conv2 k3 s2 + GELU   (100 fps -> 25 fps)
  -> sinusoidal positions
  -> 12 x pre-LN attention blocks (1280 wide, 20 heads, FSMN depthwise-conv
     memory branch added to the attention output, k=31 same-padded)
  -> FSQ: Linear(1280 -> 8), tanh-bound, rounded to {-1,0,1}; token id =
     sum_i (q_i + 1) * 3^i

The converter maps the pip package's state-dict names; numeric parity is
asserted once real checkpoints are available (no network in this build env).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ...config import S3TokenizerConfig
from ..s3gen.layers import conv1d, init_conv1d, init_layer_norm, init_linear, layer_norm, linear, mha
from ..s3gen.mel import mel_filterbank

S3_SR = 16_000
S3_HOP = 160
S3_TOKEN_RATE = 25
SPEECH_VOCAB_SIZE = 6561


def log_mel_spectrogram_128(wav: np.ndarray, n_fft: int = 400, hop: int = 160) -> np.ndarray:
    """Whisper-style 128-bin log-mel (reference `s3tokenizer.py:128-168`):
    torch.stft center=True reflect, drop last frame, power mags, slaney mel,
    log10 clamp, max-8 floor, (x+4)/4."""
    F = n_fft // 2 + 1
    n = np.arange(n_fft)
    f = np.arange(F)[:, None]
    ang = 2.0 * np.pi * f * n[None, :] / n_fft
    w = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(np.float32)
    cos_m = (np.cos(ang) * w[None, :]).astype(np.float32)
    sin_m = (np.sin(ang) * w[None, :]).astype(np.float32)
    mel_m = mel_filterbank(S3_SR, n_fft, 128, 0.0, S3_SR / 2)

    y = np.asarray(wav, np.float32)
    pad = n_fft // 2
    yp = np.pad(y, (pad, pad), mode="reflect")
    n_frames = (len(yp) - n_fft) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = yp[idx]
    real = frames @ cos_m.T
    imag = frames @ sin_m.T
    power = (real * real + imag * imag)[:-1]              # drop last frame (stft[..., :-1])
    mel = power @ mel_m.T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T.astype(np.float32)  # [128, T]


def sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def init_s3tokenizer(key: jax.Array, cfg: S3TokenizerConfig = S3TokenizerConfig(),
                     dtype=jnp.float32) -> dict:
    # each block consumes 7 keys; +4 singles
    keys = iter(jax.random.split(key, 7 * cfg.n_audio_layer + 4))
    d, h = cfg.n_audio_state, cfg.n_audio_head

    def block():
        return {
            "attn_ln": init_layer_norm(d, dtype),
            "q": init_linear(next(keys), d, d, dtype),
            "k": init_linear(next(keys), d, d, dtype, bias=False),
            "v": init_linear(next(keys), d, d, dtype),
            "out": init_linear(next(keys), d, d, dtype),
            "fsmn": init_conv1d(next(keys), d, d, 31, dtype, bias=False, groups=d),
            "mlp_ln": init_layer_norm(d, dtype),
            "mlp1": init_linear(next(keys), d, 4 * d, dtype),
            "mlp2": init_linear(next(keys), 4 * d, d, dtype),
        }

    return {
        "conv1": init_conv1d(next(keys), cfg.n_mels, d, 3, dtype),
        "conv2": init_conv1d(next(keys), d, d, 3, dtype),
        "blocks": [block() for _ in range(cfg.n_audio_layer)],
        "ln_post": init_layer_norm(d, dtype),
        "fsq_down": init_linear(next(keys), d, cfg.fsq_dim, dtype),
    }


def _block_apply(p, x, heads, mask_bias):
    y = layer_norm(p["attn_ln"], x)
    q = linear(p["q"], y)
    k = linear(p["k"], y)
    v = linear(p["v"], y)
    attn = mha(q, k, v, heads, bias=mask_bias)
    # FSMN memory branch: depthwise conv over v (same-padded), added to attention
    mem = conv1d(p["fsmn"], v.transpose(0, 2, 1), padding=(15, 15),
                 groups=v.shape[-1]).transpose(0, 2, 1)
    x = x + linear(p["out"], attn + mem)
    y = layer_norm(p["mlp_ln"], x)
    return x + linear(p["mlp2"], jax.nn.gelu(linear(p["mlp1"], y), approximate=False))


def s3tokenizer_quantize(
    params: dict,
    cfg: S3TokenizerConfig,
    mel: jnp.ndarray,          # [B, 128, T_mel]
    mel_mask: jnp.ndarray,     # [B, T_mel] bool
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens [B, T_tok], token lengths [B]); T_tok = T_mel // 4."""
    x = jax.nn.gelu(conv1d(params["conv1"], mel, stride=2, padding=(1, 1)),
                    approximate=True)
    x = jax.nn.gelu(conv1d(params["conv2"], x, stride=2, padding=(1, 1)),
                    approximate=True)
    x = x.transpose(0, 2, 1)                               # [B, T_tok, 1280]
    T = x.shape[1]
    x = x + jnp.asarray(sinusoids(T, x.shape[-1]))[None]
    tok_mask = mel_mask[:, ::4][:, :T]
    bias = jnp.where(tok_mask, 0.0, -1e10).astype(jnp.float32)[:, None, None, :]
    for p in params["blocks"]:
        x = _block_apply(p, x, cfg.n_audio_head, bias)
    x = layer_norm(params["ln_post"], x)
    h = jnp.tanh(linear(params["fsq_down"], x))            # [B, T, 8] in (-1, 1)
    q = jnp.round(h).astype(jnp.int32) + 1                 # {0, 1, 2}
    powers = jnp.asarray([3 ** i for i in range(cfg.fsq_dim)], jnp.int32)
    tokens = jnp.sum(q * powers[None, None, :], axis=-1)
    return tokens, jnp.sum(tok_mask, axis=-1)


class S3TokenizerModel:
    """Host-facing wrapper: wav list -> (tokens, lengths), 25 tok/s."""

    def __init__(self, params: dict, cfg: S3TokenizerConfig = S3TokenizerConfig()):
        self.params = params
        self.cfg = cfg
        # weight arrays as ARGUMENTS, not closure: closed-over device arrays
        # get baked into the HLO as literals (slow tunnel download at
        # lowering + the serialized program can exceed the remote-compile
        # size cap); static tree metadata stays in the closure
        from ...utils.pytree import merge_arrays, split_arrays

        arrays, spec = split_arrays(params)
        self._jit = functools.partial(
            jax.jit(lambda a, mel, mask: s3tokenizer_quantize(
                merge_arrays(a, spec), cfg, mel, mask)),
            arrays)

    def __call__(self, wavs: list[np.ndarray], max_len: int | None = None):
        mels = []
        for wav in wavs:
            # pad to a 40 ms multiple (reference `s3tokenizer.py:54-76`)
            n_tok = int(np.ceil(len(wav) / S3_SR * S3_TOKEN_RATE))
            target = int(n_tok * S3_SR / S3_TOKEN_RATE)
            wav = np.pad(wav, (0, target - len(wav)))
            mel = log_mel_spectrogram_128(wav)
            if max_len is not None:
                mel = mel[:, : max_len * 4]
            mels.append(mel)
        T = max(m.shape[1] for m in mels)
        batch = np.zeros((len(mels), 128, T), np.float32)
        mask = np.zeros((len(mels), T), bool)
        for i, m in enumerate(mels):
            batch[i, :, : m.shape[1]] = m
            mask[i, : m.shape[1]] = True
        tokens, lens = self._jit(jnp.asarray(batch), jnp.asarray(mask))
        return np.asarray(tokens), np.asarray(lens)


def drop_invalid_tokens(tokens: np.ndarray) -> np.ndarray:
    """Strip ids >= 6561 (BOS/EOS of the tokenizer space), reference
    `models/s3tokenizer/__init__.py:37-79`."""
    return tokens[tokens < SPEECH_VOCAB_SIZE]


def convert_s3tokenizer(sd: dict, cfg: S3TokenizerConfig = S3TokenizerConfig(),
                        prefix: str = "") -> dict:
    """Map the s3tokenizer pip package's state-dict names (encoder.* /
    quantizer.*) onto our pytree."""
    from ...utils.checkpoint import conv_p, linear_p, norm_p

    e = prefix + "encoder."
    blocks = []
    for i in range(cfg.n_audio_layer):
        b = f"{e}blocks.{i}."
        blocks.append({
            "attn_ln": norm_p(sd, b + "attn_ln"),
            "q": linear_p(sd, b + "attn.query"),
            "k": linear_p(sd, b + "attn.key", bias=False),
            "v": linear_p(sd, b + "attn.value"),
            "out": linear_p(sd, b + "attn.out"),
            "fsmn": conv_p(sd, b + "attn.fsmn_block", bias=False),
            "mlp_ln": norm_p(sd, b + "mlp_ln"),
            "mlp1": linear_p(sd, b + "mlp.0"),
            "mlp2": linear_p(sd, b + "mlp.2"),
        })
    return {
        "conv1": conv_p(sd, e + "conv1"),
        "conv2": conv_p(sd, e + "conv2"),
        "blocks": blocks,
        "ln_post": norm_p(sd, e + "ln_post"),
        "fsq_down": linear_p(sd, prefix + "quantizer.fsq.project_down"),
    }
