"""S3Gen engine: speech tokens + voice reference -> 24 kHz waveform.

The TPU-native equivalent of the reference's `S3Token2Wav`
(`models/s3gen/s3gen.py:233-323`): two jitted stages (token->mel flow, and
mel->wav HiFT) compiled once per token-length bucket, with a host hop between
them to slice each sample's generated mel region (static shapes throughout).

`embed_ref` builds the reference-voice dict — 24 kHz prompt mel, CAMPPlus
x-vector, S3 tokenizer prompt tokens (reference `embed_ref`,
`s3gen.py:120-170`) — and the 20 ms trim-fade is applied to the final wav
(reference `s3gen.py:254-257,278`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ...config import S3GenConfig
from .cfm import make_rand_noise
from .conformer import espnet_rel_pos_table
from .flow import flow_inference, init_flow
from .hift import hift_apply, init_hift
from .mel import MelExtractor
from .xvector import KaldiFbank, campplus_apply


@dataclass
class RefDict:
    """Voice-reference conditioning (reference ref_dict, `s3gen.py:164-170`)."""

    prompt_token: np.ndarray      # [Tp] int32
    prompt_feat: np.ndarray       # [Tp*2, 80] 24 kHz mel
    embedding: np.ndarray         # [192] CAMPPlus x-vector


def init_s3gen_params(key: jax.Array, cfg: S3GenConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "flow": init_flow(k1, cfg, dtype),
        "hift": init_hift(k2, cfg.hift, dtype),
        "rand_noise": make_rand_noise(k3),
    }


class S3GenEngine:
    def __init__(
        self,
        params: dict,
        cfg: S3GenConfig = S3GenConfig(),
        token_buckets: tuple = (64, 128, 256, 512, 768),
        max_prompt_tokens: int = 256,
        campplus_params: dict | None = None,
        s3tok_model=None,
    ):
        self.params = params
        self.cfg = cfg
        self.token_buckets = tuple(sorted(token_buckets))
        self.max_prompt_tokens = max_prompt_tokens
        self.campplus_params = campplus_params
        self.s3tok = s3tok_model
        max_T = self.token_buckets[-1]
        table_len = 2 * max_T + 8
        self._pos_table = jnp.asarray(espnet_rel_pos_table(cfg.encoder.output_size,
                                                           table_len))
        self._pos_table_len = table_len
        self.mel_extractor = MelExtractor(cfg.sample_rate, cfg.mel_n_fft, cfg.mel_bins,
                                          cfg.mel_hop, cfg.mel_n_fft,
                                          cfg.mel_fmin, cfg.mel_fmax)
        self.fbank = KaldiFbank(16000, 80)
        n_trim = cfg.trim_fade_samples
        fade = np.zeros(2 * n_trim, np.float32)
        fade[n_trim:] = (np.cos(np.linspace(np.pi, 0.0, n_trim)) + 1.0) / 2.0
        self._trim_fade = fade

        self._flow_jit = {}
        self._hift_jit = {}

    # -- jitted stages ------------------------------------------------------

    def _flow_fn(self, T_bucket: int, n_timesteps: int):
        key = (T_bucket, n_timesteps)
        if key not in self._flow_jit:
            P_max = 2 * self.max_prompt_tokens

            def fn(tokens, mask, prompt_feat, prompt_mel_len, embedding):
                return flow_inference(
                    self.params["flow"], self.cfg, tokens, mask, prompt_feat,
                    prompt_mel_len, embedding, self.params["rand_noise"],
                    pos_table=self._pos_table, pos_table_len=self._pos_table_len,
                    n_timesteps=n_timesteps,
                )

            self._flow_jit[key] = jax.jit(fn)
        return self._flow_jit[key]

    def _hift_fn(self, M_bucket: int):
        if M_bucket not in self._hift_jit:
            def fn(mel, hift_key):
                return hift_apply(self.params["hift"], self.cfg.hift, mel, hift_key)

            self._hift_jit[M_bucket] = jax.jit(fn)
        return self._hift_jit[M_bucket]

    def _bucket(self, n: int) -> int:
        for b in self.token_buckets:
            if n <= b:
                return b
        raise ValueError(f"token sequence of {n} exceeds largest bucket "
                         f"{self.token_buckets[-1]}")

    # -- reference embedding ------------------------------------------------

    def embed_ref(self, ref_wav_24k: np.ndarray, ref_wav_16k: np.ndarray) -> RefDict:
        """Build conditioning from a (<=10 s) reference wav at both rates."""
        if self.s3tok is None or self.campplus_params is None:
            raise RuntimeError("embed_ref needs campplus_params and s3tok_model")
        mel = np.asarray(self.mel_extractor(jnp.asarray(ref_wav_24k)[None]))[0].T  # [T, 80]
        feats = self.fbank(ref_wav_16k)
        from ...config import CampPlusConfig

        emb = np.asarray(campplus_apply(self.campplus_params, CampPlusConfig(),
                                        jnp.asarray(feats)[None]))[0]
        tokens, lens = self.s3tok([ref_wav_16k])
        prompt_token = tokens[0, : lens[0]]
        # mel frames must equal 2x token count (reference `s3gen.py:157-162`)
        if mel.shape[0] != 2 * len(prompt_token):
            n = min(mel.shape[0] // 2, len(prompt_token))
            prompt_token = prompt_token[:n]
            mel = mel[: 2 * n]
        if len(prompt_token) > self.max_prompt_tokens:
            prompt_token = prompt_token[: self.max_prompt_tokens]
            mel = mel[: 2 * self.max_prompt_tokens]
        return RefDict(prompt_token=prompt_token.astype(np.int32),
                       prompt_feat=mel.astype(np.float32),
                       embedding=emb.astype(np.float32))

    # -- main entry ---------------------------------------------------------

    def inference(
        self,
        speech_tokens: np.ndarray,     # [n] int32 generated tokens
        ref: RefDict,
        n_timesteps: int = 10,
        seed: int = 0,
        no_trim: bool = False,
    ) -> np.ndarray:
        """One utterance -> wav float32 [n * 960] at 24 kHz
        (2 mel frames/token * 480 samples/frame)."""
        cfg = self.cfg
        prompt = ref.prompt_token
        n_gen = len(speech_tokens)
        total = len(prompt) + n_gen
        T_b = self._bucket(total)

        tokens = np.zeros((1, T_b), np.int32)
        tokens[0, : len(prompt)] = prompt
        tokens[0, len(prompt) : total] = speech_tokens
        mask = np.zeros((1, T_b), bool)
        mask[0, :total] = True

        P_max = 2 * self.max_prompt_tokens
        pf = np.zeros((1, P_max, cfg.mel_bins), np.float32)
        pf[0, : ref.prompt_feat.shape[0]] = ref.prompt_feat
        p_len = np.asarray([ref.prompt_feat.shape[0]], np.int32)

        mel_full = self._flow_fn(T_b, n_timesteps)(
            jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(pf),
            jnp.asarray(p_len), jnp.asarray(ref.embedding[None]),
        )
        mel_full = np.asarray(mel_full)                        # [1, 80, 2*T_b]
        start = ref.prompt_feat.shape[0]
        gen_mel = mel_full[:, :, start : start + 2 * n_gen]

        # pad generated mel to a bucket with edge-replication for HiFT
        M = gen_mel.shape[-1]
        M_b = self._bucket_mel(M)
        if M_b > M:
            pad = np.repeat(gen_mel[:, :, -1:], M_b - M, axis=-1)
            gen_mel = np.concatenate([gen_mel, pad], axis=-1)

        wav, _ = self._hift_fn(M_b)(jnp.asarray(gen_mel), jax.random.PRNGKey(seed))
        wav = np.array(wav)[0, : M * 480]
        if not no_trim:
            n = min(len(self._trim_fade), len(wav))
            wav[:n] *= self._trim_fade[:n]
        return wav.astype(np.float32)

    def _bucket_mel(self, m: int) -> int:
        for b in self.token_buckets:
            if m <= 2 * b:
                return 2 * b
        return 2 * self.token_buckets[-1]
