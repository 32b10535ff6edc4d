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
from ...utils.pytree import merge_arrays, split_arrays
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
        # numpy on purpose: this is a closure constant of the jitted flow —
        # device-resident constants force a device->host download at MLIR
        # lowering time (minutes through the axon tunnel)
        self._pos_table = np.asarray(espnet_rel_pos_table(cfg.encoder.output_size,
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

    @property
    def params(self) -> dict:
        return self._params

    @params.setter
    def params(self, value: dict) -> None:
        # A params swap (e.g. quantize_linears) can change the tree
        # structure; drop jits whose closed-over skeleton would go stale.
        self._params = value
        if hasattr(self, "_flow_jit"):
            self._flow_jit.clear()
            self._hift_jit.clear()

    # -- jitted stages ------------------------------------------------------

    def _flow_fn(self, T_bucket: int, n_timesteps: int, finalize: bool = True):
        # Weight ARRAYS are jit arguments, never closure constants: closing
        # over device arrays bakes them into the HLO as literals — the
        # serialized program then exceeds the axon tunnel's compile-request
        # size limit (HTTP 413; hit on the first TPU e2e bench).  Static
        # metadata in the tree (conv kernel/dilation ints) stays in the
        # closure via split_arrays/merge_arrays.
        key = (T_bucket, n_timesteps, finalize)
        if key not in self._flow_jit:
            _, spec = split_arrays((self.params["flow"],
                                    self.params["rand_noise"]))

            def fn(arrays, tokens, mask, prompt_feat, prompt_mel_len,
                   embedding):
                flow_params, rand_noise = merge_arrays(arrays, spec)
                return flow_inference(
                    flow_params, self.cfg, tokens, mask, prompt_feat,
                    prompt_mel_len, embedding, rand_noise,
                    pos_table=self._pos_table, pos_table_len=self._pos_table_len,
                    n_timesteps=n_timesteps, finalize=finalize,
                )

            self._flow_jit[key] = jax.jit(fn)
        arrays, _ = split_arrays((self.params["flow"], self.params["rand_noise"]))
        return functools.partial(self._flow_jit[key], arrays)

    def _hift_stream_fn(self, M_bucket: int):
        """HiFT with a right-padded dynamic-length source cache (streaming)."""
        key = ("stream", M_bucket)
        if key not in self._hift_jit:
            _, spec = split_arrays(self.params["hift"])

            def fn(arrays, mel, hift_key, cache, cache_len):
                return hift_apply(merge_arrays(arrays, spec), self.cfg.hift,
                                  mel, hift_key, cache_source=cache,
                                  cache_len=cache_len)

            self._hift_jit[key] = jax.jit(fn)
        arrays, _ = split_arrays(self.params["hift"])
        return functools.partial(self._hift_jit[key], arrays)

    def _hift_fn(self, M_bucket: int):
        if M_bucket not in self._hift_jit:
            _, spec = split_arrays(self.params["hift"])

            def fn(arrays, mel, hift_key):
                return hift_apply(merge_arrays(arrays, spec), self.cfg.hift,
                                  mel, hift_key)

            self._hift_jit[M_bucket] = jax.jit(fn)
        arrays, _ = split_arrays(self.params["hift"])
        return functools.partial(self._hift_jit[M_bucket], arrays)

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
        return self.inference_batch([(speech_tokens, ref)], n_timesteps,
                                    seeds=[seed], no_trim=no_trim)[0]

    BATCH_BUCKETS = (1, 2, 4, 8)

    def _batch_bucket(self, n: int) -> int:
        for b in self.BATCH_BUCKETS:
            if n <= b:
                return b
        return self.BATCH_BUCKETS[-1]

    def inference_batch(
        self,
        items: list,                   # [(speech_tokens [n] int32, RefDict)]
        n_timesteps: int = 10,
        seeds: list | None = None,
        no_trim: bool = False,
    ) -> list:
        """Vectorized synthesis: same-token-bucket utterances share one flow
        dispatch and same-mel-bucket utterances share one HiFT dispatch.

        The reference runs S3Gen strictly serially per utterance (reference
        `tts.py:474-521`); here B utterances cost ~one utterance of wall
        time per bucket group.  Per-sample PRNG keys keep seeded requests
        reproducible regardless of co-batched traffic (noise depends only on
        (seed, own mel bucket)).
        """
        cfg = self.cfg
        if seeds is None:
            seeds = [0] * len(items)
        n_items = len(items)
        if n_items == 0:
            return []

        # ---- group by flow token bucket --------------------------------- #
        meta = []   # (idx, tokens, ref, total, T_bucket)
        for i, (toks, ref) in enumerate(items):
            total = len(ref.prompt_token) + len(toks)
            meta.append((i, toks, ref, total, self._bucket(total)))
        wavs: list = [None] * n_items
        gen_mels: dict = {}            # idx -> [80, 2*n_gen] numpy

        P_max = 2 * self.max_prompt_tokens
        by_bucket: dict = {}
        for m in meta:
            by_bucket.setdefault(m[4], []).append(m)
        for T_b, group in by_bucket.items():
            for j in range(0, len(group), self.BATCH_BUCKETS[-1]):
                chunk = group[j:j + self.BATCH_BUCKETS[-1]]
                B = self._batch_bucket(len(chunk))
                tokens = np.zeros((B, T_b), np.int32)
                mask = np.zeros((B, T_b), bool)
                pf = np.zeros((B, P_max, cfg.mel_bins), np.float32)
                p_len = np.zeros((B,), np.int32)
                emb = np.zeros((B, cfg.spk_embed_dim), np.float32)
                for r, (i, toks, ref, total, _) in enumerate(chunk):
                    np_ = len(ref.prompt_token)
                    tokens[r, :np_] = ref.prompt_token
                    tokens[r, np_:total] = toks
                    mask[r, :total] = True
                    pf[r, : ref.prompt_feat.shape[0]] = ref.prompt_feat
                    p_len[r] = ref.prompt_feat.shape[0]
                    emb[r] = ref.embedding
                mel_full = np.asarray(self._flow_fn(T_b, n_timesteps)(
                    jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(pf),
                    jnp.asarray(p_len), jnp.asarray(emb)))   # [B, 80, 2*T_b]
                for r, (i, toks, ref, total, _) in enumerate(chunk):
                    start = ref.prompt_feat.shape[0]
                    gen_mels[i] = mel_full[r, :, start: start + 2 * len(toks)]

        # ---- group by HiFT mel bucket ----------------------------------- #
        by_mel: dict = {}
        for i in range(n_items):
            M = gen_mels[i].shape[-1]
            by_mel.setdefault(self._bucket_mel(M), []).append(i)
        for M_b, idxs in by_mel.items():
            for j in range(0, len(idxs), self.BATCH_BUCKETS[-1]):
                chunk = idxs[j:j + self.BATCH_BUCKETS[-1]]
                B = self._batch_bucket(len(chunk))
                mel = np.zeros((B, cfg.mel_bins, M_b), np.float32)
                for r, i in enumerate(chunk):
                    g = gen_mels[i]
                    mel[r, :, : g.shape[-1]] = g
                    if g.shape[-1] < M_b:   # edge-replicate pad
                        mel[r, :, g.shape[-1]:] = g[:, -1:]
                row_seeds = jnp.asarray(
                    [seeds[i] if i < len(seeds) else 0 for i in chunk]
                    + [0] * (B - len(chunk)), jnp.uint32)
                keys = jax.vmap(jax.random.key)(row_seeds)   # typed keys [B]
                wav_b, _ = self._hift_fn(M_b)(jnp.asarray(mel), keys)
                wav_b = np.asarray(wav_b)
                for r, i in enumerate(chunk):
                    M = gen_mels[i].shape[-1]
                    wav = wav_b[r, : M * 480].copy()
                    if not no_trim:
                        n = min(len(self._trim_fade), len(wav))
                        wav[:n] *= self._trim_fade[:n]
                    wavs[i] = wav.astype(np.float32)
        return wavs

    def _bucket_mel(self, m: int) -> int:
        for b in self.token_buckets:
            if m <= 2 * b:
                return 2 * b
        return 2 * self.token_buckets[-1]


class StreamingVocoder:
    """Token-chunk streaming synthesis over one utterance.

    Mirrors the reference's streaming hooks instead of its batch path: the
    flow runs on the full token prefix with `finalize=False` and the last
    `pre_lookahead_len` tokens' frames are withheld until the final chunk
    (reference `flow.py:268-269`), and HiFT is re-run over the full generated
    mel with the previous call's source cache so the harmonic excitation is
    phase-continuous across chunks (reference `hifigan.py:462-474`
    `cache_source`).  Each push yields only the newly-reliable samples.

    Shapes stay static via the engine's ascending token/mel buckets, so a
    stream compiles the same programs batch inference does (plus the
    streaming-HiFT variant).  Recompute cost is O(prefix) per chunk — the
    price of exact-context streaming at these short lengths.
    """

    def __init__(self, engine: S3GenEngine, ref: RefDict, *,
                 n_timesteps: int = 10, seed: int = 0,
                 chunk_tokens: int = 25):
        self.eng = engine
        self.ref = ref
        self.n_timesteps = n_timesteps
        self.chunk_tokens = chunk_tokens
        self.tokens: list = []
        self.emitted_mel = 0          # generated-region mel frames emitted
        self.source_cache: np.ndarray | None = None   # [1, 1, n] numpy
        self.finished = False
        self._first = True
        self._key = jax.random.key(np.uint32(seed))

    def push(self, new_tokens, final: bool = False) -> np.ndarray | None:
        """Feed newly decoded speech tokens; returns the next wav chunk
        (float32, 24 kHz) or None if not enough tokens are buffered yet."""
        assert not self.finished
        eng, cfg = self.eng, self.eng.cfg
        self.tokens.extend(int(t) for t in np.asarray(new_tokens).ravel())
        la = cfg.encoder.pre_lookahead_len
        n = len(self.tokens)
        avail_mel = 2 * n if final else max(2 * (n - la), 0)
        if not final and avail_mel - self.emitted_mel < 2 * self.chunk_tokens:
            return None
        if final:
            self.finished = True
        if avail_mel <= self.emitted_mel:
            return np.zeros(0, np.float32) if final else None

        ref = self.ref
        np_tok = len(ref.prompt_token)
        total = np_tok + n
        T_b = eng._bucket(total)
        P_max = 2 * eng.max_prompt_tokens
        tokens = np.zeros((1, T_b), np.int32)
        tokens[0, :np_tok] = ref.prompt_token
        tokens[0, np_tok:total] = self.tokens
        mask = np.zeros((1, T_b), bool)
        mask[0, :total] = True
        pf = np.zeros((1, P_max, cfg.mel_bins), np.float32)
        pf[0, : ref.prompt_feat.shape[0]] = ref.prompt_feat
        p_len = np.asarray([ref.prompt_feat.shape[0]], np.int32)
        emb = ref.embedding[None].astype(np.float32)

        mel_full = np.asarray(eng._flow_fn(T_b, self.n_timesteps,
                                           finalize=final)(
            jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(pf),
            jnp.asarray(p_len), jnp.asarray(emb)))     # [1, 80, T_mel(-la*2)]
        start = ref.prompt_feat.shape[0]
        gen_mel = mel_full[0, :, start: start + avail_mel]   # [80, avail]
        avail_mel = gen_mel.shape[1]                   # guard vs bucket edge

        M_b = eng._bucket_mel(avail_mel)
        mel_in = np.zeros((1, cfg.mel_bins, M_b), np.float32)
        mel_in[0, :, :avail_mel] = gen_mel
        if avail_mel < M_b:
            mel_in[0, :, avail_mel:] = gen_mel[:, -1:]
        cache = np.zeros((1, 1, M_b * 480), np.float32)
        cache_n = 0
        if self.source_cache is not None:
            cache_n = min(self.source_cache.shape[-1], cache.shape[-1])
            cache[:, :, :cache_n] = self.source_cache[:, :, :cache_n]
        wav_full, source = eng._hift_stream_fn(M_b)(
            jnp.asarray(mel_in), self._key, jnp.asarray(cache),
            jnp.asarray(cache_n, jnp.int32))
        wav_full = np.asarray(wav_full)[0]
        self.source_cache = np.asarray(source)[:, :, : avail_mel * 480]

        lo, hi = self.emitted_mel * 480, avail_mel * 480
        chunk = wav_full[lo:hi].astype(np.float32).copy()
        if self._first:
            fade = eng._trim_fade
            m = min(len(fade), len(chunk))
            chunk[:m] *= fade[:m]
            self._first = False
        self.emitted_mel = avail_mel
        return chunk
