"""T3 generation engine: CFG-paired continuous decoding, fully jitted.

This is the TPU-native replacement for the vLLM engine the reference plugs
into (`vllm.LLM` at reference `tts.py:150-171,445`).  Design (SURVEY.md §7):

  * Each request occupies one CFG *pair* = two adjacent device batch rows
    (even = conditioned, odd = unconditioned).  One fused forward serves both;
    logits are combined per pair and a single token is sampled and fed back to
    both rows.
  * Prefill and decode are separate jitted programs with static shapes; text
    lengths are bucketed (config.engine.prefill_buckets) so each bucket
    compiles once.  Prefill attention is O(T^2) over the new tokens (never the
    whole cache), so long-text buckets cost what they should.
  * Decode runs `decode_steps_per_dispatch` tokens per host round-trip via
    `lax.scan`; per-stream state (lengths, speech positions, sampler state,
    RNG keys, done flags) lives on device.  The KV cache is donated through
    the decode step so XLA updates it in place, and attention reads only a
    static `cache_len` bucket that the host advances as sequences grow.
  * quant_mode "int8" / "int4_awq" swaps the backbone matmul weights for
    QuantTensors at construction (ops/quant_matmul.py) — the analog of the
    reference's AWQ/bitsandbytes load-time quantization
    (reference `quantization.py:29-185`, `tts.py:160-169`).
  * Every request samples from its own PRNG key (T3Request.seed), so seeded
    requests are reproducible under concurrency.

Exact speech positions are tracked per stream — fixing the reference's
acknowledged position-restart approximation (`models/t3/t3.py:447-464`).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, SamplingConfig, T3Config
from ..models.t3.model import (
    KVCache,
    build_decode_embeds,
    build_prefill_embeds,
    cfg_combine,
    make_rope_tables,
    speech_logits,
    t3_decode,
    t3_prefill,
)
from ..ops.quant_matmul import quantize_t3_params
from ..ops.sampling import SamplingState, make_keys, sample, split_keys

CACHE_LEN_BUCKET = 128   # decode attention reads round up to this granularity


@dataclass
class T3Request:
    """One utterance to synthesise speech tokens for."""

    text_ids: np.ndarray                  # [Tt] int32 (includes [START]/[STOP] text markers)
    cond_emb: np.ndarray                  # [34, hidden]
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    max_new_tokens: int = 1000
    request_id: Optional[str] = None
    seed: Optional[int] = None            # per-request RNG seed


@dataclass
class T3Result:
    tokens: np.ndarray                    # [n] int32 speech tokens (no start/stop)
    finished_by_stop: bool
    request_id: Optional[str] = None
    t3_time_s: float = 0.0


class DecodeState(NamedTuple):
    kv: KVCache
    lengths: jnp.ndarray        # [S] int32 — total tokens written per stream
    speech_pos: jnp.ndarray     # [B] int32 — exact speech position of next input token
    last_token: jnp.ndarray     # [B] int32
    prev_tokens: jnp.ndarray    # [B, 2] int32 — tokens t-3, t-2 (analyzer window)
    completed_at: jnp.ndarray   # [B] int32 — frame where text coverage completed (-1)
    seen: jnp.ndarray           # [B, V] bool — repetition-penalty table
    done: jnp.ndarray           # [B] bool
    stopped: jnp.ndarray        # [B] bool — finished by emitting the stop token
    n_generated: jnp.ndarray    # [B] int32
    out_tokens: jnp.ndarray     # [B, max_out] int32
    keys: jax.Array             # [B] typed PRNG keys — one stream per request


def alignment_analyzer_logits(
    logits: jnp.ndarray,        # [B, V] f32
    state: "DecodeState",
    text_len: jnp.ndarray,      # [B] int32
    eos_id: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """In-loop alignment stream analyzer (reference
    `models/t3/inference/alignment_stream_analyzer.py:115-195`, which the
    reference only replays post-hoc over finished token lists,
    `tts.py:300-365`).

    Heuristics: estimated text position = frames // 2; EOS suppressed until
    the text is nearly covered; EOS forced on 3-token repetition or on a
    >=10-frame long tail after coverage completes.

    Returns (modified logits, completed_at update).
    """
    B, V = logits.shape
    big = jnp.float32(2 ** 15)
    pos = jnp.minimum(state.n_generated // 2, text_len - 1)
    complete = pos >= (text_len - 3)
    completed_at = jnp.where(complete & (state.completed_at < 0),
                             state.n_generated, state.completed_at)
    long_tail = complete & (completed_at >= 0) & \
        (state.n_generated - completed_at >= 10)
    repetition = (
        (state.n_generated >= 3)
        & (state.prev_tokens[:, 0] == state.prev_tokens[:, 1])
        & (state.prev_tokens[:, 1] == state.last_token)
    )
    suppress = (pos < text_len - 3) & (text_len > 5)
    eos_col = jnp.arange(V)[None, :] == eos_id
    logits = jnp.where(suppress[:, None] & eos_col, -big, logits)
    force = (long_tail | repetition)[:, None]
    logits = jnp.where(force, jnp.where(eos_col, big, -big), logits)
    return logits, completed_at


# Signature: (logits [B,V] f32, state: DecodeState) -> logits. Used for the
# in-loop alignment analyzer (reference runs it post-hoc, `tts.py:300-365`).
LogitProcessor = Callable[[jnp.ndarray, "DecodeState"], jnp.ndarray]


def make_flags_fetch():
    """Jitted packed post-chunk flag fetch shared by the continuous engines:
    one [3, B] int32 transfer (done, n_generated, stopped) instead of three
    device round trips."""
    return jax.jit(lambda st: jnp.stack(
        [st.done.astype(jnp.int32), st.n_generated,
         st.stopped.astype(jnp.int32)]))


def collect_partial_tokens(active: dict, n_gen, out, stop_token: int) -> dict:
    """Shared partial_tokens body: tokens-so-far per active request id."""
    res = {}
    for slot, (rid, _req, _t0) in active.items():
        toks = out[slot, : n_gen[slot]]
        res[rid] = toks[toks != stop_token].astype(np.int32)
    return res


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class T3Engine:
    """Batch/continuous T3 speech-token generation."""

    def __init__(
        self,
        config: Config,
        params: dict,
        *,
        logit_processor: Optional[LogitProcessor] = None,
        compute_dtype=jnp.bfloat16,
        mesh=None,
    ):
        self.config = config
        self.t3cfg: T3Config = config.t3
        self.compute_dtype = compute_dtype
        self.logit_processor = logit_processor
        self.mesh = mesh
        ecfg = config.engine
        self.max_len = ecfg.max_model_len
        self.B = ecfg.max_batch_size
        self.S = 2 * self.B
        self.max_out = ecfg.max_model_len
        # Pallas decode attention isn't GSPMD-partitionable — force XLA when
        # the engine is sharded over a mesh (see config.EngineConfig).
        self._attn_impl = "xla" if mesh is not None else ecfg.decode_attn
        self._attn_interpret = jax.default_backend() != "tpu"
        params = quantize_t3_params(params, ecfg.quant_mode)
        if mesh is not None:
            from ..parallel.sharding import shard_engine_params
            params = shard_engine_params(params, mesh)
        self.params = params
        cos, sin = make_rope_tables(self.t3cfg, self.max_len)
        self._rope = (cos, sin)
        prefill_kwargs = {}
        if mesh is not None:
            from ..parallel.sharding import decode_state_shardings
            prefill_kwargs["out_shardings"] = decode_state_shardings(mesh)
        self._decode_chunk = jax.jit(
            self._decode_chunk_impl,
            static_argnames=("num_steps", "cache_len"),
            donate_argnums=(1,),
        )
        self._decode_chunk_sliced = jax.jit(
            self._decode_chunk_sliced_impl,
            static_argnames=("num_steps", "cache_len", "bucket"),
            donate_argnums=(1,),
        )
        self._prefill = jax.jit(self._prefill_impl, **prefill_kwargs)

    # ------------------------------------------------------------------ #
    # jitted programs
    # ------------------------------------------------------------------ #

    def _prefill_impl(
        self,
        params,
        cond_emb,            # [B, 34, h]
        text_ids,            # [B, Tt]
        text_len,            # [B]
        sampling: SamplingState,
        cfg_scale,           # [B]
        inactive,            # [B] bool — padding rows of a short batch
        keys,                # [B] typed PRNG keys
    ) -> DecodeState:
        """Prefill the whole batch and assemble the initial DecodeState."""
        cfg = self.t3cfg
        B, S = self.B, self.S
        embeds, positions, prefill_len = build_prefill_embeds(
            params, cfg, cond_emb.astype(self.compute_dtype), text_ids, text_len
        )
        kv = KVCache.zeros(cfg, S, self.max_len, self._kv_dtype())
        hidden, kv = t3_prefill(
            params, cfg, embeds, positions, prefill_len, kv, *self._rope,
            layer_mode=self.config.engine.layer_mode,
        )
        last = hidden[jnp.arange(S), prefill_len - 1]            # [S, h]
        logits = cfg_combine(
            speech_logits(params, last, cfg.speech_vocab_size), cfg_scale)
        seen = jnp.zeros((B, cfg.speech_vocab_size), bool)
        use, keys = split_keys(keys)
        tok = sample(logits, sampling, seen, use)
        seen = seen.at[jnp.arange(B), tok].set(True)

        first_is_stop = tok == cfg.stop_speech_token
        done0 = inactive | first_is_stop
        return DecodeState(
            kv=kv,
            lengths=prefill_len,
            speech_pos=jnp.ones((B,), jnp.int32),
            last_token=tok,
            prev_tokens=jnp.full((B, 2), -1, jnp.int32),
            completed_at=jnp.full((B,), -1, jnp.int32),
            seen=seen,
            done=done0,
            stopped=~inactive & first_is_stop,
            n_generated=jnp.where(done0, 0, 1).astype(jnp.int32),
            out_tokens=jnp.zeros((B, self.max_out), jnp.int32)
            .at[:, 0].set(jnp.where(first_is_stop, 0, tok)),
            keys=keys,
        )

    def _decode_step(self, params, sampling: SamplingState, cfg_scale, max_new,
                     text_len, cache_len: int, state: DecodeState, _):
        cfg = self.t3cfg
        tokens_s = jnp.repeat(state.last_token, 2)
        pos_s = jnp.repeat(state.speech_pos, 2)
        embeds = build_decode_embeds(params, cfg, tokens_s, pos_s, self.compute_dtype)
        hidden, kv = t3_decode(
            params, cfg, embeds, state.kv, state.lengths, *self._rope,
            cache_len=cache_len,
            layer_mode=self.config.engine.layer_mode,
            attn_impl=self._attn_impl,
            attn_interpret=self._attn_interpret,
        )
        logits = cfg_combine(
            speech_logits(params, hidden, cfg.speech_vocab_size), cfg_scale)
        completed_at = state.completed_at
        if self.config.engine.enable_analyzer:
            logits, completed_at = alignment_analyzer_logits(
                logits, state, text_len, cfg.stop_speech_token)
        if self.logit_processor is not None:
            logits = self.logit_processor(logits, state)
        use, keys = split_keys(state.keys)
        tok = sample(logits, sampling, state.seen, use)

        active = ~state.done
        tok = jnp.where(active, tok, cfg.stop_speech_token)
        rows_b = jnp.arange(tok.shape[0])   # works on sliced sub-states too
        seen = state.seen.at[rows_b, tok].set(
            state.seen[rows_b, tok] | active
        )
        out = state.out_tokens.at[rows_b, state.n_generated].set(
            jnp.where(active, tok, state.out_tokens[rows_b, state.n_generated])
        )
        n_gen = state.n_generated + active.astype(jnp.int32)
        hit_stop = active & (tok == cfg.stop_speech_token)
        done = state.done | hit_stop | (n_gen >= max_new)
        lengths = state.lengths + jnp.repeat(active, 2).astype(jnp.int32)
        speech_pos = state.speech_pos + active.astype(jnp.int32)
        prev = jnp.where(active[:, None],
                         jnp.stack([state.prev_tokens[:, 1], state.last_token], axis=1),
                         state.prev_tokens)
        new_state = DecodeState(
            kv=kv, lengths=lengths, speech_pos=speech_pos, last_token=tok,
            prev_tokens=prev, completed_at=completed_at,
            seen=seen, done=done, stopped=state.stopped | hit_stop,
            n_generated=n_gen, out_tokens=out, keys=keys,
        )
        return new_state, None

    def _decode_chunk_impl(self, params, state: DecodeState,
                           sampling: SamplingState, cfg_scale, max_new,
                           text_len, num_steps: int, cache_len: int):
        step = functools.partial(self._decode_step, params, sampling, cfg_scale,
                                 max_new, text_len, cache_len)
        state, _ = jax.lax.scan(step, state, None, length=num_steps)
        return state

    def _decode_chunk_sliced_impl(self, params, state: DecodeState,
                                  sampling: SamplingState, cfg_scale, max_new,
                                  text_len, num_steps: int, cache_len: int,
                                  bucket: int):
        """Decode chunk over only the first `bucket` pair slots.

        The batch-1 latency bucket (VERDICT r3 weak #4): a lone request in a
        B=8 engine otherwise pays 16 device rows every step.  Slots are
        admitted lowest-first, so a small prefix bucket covers the common
        low-occupancy case; the slice in / write back costs two bucket-sized
        KV copies per CHUNK (amortised over decode_steps_per_dispatch steps).
        """
        b, s = bucket, 2 * bucket

        def take(x, n):
            return jax.lax.slice_in_dim(x, 0, n, axis=0)

        sub = DecodeState(
            kv=KVCache(jax.lax.slice_in_dim(state.kv.k, 0, s, axis=1),
                       jax.lax.slice_in_dim(state.kv.v, 0, s, axis=1)),
            lengths=take(state.lengths, s),
            speech_pos=take(state.speech_pos, b),
            last_token=take(state.last_token, b),
            prev_tokens=take(state.prev_tokens, b),
            completed_at=take(state.completed_at, b),
            seen=take(state.seen, b),
            done=take(state.done, b),
            stopped=take(state.stopped, b),
            n_generated=take(state.n_generated, b),
            out_tokens=take(state.out_tokens, b),
            keys=take(state.keys, b),
        )
        sub_sampling = SamplingState(*(take(a, b) for a in sampling))
        sub = self._decode_chunk_impl(
            params, sub, sub_sampling, take(cfg_scale, b), take(max_new, b),
            take(text_len, b), num_steps, cache_len)

        def put(full, part, extra_dims=0):
            return jax.lax.dynamic_update_slice(
                full, part, (0,) * (part.ndim))

        return DecodeState(
            kv=KVCache(
                jax.lax.dynamic_update_slice(
                    state.kv.k, sub.kv.k, (0, 0, 0, 0, 0)),
                jax.lax.dynamic_update_slice(
                    state.kv.v, sub.kv.v, (0, 0, 0, 0, 0))),
            lengths=put(state.lengths, sub.lengths),
            speech_pos=put(state.speech_pos, sub.speech_pos),
            last_token=put(state.last_token, sub.last_token),
            prev_tokens=put(state.prev_tokens, sub.prev_tokens),
            completed_at=put(state.completed_at, sub.completed_at),
            seen=put(state.seen, sub.seen),
            done=put(state.done, sub.done),
            stopped=put(state.stopped, sub.stopped),
            n_generated=put(state.n_generated, sub.n_generated),
            out_tokens=put(state.out_tokens, sub.out_tokens),
            keys=put(state.keys, sub.keys),
        )

    # ------------------------------------------------------------------ #
    # host API
    # ------------------------------------------------------------------ #

    def _bucket_len(self, n: int) -> int:
        cond = self.t3cfg.cond_seq_len
        for b in self.config.engine.prefill_buckets:
            # a bucket must leave room for cond + text + SOS + >=1 speech token
            if n <= b and cond + b + 2 <= self.max_len:
                return b
        raise ValueError(
            f"text length {n} does not fit any prefill bucket under "
            f"max_model_len={self.max_len} "
            f"(buckets {self.config.engine.prefill_buckets})"
        )

    def _cache_len(self, length_bound: int) -> int:
        return min(self.max_len, _round_up(length_bound, CACHE_LEN_BUCKET))

    def generate(
        self,
        requests: Sequence[T3Request],
        seed: int = 0,
    ) -> list[T3Result]:
        """Generate speech tokens for up to max_batch_size requests.

        Larger request lists are processed in batches (continuous slot-level
        admission lives in `scheduler.py` / `paged.py`).
        """
        results: list[T3Result] = []
        for i in range(0, len(requests), self.B):
            results.extend(self._generate_batch(requests[i : i + self.B], seed + i))
        return results

    def _generate_batch(self, requests: Sequence[T3Request], seed: int) -> list[T3Result]:
        t0 = time.time()
        cfg = self.t3cfg
        n = len(requests)
        B = self.B
        Tt = self._bucket_len(max(len(r.text_ids) for r in requests))

        text_ids = np.zeros((B, Tt), np.int32)
        text_len = np.zeros((B,), np.int32)
        cond = np.zeros((B, cfg.cond_seq_len, cfg.hidden_size), np.float32)
        cfg_scale = np.zeros((B,), np.float32)
        max_new = np.full((B,), 1, np.int32)
        seeds = np.arange(B, dtype=np.int64) + seed
        samp = dict(temperature=np.zeros(B, np.float32), top_p=np.ones(B, np.float32),
                    min_p=np.zeros(B, np.float32), repetition_penalty=np.ones(B, np.float32))
        for i, r in enumerate(requests):
            L = len(r.text_ids)
            text_ids[i, :L] = r.text_ids
            text_len[i] = L
            cond[i] = r.cond_emb
            cfg_scale[i] = r.sampling.cfg_scale
            budget = self.max_len - (cfg.cond_seq_len + L + 1) - 1
            max_new[i] = min(r.max_new_tokens, r.sampling.max_tokens, budget)
            if r.seed is not None:
                seeds[i] = r.seed
            samp["temperature"][i] = r.sampling.temperature
            samp["top_p"][i] = r.sampling.top_p
            samp["min_p"][i] = r.sampling.min_p
            samp["repetition_penalty"][i] = r.sampling.repetition_penalty

        sampling = SamplingState(**{k: jnp.asarray(v) for k, v in samp.items()})
        inactive = jnp.asarray(np.arange(B) >= n)

        state = self._prefill(
            self.params, jnp.asarray(cond), jnp.asarray(text_ids),
            jnp.asarray(text_len), sampling, jnp.asarray(cfg_scale),
            inactive, make_keys(seeds),
        )

        steps = self.config.engine.decode_steps_per_dispatch
        max_new_j = jnp.asarray(max_new)
        cfg_scale_j = jnp.asarray(cfg_scale)
        text_len_j = jnp.asarray(text_len)
        base = int(cfg.cond_seq_len + text_len.max() + 1)
        single = self.config.engine.cache_len_schedule == "single"
        final_cache = self._cache_len(base + int(max_new.max()) + 1)
        # occupancy bucket: a short batch decodes on a sliced prefix
        # sub-state instead of full max_batch_size shapes (requests fill
        # slots 0..n-1).  Mesh-sharded engines always run full-batch.
        bucket = None
        if self.mesh is None:
            for b in self.config.engine.pair_buckets:
                if n <= b < B:
                    bucket = b
                    break

        progress = 0
        while True:
            if bool(np.all(jax.device_get(state.done))):
                break
            cache_len = final_cache if single else \
                self._cache_len(base + progress + steps + 1)
            if bucket is not None:
                state = self._decode_chunk_sliced(
                    self.params, state, sampling, cfg_scale_j, max_new_j,
                    text_len_j, num_steps=steps, cache_len=cache_len,
                    bucket=bucket,
                )
            else:
                state = self._decode_chunk(
                    self.params, state, sampling, cfg_scale_j, max_new_j,
                    text_len_j, num_steps=steps, cache_len=cache_len,
                )
            progress += steps

        out = np.asarray(jax.device_get(state.out_tokens))
        n_gen = np.asarray(jax.device_get(state.n_generated))
        stopped = np.asarray(jax.device_get(state.stopped))
        dt = time.time() - t0

        results = []
        for i, r in enumerate(requests):
            toks = out[i, : n_gen[i]]
            by_stop = bool(stopped[i])
            toks = toks[toks != cfg.stop_speech_token]
            results.append(T3Result(
                tokens=toks.astype(np.int32),
                finished_by_stop=by_stop,
                request_id=r.request_id,
                t3_time_s=dt,
            ))
        return results

    def _kv_dtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(
            self.config.engine.kv_cache_dtype, jnp.bfloat16
        )
