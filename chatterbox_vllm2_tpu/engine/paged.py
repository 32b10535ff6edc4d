"""Paged-KV continuous engine: block tables + Pallas paged attention.

The paged twin of `scheduler.ContinuousEngine` (dense slotted cache).  The
KV cache is a pool of fixed-size pages shared by all streams; the native C++
allocator (`chatterbox_vllm2_tpu/native`) owns the free list and per-stream
block tables, and pages are reserved *per decode chunk* — a stream holds only
the pages its current length needs, so long max_model_len no longer costs
O(S * max_len) HBM (the reason vLLM exists; reference consumes this as
PagedAttention, SURVEY.md §2.2).

If a reservation fails (pool exhausted) the youngest active request is
preempted — its pages are released and it is re-queued for a fresh prefill —
matching vLLM's recompute-preemption policy.

Decode attention runs in the Pallas kernel (`ops/paged_attention.py`),
optionally over INT8 pages with per-(token, head) scales
(`kv_cache_dtype="int8"`), quantized on append inside the jitted step.  The
30 layers are a static Python loop with the page pools updated in place
(stacked [L, P, H, bs, D], donated through the decode chunk) — a lax.scan
over layers would copy the whole pool through the scan buffers every step.
"""

from __future__ import annotations

import functools
import itertools
import os
import time
from collections import deque
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.t3.model import (
    KVCache,
    _layer_params,
    _mlp,
    _qkv,
    build_decode_embeds,
    build_prefill_embeds,
    cfg_combine,
    make_rope_tables,
    speech_logits,
    t3_prefill,
)
from ..ops.norm import rms_norm
from ..ops.paged_attention import (
    paged_attention_decode,
    quantize_kv,
    write_prefill_to_pages,
)
from ..ops.rotary import apply_rope
from ..ops.sampling import SamplingState, make_keys, sample, split_keys
from .engine import T3Request, T3Result, alignment_analyzer_logits


class PagedKV(NamedTuple):
    """Stacked per-layer page pools.  k/v: [L, P, H, bs, D]; scales
    [L, P, H, bs] f32 (present only for INT8 pages); tables: [S, NB] int32
    page ids."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scales: Optional[jnp.ndarray]
    v_scales: Optional[jnp.ndarray]
    tables: jnp.ndarray


def paged_backbone_decode(
    params: dict,
    cfg,
    x: jnp.ndarray,            # [S, hidden]
    paged: PagedKV,
    lengths: jnp.ndarray,      # [S] int32 — tokens already in cache
    rope_cos, rope_sin,
    *,
    block_size: int,
    nb_active: int | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, PagedKV]:
    """One decode step over the paged cache.  Appends the new token's K/V to
    each stream's current page in place, then runs the Pallas paged-attention
    kernel on that layer's pool.

    nb_active statically bounds the per-stream pages the kernel's grid
    iterates (the paged analog of the dense engine's cache_len bucket): with
    the full table the grid spins over every reserved-capacity page even when
    streams are short — at bench shapes that was ~3/4 wasted grid steps
    (VERDICT r3 weak #2)."""
    S, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    quantized = paged.k_scales is not None
    rows = jnp.arange(S)
    page = paged.tables[rows, lengths // block_size]             # [S]
    off = lengths % block_size
    pos = lengths[:, None]
    k_pools, v_pools = paged.k, paged.v
    k_scl, v_scl = paged.k_scales, paged.v_scales

    for l in range(cfg.num_layers):
        lp = _layer_params(params, l)
        resid = x
        y = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, y, cfg)                               # [S, nh, hd]
        q = apply_rope(q[:, None], rope_cos, rope_sin, pos)[:, 0]
        k = apply_rope(k[:, None], rope_cos, rope_sin, pos)[:, 0]

        if quantized:
            k_q, k_s = quantize_kv(k)
            v_q, v_s = quantize_kv(v)
            k_pools = k_pools.at[l, page, :, off, :].set(k_q)
            v_pools = v_pools.at[l, page, :, off, :].set(v_q)
            k_scl = k_scl.at[l, page, :, off].set(k_s)
            v_scl = v_scl.at[l, page, :, off].set(v_s)
        else:
            k_pools = k_pools.at[l, page, :, off, :].set(
                k.astype(k_pools.dtype))
            v_pools = v_pools.at[l, page, :, off, :].set(
                v.astype(v_pools.dtype))

        tables = (paged.tables if nb_active is None
                  else paged.tables[:, :nb_active])
        out = paged_attention_decode(
            q.astype(jnp.float32), k_pools[l], v_pools[l], tables,
            lengths + 1, block_size=block_size, sm_scale=hd ** -0.5,
            k_scales=None if not quantized else k_scl[l],
            v_scales=None if not quantized else v_scl[l],
            interpret=interpret)
        out = out.reshape(S, nh * hd).astype(x.dtype)
        from ..ops.quant_matmul import quant_einsum
        x = resid + quant_einsum(out, lp["o_proj"])

        resid = x
        y = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
        x = resid + _mlp(lp, y)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, PagedKV(k_pools, v_pools, k_scl, v_scl, paged.tables)


class PagedDecodeState(NamedTuple):
    paged: PagedKV
    lengths: jnp.ndarray        # [S]
    speech_pos: jnp.ndarray     # [B]
    last_token: jnp.ndarray     # [B]
    prev_tokens: jnp.ndarray    # [B, 2]
    completed_at: jnp.ndarray   # [B]
    seen: jnp.ndarray           # [B, V]
    done: jnp.ndarray           # [B]
    stopped: jnp.ndarray        # [B]
    n_generated: jnp.ndarray    # [B]
    out_tokens: jnp.ndarray     # [B, max_out]
    keys: jnp.ndarray           # [B, 2] raw uint32 PRNG keys


class PagedContinuousEngine:
    """Continuous batching over the paged cache.  Same host API as
    `ContinuousEngine` (submit/step/run)."""

    def __init__(self, config: Config, params: dict,
                 compute_dtype=jnp.bfloat16, *, num_pages: Optional[int] = None,
                 interpret: Optional[bool] = None, logit_processor=None):
        from ..native import make_block_allocator
        from ..ops.quant_matmul import quantize_t3_params

        self.config = config
        self.t3cfg = config.t3
        self.params = quantize_t3_params(params, config.engine.quant_mode)
        self.compute_dtype = compute_dtype
        self.logit_processor = logit_processor
        ecfg = config.engine
        self.B = ecfg.max_batch_size
        self.S = 2 * self.B
        self.max_len = ecfg.max_model_len
        self.max_out = ecfg.max_model_len
        self.bs = ecfg.kv_block_size
        self.NB = -(-self.max_len // self.bs)
        self.quantized = ecfg.kv_cache_dtype == "int8"
        self.P = num_pages or self._size_pool()
        self.interpret = (jax.default_backend() != "tpu"
                          if interpret is None else interpret)
        self.alloc = make_block_allocator(self.P, self.S, self.NB)
        cos, sin = make_rope_tables(self.t3cfg, self.max_len)
        self._rope = (cos, sin)

        self._decode_chunk = jax.jit(
            self._decode_chunk_impl,
            static_argnames=("num_steps", "nb_active"), donate_argnums=(1,))
        self._prefill_pair = jax.jit(self._prefill_pair_impl)
        self._admit = jax.jit(self._admit_impl, donate_argnums=(0, 1, 2, 3, 4))
        self._set_tables = jax.jit(
            lambda st, t: st._replace(paged=st.paged._replace(tables=t)),
            donate_argnums=(0,))

        self._state = self._empty_state()
        self._sampling = SamplingState.broadcast(self.B)
        self._cfg_scale = jnp.full((self.B,), 0.5, jnp.float32)
        self._max_new = jnp.ones((self.B,), jnp.int32)
        self._text_len = jnp.ones((self.B,), jnp.int32)

        self._pending = deque()
        self._active: dict[int, tuple[str, T3Request, float]] = {}
        self._results: dict[str, T3Result] = {}
        self._ids = itertools.count()
        self._seed = itertools.count(1)

    # ------------------------------------------------------------------ #

    def _kv_dtype(self):
        return jnp.int8 if self.quantized else jnp.bfloat16

    def _size_pool(self) -> int:
        """Size the page pool from live HBM stats (the analog of the
        reference sizing its KV cache from free VRAM, reference
        `tts.py:139-155`): weights are already resident at this point, so
        `bytes_limit - bytes_in_use` is the real budget.  Falls back to 75%
        of the dense-equivalent footprint when stats are unavailable
        (CPU/interpret runs)."""
        cfg = self.t3cfg
        per_tok = cfg.num_layers * cfg.num_kv_heads * cfg.head_dim
        page_bytes = 2 * per_tok * self.bs * (1 if self.quantized else 2)
        if self.quantized:   # + f32 scale per (layer, token, head) for k and v
            page_bytes += 2 * cfg.num_layers * cfg.num_kv_heads * self.bs * 4
        floor = max(2 * self.NB, 4)
        cap = self.S * self.NB                      # dense equivalent
        util = float(os.environ.get("CHATTERBOX_HBM_UTILIZATION", 0.85))
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            budget = stats["bytes_limit"] * util - stats["bytes_in_use"]
            if budget <= 0:
                return floor
            return int(min(max(budget // page_bytes, floor), cap))
        except Exception:
            return max(cap * 3 // 4, floor)

    def _empty_state(self) -> PagedDecodeState:
        cfg, B, S = self.t3cfg, self.B, self.S
        H, D = cfg.num_kv_heads, cfg.head_dim
        L = cfg.num_layers

        def pages():
            return jnp.zeros((L, self.P, H, self.bs, D), self._kv_dtype())

        def scales():
            return (jnp.zeros((L, self.P, H, self.bs), jnp.float32)
                    if self.quantized else None)

        return PagedDecodeState(
            paged=PagedKV(pages(), pages(), scales(), scales(),
                          jnp.zeros((S, self.NB), jnp.int32)),
            lengths=jnp.zeros((S,), jnp.int32),
            speech_pos=jnp.ones((B,), jnp.int32),
            last_token=jnp.zeros((B,), jnp.int32),
            prev_tokens=jnp.full((B, 2), -1, jnp.int32),
            completed_at=jnp.full((B,), -1, jnp.int32),
            seen=jnp.zeros((B, cfg.speech_vocab_size), bool),
            done=jnp.ones((B,), bool),
            stopped=jnp.zeros((B,), bool),
            n_generated=jnp.zeros((B,), jnp.int32),
            out_tokens=jnp.zeros((B, self.max_out), jnp.int32),
            keys=make_keys(np.zeros((B,), np.int64)),
        )

    # ------------------------------------------------------------------ #
    # jitted programs
    # ------------------------------------------------------------------ #

    def _prefill_pair_impl(self, params, cond_emb, text_ids, text_len,
                           sampling, cfg_scale, keys):
        """Identical math to the dense pair prefill (prefill never reads the
        cache — it IS the start of the sequence), returning n pairs' K/V for
        page scatter.  A burst of pending requests shares ONE prefill
        dispatch (padded to the admission bucket); per-pair slices feed the
        admit scatter."""
        cfg = self.t3cfg
        n = text_ids.shape[0]
        embeds, positions, prefill_len = build_prefill_embeds(
            params, cfg, cond_emb.astype(self.compute_dtype),
            text_ids, text_len)
        T = embeds.shape[1]
        kv = KVCache.zeros(cfg, 2 * n, T, jnp.bfloat16)
        hidden, kv = t3_prefill(
            params, cfg, embeds, positions, prefill_len, kv, *self._rope,
            layer_mode=self.config.engine.layer_mode)
        last = hidden[jnp.arange(2 * n), prefill_len - 1]
        logits = cfg_combine(
            speech_logits(params, last, cfg.speech_vocab_size), cfg_scale)
        seen = jnp.zeros((n, cfg.speech_vocab_size), bool)
        use, keys = split_keys(keys)
        tok = sample(logits, sampling, seen, use)
        seen = seen.at[jnp.arange(n), tok].set(True)
        return kv.k, kv.v, prefill_len, tok, seen, keys

    def _admit_impl(self, state: PagedDecodeState, sampling, cfg_scale,
                    max_new, text_len, slot, pair_tables,
                    new_k, new_v, prefill_len, tok, seen_row, keys_row,
                    req_sampling, req_cfg_scale, req_max_new, req_text_len):
        """Scatter the prefilled pair's K/V into its reserved pages and
        install per-slot state.  new_k/new_v: [L, 2, H, T, D]."""
        row = 2 * slot
        paged = state.paged
        # install the pair's block-table rows first so the scatter targets them
        tables = jax.lax.dynamic_update_slice(paged.tables, pair_tables, (row, 0))

        k_pages, v_pages, k_scales, v_scales = write_prefill_to_pages(
            paged.k, paged.v, new_k, new_v, pair_tables,
            block_size=self.bs,
            k_scales=paged.k_scales, v_scales=paged.v_scales)

        first_is_stop = tok[0] == self.t3cfg.stop_speech_token
        lengths = jax.lax.dynamic_update_slice(state.lengths, prefill_len, (row,))
        state = state._replace(
            paged=PagedKV(k_pages, v_pages, k_scales, v_scales, tables),
            lengths=lengths,
            speech_pos=state.speech_pos.at[slot].set(1),
            last_token=state.last_token.at[slot].set(tok[0]),
            prev_tokens=state.prev_tokens.at[slot].set(
                jnp.full((2,), -1, jnp.int32)),
            completed_at=state.completed_at.at[slot].set(-1),
            seen=jax.lax.dynamic_update_slice(state.seen, seen_row, (slot, 0)),
            done=state.done.at[slot].set(first_is_stop),
            stopped=state.stopped.at[slot].set(first_is_stop),
            n_generated=state.n_generated.at[slot].set(
                jnp.where(first_is_stop, 0, 1)),
            out_tokens=state.out_tokens.at[slot].set(
                jnp.zeros((self.max_out,), jnp.int32)
                .at[0].set(jnp.where(first_is_stop, 0, tok[0]))),
            keys=jax.lax.dynamic_update_slice(state.keys, keys_row, (slot, 0)),
        )
        sampling = SamplingState(
            *(arr.at[slot].set(new[0])
              for arr, new in zip(sampling, req_sampling)))
        return (state, sampling,
                cfg_scale.at[slot].set(req_cfg_scale[0]),
                max_new.at[slot].set(req_max_new[0]),
                text_len.at[slot].set(req_text_len[0]))

    def _decode_step(self, params, sampling, cfg_scale, max_new, text_len,
                     state: PagedDecodeState, _, *, nb_active: int):
        cfg = self.t3cfg
        tokens_s = jnp.repeat(state.last_token, 2)
        pos_s = jnp.repeat(state.speech_pos, 2)
        embeds = build_decode_embeds(params, cfg, tokens_s, pos_s,
                                     self.compute_dtype)
        hidden, paged = paged_backbone_decode(
            params, cfg, embeds, state.paged, state.lengths, *self._rope,
            block_size=self.bs, nb_active=nb_active,
            interpret=self.interpret)
        logits = cfg_combine(
            speech_logits(params, hidden, cfg.speech_vocab_size),
            cfg_scale)
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
        seen = state.seen.at[jnp.arange(self.B), tok].set(
            state.seen[jnp.arange(self.B), tok] | active)
        out = state.out_tokens.at[jnp.arange(self.B), state.n_generated].set(
            jnp.where(active, tok,
                      state.out_tokens[jnp.arange(self.B), state.n_generated]))
        n_gen = state.n_generated + active.astype(jnp.int32)
        hit_stop = active & (tok == cfg.stop_speech_token)
        done = state.done | hit_stop | (n_gen >= max_new)
        lengths = state.lengths + jnp.repeat(active, 2).astype(jnp.int32)
        speech_pos = state.speech_pos + active.astype(jnp.int32)
        prev = jnp.where(active[:, None],
                         jnp.stack([state.prev_tokens[:, 1], state.last_token],
                                   axis=1),
                         state.prev_tokens)
        return PagedDecodeState(
            paged=paged, lengths=lengths, speech_pos=speech_pos,
            last_token=tok, prev_tokens=prev, completed_at=completed_at,
            seen=seen, done=done, stopped=state.stopped | hit_stop,
            n_generated=n_gen, out_tokens=out, keys=keys), None

    def _decode_chunk_impl(self, params, state, sampling, cfg_scale, max_new,
                           text_len, num_steps: int, nb_active: int):
        step = functools.partial(self._decode_step, params, sampling,
                                 cfg_scale, max_new, text_len,
                                 nb_active=nb_active)
        state, _ = jax.lax.scan(step, state, None, length=num_steps)
        return state

    # ------------------------------------------------------------------ #
    # host scheduling (block reservation + preemption)
    # ------------------------------------------------------------------ #

    def submit(self, req: T3Request) -> str:
        rid = req.request_id or f"req-{next(self._ids)}"
        req.request_id = rid
        self._pending.append((rid, req))
        return rid

    def reset(self) -> None:
        """Drop all pending/active work, release every stream's pages, and
        rebuild the device state (serving-layer failure recovery; VERDICT r3
        weak #7)."""
        self._pending.clear()
        self._active.clear()
        self._results.clear()
        for row in range(self.S):
            self.alloc.release(row)
        self._state = self._empty_state()
        self._sampling = SamplingState.broadcast(self.B)
        self._cfg_scale = jnp.full((self.B,), 0.5, jnp.float32)
        self._max_new = jnp.ones((self.B,), jnp.int32)
        self._text_len = jnp.ones((self.B,), jnp.int32)

    @property
    def has_work(self) -> bool:
        return bool(self._pending or self._active)

    def _bucket_len(self, n: int) -> int:
        cond = self.t3cfg.cond_seq_len
        for b in self.config.engine.prefill_buckets:
            if n <= b and cond + b + 2 <= self.max_len:
                return b
        raise ValueError(
            f"text length {n} does not fit any prefill bucket under "
            f"max_model_len={self.max_len}")

    def _reserve_for_chunk(self, lengths_host: np.ndarray, steps: int) -> bool:
        """Ensure every active stream has pages for `steps` more tokens.
        On pool exhaustion, preempt the youngest active request.  Returns True
        if the tables changed (device copy needed)."""
        changed = False
        while True:
            ok = True
            for slot in list(self._active):
                need = -(-(int(lengths_host[2 * slot]) + steps) // self.bs)
                need = min(need, self.NB)
                for row in (2 * slot, 2 * slot + 1):
                    if self.alloc.seq_num_blocks(row) < need:
                        if not self.alloc.reserve(row, need):
                            ok = False
                            break
                        changed = True
                if not ok:
                    break
            if ok:
                return changed
            # preempt the youngest active request (vLLM recompute policy)
            victim = max(self._active, key=lambda s: self._active[s][2])
            rid, req, _ = self._active.pop(victim)
            for row in (2 * victim, 2 * victim + 1):
                self.alloc.release(row)
            self._pending.appendleft((rid, req))
            # mark slot done on device so it stops decoding
            self._state = self._state._replace(
                done=self._state.done.at[victim].set(True))
            changed = True

    # Burst-admission sub-batch sizes (one prefill dispatch per burst; the
    # paged analog of ContinuousEngine.ADMIT_BUCKETS).
    ADMIT_BUCKETS = (1, 2, 4, 8)

    def _reserve_slot(self, slot: int, req: T3Request):
        """Reserve the pair's initial pages; returns the [2, NB] table rows
        or None on pool exhaustion."""
        Tt = self._bucket_len(len(req.text_ids))
        T = self.t3cfg.cond_seq_len + Tt + 1
        nb0 = -(-T // self.bs)
        rows = (2 * slot, 2 * slot + 1)
        for row in rows:
            if not self.alloc.reserve(row, nb0):
                for r in rows:
                    self.alloc.release(r)
                return None
        return np.stack([np.maximum(self.alloc.table(r), 0) for r in rows])

    def _admit_one(self, slot: int, rid: str, req: T3Request) -> bool:
        pair_tables = self._reserve_slot(slot, req)
        if pair_tables is None:
            return False
        self._admit_chunk(self._bucket_len(len(req.text_ids)),
                          [(slot, rid, req, pair_tables)])
        return True

    def _admit_chunk(self, Tt: int, chunk: list) -> None:
        """Prefill + admit same-text-bucket reserved requests in one padded
        prefill dispatch; page scatters consume per-pair slices."""
        cfg = self.t3cfg
        T = cfg.cond_seq_len + Tt + 1
        n = next(b for b in self.ADMIT_BUCKETS if len(chunk) <= b)
        text_ids = np.zeros((n, Tt), np.int32)
        text_len = np.ones((n,), np.int32)
        cond = np.zeros((n, cfg.cond_seq_len, cfg.hidden_size), np.float32)
        cfg_scale = np.full((n,), 0.5, np.float32)
        seeds = np.zeros((n,), np.int64)
        samp = dict(temperature=np.full(n, 1.0, np.float32),
                    top_p=np.ones(n, np.float32),
                    min_p=np.zeros(n, np.float32),
                    repetition_penalty=np.ones(n, np.float32))
        for r, (slot, rid, req, _) in enumerate(chunk):
            L = len(req.text_ids)
            text_ids[r, :L] = req.text_ids
            text_len[r] = L
            cond[r] = req.cond_emb
            cfg_scale[r] = req.sampling.cfg_scale
            seeds[r] = req.seed if req.seed is not None else next(self._seed)
            samp["temperature"][r] = req.sampling.temperature
            samp["top_p"][r] = req.sampling.top_p
            samp["min_p"][r] = req.sampling.min_p
            samp["repetition_penalty"][r] = req.sampling.repetition_penalty
        sampling = SamplingState(**{k: jnp.asarray(v) for k, v in samp.items()})
        kv_k, kv_v, prefill_len, tok, seen, keys = self._prefill_pair(
            self.params, jnp.asarray(cond), jnp.asarray(text_ids),
            jnp.asarray(text_len), sampling, jnp.asarray(cfg_scale),
            make_keys(seeds))
        for r, (slot, rid, req, pair_tables) in enumerate(chunk):
            L = len(req.text_ids)
            req_sampling = SamplingState(*(a[r:r + 1] for a in sampling))
            (self._state, self._sampling, self._cfg_scale, self._max_new,
             self._text_len) = self._admit(
                self._state, self._sampling, self._cfg_scale, self._max_new,
                self._text_len, jnp.asarray(slot, jnp.int32),
                jnp.asarray(pair_tables),
                kv_k[:, 2 * r: 2 * r + 2], kv_v[:, 2 * r: 2 * r + 2],
                prefill_len[2 * r: 2 * r + 2], tok[r:r + 1], seen[r:r + 1],
                keys[r:r + 1],
                req_sampling,
                jnp.asarray([req.sampling.cfg_scale], jnp.float32),
                jnp.asarray([min(req.max_new_tokens, req.sampling.max_tokens,
                                 self.max_len - T - 1)], jnp.int32),
                jnp.asarray([L], jnp.int32))
            self._active[slot] = (rid, req, time.time())

    def step(self) -> list[T3Result]:
        before = set(self._results)
        done_host = np.array(jax.device_get(self._state.done))
        batch = []
        for slot in range(self.B):
            if not self._pending:
                break
            if bool(done_host[slot]) and slot not in self._active:
                rid, req = self._pending.popleft()
                pair_tables = self._reserve_slot(slot, req)
                if pair_tables is None:       # pool exhausted: stop admitting
                    self._pending.appendleft((rid, req))
                    break
                batch.append((slot, rid, req, pair_tables))
                done_host[slot] = False
        groups: dict[int, list] = {}
        for entry in batch:
            groups.setdefault(self._bucket_len(len(entry[2].text_ids)),
                              []).append(entry)
        for Tt, grp in groups.items():
            for j in range(0, len(grp), self.ADMIT_BUCKETS[-1]):
                self._admit_chunk(Tt, grp[j:j + self.ADMIT_BUCKETS[-1]])

        if self._active:
            steps = self.config.engine.decode_steps_per_dispatch
            lengths_host = np.asarray(jax.device_get(self._state.lengths))
            if self._reserve_for_chunk(lengths_host, steps):
                tables = np.maximum(self.alloc.full_table(), 0)
                self._state = self._set_tables(
                    self._state, jnp.asarray(tables))
            # static page bound for the kernel grid, in 128-token steps
            # (the paged analog of the dense cache_len bucket)
            active_rows = [r for s in self._active for r in (2 * s, 2 * s + 1)]
            bound = int(lengths_host[active_rows].max()) + steps + 1
            bound = -(-bound // 128) * 128
            nb_active = min(self.NB, -(-bound // self.bs))
            self._state = self._decode_chunk(
                self.params, self._state, self._sampling, self._cfg_scale,
                self._max_new, self._text_len, num_steps=steps,
                nb_active=nb_active)
            done_host = np.asarray(jax.device_get(self._state.done))
            n_gen = np.asarray(jax.device_get(self._state.n_generated))
            stopped = np.asarray(jax.device_get(self._state.stopped))
            finished = [s for s in self._active if bool(done_host[s])]
            if finished:
                out_host = np.asarray(jax.device_get(self._state.out_tokens))
                for slot in finished:
                    rid, req, t0 = self._active.pop(slot)
                    for row in (2 * slot, 2 * slot + 1):
                        self.alloc.release(row)
                    n = int(n_gen[slot])
                    toks = out_host[slot, :n]
                    toks = toks[toks != self.t3cfg.stop_speech_token]
                    self._results[rid] = T3Result(
                        tokens=toks.astype(np.int32),
                        finished_by_stop=bool(stopped[slot]),
                        request_id=rid, t3_time_s=time.time() - t0)

        return [self._results[r] for r in self._results if r not in before]

    def run(self, requests, timeout_s: float = 600.0) -> list[T3Result]:
        rids = [self.submit(r) for r in requests]
        t0 = time.time()
        while self.has_work:
            self.step()
            if time.time() - t0 > timeout_s:
                raise TimeoutError("paged engine did not drain")
        return [self._results.pop(r) for r in rids]

    def generate(self, requests, seed: int = 0) -> list[T3Result]:
        """Batch-API adapter matching `T3Engine.generate` (bench / tests)."""
        for i, r in enumerate(requests):
            if r.seed is None:
                r.seed = seed + i
        return self.run(requests)
