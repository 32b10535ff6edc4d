"""Paged-KV continuous engine: pair-level block tables + Pallas paged attention.

The paged twin of `scheduler.ContinuousEngine` (dense slotted cache).  The KV
cache is a pool of fixed-size pages shared by all requests; the native C++
allocator (`chatterbox_vllm2_tpu/native`) owns the free list and per-pair
block tables, and pages are reserved *per decode chunk* — a request holds only
the pages its current length needs, so long max_model_len no longer costs
O(S * max_len) HBM (the reason vLLM exists; the reference consumes this as
PagedAttention, SURVEY.md §2.2).

Each CFG pair owns ONE block table row: a page stores the cond and uncond
streams side by side in its 128-lane rows (`ops/paged_attention.py` pair-lane
layout), since both streams of a pair always share a length.  If a
reservation fails (pool exhausted) the youngest active request is preempted —
its pages are released and it is re-queued for a fresh prefill — matching
vLLM's recompute-preemption policy.

Decode attention runs in the Pallas kernel (`ops/paged_attention.py`),
optionally over INT8 pages with per-(page, head, token) scales
(`kv_cache_dtype="int8"`), quantized on append inside the jitted step.  The
30 layers are a static Python loop; the stacked page pools are `pl.ANY`
kernel operands updated in place (donated through the decode chunk), so no
per-layer pool slices are ever materialized.

Mesh support: pairs shard over 'data', heads over 'model'.  Every op that
touches page ids (append scatter, prefill write, the kernel itself) runs
inside a `shard_map` island so page ids stay shard-local: the pool's page
axis is partitioned over 'data' and the host keeps one allocator per data
shard handing out local ids.  The rest of the decode step stays GSPMD like
the dense sharded engine.
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
    append_layer_to_pages,
    pack_pairs,
    paged_attention_pairs,
    quantize_pair_rows,
    unpack_pairs,
    write_prefill_to_pages,
)
from ..ops.quant_matmul import quant_einsum
from ..ops.rotary import apply_rope
from ..ops.sampling import SamplingState, make_keys, sample, split_keys
from .engine import (T3Request, T3Result, alignment_analyzer_logits,
                     collect_partial_tokens, make_flags_fetch)


class PagedKV(NamedTuple):
    """Stacked per-layer page pools.  k/v: [L, P, H, bs, 2D] pair-lane pages;
    scales [L, P, H, bs] f32 (present only for INT8 pages); tables: [B, NB]
    int32 page ids, one row per CFG pair (shard-local ids under a mesh)."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scales: Optional[jnp.ndarray]
    v_scales: Optional[jnp.ndarray]
    tables: jnp.ndarray


def _attend_and_append(q, k, v, paged: PagedKV, lengths, active, *,
                       layer: int, block_size: int, sm_scale: float,
                       interpret: bool):
    """Append the new token's K/V and attend over the paged cache for one
    layer.  q/k/v: [S, H, D] post-RoPE; active [B] routes done/preempted
    pairs' writes to the reserved trash page.  Returns ([S, H, D] f32, new
    pools).  All page-id indexing happens here (shard-local under a mesh)."""
    k_pages, v_pages, k_scl, v_scl = paged.k, paged.v, paged.k_scales, paged.v_scales
    k_pages, v_pages, k_scl, v_scl = append_layer_to_pages(
        k_pages, v_pages, k, v, layer, paged.tables, lengths,
        block_size=block_size, k_scales=k_scl, v_scales=v_scl, active=active)
    out = paged_attention_pairs(
        pack_pairs(q), k_pages, v_pages, paged.tables, lengths + 1,
        layer, block_size=block_size, sm_scale=sm_scale,
        k_scales=k_scl, v_scales=v_scl, interpret=interpret)
    return unpack_pairs(out), PagedKV(k_pages, v_pages, k_scl, v_scl,
                                      paged.tables)


def paged_backbone_decode(
    params: dict,
    cfg,
    x: jnp.ndarray,            # [S, hidden]
    paged: PagedKV,
    lengths: jnp.ndarray,      # [B] int32 — tokens already in cache per pair
    active: jnp.ndarray,       # [B] bool — False routes appends to the trash page
    rope_cos, rope_sin,
    *,
    block_size: int,
    interpret: bool = False,
    mesh: Optional[Mesh] = None,
    tail: Optional[tuple] = None,   # staged append: (tail_k, tail_v
                                    # [L, B, H, C, 2D], t, flushed [B])
) -> tuple:
    """One decode step over the paged cache.  Appends the new token's packed
    pair K/V to each pair's current page in place, then runs the Pallas
    paged-attention kernel against the full stacked pool.  The per-pair page
    loop inside the kernel is length-adaptive, so there is no nb_active
    bucketing (and no recompiles as the batch lengthens)."""
    S, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    pos = jnp.repeat(lengths, 2)[:, None]                    # [S, 1]

    attend = _attend_and_append
    if mesh is not None:
        from jax import shard_map
        pool_spec = P(None, "data", "model", None, None)
        scl_spec = P(None, "data", "model", None)
        kv_specs = PagedKV(
            pool_spec, pool_spec,
            None if paged.k_scales is None else scl_spec,
            None if paged.v_scales is None else scl_spec,
            P("data", None))

        def attend(q, k, v, paged, lengths, active, **kw):
            fn = functools.partial(_attend_and_append, **kw)
            return shard_map(
                fn, mesh=mesh,
                in_specs=(P("data", "model", None),) * 3
                + (kv_specs, P("data"), P("data")),
                out_specs=(P("data", "model", None), kv_specs),
                check_vma=False,
            )(q, k, v, paged, lengths, active)

    if tail is not None:
        tail_k, tail_v, t, flushed = tail

        def attend_staged(q, k, v, paged, lengths, tail_k, tail_v,
                          flushed, **kw):
            fn = functools.partial(_attend_staged, **kw)
            if mesh is None:
                return fn(q, k, v, paged, lengths, tail_k, tail_v, flushed, t)
            from jax import shard_map
            pool_spec = P(None, "data", "model", None, None)
            scl_spec = P(None, "data", "model", None)
            kv_specs = PagedKV(
                pool_spec, pool_spec,
                None if paged.k_scales is None else scl_spec,
                None if paged.v_scales is None else scl_spec,
                P("data", None))
            tl = P(None, "data", "model", None, None)
            return shard_map(
                fn, mesh=mesh,
                in_specs=(P("data", "model", None),) * 3
                + (kv_specs, P("data"), tl, tl, P("data"), P()),
                out_specs=(P("data", "model", None), tl, tl),
                check_vma=False,
            )(q, k, v, paged, lengths, tail_k, tail_v, flushed, t)

    for l in range(cfg.num_layers):
        lp = _layer_params(params, l)
        resid = x
        y = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, y, cfg)                           # [S, nh, hd]
        q = apply_rope(q[:, None], rope_cos, rope_sin, pos)[:, 0]
        k = apply_rope(k[:, None], rope_cos, rope_sin, pos)[:, 0]
        if tail is None:
            out, paged = attend(
                q, k, v, paged, lengths, active, layer=l,
                block_size=block_size, sm_scale=hd ** -0.5,
                interpret=interpret)
        else:
            out, tail_k, tail_v = attend_staged(
                q, k, v, paged, lengths, tail_k, tail_v, flushed,
                layer=l, block_size=block_size, sm_scale=hd ** -0.5,
                interpret=interpret)
        out = out.reshape(S, nh * hd).astype(x.dtype)
        x = resid + quant_einsum(out, lp["o_proj"])

        resid = x
        y = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps)
        x = resid + _mlp(lp, y)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if tail is not None:
        return x, paged, tail_k, tail_v
    return x, paged


def _attend_staged(q, k, v, paged: PagedKV, lengths, tail_k, tail_v,
                   flushed, t, *, layer: int, block_size: int,
                   sm_scale: float, interpret: bool):
    """Staged-append per-layer attention: write this step's packed pair K/V
    into the chunk tail at index t (one scalar-indexed DUS — no per-pair
    scatter), then attend over pages (flushed tokens) + tail (the rest).
    Pools are read-only here; the tail flushes to pages once per chunk."""
    kp = pack_pairs(k).astype(tail_k.dtype)
    vp = pack_pairs(v).astype(tail_v.dtype)
    tail_k = jax.lax.dynamic_update_slice(
        tail_k, kp[None, :, :, None, :], (layer, 0, 0, t, 0))
    tail_v = jax.lax.dynamic_update_slice(
        tail_v, vp[None, :, :, None, :], (layer, 0, 0, t, 0))
    out = paged_attention_pairs(
        pack_pairs(q), paged.k, paged.v, paged.tables, lengths + 1,
        layer, block_size=block_size, sm_scale=sm_scale,
        k_scales=paged.k_scales, v_scales=paged.v_scales,
        flushed=flushed, tail_k=tail_k, tail_v=tail_v,
        interpret=interpret)
    return unpack_pairs(out), tail_k, tail_v


def _flush_tail(paged: PagedKV, tail_k, tail_v, flushed, active, *,
                block_size):
    """Scatter a whole chunk's tail into pages (once per decode chunk).
    Inactive pairs' rows route to the trash page (stale tables); pairs
    active at chunk end appended every step, so all C rows are valid.
    With advanced indices separated by a slice, the index axis moves to
    the FRONT of the updated window, so rows are laid out [B*C, L, H, .]."""
    L, B, H, C, D2 = tail_k.shape
    bs = block_size
    NB = paged.tables.shape[1]
    pos = flushed[:, None] + jnp.arange(C)[None, :]          # [B, C]
    page = jnp.take_along_axis(paged.tables,
                               jnp.minimum(pos // bs, NB - 1), axis=1)
    page = jnp.where(active[:, None], page, paged.k.shape[1] - 1)
    off = pos % bs
    pf = page.reshape(-1)                                    # [B*C]
    of = off.reshape(-1)
    kv_rows = lambda x: x.transpose(1, 3, 0, 2, 4).reshape(B * C, L, H, D2)
    kr, vr = kv_rows(tail_k), kv_rows(tail_v)
    k_pages, v_pages = paged.k, paged.v
    k_scl, v_scl = paged.k_scales, paged.v_scales
    if k_scl is not None:
        k_q, k_s = quantize_pair_rows(kr)
        v_q, v_s = quantize_pair_rows(vr)
        k_pages = k_pages.at[:, pf, :, of, :].set(k_q, mode="drop")
        v_pages = v_pages.at[:, pf, :, of, :].set(v_q, mode="drop")
        k_scl = k_scl.at[:, pf, :, of].set(k_s, mode="drop")
        v_scl = v_scl.at[:, pf, :, of].set(v_s, mode="drop")
    else:
        k_pages = k_pages.at[:, pf, :, of, :].set(
            kr.astype(k_pages.dtype), mode="drop")
        v_pages = v_pages.at[:, pf, :, of, :].set(
            vr.astype(v_pages.dtype), mode="drop")
    return PagedKV(k_pages, v_pages, k_scl, v_scl, paged.tables)


def _write_prefill_sharded(paged_k, paged_v, k_scl, v_scl, k_new, v_new,
                           pair_tables, owner_shard, *, block_size):
    """Shard-local prefill page write: only the data shard owning the slot
    scatters (others redirect the write to out-of-range pages with
    mode='drop' semantics via an invalid table)."""
    me = jax.lax.axis_index("data")
    tables = jnp.where(owner_shard == me, pair_tables,
                       jnp.full_like(pair_tables, paged_k.shape[1]))
    # out-of-range page ids: use explicit drop mode in the scatter
    return write_prefill_to_pages(
        paged_k, paged_v, k_new, v_new, tables, block_size=block_size,
        k_scales=k_scl, v_scales=v_scl)


class PagedDecodeState(NamedTuple):
    paged: PagedKV
    lengths: jnp.ndarray        # [B] — per CFG pair
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


def _state_specs(quantized: bool) -> PagedDecodeState:
    """PartitionSpec pytree for the mesh-sharded paged decode state: pairs
    over 'data', heads over 'model', page axis over 'data' (each data shard
    owns a private sub-pool; ids in `tables` are shard-local)."""
    pool = P(None, "data", "model", None, None)
    scl = P(None, "data", "model", None) if quantized else None
    return PagedDecodeState(
        paged=PagedKV(pool, pool, scl, scl, P("data", None)),
        lengths=P("data"),
        speech_pos=P("data"),
        last_token=P("data"),
        prev_tokens=P("data", None),
        completed_at=P("data"),
        seen=P("data", None),
        done=P("data"),
        stopped=P("data"),
        n_generated=P("data"),
        out_tokens=P("data", None),
        keys=P("data", None),
    )


class PagedContinuousEngine:
    """Continuous batching over the paged cache.  Same host API as
    `ContinuousEngine` (submit/step/run)."""

    def __init__(self, config: Config, params: dict,
                 compute_dtype=jnp.bfloat16, *, num_pages: Optional[int] = None,
                 interpret: Optional[bool] = None, logit_processor=None,
                 mesh: Optional[Mesh] = None):
        from ..native import make_block_allocator
        from ..ops.quant_matmul import quantize_t3_params

        self.config = config
        self.t3cfg = config.t3
        self.compute_dtype = compute_dtype
        self.logit_processor = logit_processor
        self.mesh = mesh
        ecfg = config.engine
        self.B = ecfg.max_batch_size
        self.S = 2 * self.B
        self.max_len = ecfg.max_model_len
        self.max_out = ecfg.max_model_len
        self.bs = ecfg.kv_block_size
        self.NB = -(-self.max_len // self.bs)
        self.quantized = ecfg.kv_cache_dtype == "int8"
        self.n_shards = 1 if mesh is None else mesh.shape["data"]
        if self.B % self.n_shards:
            raise ValueError(
                f"max_batch_size {self.B} not divisible by data shards "
                f"{self.n_shards}")
        self.B_local = self.B // self.n_shards
        if mesh is not None and (
                self.t3cfg.num_heads % mesh.shape["model"]
                or self.t3cfg.num_kv_heads % mesh.shape["model"]):
            raise ValueError(
                "num_heads and num_kv_heads must divide the 'model' axis "
                "(the page pools shard over kv heads)")
        total = num_pages or self._size_pool()
        self.P_local = max(total // self.n_shards, 3)   # >= 2 usable + trash
        self.P = self.P_local * self.n_shards
        self.interpret = (jax.default_backend() != "tpu"
                          if interpret is None else interpret)
        if ecfg.paged_append not in ("dus", "staged"):
            raise ValueError(
                f"paged_append must be 'dus' or 'staged', got "
                f"{ecfg.paged_append!r}")
        if self.quantized and not self.interpret and self.bs % 128:
            raise ValueError(
                "kv_cache_dtype='int8' needs kv_block_size % 128 == 0 on "
                "TPU: the per-page f32 scale rows [H, bs] must be lane-"
                "aligned for the kernel's DMA (Mosaic tiling constraint)")

        params = quantize_t3_params(params, ecfg.quant_mode)
        if mesh is not None:
            from ..parallel.sharding import shard_engine_params
            params = shard_engine_params(params, mesh)
        self.params = params

        # one allocator per data shard; table entries are shard-local ids.
        # The LAST local page (id P_local-1) is never allocated: it is the
        # write-off target for done/preempted pairs' per-step appends (a
        # released table row would otherwise clamp to page 0 and corrupt a
        # live request's first page).
        self.allocs = [make_block_allocator(self.P_local - 1, self.B_local,
                                            self.NB)
                       for _ in range(self.n_shards)]
        cos, sin = make_rope_tables(self.t3cfg, self.max_len)
        self._rope = (cos, sin)

        self._decode_chunk = jax.jit(
            self._decode_chunk_impl,
            static_argnames=("num_steps",), donate_argnums=(1,))
        # one packed [3, B] transfer per chunk instead of three device_gets
        # (each get is a host round trip; VERDICT r4 item 8)
        self._flags = make_flags_fetch()
        self._done_cache = np.ones((self.B,), bool)   # all slots free
        self._prefill_pair = jax.jit(self._prefill_pair_impl)
        self._admit = jax.jit(self._admit_impl, donate_argnums=(0, 1, 2, 3, 4))
        if mesh is None:
            self._set_tables = jax.jit(
                lambda st, t: st._replace(paged=st.paged._replace(tables=t)),
                donate_argnums=(0,))
        else:
            tspec = NamedSharding(mesh, P("data", None))
            self._set_tables = jax.jit(
                lambda st, t: st._replace(paged=st.paged._replace(
                    tables=jax.lax.with_sharding_constraint(t, tspec))),
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

    def _shard_of(self, slot: int) -> int:
        return slot // self.B_local

    def _local_row(self, slot: int) -> int:
        return slot % self.B_local

    def _full_table(self) -> np.ndarray:
        return np.concatenate([a.full_table() for a in self.allocs], axis=0)

    def _size_pool(self) -> int:
        """Size the page pool from live HBM stats (the analog of the
        reference sizing its KV cache from free VRAM, reference
        `tts.py:139-155`): weights are already resident at this point, so
        `bytes_limit - bytes_in_use` is the real budget.  Falls back to 75%
        of the dense-equivalent footprint when stats are unavailable
        (CPU/interpret runs).  A page holds both CFG streams of `bs` tokens
        across all layers."""
        cfg = self.t3cfg
        per_tok = cfg.num_layers * cfg.num_kv_heads * (2 * cfg.head_dim)
        page_bytes = 2 * per_tok * self.bs * (1 if self.quantized else 2)
        if self.quantized:   # + f32 scale per (layer, head, token) for k and v
            page_bytes += 2 * cfg.num_layers * cfg.num_kv_heads * self.bs * 4
        floor = max(2 * self.NB, 4)
        # dense-equivalent capacity + one reserved trash page per data shard
        cap = self.B * self.NB + self.n_shards
        util = float(os.environ.get("CHATTERBOX_HBM_UTILIZATION", 0.85))
        # a mesh splits every page over (data x model) devices, so the
        # whole mesh's HBM funds the pool, not one device's
        n_dev = 1 if self.mesh is None else int(np.prod(
            list(self.mesh.shape.values())))
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            budget = (stats["bytes_limit"] * util
                      - stats["bytes_in_use"]) * n_dev
            if budget <= 0:
                return floor
            return int(min(max(budget // page_bytes, floor), cap))
        except Exception:
            return max(cap * 3 // 4, floor)

    def _empty_state(self) -> PagedDecodeState:
        cfg, B = self.t3cfg, self.B
        H, D2 = cfg.num_kv_heads, 2 * cfg.head_dim
        L = cfg.num_layers

        def pages():
            return jnp.zeros((L, self.P, H, self.bs, D2), self._kv_dtype())

        def scales():
            return (jnp.zeros((L, self.P, H, self.bs), jnp.float32)
                    if self.quantized else None)

        state = PagedDecodeState(
            paged=PagedKV(pages(), pages(), scales(), scales(),
                          jnp.zeros((B, self.NB), jnp.int32)),
            lengths=jnp.zeros((B,), jnp.int32),
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
        if self.mesh is not None:
            specs = _state_specs(self.quantized)
            state = jax.tree.map(
                lambda x, s: jax.device_put(
                    x, NamedSharding(self.mesh, s)) if s is not None else x,
                state, specs,
                is_leaf=lambda x: x is None or not isinstance(
                    x, (PagedDecodeState, PagedKV)))
        return state

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
        install per-slot state.  new_k/new_v: [L, 2, H, T, D]; pair_tables:
        [1, NB] shard-local page ids."""
        paged = state.paged
        tables = jax.lax.dynamic_update_slice(paged.tables, pair_tables,
                                              (slot, 0))

        if self.mesh is None:
            k_pages, v_pages, k_scales, v_scales = write_prefill_to_pages(
                paged.k, paged.v, new_k, new_v, pair_tables,
                block_size=self.bs,
                k_scales=paged.k_scales, v_scales=paged.v_scales)
        else:
            from jax import shard_map
            pool = P(None, "data", "model", None, None)
            scl = P(None, "data", "model", None) if self.quantized else None
            owner = slot // self.B_local
            fn = functools.partial(_write_prefill_sharded, block_size=self.bs)
            k_pages, v_pages, k_scales, v_scales = shard_map(
                fn, mesh=self.mesh,
                in_specs=(pool, pool, scl, scl,
                          P(None, None, "model", None, None),
                          P(None, None, "model", None, None),
                          P(None, None), P()),
                out_specs=(pool, pool, scl, scl),
                check_vma=False,
            )(paged.k, paged.v, paged.k_scales, paged.v_scales,
              new_k, new_v, pair_tables, owner)

        first_is_stop = tok[0] == self.t3cfg.stop_speech_token
        state = state._replace(
            paged=PagedKV(k_pages, v_pages, k_scales, v_scales, tables),
            lengths=state.lengths.at[slot].set(prefill_len[0]),
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
                     state: PagedDecodeState, t, tails=None, flushed=None):
        """One decode step.  `tails=(tail_k, tail_v)` switches the append to
        staged mode (`paged_append="staged"`): the new K/V land in the chunk
        tail at scan index `t` and the pools stay read-only until the
        once-per-chunk flush in `_decode_chunk_impl`."""
        cfg = self.t3cfg
        tokens_s = jnp.repeat(state.last_token, 2)
        pos_s = jnp.repeat(state.speech_pos, 2)
        embeds = build_decode_embeds(params, cfg, tokens_s, pos_s,
                                     self.compute_dtype)
        if tails is None:
            hidden, paged = paged_backbone_decode(
                params, cfg, embeds, state.paged, state.lengths, ~state.done,
                *self._rope,
                block_size=self.bs, interpret=self.interpret, mesh=self.mesh)
        else:
            hidden, paged, tail_k, tail_v = paged_backbone_decode(
                params, cfg, embeds, state.paged, state.lengths, ~state.done,
                *self._rope,
                block_size=self.bs, interpret=self.interpret, mesh=self.mesh,
                tail=(tails[0], tails[1], t, flushed))
            tails = (tail_k, tail_v)
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
        lengths = state.lengths + active.astype(jnp.int32)
        speech_pos = state.speech_pos + active.astype(jnp.int32)
        prev = jnp.where(active[:, None],
                         jnp.stack([state.prev_tokens[:, 1], state.last_token],
                                   axis=1),
                         state.prev_tokens)
        new_state = PagedDecodeState(
            paged=paged, lengths=lengths, speech_pos=speech_pos,
            last_token=tok, prev_tokens=prev, completed_at=completed_at,
            seen=seen, done=done, stopped=state.stopped | hit_stop,
            n_generated=n_gen, out_tokens=out, keys=keys)
        return new_state, tails

    def _decode_chunk_impl(self, params, state, sampling, cfg_scale, max_new,
                           text_len, num_steps: int):
        step = functools.partial(self._decode_step, params, sampling,
                                 cfg_scale, max_new, text_len)
        if self.config.engine.paged_append != "staged":
            state, _ = jax.lax.scan(
                lambda st, _: (step(st, _)[0], None), state, None,
                length=num_steps)
            return state

        # Staged append: the chunk's new tokens accumulate in a dense tail
        # buffer (one scalar-indexed DUS per layer per step; the kernel reads
        # the tail as one extra masked attention block) and scatter into
        # pages ONCE here — replacing num_steps x B per-pair page DUS ops.
        cfg = self.t3cfg
        L, H, D2 = cfg.num_layers, cfg.num_kv_heads, 2 * cfg.head_dim
        flushed = state.lengths
        tail_k = jnp.zeros((L, self.B, H, num_steps, D2), jnp.bfloat16)
        tail_v = jnp.zeros_like(tail_k)
        if self.mesh is not None:
            tspec = NamedSharding(self.mesh,
                                  P(None, "data", "model", None, None))
            tail_k = jax.lax.with_sharding_constraint(tail_k, tspec)
            tail_v = jax.lax.with_sharding_constraint(tail_v, tspec)

        def staged_step(carry, t):
            st, tk, tv = carry
            st, (tk, tv) = step(st, t, tails=(tk, tv), flushed=flushed)
            return (st, tk, tv), None

        (state, tail_k, tail_v), _ = jax.lax.scan(
            staged_step, (state, tail_k, tail_v),
            jnp.arange(num_steps, dtype=jnp.int32))

        flush = functools.partial(_flush_tail, block_size=self.bs)
        if self.mesh is None:
            paged = flush(state.paged, tail_k, tail_v, flushed, ~state.done)
        else:
            from jax import shard_map
            pool = P(None, "data", "model", None, None)
            scl = P(None, "data", "model", None) if self.quantized else None
            kv_specs = PagedKV(pool, pool, scl, scl, P("data", None))
            tl = P(None, "data", "model", None, None)
            paged = shard_map(
                flush, mesh=self.mesh,
                in_specs=(kv_specs, tl, tl, P("data"), P("data")),
                out_specs=kv_specs, check_vma=False,
            )(state.paged, tail_k, tail_v, flushed, ~state.done)
        return state._replace(paged=paged)

    # ------------------------------------------------------------------ #
    # host scheduling (block reservation + preemption)
    # ------------------------------------------------------------------ #

    def submit(self, req: T3Request) -> str:
        rid = req.request_id or f"req-{next(self._ids)}"
        req.request_id = rid
        self._pending.append((rid, req))
        return rid

    def reset(self) -> None:
        """Drop all pending/active work, release every pair's pages, and
        rebuild the device state (serving-layer failure recovery)."""
        self._pending.clear()
        self._active.clear()
        self._results.clear()
        self._done_cache = np.ones((self.B,), bool)
        for alloc in self.allocs:
            for row in range(self.B_local):
                alloc.release(row)
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
        """Ensure every active pair has pages for `steps` more tokens.
        On pool exhaustion, preempt the youngest active request in the
        exhausted shard.  Returns True if the tables changed."""
        changed = False
        while True:
            blocked_shard = None
            for slot in list(self._active):
                need = -(-(int(lengths_host[slot]) + steps) // self.bs)
                need = min(need, self.NB)
                alloc = self.allocs[self._shard_of(slot)]
                row = self._local_row(slot)
                if alloc.seq_num_blocks(row) < need:
                    if not alloc.reserve(row, need):
                        blocked_shard = self._shard_of(slot)
                        break
                    changed = True
            if blocked_shard is None:
                return changed
            # preempt the youngest active request in that shard (vLLM
            # recompute policy)
            candidates = [s for s in self._active
                          if self._shard_of(s) == blocked_shard]
            victim = max(candidates, key=lambda s: self._active[s][2])
            rid, req, _ = self._active.pop(victim)
            self.allocs[blocked_shard].release(self._local_row(victim))
            self._pending.appendleft((rid, req))
            # mark slot done on device so it stops decoding
            self._state = self._state._replace(
                done=self._state.done.at[victim].set(True))
            self._done_cache[victim] = True
            changed = True

    # Burst-admission sub-batch sizes (one prefill dispatch per burst).
    ADMIT_BUCKETS = (1, 2, 4, 8)

    def _reserve_slot(self, slot: int, req: T3Request):
        """Reserve the pair's initial pages; returns the [1, NB] table row
        (shard-local ids) or None on pool exhaustion."""
        Tt = self._bucket_len(len(req.text_ids))
        T = self.t3cfg.cond_seq_len + Tt + 1
        nb0 = -(-T // self.bs)
        alloc = self.allocs[self._shard_of(slot)]
        row = self._local_row(slot)
        if not alloc.reserve(row, nb0):
            alloc.release(row)
            return None
        return np.maximum(alloc.table(row), 0)[None, :]

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

    def _slot_order(self):
        """Admission order: interleave data shards so concurrent requests
        spread across sub-pools."""
        return [g * self.B_local + r
                for r in range(self.B_local) for g in range(self.n_shards)]

    def step(self) -> list[T3Result]:
        before = set(self._results)
        done_host = self._done_cache.copy()
        batch = []
        for slot in self._slot_order():
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
                tables = np.maximum(self._full_table(), 0)
                self._state = self._set_tables(
                    self._state, jnp.asarray(tables))
            self._state = self._decode_chunk(
                self.params, self._state, self._sampling, self._cfg_scale,
                self._max_new, self._text_len, num_steps=steps)
            flags = np.asarray(jax.device_get(self._flags(self._state)))
            done_host = flags[0].astype(bool)
            n_gen = flags[1]
            stopped = flags[2].astype(bool)
            self._done_cache = done_host
            finished = [s for s in self._active if bool(done_host[s])]
            if finished:
                out_host = np.asarray(jax.device_get(self._state.out_tokens))
                for slot in finished:
                    rid, req, t0 = self._active.pop(slot)
                    self.allocs[self._shard_of(slot)].release(
                        self._local_row(slot))
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

    def partial_tokens(self) -> dict:
        """Tokens generated so far for ACTIVE requests, keyed by request id
        (token-chunk streaming consumers poll this between step() calls)."""
        if not self._active:
            return {}
        n_gen = np.asarray(jax.device_get(self._state.n_generated))
        out = np.asarray(jax.device_get(self._state.out_tokens))
        return collect_partial_tokens(self._active, n_gen, out,
                                      self.t3cfg.stop_speech_token)
