"""Pallas paged attention for the T3 decode step (pair-lane layout).

TPU-native replacement for vLLM's CUDA `paged_attention_v1/v2` +
`reshape_and_cache` kernels (consumed implicitly by the reference, SURVEY.md
§2.2).  Three structural choices distinguish this from a generic port:

  * **CFG pairs ride the lane dimension.**  Every request is a cond/uncond
    stream pair with identical lengths, so a page stores both streams side by
    side: `[H, block_size, 2*head_dim]` with lanes 0:D = cond K/V and D:2D =
    uncond.  With head_dim 64 this makes every DMA a full 128-lane row (the
    D=64-minor layout measured at a fraction of spec bandwidth,
    BENCH_NOTES.md), halves the number of block tables/lengths to track, and
    keeps the head axis contiguous for 'model'-axis sharding.

  * **The stacked per-layer pool is one `pl.ANY` operand.**  Pallas operands
    with blocked BlockSpecs must be materialized buffers, so the previous
    kernel's per-layer `pool[l]` slices forced XLA to copy ~tens of MB per
    layer per step.  Here the whole `[L*P, H, bs, 2D]` pool stays in HBM and
    the kernel DMAs exactly the pages it needs (`layer` rides in as a scalar
    so one Mosaic kernel serves all 30 layers).

  * **One grid step per pair** with an inner length-adaptive page loop,
    double-buffered manual DMA, and cross-step prefetch (the pipelining
    pattern of jax.experimental's TPU paged-attention kernel).  At bench
    shapes this is 16 grid steps per layer instead of the previous
    (streams x pages) = 192, and trailing-page work vanishes entirely
    because the loop bound is `ceil(length / bs)` per pair.

Pages are optionally INT8 with one f32 scale per (page, head, token) row
covering both streams' lanes (quantize-on-append; the INT8-KV design from
BASELINE.md).  Block tables are produced by the native C++ allocator
(`chatterbox_vllm2_tpu/native`), one row per CFG pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------- #
# Pair-lane packing helpers
# --------------------------------------------------------------------------- #


def pack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """[S=2B, ..., H, D] (rows 2b = cond, 2b+1 = uncond) -> [B, ..., H, 2D]."""
    S = x.shape[0]
    H, D = x.shape[-2], x.shape[-1]
    mid = x.shape[1:-2]
    x = x.reshape((S // 2, 2) + mid + (H, D))
    x = jnp.moveaxis(x, 1, -2)                       # [B, ..., H, 2, D]
    return x.reshape((S // 2,) + mid + (H, 2 * D))


def unpack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """[B, ..., H, 2D] -> [S=2B, ..., H, D]."""
    B = x.shape[0]
    H, D2 = x.shape[-2], x.shape[-1]
    mid = x.shape[1:-2]
    x = x.reshape((B,) + mid + (H, 2, D2 // 2))
    x = jnp.moveaxis(x, -2, 1)                       # [B, 2, ..., H, D]
    return x.reshape((2 * B,) + mid + (H, D2 // 2))


def quantize_pair_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 per-row quantization over the packed 2D lane axis.
    x [..., 2D] -> (int8 [..., 2D], scales [...] f32).  One scale covers both
    streams' lanes of a (head, token) row — the cond/uncond K/V magnitudes at
    the same (layer, head, position) are near-identical, and a full 128-lane
    row is what the kernel dequantizes in one VPU op."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scl = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scl[..., None]), -127, 127).astype(jnp.int8)
    return q, scl


# --------------------------------------------------------------------------- #
# The kernel
# --------------------------------------------------------------------------- #


# DMA pipeline depth: page fetches in flight ahead of the compute position.
# Each inner iteration's compute is ~us-scale, far below the chip's DMA
# latency, so a single-chunk lookahead stalls every iteration; measured on
# the dev chip the kernel was ~1 us x (pairs x pages x layers) of DMA-wait
# bound before deepening.
PREFETCH_DEPTH = 3
# Pages fetched and scored per inner iteration.  Measured on the dev chip:
# 2 pages/iteration is SLOWER (5.19 vs 4.53 ms/step backbone at serving
# shapes) — the extra per-iteration DMA (including clamped duplicate tail
# copies for short pairs) outweighs the halved iteration count, so the
# per-iteration floor is not amortizable this way.  Kept parameterized with
# the measured-best value.
PAGES_PER_FETCH = 1


def _attn_kernel(
    # scalar prefetch (SMEM)
    lengths_ref,    # [B] int32 — valid tokens per pair (incl. appended token)
    tables_ref,     # [B*NB] int32 — flattened block tables (per-layer page ids)
    layer_ref,      # [1] int32
    buf_ref,        # [1] int32 — compute slot (mutable scalar state)
    init_ref,       # [1] int32 — 1 until the pipeline has been primed
    pf_ref,         # [2] int32 — (pair, page) of the last prefetched chunk
    flushed_ref,    # [B] int32 — tokens resident in PAGES (staged mode; the
                    # rest of `lengths` lives in the tail buffer) or None
    # inputs
    q_ref,          # [1, H, 2D] bf16 (VMEM block at pair b)
    k_hbm,          # [L*P, H, bs, 2D] (ANY)
    v_hbm,          # [L*P, H, bs, 2D] (ANY)
    k_scl_hbm,      # [L*P, H, bs] f32 (ANY) or None
    v_scl_hbm,
    kt_hbm,         # [L*B, H, C, 2D] bf16 tail (ANY; staged mode) or None
    vt_hbm,
    # output
    o_ref,          # [1, H, 2D] f32
    # scratch
    k_buf,          # [NBUF, H, bs, 2D] kv dtype
    v_buf,
    ks_buf,         # [NBUF, H, bs] f32 or None
    vs_buf,
    kt_buf,         # [H, C, 2D] bf16 or None (staged tail)
    vt_buf,
    sems,           # DMA sems [NBUF, 2] (slot, k/v)
    tsem,           # DMA sem for the tail or None
    m0, l0, m1, l1,  # [H, 1] f32 online-softmax state (cond / uncond)
    acc,            # [H, 2D] f32
    *,
    block_size: int,
    pages_per_layer: int,
    blocks_per_pair: int,
    scale: float,
):
    b = pl.program_id(0)
    B = pl.num_programs(0)
    NBUF = PREFETCH_DEPTH
    bs = block_size
    H, D2 = acc.shape
    D = D2 // 2
    length = lengths_ref[b]
    staged = kt_buf is not None
    paged_len = flushed_ref[b] if staged else length
    cs = bs * PAGES_PER_FETCH                 # tokens per fetched chunk
    nchunks = pl.cdiv(paged_len, cs)
    quantized = ks_buf is not None

    def pair_paged_len(bb):
        bb = jnp.minimum(bb, B - 1)
        return flushed_ref[bb] if staged else lengths_ref[bb]

    def copies(bb, i, slot):
        # one "chunk" = PAGES_PER_FETCH consecutive logical pages of pair bb
        # (physical pages are arbitrary: one copy per page, same semaphores);
        # the trailing page of an odd tail clamps to the last valid page and
        # its tokens are masked
        np_bb = pl.cdiv(pair_paged_len(bb), bs)
        out = []
        for p in range(PAGES_PER_FETCH):
            pg = jnp.minimum(i * PAGES_PER_FETCH + p,
                             jnp.maximum(np_bb - 1, 0))
            fp = (layer_ref[0] * pages_per_layer
                  + tables_ref[bb * blocks_per_pair + pg])
            out += [
                pltpu.make_async_copy(
                    k_hbm.at[fp], k_buf.at[slot, :, p * bs:(p + 1) * bs, :],
                    sems.at[slot, 0]),
                pltpu.make_async_copy(
                    v_hbm.at[fp], v_buf.at[slot, :, p * bs:(p + 1) * bs, :],
                    sems.at[slot, 1]),
            ]
            if quantized:
                out += [
                    pltpu.make_async_copy(
                        k_scl_hbm.at[fp], ks_buf.at[slot, :, p * bs:(p + 1) * bs],
                        sems.at[slot, 0]),
                    pltpu.make_async_copy(
                        v_scl_hbm.at[fp], vs_buf.at[slot, :, p * bs:(p + 1) * bs],
                        sems.at[slot, 1]),
                ]
        return out

    def start(bb, i, slot):
        for c in copies(bb, i, slot):
            c.start()

    def wait(slot):
        # source index is irrelevant to wait (byte counts only)
        for c in copies(0, 0, slot):
            c.wait()

    def first_active(s):
        """Smallest pair index >= s with nonzero PAGED tokens, else B."""
        return jax.lax.fori_loop(
            0, B,
            lambda _, cur: jnp.where(
                (cur < B) & (pair_paged_len(cur) == 0),
                cur + 1, cur),
            s)

    def advance(bb, ii):
        """Next (pair, chunk) in flat traversal order; (B, 0) past the end."""
        nc_b = pl.cdiv(pair_paged_len(bb), cs)
        return jax.lax.cond(
            (bb < B) & (ii + 1 < nc_b), lambda: (bb, ii + 1),
            lambda: (first_active(jnp.minimum(bb, B - 1) + 1), 0))

    def prefetch_next(slot_for_it):
        """Advance the prefetch frontier by one chunk into the given slot."""
        pb, pi = pf_ref[0], pf_ref[1]
        nb_, ni_ = advance(pb, pi)

        @pl.when(nb_ < B)
        def _():
            start(nb_, ni_, slot_for_it)
            pf_ref[0] = nb_
            pf_ref[1] = ni_

    @pl.when(nchunks == 0)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    def tail_copies():
        fl = layer_ref[0] * B + b
        return [pltpu.make_async_copy(kt_hbm.at[fl], kt_buf, tsem),
                pltpu.make_async_copy(vt_hbm.at[fl], vt_buf, tsem)]

    @pl.when(nchunks > 0)
    def _():
        m0[...] = jnp.full_like(m0, -1e30)
        m1[...] = jnp.full_like(m1, -1e30)
        l0[...] = jnp.zeros_like(l0)
        l1[...] = jnp.zeros_like(l1)
        acc[...] = jnp.zeros_like(acc)
        if staged:
            for c in tail_copies():
                c.start()

        @pl.when(init_ref[0] == 1)
        def _():
            # prime the pipeline with positions 0..NBUF-2 (slots 0..NBUF-2);
            # each body iteration then issues position f+NBUF-1 into the slot
            # retired at iteration f-1, so no slot is overwritten in flight
            start(b, 0, 0)
            pf_ref[0] = b
            pf_ref[1] = 0
            buf_ref[0] = 0
            for d in range(1, NBUF - 1):
                prefetch_next(d)
            init_ref[0] = 0

        lane = jax.lax.broadcasted_iota(jnp.int32, (H, D2), 1)
        q = q_ref[0]
        q0 = jnp.where(lane < D, q, jnp.zeros_like(q))      # cond lanes
        q1 = jnp.where(lane >= D, q, jnp.zeros_like(q))     # uncond lanes

        def rank3(x):
            # Mosaic can't shape-cast bf16 across ranks; hop through f32
            return x.astype(jnp.float32)[:, None, :].astype(jnp.bfloat16)

        def online(sc, m_ref_, l_ref_):
            m_prev, l_prev = m_ref_[...], l_ref_[...]
            m_cur = jnp.max(sc, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(sc - m_new)
            l_ref_[...] = l_prev * alpha + jnp.sum(p, axis=-1,
                                                   keepdims=True)
            m_ref_[...] = m_new
            return p, alpha

        def body(i, _):
            slot = buf_ref[0]
            # keep NBUF-1 chunks in flight ahead of the compute position
            prefetch_next((slot + NBUF - 1) % NBUF)
            wait(slot)
            buf_ref[0] = (slot + 1) % NBUF
            k = k_buf[slot]
            v = v_buf[slot]
            if quantized:
                k = k.astype(jnp.bfloat16) * ks_buf[slot][..., None].astype(
                    jnp.bfloat16)
                v = v.astype(jnp.bfloat16) * vs_buf[slot][..., None].astype(
                    jnp.bfloat16)

            # scores[h, t] = sum_d q[h, d] * k[h, t, d], per CFG half: the
            # other half's lanes are zeroed in q so they contribute nothing
            def scores(qh):
                s = jax.lax.dot_general(
                    rank3(qh), k,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )[:, 0, :] * scale                           # [H, bs]
                valid = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                         + i * cs) < paged_len
                return jnp.where(valid, s, -1e30)

            p0, a0 = online(scores(q0), m0, l0)
            p1, a1 = online(scores(q1), m1, l1)

            # pv[h, d] = sum_t p[h, t] * v[h, t, d]; lanes of the other half
            # are wrong (other stream's V times this half's p) and dropped by
            # the lane select below
            def pv(p):
                return jax.lax.dot_general(
                    rank3(p), v,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )[:, 0, :]                                   # [H, 2D]

            alpha_full = jnp.where(lane < D, a0, a1)
            acc[...] = acc[...] * alpha_full + jnp.where(lane < D, pv(p0),
                                                         pv(p1))
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)

        if staged:
            # this chunk's not-yet-flushed tokens (incl. the new one): one
            # masked online-softmax block from the tail buffer.  An empty
            # tail (done pairs) is safe: a fully-masked block leaves the
            # softmax state untouched (alpha == 1, p == 0).
            for c in tail_copies():
                c.wait()
            kt = kt_buf[...]
            vt = vt_buf[...]
            t_count = length - paged_len

            def t_scores(qh):
                sc = jax.lax.dot_general(
                    rank3(qh), kt,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )[:, 0, :] * scale
                valid = jax.lax.broadcasted_iota(
                    jnp.int32, sc.shape, 1) < t_count
                return jnp.where(valid, sc, -1e30)

            p0t, a0t = online(t_scores(q0), m0, l0)
            p1t, a1t = online(t_scores(q1), m1, l1)

            def t_pv(p):
                return jax.lax.dot_general(
                    rank3(p), vt,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )[:, 0, :]

            alpha_t = jnp.where(lane < D, a0t, a1t)
            acc[...] = acc[...] * alpha_t + jnp.where(lane < D, t_pv(p0t),
                                                      t_pv(p1t))

        l_full = jnp.where(lane < D, l0[...], l1[...])
        o_ref[0] = acc[...] / jnp.maximum(l_full, 1e-30)


def _make_kernel(quantized: bool, staged: bool, **static):
    """Positional-ref adapter over _attn_kernel for every (quantized,
    staged) operand/scratch combination."""

    def kern(lengths, tables, layer, buf, init, pf, flushed, *rest):
        it = iter(rest)
        q_ref = next(it)
        k_hbm = next(it)
        v_hbm = next(it)
        k_scl = next(it) if quantized else None
        v_scl = next(it) if quantized else None
        kt_hbm = next(it) if staged else None
        vt_hbm = next(it) if staged else None
        o_ref = next(it)
        k_buf = next(it)
        v_buf = next(it)
        ks_buf = next(it) if quantized else None
        vs_buf = next(it) if quantized else None
        kt_buf = next(it) if staged else None
        vt_buf = next(it) if staged else None
        sems = next(it)
        tsem = next(it) if staged else None
        m0, l0, m1, l1, acc = it
        _attn_kernel(lengths, tables, layer, buf, init, pf,
                     flushed if staged else lengths,
                     q_ref, k_hbm, v_hbm, k_scl, v_scl, kt_hbm, vt_hbm,
                     o_ref, k_buf, v_buf, ks_buf, vs_buf, kt_buf, vt_buf,
                     sems, tsem, m0, l0, m1, l1, acc, **static)

    return kern


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "sm_scale", "interpret"),
)
def paged_attention_pairs(
    q: jnp.ndarray,            # [B, H, 2D] — packed post-RoPE pair queries
    k_pages: jnp.ndarray,      # [L, P, H, bs, 2D]
    v_pages: jnp.ndarray,
    block_tables: jnp.ndarray, # [B, NB] int32
    lengths: jnp.ndarray,      # [B] int32 (valid tokens incl. the new one)
    layer,                     # int32 scalar (or python int)
    *,
    block_size: int,
    sm_scale: float,
    k_scales: jnp.ndarray | None = None,   # [L, P, H, bs] f32 for INT8 pages
    v_scales: jnp.ndarray | None = None,
    flushed: jnp.ndarray | None = None,    # [B] — staged mode: tokens in pages
    tail_k: jnp.ndarray | None = None,     # [L, B, H, C, 2D] bf16 chunk tail
    tail_v: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, H, 2D] f32 packed attention output for one layer.

    Staged mode (`flushed`/`tail_k`/`tail_v` given): pages hold `flushed[b]`
    tokens and the remaining `lengths[b] - flushed[b]` live in the per-pair
    tail buffer (this decode chunk's appends, flushed to pages once per
    chunk by the engine)."""
    B, H, D2 = q.shape
    L, P = k_pages.shape[:2]
    NB = block_tables.shape[1]
    quantized = k_scales is not None
    staged = tail_k is not None

    flat = lambda a: a.reshape((L * a.shape[1],) + a.shape[2:])
    kv_dtype = k_pages.dtype

    kernel = _make_kernel(
        quantized, staged,
        block_size=block_size, pages_per_layer=P, blocks_per_pair=NB,
        scale=sm_scale)

    in_specs = [
        pl.BlockSpec((1, H, D2), lambda b, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [q.astype(jnp.bfloat16), flat(k_pages), flat(v_pages)]
    NBUF = PREFETCH_DEPTH
    CW = block_size * PAGES_PER_FETCH          # chunk width (tokens)
    scratch = [
        pltpu.VMEM((NBUF, H, CW, D2), kv_dtype),
        pltpu.VMEM((NBUF, H, CW, D2), kv_dtype),
    ]
    if quantized:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY)]
        args += [flat(k_scales), flat(v_scales)]
        scratch += [pltpu.VMEM((NBUF, H, CW), jnp.float32),
                    pltpu.VMEM((NBUF, H, CW), jnp.float32)]
    if staged:
        C = tail_k.shape[3]
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY)]
        args += [flat(tail_k.astype(jnp.bfloat16)),
                 flat(tail_v.astype(jnp.bfloat16))]
        scratch += [pltpu.VMEM((H, C, D2), jnp.bfloat16),
                    pltpu.VMEM((H, C, D2), jnp.bfloat16)]
    sem_scratch = [pltpu.SemaphoreType.DMA((NBUF, 2))]
    if staged:
        sem_scratch += [pltpu.SemaphoreType.DMA(())]
    # scratch order must match _make_kernel: bufs, sems, softmax state
    scratch = scratch + sem_scratch + [
        pltpu.VMEM((H, 1), jnp.float32),   # m0
        pltpu.VMEM((H, 1), jnp.float32),   # l0
        pltpu.VMEM((H, 1), jnp.float32),   # m1
        pltpu.VMEM((H, 1), jnp.float32),   # l1
        pltpu.VMEM((H, D2), jnp.float32),  # acc
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, D2), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, D2), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lengths, block_tables.reshape(-1),
      jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
      jnp.zeros((2,), jnp.int32),
      lengths if flushed is None else flushed, *args)


# --------------------------------------------------------------------------- #
# Cache maintenance (the analog of vLLM's reshape_and_cache)
# --------------------------------------------------------------------------- #


def append_layer_to_pages(
    k_pages: jnp.ndarray,       # [L, P, H, bs, 2D]
    v_pages: jnp.ndarray,
    k_new: jnp.ndarray,         # [S=2B, H, D] — this layer's new-token K
    v_new: jnp.ndarray,
    layer: int,
    block_tables: jnp.ndarray,  # [B, NB]
    positions: jnp.ndarray,     # [B] int32 — token index being written
    *,
    block_size: int,
    k_scales: jnp.ndarray | None = None,   # [L, P, H, bs]
    v_scales: jnp.ndarray | None = None,
    active: jnp.ndarray | None = None,     # [B] bool
):
    """Write one new token's packed pair K/V into its page (in place on the
    donated pool).  With scale buffers present the pages are INT8.

    Uses one dynamic_update_slice per pair instead of a single batched
    scatter: XLA assigns scatters a transposed pool layout inside the decode
    loop and then inserts a FULL-POOL layout-conversion copy before every
    Pallas call (measured: 2x30 pool copies per step, ~100 ms at bench
    shapes).  DUS carries no layout preference, so the pool stays in the
    kernel's default layout.

    `active` [B] bool (optional): pairs that are done/preempted write to the
    pool's LAST page instead of their (stale or released-and-reused) table
    entry — the engine reserves that page as a write-off target, because a
    released row clamps to page 0 and would otherwise corrupt a live
    request's first page every step."""
    B = positions.shape[0]
    page = block_tables[jnp.arange(B), positions // block_size]   # [B]
    if active is not None:
        page = jnp.where(active, page, k_pages.shape[1] - 1)
    off = positions % block_size
    kp = pack_pairs(k_new)                                        # [B, H, 2D]
    vp = pack_pairs(v_new)

    def write(pool, rows):
        rows = rows.astype(pool.dtype)
        for b in range(B):
            pool = jax.lax.dynamic_update_slice(
                pool, rows[b][None, None, :, None, :],
                (layer, page[b], 0, off[b], 0))
        return pool

    def write_scl(scl, s):
        for b in range(B):
            scl = jax.lax.dynamic_update_slice(
                scl, s[b][None, None, :, None], (layer, page[b], 0, off[b]))
        return scl

    if k_scales is not None:
        k_q, k_s = quantize_pair_rows(kp)
        v_q, v_s = quantize_pair_rows(vp)
        return (write(k_pages, k_q), write(v_pages, v_q),
                write_scl(k_scales, k_s), write_scl(v_scales, v_s))

    return write(k_pages, kp), write(v_pages, vp), None, None


def write_prefill_to_pages(
    k_pages: jnp.ndarray,       # [L, P, H, bs, 2D]
    v_pages: jnp.ndarray,
    k_full: jnp.ndarray,        # [L, 2n, H, T, D] — prefilled pairs' K
    v_full: jnp.ndarray,
    pair_tables: jnp.ndarray,   # [n, NB]
    *,
    block_size: int,
    k_scales: jnp.ndarray | None = None,
    v_scales: jnp.ndarray | None = None,
):
    """Scatter whole prefilled pairs into pages in one update (padding tokens
    land in the reserved pages and are masked by `lengths` at read time).
    Page ids are layer-invariant, so the layer axis rides along whole."""
    L, S2, H, T, D = k_full.shape
    n = S2 // 2
    bs = block_size
    nb = -(-T // bs)
    pad = nb * bs - T
    pages = pair_tables[:, :nb].reshape(-1)                  # [n*nb]

    def to_blocks(x):
        # [L, 2n, H, T, D] -> [L, n*nb, H, bs, 2D]
        x = x.reshape(L, n, 2, H, T, D)
        x = jnp.moveaxis(x, 2, -2)                           # [L,n,H,T,2,D]
        x = x.reshape(L, n, H, T, 2 * D)
        x = jnp.pad(x, ((0, 0),) * 3 + ((0, pad), (0, 0)))
        x = x.reshape(L, n, H, nb, bs, 2 * D)
        x = x.transpose(0, 1, 3, 2, 4, 5)                    # [L,n,nb,H,bs,2D]
        return x.reshape(L, n * nb, H, bs, 2 * D)

    kb, vb = to_blocks(k_full), to_blocks(v_full)
    # mode="drop": out-of-range page ids are discarded, which lets a mesh
    # shard skip writes for pairs it does not own (engine/paged.py)
    if k_scales is not None:
        k_q, k_s = quantize_pair_rows(kb)
        v_q, v_s = quantize_pair_rows(vb)
        k_pages = k_pages.at[:, pages].set(k_q, mode="drop")
        v_pages = v_pages.at[:, pages].set(v_q, mode="drop")
        k_scales = k_scales.at[:, pages].set(k_s, mode="drop")
        v_scales = v_scales.at[:, pages].set(v_s, mode="drop")
        return k_pages, v_pages, k_scales, v_scales

    k_pages = k_pages.at[:, pages].set(kb.astype(k_pages.dtype), mode="drop")
    v_pages = v_pages.at[:, pages].set(vb.astype(v_pages.dtype), mode="drop")
    return k_pages, v_pages, None, None
