"""Paged attention kernel + block allocator tests (interpret mode, CPU).

Kernel results are checked against a plain masked-softmax dense reference —
the same strategy SURVEY.md §4 prescribes (Pallas kernels vs reference-dtype
einsums in interpreter mode).  The kernel is pair-native: pages store both
CFG streams in their 128-lane rows and one block-table row serves a pair
(`ops/paged_attention.py`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatterbox_vllm2_tpu.native import (
    NativeBlockAllocator,
    PyBlockAllocator,
    make_block_allocator,
)
from chatterbox_vllm2_tpu.ops.paged_attention import (
    append_layer_to_pages,
    pack_pairs,
    paged_attention_pairs,
    unpack_pairs,
    write_prefill_to_pages,
)

B, H, D, BS, NB = 3, 4, 32, 8, 6   # pairs, heads, head_dim, block, blocks/pair
S = 2 * B                          # device streams
L = 2                              # stacked layers (kernel reads layer 1)
P = B * NB + 2                     # pages per layer
LAYER = 1


def dense_reference(q, k, v, lengths_pair, scale):
    """q [S,H,D]; k/v [S,H,T,D]; masked softmax attention (lengths per pair)."""
    scores = np.einsum("shd,shtd->sht", q, k) * scale
    T = k.shape[2]
    lengths = np.repeat(lengths_pair, 2)
    mask = np.arange(T)[None, None, :] < lengths[:, None, None]
    scores = np.where(mask, scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("sht,shtd->shd", p, v)
    out[lengths == 0] = 0.0
    return out


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(0)
    lengths = np.asarray([5, BS * 3, BS * NB], np.int32)      # per pair
    T = BS * NB
    q = rng.randn(S, H, D).astype(np.float32)
    k = rng.randn(L, S, H, T, D).astype(np.float32)
    v = rng.randn(L, S, H, T, D).astype(np.float32)
    return q, k, v, lengths


def _build_pages(k, v, quantized=False):
    alloc = make_block_allocator(P, B, NB)
    # prefill writes the whole padded bucket, so reserve by bucket length
    # (padding tokens are masked by `lengths` at read time)
    nb_full = -(-k.shape[3] // BS)
    for b in range(B):
        assert alloc.reserve(b, nb_full)
    tables = np.maximum(alloc.full_table(), 0)
    kp = jnp.zeros((L, P, H, BS, 2 * D), jnp.int8 if quantized else jnp.float32)
    vp = jnp.zeros_like(kp)
    ks = jnp.zeros((L, P, H, BS), jnp.float32) if quantized else None
    vs = jnp.zeros((L, P, H, BS), jnp.float32) if quantized else None
    kp, vp, ks, vs = write_prefill_to_pages(
        kp, vp, jnp.asarray(k), jnp.asarray(v), jnp.asarray(tables),
        block_size=BS, k_scales=ks, v_scales=vs)
    return kp, vp, ks, vs, jnp.asarray(tables), alloc


def _run(q, kp, vp, tables, lengths, **kw):
    out = paged_attention_pairs(
        pack_pairs(jnp.asarray(q)), kp, vp, tables,
        jnp.asarray(lengths, jnp.int32), LAYER,
        block_size=BS, sm_scale=D ** -0.5, interpret=True, **kw)
    return np.asarray(unpack_pairs(out))


def test_paged_attention_matches_dense(problem):
    q, k, v, lengths = problem
    kp, vp, _, _, tables, _ = _build_pages(k, v)
    out = _run(q, kp, vp, tables, lengths)
    ref = dense_reference(q, k[LAYER], v[LAYER], lengths, D ** -0.5)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=5e-3)  # bf16 math


def test_zero_length_pair_outputs_zero(problem):
    q, k, v, lengths = problem
    kp, vp, _, _, tables, _ = _build_pages(k, v)
    lengths = lengths.copy()
    lengths[1] = 0
    out = _run(q, kp, vp, tables, lengths)
    assert np.abs(out[2:4]).max() == 0
    ref = dense_reference(q, k[LAYER], v[LAYER], lengths, D ** -0.5)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=5e-3)


def test_paged_attention_int8_close_to_dense(problem):
    q, k, v, lengths = problem
    kp, vp, ks, vs, tables, _ = _build_pages(k, v, quantized=True)
    out = _run(q, kp, vp, tables, lengths, k_scales=ks, v_scales=vs)
    ref = dense_reference(q, k[LAYER], v[LAYER], lengths, D ** -0.5)
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.03, f"int8 relative error {err}"


def test_append_then_attend(problem):
    """Decode path: append one new token per pair, attend, compare."""
    q, k, v, lengths = problem
    kp, vp, _, _, tables, _ = _build_pages(k, v)
    rng = np.random.RandomState(1)
    k_new = rng.randn(L, S, H, D).astype(np.float32)
    v_new = rng.randn(L, S, H, D).astype(np.float32)
    # append at position lengths[b]; pair 2 is full, so cap one below capacity
    lengths = np.minimum(lengths, BS * NB - 1)
    for l in range(L):
        kp, vp, _, _ = append_layer_to_pages(
            kp, vp, jnp.asarray(k_new[l]), jnp.asarray(v_new[l]), l, tables,
            jnp.asarray(lengths, jnp.int32), block_size=BS)
    new_len = lengths + 1
    out = _run(q, kp, vp, tables, new_len)

    k_ref, v_ref = k[LAYER].copy(), v[LAYER].copy()
    for s in range(S):
        k_ref[s, :, lengths[s // 2], :] = k_new[LAYER, s]
        v_ref[s, :, lengths[s // 2], :] = v_new[LAYER, s]
    ref = dense_reference(q, k_ref, v_ref, new_len, D ** -0.5)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=5e-3)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(S, H, D).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_pairs(pack_pairs(x))),
                                  np.asarray(x))


# --------------------------------------------------------------------------- #
# Block allocator (C++ and Python fallback must agree)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("cls", [NativeBlockAllocator, PyBlockAllocator])
def test_allocator_semantics(cls):
    try:
        a = cls(10, 3, 4)
    except RuntimeError:
        pytest.skip("no native toolchain")
    assert a.num_free == 10
    assert a.reserve(0, 3)
    assert a.reserve(1, 4)
    assert a.num_free == 3
    assert a.seq_num_blocks(0) == 3
    assert not a.reserve(2, 4)          # OOM: all-or-nothing
    assert a.num_free == 3
    assert a.reserve(0, 3)              # idempotent grow
    t0 = a.table(0)
    assert (t0[:3] >= 0).all() and (t0[3:] == -1).all()
    # no double-assignment of pages
    held = set(a.table(0)[:3]) | set(a.table(1)[:4])
    assert len(held) == 7
    a.release(0)
    assert a.num_free == 6
    assert a.reserve(2, 4)
    full = a.full_table()
    assert full.shape == (3, 4)
    assert (full[0] == -1).all()


def test_native_matches_python_fallback():
    try:
        n = NativeBlockAllocator(8, 2, 4)
    except RuntimeError:
        pytest.skip("no native toolchain")
    p = PyBlockAllocator(8, 2, 4)
    ops = [("reserve", 0, 2), ("reserve", 1, 3), ("release", 0, None),
           ("reserve", 1, 4), ("reserve", 0, 4), ("release", 1, None)]
    for op, seq, arg in ops:
        if op == "reserve":
            assert n.reserve(seq, arg) == p.reserve(seq, arg)
        else:
            n.release(seq); p.release(seq)
        assert n.num_free == p.num_free
        np.testing.assert_array_equal(n.full_table(), p.full_table())


def test_staged_tail_matches_full_pages(problem):
    """Staged mode: pages hold `flushed` tokens, the chunk tail holds the
    rest — output must match the all-in-pages kernel on the same logical
    K/V (the engine's staged-append path, flushed once per decode chunk)."""
    q, k, v, lengths = problem
    kp, vp, _, _, tables, _ = _build_pages(k, v)
    ref = _run(q, kp, vp, tables, lengths)

    C = 8                                     # tail capacity (chunk steps)
    flushed = np.maximum(lengths - np.array([3, 5, 0]), 0).astype(np.int32)
    # rebuild pages holding only the flushed prefix; tail carries the rest
    k_cut = k.copy()
    v_cut = v.copy()
    tail_k = np.zeros((L, B, H, C, 2 * D), np.float32)
    tail_v = np.zeros((L, B, H, C, 2 * D), np.float32)
    for b in range(B):
        n_tail = int(lengths[b] - flushed[b])
        for t in range(n_tail):
            pos = int(flushed[b]) + t
            for s_half in (0, 1):
                tail_k[:, b, :, t, s_half * D:(s_half + 1) * D] = \
                    k[:, 2 * b + s_half, :, pos, :]
                tail_v[:, b, :, t, s_half * D:(s_half + 1) * D] = \
                    v[:, 2 * b + s_half, :, pos, :]
        k_cut[:, 2 * b: 2 * b + 2, :, int(flushed[b]):, :] = 7.7   # poison
        v_cut[:, 2 * b: 2 * b + 2, :, int(flushed[b]):, :] = -7.7
    kp2, vp2, _, _, tables2, _ = _build_pages(k_cut, v_cut)

    out = paged_attention_pairs(
        pack_pairs(jnp.asarray(q)), kp2, vp2, tables2,
        jnp.asarray(lengths, jnp.int32), LAYER,
        block_size=BS, sm_scale=D ** -0.5,
        flushed=jnp.asarray(flushed), tail_k=jnp.asarray(tail_k),
        tail_v=jnp.asarray(tail_v), interpret=True)
    out = np.asarray(unpack_pairs(out))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=6e-3)
