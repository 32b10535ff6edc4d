"""Paged attention kernel + block allocator tests (interpret mode, CPU).

Kernel results are checked against a plain masked-softmax dense reference —
the same strategy SURVEY.md §4 prescribes (Pallas kernels vs reference-dtype
einsums in interpreter mode).
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
    append_to_pages,
    paged_attention_decode,
    write_prefill_to_pages,
)

S, H, D, BS, NB = 4, 4, 32, 8, 6   # streams, heads, head_dim, block, blocks/seq
P = S * NB + 2                     # pages


def dense_reference(q, k, v, lengths, scale):
    """q [S,H,D]; k/v [S,T,H,D]; masked softmax attention."""
    scores = np.einsum("shd,sthd->sht", q, k) * scale
    T = k.shape[1]
    mask = np.arange(T)[None, None, :] < lengths[:, None, None]
    scores = np.where(mask, scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("sht,sthd->shd", p, v)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(0)
    lengths = np.asarray([5, BS * 3, BS * NB, 17], np.int32)
    T = BS * NB
    q = rng.randn(S, H, D).astype(np.float32)
    k = rng.randn(S, T, H, D).astype(np.float32)
    v = rng.randn(S, T, H, D).astype(np.float32)
    return q, k, v, lengths


def _build_pages(k, v, lengths, dtype=jnp.float32, quantized=False):
    alloc = make_block_allocator(P, S, NB)
    # prefill writes the whole padded bucket, so reserve by bucket length
    # (padding tokens are masked by `lengths` at read time)
    nb_full = -(-k.shape[1] // BS)
    for s in range(S):
        assert alloc.reserve(s, nb_full)
    tables = np.maximum(alloc.full_table(), 0)
    kp = jnp.zeros((P, H, BS, D), jnp.int8 if quantized else dtype)
    vp = jnp.zeros_like(kp)
    ks = jnp.zeros((P, H, BS), jnp.float32) if quantized else None
    vs = jnp.zeros((P, H, BS), jnp.float32) if quantized else None
    kp, vp, ks, vs = write_prefill_to_pages(
        kp, vp, jnp.asarray(k), jnp.asarray(v), jnp.asarray(tables),
        block_size=BS, k_scales=ks, v_scales=vs)
    return kp, vp, ks, vs, jnp.asarray(tables), alloc


def test_paged_attention_matches_dense(problem):
    q, k, v, lengths = problem
    kp, vp, _, _, tables, _ = _build_pages(k, v, lengths)
    out = paged_attention_decode(
        jnp.asarray(q), kp, vp, tables, jnp.asarray(lengths),
        block_size=BS, sm_scale=D ** -0.5, interpret=True)
    ref = dense_reference(q, k, v, lengths, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=5e-3)  # bf16 in-kernel math


def test_paged_attention_int8_close_to_dense(problem):
    q, k, v, lengths = problem
    kp, vp, ks, vs, tables, _ = _build_pages(k, v, lengths, quantized=True)
    out = paged_attention_decode(
        jnp.asarray(q), kp, vp, tables, jnp.asarray(lengths),
        block_size=BS, sm_scale=D ** -0.5, k_scales=ks, v_scales=vs,
        interpret=True)
    ref = dense_reference(q, k, v, lengths, D ** -0.5)
    # int8 per-(token, head) quantization: ~1% tolerance
    err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.03, f"int8 relative error {err}"


def test_append_then_attend(problem):
    """Decode path: append one new token per stream, attend, compare."""
    q, k, v, lengths = problem
    kp, vp, _, _, tables, _ = _build_pages(k, v, lengths)
    rng = np.random.RandomState(1)
    k_new = rng.randn(S, H, D).astype(np.float32)
    v_new = rng.randn(S, H, D).astype(np.float32)
    # append at position lengths[s] (the next free slot); stream 2 is full, so
    # cap its length one below the page capacity for this test
    lengths = np.minimum(lengths, BS * NB - 1)
    kp, vp, _, _ = append_to_pages(
        kp, vp, jnp.asarray(k_new), jnp.asarray(v_new), tables,
        jnp.asarray(lengths, jnp.int32), block_size=BS)
    new_len = lengths + 1
    out = paged_attention_decode(
        jnp.asarray(q), kp, vp, tables, jnp.asarray(new_len, jnp.int32),
        block_size=BS, sm_scale=D ** -0.5, interpret=True)

    k_ref, v_ref = k.copy(), v.copy()
    for s in range(S):
        k_ref[s, lengths[s]] = k_new[s]
        v_ref[s, lengths[s]] = v_new[s]
    ref = dense_reference(q, k_ref, v_ref, new_len, D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=5e-3)  # bf16 in-kernel math


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
