"""Weight-only quantized matmul Pallas kernels (INT4 / INT8, group-wise).

TPU-native replacement for the AWQ/GPTQ INT4 CUDA GEMMs and bitsandbytes
NF4/Int8 linears the reference enables through `quantization.py:29-185` +
vLLM (SURVEY.md §2.2).  One kernel family serves both the T3 backbone and
any other linear (the reference needs two libraries for this).

Decode is HBM-bound on weight traffic (520M params -> ~1 GB/step at bf16);
INT4 packing cuts that 4x, which is the whole point — the kernel just has to
dequantize in VMEM at streaming rate and feed the MXU.

Layout (AWQ-style, group-wise along the contraction axis K):
  packed   [K/2, N]  uint8 — two 4-bit codes per byte (low nibble = even k)
  scales   [K/G, N]  f32
  zeros    [K/G, N]  f32   (w = (q - z) * s)
INT8 uses [K, N] int8 + the same group-wise scales/zeros.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QuantLinear(NamedTuple):
    """A quantized weight matrix [K, N]."""

    packed: jnp.ndarray    # int4: [K//2, N] uint8; int8: [K, N] int8
    scales: jnp.ndarray    # [K//G, N] f32
    zeros: jnp.ndarray     # [K//G, N] f32
    bits: int              # 4 or 8
    group_size: int

    @property
    def k(self) -> int:
        return self.packed.shape[0] * (2 if self.bits == 4 else 1)

    @property
    def n(self) -> int:
        return self.packed.shape[1]


def quantize(w, bits: int = 4, group_size: int = 128) -> QuantLinear:
    """Quantize a dense [K, N] weight group-wise along K (host-side)."""
    w = np.asarray(w, np.float32)
    K, N = w.shape
    assert K % group_size == 0, (K, group_size)
    G = K // group_size
    grp = w.reshape(G, group_size, N)
    wmin = grp.min(axis=1, keepdims=True)
    wmax = grp.max(axis=1, keepdims=True)
    qmax = (1 << bits) - 1
    scale = np.maximum((wmax - wmin) / qmax, 1e-8)
    zero = -wmin / scale
    q = np.clip(np.round(grp / scale + zero), 0, qmax)
    if bits == 4:
        q = q.reshape(K, N).astype(np.uint8)
        packed = (q[0::2] | (q[1::2] << 4)).astype(np.uint8)   # [K//2, N]
        stored_zero = zero[:, 0, :]
    else:
        # codes re-biased into int8 range: stored = q - 128, so the zero
        # point shifts by the same 128 to keep (stored - z) * s == (q - zero) * s
        packed = (q.reshape(K, N) - 128).astype(np.int8)
        stored_zero = zero[:, 0, :] - 128.0
    return QuantLinear(
        packed=jnp.asarray(packed),
        scales=jnp.asarray(scale[:, 0, :]),
        zeros=jnp.asarray(stored_zero),
        bits=bits,
        group_size=group_size,
    )


def dequantize(q: QuantLinear) -> jnp.ndarray:
    """Reference dequantization (tests / non-Pallas fallback). [K, N] f32."""
    if q.bits == 4:
        low = (q.packed & 0xF).astype(jnp.float32)
        high = (q.packed >> 4).astype(jnp.float32)
        w = jnp.stack([low, high], axis=1).reshape(q.k, q.n)
    else:
        w = q.packed.astype(jnp.float32)
    s = jnp.repeat(q.scales, q.group_size, axis=0)
    z = jnp.repeat(q.zeros, q.group_size, axis=0)
    return (w - z) * s


def _qmm_kernel(x_ref, p_ref, s_ref, z_ref, o_ref, acc_ref,
                *, bits: int, block_k: int, group_size: int):
    """One (n, k) grid step: dequantize the [BK, BN] weight tile in VMEM and
    accumulate x_tile @ w_tile into the f32 scratch."""
    k_idx = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if bits == 4:
        p = p_ref[:]                                   # [BK//2, BN] uint8
        low = (p & 0xF).astype(jnp.float32)
        high = (p >> 4).astype(jnp.float32)
        # interleave rows: stack on a new axis then collapse
        w = jnp.stack([low, high], axis=1)             # [BK//2, 2, BN]
        w = w.reshape(block_k, p.shape[-1])            # [BK, BN]
    else:
        w = p_ref[:].astype(jnp.float32)               # [BK, BN]

    # group-wise dequant: BK is a multiple of group_size; each scale row
    # covers `group_size` consecutive K rows
    s = s_ref[:]                                       # [BK//G, BN]
    z = z_ref[:]
    gk, bn = s.shape
    s_full = jnp.broadcast_to(s[:, None, :], (gk, group_size, bn)
                              ).reshape(block_k, bn)
    z_full = jnp.broadcast_to(z[:, None, :], (gk, group_size, bn)
                              ).reshape(block_k, bn)
    w = (w - z_full) * s_full

    acc_ref[:] += jax.lax.dot(
        x_ref[:].astype(jnp.float32), w,
        preferred_element_type=jnp.float32)

    @pl.when(k_idx == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("bits", "group_size", "block_n", "block_k",
                              "interpret"))
def _qmm(x, packed, scales, zeros, *, bits, group_size,
         block_n=256, block_k=256, interpret=False):
    M, K = x.shape
    if bits == 4:
        N = packed.shape[1]
        assert packed.shape[0] * 2 == K
    else:
        N = packed.shape[1]
    block_n = min(block_n, N)
    block_k = min(block_k, K)
    assert K % block_k == 0 and N % block_n == 0
    assert block_k % group_size == 0
    grid = (N // block_n, K // block_k)

    pk = block_k // 2 if bits == 4 else block_k
    gk = block_k // group_size
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, bits=bits, block_k=block_k,
                          group_size=group_size),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, block_k), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pk, block_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gk, block_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gk, block_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
        interpret=interpret,
    )(x, packed, scales, zeros)
    return out


def quant_matmul(x: jnp.ndarray, q: QuantLinear, *,
                 out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """x [M, K] @ dequant(q) [K, N] -> [M, N].

    M is padded up to the f32 sublane tile (8) if needed — decode calls come
    in at M = 2*batch which is usually already aligned.
    """
    M, K = x.shape
    assert K == q.k, (K, q.k)
    pad = (-M) % 8
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    out = _qmm(x, q.packed, q.scales, q.zeros, bits=q.bits,
               group_size=q.group_size, interpret=interpret)
    if pad:
        out = out[:M]
    return out.astype(out_dtype or x.dtype)
