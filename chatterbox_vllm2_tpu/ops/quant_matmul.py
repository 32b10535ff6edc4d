"""Weight-only quantized matmuls (INT8 native-MXU, INT4 group-wise Pallas).

TPU-native replacement for the AWQ/GPTQ INT4 CUDA GEMMs and bitsandbytes
NF4/Int8 linears the reference enables through `quantization.py:29-185` +
vLLM (SURVEY.md §2.2).  One mechanism serves every linear in the framework
(the reference needs two libraries for this): a weight leaf in a parameter
pytree is either a plain array or a `QuantTensor`, and `quant_einsum`
dispatches on the type — model code is quantization-agnostic.

Decode is HBM-bound on weight traffic (520M params -> ~1 GB/step at bf16):

  * **int8**: symmetric per-column weights + per-row dynamic activation
    quantization, contracted with a single native int8 x int8 -> int32 MXU
    dot.  Halves weight traffic with zero custom kernels; the MXU reads int8
    directly.
  * **int4**: AWQ-style asymmetric group-wise (default group 128) packed two
    codes per byte, dequantized in VMEM by a Pallas kernel and fed to the MXU
    in bf16.  Quarter weight traffic.

INT4 packing layout — "concat halves", chosen so the kernel never needs a
sublane interleave (which Mosaic lowers poorly): byte row r of `data` holds
original row r in the LOW nibble and row r + K/2 in the HIGH nibble.  A
group's rows therefore live in one nibble of one contiguous row range, and
dequantization is static slicing + shift/mask only.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("data", "scales", "zeros"),
    meta_fields=("bits", "group_size"),
)
@dataclasses.dataclass(frozen=True)
class QuantTensor:
    """A quantized weight matrix [K, N], possibly stacked [L, K, N].

    int8: data int8 [.., K, N];    scales f32 [.., 1, N];    zeros None
    int4: data uint8 [.., K/2, N]; scales f32 [.., K/G, N];  zeros f32 [.., K/G, N]
    """

    data: jnp.ndarray
    scales: jnp.ndarray
    zeros: Optional[jnp.ndarray]
    bits: int
    group_size: int

    @property
    def k(self) -> int:
        return self.data.shape[-2] * (2 if self.bits == 4 else 1)

    @property
    def n(self) -> int:
        return self.data.shape[-1]

    def __getitem__(self, idx):
        """Static indexing of stacked quantized layers (leading dims)."""
        return QuantTensor(self.data[idx], self.scales[idx],
                           None if self.zeros is None else self.zeros[idx],
                           self.bits, self.group_size)


Weight = Union[jnp.ndarray, QuantTensor]


def _quantize_device(w: jax.Array, bits: int, group_size: int) -> QuantTensor:
    """On-device quantization of a [K, N] or stacked [L, K, N] weight.

    Used when the weight already lives on the device: `np.asarray` would pull
    it through the tunnel's slow device->host path (minutes per GB); a small
    jitted program quantizes it in HBM instead."""

    @functools.partial(jax.jit, static_argnames=("bits", "group_size"))
    def go(w, bits, group_size):
        w = w.astype(jnp.float32)
        stacked = w.ndim == 3
        if not stacked:
            w = w[None]
        L, K, N = w.shape
        if bits == 8:
            s = jnp.maximum(jnp.abs(w).max(axis=1, keepdims=True) / 127.0, 1e-10)
            q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
            if not stacked:
                return q[0], s[0], None
            return q, s, None
        G = K // group_size
        grp = w.reshape(L, G, group_size, N)
        wmin = grp.min(axis=2, keepdims=True)
        wmax = grp.max(axis=2, keepdims=True)
        scale = jnp.maximum((wmax - wmin) / 15.0, 1e-10)
        zero = -wmin / scale
        q = jnp.clip(jnp.round(grp / scale + zero), 0, 15)
        q = q.reshape(L, K, N).astype(jnp.uint8)
        packed = q[:, : K // 2] | (q[:, K // 2:] << 4)          # concat halves
        scales = scale[:, :, 0, :]
        zeros = zero[:, :, 0, :]
        if not stacked:
            return packed[0], scales[0], zeros[0]
        return packed, scales, zeros

    if bits == 4:
        K = w.shape[-2]
        assert K % (2 * group_size) == 0, (K, group_size)
    data, scales, zeros = go(w, bits, group_size)
    return QuantTensor(data, scales, zeros, bits,
                       group_size if bits == 4 else w.shape[-2])


def quantize_tensor(w, bits: int = 4, group_size: int = 128) -> QuantTensor:
    """Quantize a dense [K, N] (or stacked [L, K, N]) weight.

    Device arrays are quantized on-device (no tunnel download); numpy goes
    through the host reference path below (tests, checkpoint conversion)."""
    if isinstance(w, jax.Array):
        return _quantize_device(w, bits, group_size)
    w = np.asarray(w, np.float32)
    if w.ndim == 3:
        parts = [quantize_tensor(w[i], bits, group_size) for i in range(w.shape[0])]
        return QuantTensor(
            jnp.stack([p.data for p in parts]),
            jnp.stack([p.scales for p in parts]),
            None if bits == 8 else jnp.stack([p.zeros for p in parts]),
            bits, parts[0].group_size)
    K, N = w.shape
    if bits == 8:
        # symmetric per-column
        s = np.maximum(np.abs(w).max(axis=0, keepdims=True) / 127.0, 1e-10)
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return QuantTensor(jnp.asarray(q), jnp.asarray(s.astype(np.float32)),
                           None, 8, K)
    assert bits == 4
    assert K % (2 * group_size) == 0, (K, group_size)
    G = K // group_size
    grp = w.reshape(G, group_size, N)
    wmin = grp.min(axis=1, keepdims=True)
    wmax = grp.max(axis=1, keepdims=True)
    scale = np.maximum((wmax - wmin) / 15.0, 1e-10)
    zero = -wmin / scale
    q = np.clip(np.round(grp / scale + zero), 0, 15).reshape(K, N).astype(np.uint8)
    packed = (q[: K // 2] | (q[K // 2:] << 4)).astype(np.uint8)   # concat halves
    return QuantTensor(jnp.asarray(packed),
                       jnp.asarray(scale[:, 0, :].astype(np.float32)),
                       jnp.asarray(zero[:, 0, :].astype(np.float32)),
                       4, group_size)


def dequantize_tensor(q: QuantTensor) -> jnp.ndarray:
    """Reference dequantization (tests / CPU fallback). [.., K, N] f32."""
    if q.bits == 8:
        return q.data.astype(jnp.float32) * q.scales
    low = (q.data & 0xF).astype(jnp.float32)
    high = (q.data >> 4).astype(jnp.float32)
    w = jnp.concatenate([low, high], axis=-2)                     # [.., K, N]
    s = jnp.repeat(q.scales, q.group_size, axis=-2)
    z = jnp.repeat(q.zeros, q.group_size, axis=-2)
    return (w - z) * s


# ---------------------------------------------------------------------------
# INT8: native MXU int8 x int8 -> int32 with dynamic per-row activation scales
# ---------------------------------------------------------------------------


def _int8_matmul(x2d: jnp.ndarray, q: QuantTensor) -> jnp.ndarray:
    xf = x2d.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-10)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, q.data, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * xs * q.scales                 # [M, N] f32


# ---------------------------------------------------------------------------
# INT4: Pallas group-wise dequant + MXU dot
# ---------------------------------------------------------------------------


def _qmm4_kernel(x_ref, p_ref, s_ref, z_ref, o_ref, *, k: int, group_size: int):
    """One (m, n) grid cell: dequantize the [K, BN] tile group-by-group in
    VMEM (bf16) and accumulate x_tile @ w_tile on the MXU."""
    G = group_size
    half = k // 2
    num_groups = k // G
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for g in range(num_groups):
        # Mosaic can't cast uint8->float32 directly; widen to int32 first.
        if g < half // G:
            rows = p_ref[g * G:(g + 1) * G, :].astype(jnp.int32)
            wq = (rows & 0xF).astype(jnp.float32)
        else:
            rows = p_ref[g * G - half:(g + 1) * G - half, :].astype(jnp.int32)
            wq = (rows >> 4).astype(jnp.float32)
        s = s_ref[g, :][None, :]
        z = z_ref[g, :][None, :]
        w = ((wq - z) * s).astype(jnp.bfloat16)
        acc += jax.lax.dot(x_ref[:, g * G:(g + 1) * G].astype(jnp.bfloat16), w,
                           preferred_element_type=jnp.float32)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("group_size", "block_m", "block_n",
                                             "interpret"))
def _qmm4(x, packed, scales, zeros, *, group_size,
          block_m=256, block_n=512, interpret=False):
    M, K = x.shape
    N = packed.shape[1]
    assert packed.shape[0] * 2 == K
    block_m = min(block_m, M)
    block_n = next(b for b in (block_n, 256, 128, N) if N % b == 0)
    assert M % block_m == 0, (M, block_m)
    grid = (M // block_m, N // block_n)
    out = pl.pallas_call(
        functools.partial(_qmm4_kernel, k=K, group_size=group_size),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda m, n: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 2, block_n), lambda m, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // group_size, block_n), lambda m, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // group_size, block_n), lambda m, n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda m, n: (m, n),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, packed, scales, zeros)
    return out


def _int4_matmul(x2d: jnp.ndarray, q: QuantTensor,
                 interpret: Optional[bool] = None) -> jnp.ndarray:
    M, K = x2d.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_m = 256 if M >= 256 else max(8, -(-M // 8) * 8)
    pad_m = (-M) % block_m
    if pad_m:
        x2d = jnp.pad(x2d, ((0, pad_m), (0, 0)))
    out = _qmm4(x2d.astype(jnp.bfloat16), q.data, q.scales, q.zeros,
                group_size=q.group_size, block_m=block_m, interpret=interpret)
    return out[:M] if pad_m else out                             # [M, N] f32


# ---------------------------------------------------------------------------
# The single entry point model code uses for every linear
# ---------------------------------------------------------------------------


def quant_einsum(x: jnp.ndarray, w: Weight, *,
                 preferred_element_type=None) -> jnp.ndarray:
    """x [..., K] @ w [K, N] -> [..., N], where w is a dense array or a
    QuantTensor.  Output dtype is x.dtype unless preferred_element_type."""
    if isinstance(w, QuantTensor):
        lead = x.shape[:-1]
        out = (_int8_matmul if w.bits == 8 else _int4_matmul)(
            x.reshape(-1, x.shape[-1]), w)
        out = out.reshape(lead + (w.n,))
        return out.astype(preferred_element_type or x.dtype)
    out = jnp.einsum("...k,kn->...n", x, w,
                     preferred_element_type=preferred_element_type)
    if preferred_element_type is None:
        out = out.astype(x.dtype)
    return out


# ---------------------------------------------------------------------------
# Whole-model quantization (the analog of reference quantization.py:29-185:
# AWQ INT4 for the vLLM-side T3, bitsandbytes for everything else — here one
# code path quantizes any stacked linear in any params tree)
# ---------------------------------------------------------------------------

T3_QUANT_KEYS = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj")


def quantize_linears(tree, mode: str, *, min_dim: int = 256,
                     group_size: int = 128):
    """Recursively swap every qualifying linear weight in a parameter tree
    for a QuantTensor — the one-mechanism analog of the reference's
    bitsandbytes Linear swap for cond-enc / voice-encoder / S3Gen
    (reference `quantization.py:29-139`, applied `tts.py:119-205`).

    A leaf qualifies when it is the "w" of a {w[, b]} linear dict, 2-D, with
    both dims >= min_dim (tiny projections aren't worth the dequant cost —
    mirrors bnb skipping small layers).  INT4 additionally requires
    K % (2*group_size) == 0 (the concat-halves packing); non-conforming
    weights fall back to INT8.  Convs and norms stay dense, matching the
    reference (bnb only swaps nn.Linear).
    """
    if mode in ("none", None, ""):
        return tree
    bits = {"int8": 8, "int4_awq": 4, "int4": 4}[mode]

    def visit(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k == "w" and hasattr(v, "ndim") and v.ndim == 2
                        and not isinstance(v, QuantTensor)
                        and min(v.shape) >= min_dim):
                    b = bits
                    if b == 4 and v.shape[0] % (2 * group_size) != 0:
                        b = 8
                    out[k] = quantize_tensor(v, bits=b, group_size=group_size)
                else:
                    out[k] = visit(v)
            return out
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(visit(v) for v in node)
        return node

    return visit(tree)


def quantize_t3_params(params: dict, mode: str, group_size: int = 128) -> dict:
    """Swap the T3 backbone matmul weights (and lm head) for QuantTensors.

    mode: "int8" | "int4_awq".  Embeddings and norms stay dense (matching the
    reference, which AWQ-quantizes only the linear layers).
    """
    if mode in ("none", None, ""):
        return params
    bits = {"int8": 8, "int4_awq": 4, "int4": 4}[mode]
    out = dict(params)
    layers = dict(params["layers"])
    for key in T3_QUANT_KEYS:
        if not isinstance(layers[key], QuantTensor):   # idempotent: AWQ
            layers[key] = quantize_tensor(layers[key], bits=bits,
                                          group_size=group_size)
    out["layers"] = layers
    if not isinstance(params["speech_head"], QuantTensor):
        out["speech_head"] = quantize_tensor(params["speech_head"], bits=bits,
                                             group_size=group_size)
    return out
