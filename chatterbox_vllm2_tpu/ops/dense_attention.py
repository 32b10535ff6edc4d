"""Pallas decode attention over the dense slotted KV cache.

Why this exists: the XLA decode path must slice layer `l`'s cache out of the
stacked [L, S, H, M, D] carry before the attention einsums
(`models/t3/model.py:t3_decode`), and a dot operand cannot be a fused slice —
XLA materializes a [S, H, M, D] copy per layer, tripling attention HBM
traffic.  Measured on the v5e: attention was ~2.3 ms of a 3.8 ms decode step
while its bandwidth floor is ~0.9 ms (scripts/attr_backbone.py).  This kernel
reads the needed blocks of the *full stacked cache* directly — the layer
index is a scalar-prefetch operand used in the BlockSpec index_map, so no
XLA-level slice ever exists.  Cache writes stay as XLA scatters (measured
cheap, ~0.2 ms/step).

Measured reality (v5e through the axon tunnel, shared/noisy): this kernel ran
~8 ms per 30-layer pass vs ~3.6 ms for the XLA path at bench shapes — the
per-(stream, head) [1, 64] x [64, M] matvecs are latency-bound on the MXU and
the D=64-minor cache blocks DMA at a fraction of spec (measured 38 GB/s
64-minor vs 112 GB/s 128-minor streaming the same day).  It therefore ships
OFF by default (`EngineConfig.decode_attn = "xla"`) as (a) the A/B candidate
for production hardware without tunnel pathologies and (b) the only path that
can fuse INT8-KV dequantization into attention (XLA would materialize the
dequantized copy, erasing the bandwidth win).

INT8 mode: one scale per (layer, stream, head, token), quantize-on-append
(`quantize_kv_shd`), dequantized in VMEM (the INT8-KV north star,
BASELINE.md, applied to the *dense* engine per VERDICT r3 item 1b).

The reference gets this fusion from vLLM's CUDA `paged_attention` kernels
(consumed implicitly; SURVEY.md §2.2) — the paged TPU variant lives in
`ops/paged_attention.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attend(q, k, v, length, scale, o_ref):
    """q [H, D] f32; k, v [H, Mb, D] f32 (dequantized); write o_ref [1, H, D]."""
    # scores[h, m] = sum_d q[h, d] * k[h, m, d]
    scores = jax.lax.dot_general(
        q[:, None, :], k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :] * scale                                     # [H, Mb]
    valid = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) <= length
    scores = jnp.where(valid, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    # out[h, d] = sum_m p[h, m] * v[h, m, d]
    out = jax.lax.dot_general(
        p[:, None, :], v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]                                             # [H, D]
    o_ref[0] = out / jnp.maximum(denom, 1e-30)


def _dense_kernel(layer_ref, lengths_ref, q_ref, k_ref, v_ref, o_ref, *,
                  scale):
    s = pl.program_id(0)
    _attend(q_ref[0].astype(jnp.float32),
            k_ref[0, 0].astype(jnp.float32),
            v_ref[0, 0].astype(jnp.float32),
            lengths_ref[s], scale, o_ref)


def _int8_kernel(layer_ref, lengths_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                 o_ref, *, scale):
    s = pl.program_id(0)
    k = k_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0][:, :, None]
    v = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0][:, :, None]
    _attend(q_ref[0].astype(jnp.float32), k, v, lengths_ref[s], scale, o_ref)


@functools.partial(
    jax.jit,
    static_argnames=("cache_len", "sm_scale", "interpret"),
)
def dense_decode_attention(
    q: jnp.ndarray,            # [S, H, D] — post-RoPE query of the new token
    k_cache: jnp.ndarray,      # [L, S, H, M_alloc, D] (bf16 or int8)
    v_cache: jnp.ndarray,
    layer: jnp.ndarray,        # [] int32 — which layer's cache to read
    lengths: jnp.ndarray,      # [S] int32 — position just written (inclusive)
    *,
    cache_len: int,            # static read bound (multiple of the engine bucket)
    sm_scale: float,
    k_scales: jnp.ndarray | None = None,   # [L, S, H, M_alloc] f32 for INT8
    v_scales: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [S, H, D] f32 attention output for one decode step of layer
    `layer`, attending cache positions 0..lengths[s] inclusive."""
    S, H, D = q.shape
    Mb = cache_len
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    quantized = k_scales is not None

    cache_spec = pl.BlockSpec(
        (1, 1, H, Mb, D), lambda s, l_ref, len_ref: (l_ref[0], s, 0, 0, 0),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, H, D), lambda s, l_ref, len_ref: (s, 0, 0),
                     memory_space=pltpu.VMEM),
        cache_spec,
        cache_spec,
    ]
    args = [q, k_cache, v_cache]
    if quantized:
        scale_spec = pl.BlockSpec(
            (1, 1, H, Mb), lambda s, l_ref, len_ref: (l_ref[0], s, 0, 0),
            memory_space=pltpu.VMEM)
        in_specs += [scale_spec, scale_spec]
        args += [k_scales, v_scales]
        kernel = functools.partial(_int8_kernel, scale=sm_scale)
    else:
        kernel = functools.partial(_dense_kernel, scale=sm_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, D), lambda s, l_ref, len_ref: (s, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, H, D), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(layer, lengths, *args)


def quantize_kv_shd(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric INT8 per-(stream, head) quantization of one decode token's
    K or V: [S, H, D] -> (int8 [S, H, D], scales f32 [S, H])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scl = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scl[..., None]), -127, 127).astype(jnp.int8)
    return q, scl
