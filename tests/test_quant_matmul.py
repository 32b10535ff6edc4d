"""Quantized matmul kernel tests (interpret mode, CPU).

Strategy per SURVEY.md §4: the Pallas kernel must match a reference-dtype
einsum over the *dequantized* weights exactly (same arithmetic), and the
quantization itself must be accurate against the original weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatterbox_vllm2_tpu.ops.quant_matmul import (
    QuantLinear,
    dequantize,
    quant_matmul,
    quantize,
)

K, N = 512, 512


@pytest.fixture(scope="module")
def weights():
    rng = np.random.RandomState(0)
    return (rng.randn(K, N) * 0.05).astype(np.float32)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("group_size", [128, 256])
def test_kernel_matches_dequant_einsum(weights, bits, group_size):
    q = quantize(weights, bits=bits, group_size=group_size)
    rng = np.random.RandomState(1)
    x = rng.randn(16, K).astype(np.float32)
    out = quant_matmul(jnp.asarray(x), q, interpret=True)
    ref = x @ np.asarray(dequantize(q))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bits,tol", [(4, 0.06), (8, 0.005)])
def test_quantization_error_bounded(weights, bits, tol):
    q = quantize(weights, bits=bits, group_size=128)
    w_hat = np.asarray(dequantize(q))
    rel = np.abs(w_hat - weights).max() / np.abs(weights).max()
    assert rel < tol, f"{bits}-bit relative error {rel}"


def test_unaligned_m_padding(weights):
    q = quantize(weights, bits=4, group_size=128)
    rng = np.random.RandomState(2)
    x = rng.randn(3, K).astype(np.float32)        # M=3 -> padded to 8
    out = quant_matmul(jnp.asarray(x), q, interpret=True)
    ref = x @ np.asarray(dequantize(q))
    assert out.shape == (3, N)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_memory_footprint():
    q4 = quantize(np.zeros((K, N), np.float32) + 0.1, bits=4, group_size=128)
    dense_bytes = K * N * 2                        # bf16
    q_bytes = q4.packed.size + q4.scales.size * 4 + q4.zeros.size * 4
    assert q_bytes < dense_bytes / 3.5             # ~4x minus scale overhead
