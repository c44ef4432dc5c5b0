"""Pallas fused int8 matmul+requant kernel vs the numpy oracle.

On the CPU test platform the kernel runs in the Pallas interpreter; on
TPU hardware it measured 360-367 int8 TOPS (91-93% of v5e peak) with
the requant epilogue fused (see bench notes in docs/performance.md)."""

import numpy as np
import pytest

from band_tpu.ops.pallas.qmatmul import qmatmul, qmatmul_reference


def test_qmatmul_matches_reference(rng):
    M, K, N = 256, 384, 256
    a = rng.integers(-128, 128, (M, K)).astype(np.int8)
    b = rng.integers(-128, 128, (K, N)).astype(np.int8)
    bias = rng.integers(-1000, 1000, (N,)).astype(np.int32)
    mult = (rng.random(N).astype(np.float32) * 1e-3)
    out = np.asarray(qmatmul(a, b, bias, mult, out_zp=3))
    ref = qmatmul_reference(a, b, bias, mult, out_zp=3)
    np.testing.assert_array_equal(out, ref)


def test_qmatmul_saturation(rng):
    M, K, N = 128, 128, 128
    a = np.full((M, K), 127, np.int8)
    b = np.full((K, N), 127, np.int8)
    bias = np.zeros(N, np.int32)
    mult = np.full(N, 1.0, np.float32)  # huge multiplier -> saturate
    out = np.asarray(qmatmul(a, b, bias, mult))
    assert (out == 127).all()
