"""Pallas TPU kernel: fused int8 matmul + requantization.

The hot op of INT8 serving: C_q = clamp(round((A_i8 @ B_i8 + bias) *
mult) + zp).  The MXU does the s8xs8->s32 contraction; the requant
epilogue runs on the VPU inside the same kernel, so the int32
accumulator never round-trips HBM (the fusion XLA does for us on the
standard path, here under explicit control for tiling experiments and
as the building block for future fused pipelines).

Layout: A [M, K] int8, B [K, N] int8, bias [N] int32, mult [N] float32.
Grid tiles (TM x TN) with the full K dimension resident per tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmatmul_kernel(a_ref, b_ref, bias_ref, mult_ref, out_ref, *,
                    out_zp: int, qmin: int, qmax: int):
    acc = jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.int32
    )
    acc = acc + bias_ref[:]
    scaled = jnp.round(
        acc.astype(jnp.float32) * mult_ref[:]
    ).astype(jnp.int32)
    out = jnp.clip(scaled + out_zp, qmin, qmax)
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_zp", "qmin", "qmax", "tile_m", "tile_n")
)
def qmatmul(
    a: jax.Array,  # [M, K] int8
    b: jax.Array,  # [K, N] int8
    bias: jax.Array,  # [N] int32
    mult: jax.Array,  # [N] float32
    out_zp: int = 0,
    qmin: int = -128,
    qmax: int = 127,
    tile_m: int = 256,
    tile_n: int = 256,
) -> jax.Array:
    M, K = a.shape
    K2, N = b.shape
    assert K == K2
    tile_m = min(tile_m, M)
    tile_n = min(tile_n, N)
    assert M % tile_m == 0 and N % tile_n == 0, (
        f"dims ({M},{N}) must tile by ({tile_m},{tile_n})"
    )
    grid = (M // tile_m, N // tile_n)
    kernel = functools.partial(
        _qmatmul_kernel, out_zp=out_zp, qmin=qmin, qmax=qmax
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int8),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N + 8 * N,
            transcendentals=0,
        ),
        # CPU test platforms run the kernel in the Pallas interpreter
        interpret=jax.default_backend() == "cpu",
    )(a, b, bias.reshape(1, N), mult.reshape(1, N))


def qmatmul_reference(a, b, bias, mult, out_zp=0, qmin=-128, qmax=127):
    """numpy oracle (same fast-rounding semantics)."""
    acc = a.astype(np.int64) @ b.astype(np.int64) + bias.astype(np.int64)
    scaled = np.rint(acc.astype(np.float32) * mult.astype(np.float32))
    return np.clip(scaled + out_zp, qmin, qmax).astype(np.int8)


# ---------------------------------------------------------------------------
# Bit-exact variant: the TFLite fixed-point requant pipeline runs on the
# VPU inside the kernel (32-bit limb SRDHM from ops/quant.py), so the
# serving path's FULLY_CONNECTED can fuse contraction + exact requant in
# one Pallas program.
# ---------------------------------------------------------------------------

def _qmatmul_exact_kernel(a_ref, b_ref, bias_ref, qm_ref, shift_ref,
                          out_ref, *, out_zp: int, qmin: int, qmax: int,
                          rounding: str, w_zp: int):
    from .. import quant as Q

    acc = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)
    if w_zp != 0:
        # per-tensor weight zero point (uint8-era models): subtract
        # w_zp * row-sum(x); the x_zp cross terms are folded into bias
        row_sum = jnp.sum(
            a_ref[:].astype(jnp.int32), axis=1, keepdims=True
        )
        acc = acc - jnp.int32(w_zp) * row_sum
    acc = acc + bias_ref[:]
    # requant clamps into [qmin, qmax] of the output dtype's own domain
    # (uint8 outputs use 0..255 with the original zero point), so a
    # plain cast finishes the job
    out_ref[:] = Q.requantize_exact(
        acc, qm_ref[:], shift_ref[:], out_zp, qmin, qmax, out_ref.dtype,
        rounding=rounding,
    )


@functools.partial(
    jax.jit,
    static_argnames=("out_zp", "qmin", "qmax", "rounding", "w_zp",
                     "out_dtype", "tile_m", "tile_n"),
)
def qmatmul_exact(
    a: jax.Array,      # [M, K] int8
    b: jax.Array,      # [K, N] int8
    bias: jax.Array,   # [N] int32 (zero-point-folded)
    qm: jax.Array,     # [N] int32 fixed-point multipliers
    shift: jax.Array,  # [N] int32
    out_zp: int = 0,
    qmin: int = -128,
    qmax: int = 127,
    rounding: str = "ruy",
    w_zp: int = 0,
    out_dtype=jnp.int8,
    tile_m: int = 256,
    tile_n: int = 256,
) -> jax.Array:
    M, K = a.shape
    K2, N = b.shape
    assert K == K2
    tile_m = min(tile_m, M)
    tile_n = min(tile_n, N)
    assert M % tile_m == 0 and N % tile_n == 0, (
        f"dims ({M},{N}) must tile by ({tile_m},{tile_n})"
    )
    grid = (M // tile_m, N // tile_n)
    kernel = functools.partial(
        _qmatmul_exact_kernel, out_zp=out_zp, qmin=qmin, qmax=qmax,
        rounding=rounding, w_zp=w_zp,
    )
    col = pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                col, col, col,
            ],
            out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N + 12 * N,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(a, b, bias.reshape(1, N), qm.reshape(1, N), shift.reshape(1, N))
