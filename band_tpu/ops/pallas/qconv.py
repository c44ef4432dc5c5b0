"""Pallas TPU kernel: fused int8 2-D convolution + bit-exact requant.

Implicit-GEMM formulation of the INT8 serving conv (the op class that
dominates the ICN / magenta / retinaface latency): each program builds
the im2col matrix of its output-row band in VMEM (kh*kw shifted views
concatenated along K) and issues ONE MXU contraction with
K = kh*kw*Ci, instead of kh*kw accumulating K=Ci passes — the
contraction depth stays >= 128 even for 64-channel CNN layers, where
XLA's conv emitter reaches only ~45% of the int8 MXU peak
(docs/performance.md).  The TFLite requant pipeline (SRDHM + rounding
shift, ops/quant.py) runs on the VPU in the same program, so the int32
accumulator never round-trips HBM.

Reference behavior being matched: TFLite CONV_2D int8/uint8 kernels as
used by the reference's backend (band/backend/tfl/model_executor.cc
ExecuteSubgraph -> Interpreter::Invoke); bit-exactness is asserted
against the TFLite interpreter in tests.

Layout contract (stride 1, dilation 1):
  x_pad [N, OH+kh-1, OW+kw-1, Ci] int8 — already padded with the input
        zero point (the caller folds x_zp compensation into bias).
  w_km  [kh*kw*Ci, Oc] int8 — HWIO kernel reshaped row-major, i.e. the
        K axis orders taps (dy, dx, ci) exactly like the in-kernel
        im2col concatenation.
  bias/qm/shift [Oc] int32 — zero-point-folded bias + fixed-point
        requant multipliers (ops/quant.quantize_multipliers).

The input is pre-banded outside the kernel into overlapping row bands
(one tiny XLA copy, duplication factor (tile_h+kh-1)/tile_h) so the
halo reads map onto plain non-overlapping BlockSpecs and Pallas keeps
its automatic block pipelining.

Mosaic constraint: collapsing [th, ow, ci] -> [th*ow, ci] for int8
vectors requires the sublane dim (ow) to be a multiple of 32, so the
output width is padded up to a multiple of 32 inside the wrapper (the
extra columns read zero padding and are sliced off on the store);
callers should skip routing when the padding waste is prohibitive
(pick_tile_h reports the padded width).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-program VMEM budget for tile sizing (bytes); leaves headroom for
# Mosaic's own double buffering inside the ~16 MB/core VMEM.
_VMEM_BUDGET = 10 * 1024 * 1024
_MAX_ROWS = 8192  # im2col rows per program (M of the MXU contraction)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_estimate(th: int, oww: int, kh: int, kw: int, ci: int,
                   k: int, toc: int) -> int:
    m = th * oww
    band = (th + kh - 1) * (oww + kw - 1) * ci  # int8 input band
    a = m * k                                   # im2col matrix, int8
    acc = 4 * m * toc                           # int32 accumulator
    w = k * toc                                 # weight tile, int8
    out = m * toc                               # quantized output
    return band + a + acc + w + out


def pick_tile_h(oh: int, ow: int, kh: int, kw: int, ci: int,
                oc: int) -> Optional[int]:
    """Largest divisor of OH whose band fits the VMEM budget (None if
    even a single row does not fit)."""
    k = kh * kw * ci
    # mirror the grid's actual channel tile (qconv2d_exact below): oc not
    # divisible by a standard tile runs with toc = oc, so budget for it
    toc = oc if oc <= 512 else next(
        t for t in (512, 256, 128, oc) if oc % t == 0
    )
    oww = _round_up(ow, 32)
    for th in sorted((d for d in range(1, oh + 1) if oh % d == 0),
                     reverse=True):
        if th * oww > _MAX_ROWS:
            continue
        if _vmem_estimate(th, oww, kh, kw, ci, k, toc) <= _VMEM_BUDGET:
            return th
    return None


def _qconv_kernel(x_ref, w_ref, bias_ref, qm_ref, shift_ref, out_ref, *,
                  kh: int, kw: int, th: int, ow: int, oww: int, w_zp: int,
                  out_zp: int, qmin: int, qmax: int, rounding: str,
                  group: str = "full"):
    from .. import quant as Q

    ci = x_ref.shape[-1]
    m = th * oww

    def view(dy, dx):
        # [th, oww, ci] -> [th*oww, ci]: oww is 32-aligned so the
        # int8 collapse is a layout-preserving shape cast
        v = x_ref[0, 0, dy:dy + th, dx:dx + oww, :]
        return v.reshape(m, ci)

    # Tap grouping trades im2col relayout cost against MXU contraction
    # depth: "full" concatenates all kh*kw taps (K = kh*kw*ci), "row"
    # one dot per kernel row (K = kw*ci), "none" one dot per tap.
    acc = None
    rs = None
    if group == "full":
        slabs = [(jnp.concatenate(
            [view(dy, dx) for dy in range(kh) for dx in range(kw)], axis=1)
            if kh * kw > 1 else view(0, 0), 0)]
    elif group == "row":
        slabs = [
            (jnp.concatenate([view(dy, dx) for dx in range(kw)], axis=1)
             if kw > 1 else view(dy, 0), dy * kw)
            for dy in range(kh)
        ]
    else:  # "none"
        slabs = [(view(dy, dx), dy * kw + dx)
                 for dy in range(kh) for dx in range(kw)]
    for a, tap0 in slabs:
        kk = a.shape[1]
        part = jnp.dot(a, w_ref[tap0 * ci:tap0 * ci + kk, :],
                       preferred_element_type=jnp.int32)
        acc = part if acc is None else acc + part
        if w_zp != 0:
            r = jnp.sum(a.astype(jnp.int32), axis=1, keepdims=True)
            rs = r if rs is None else rs + r
    if w_zp != 0:
        # per-tensor weight zero point (uint8-era models): subtract
        # w_zp * window-sum(x); x_zp cross terms are folded into bias
        acc = acc - jnp.int32(w_zp) * rs
    acc = acc + bias_ref[:]
    out = Q.requantize_exact(
        acc, qm_ref[:], shift_ref[:], out_zp, qmin, qmax, out_ref.dtype,
        rounding=rounding,
    )
    out = out.reshape(th, oww, out_ref.shape[-1])
    out_ref[0] = out if oww == ow else out[:, :ow, :]


@functools.partial(
    jax.jit,
    static_argnames=("kh", "kw", "out_zp", "qmin", "qmax", "rounding",
                     "w_zp", "out_dtype", "tile_h", "interpret", "group"),
)
def qconv2d_exact(
    x_pad: jax.Array,   # [N, OH+kh-1, OW+kw-1, Ci] int8, zp-padded
    w_km: jax.Array,    # [kh*kw*Ci, Oc] int8
    bias: jax.Array,    # [Oc] int32 (zero-point-folded)
    qm: jax.Array,      # [Oc] int32 fixed-point multipliers
    shift: jax.Array,   # [Oc] int32
    kh: int,
    kw: int,
    out_zp: int = 0,
    qmin: int = -128,
    qmax: int = 127,
    rounding: str = "ruy",
    w_zp: int = 0,
    out_dtype=jnp.int8,
    tile_h: Optional[int] = None,
    interpret: Optional[bool] = None,
    group: str = "full",
) -> jax.Array:
    n, hp, wp, ci = x_pad.shape
    oh, ow = hp - kh + 1, wp - kw + 1
    k, oc = w_km.shape
    assert k == kh * kw * ci, (k, kh, kw, ci)
    if tile_h is None:
        tile_h = pick_tile_h(oh, ow, kh, kw, ci, oc)
    assert tile_h is not None and oh % tile_h == 0, (oh, tile_h)
    nb = oh // tile_h
    bh = tile_h + kh - 1
    oww = _round_up(ow, 32)
    if oww != ow:
        # extra columns only feed discarded outputs; any pad value works
        x_pad = jnp.pad(x_pad, ((0, 0), (0, 0), (0, oww - ow), (0, 0)))
    wpp = oww + kw - 1

    if nb == 1:
        bands = x_pad.reshape(n, 1, hp, wpp, ci)
    else:
        bands = jnp.stack(
            [
                lax.slice_in_dim(x_pad, b * tile_h, b * tile_h + bh, axis=1)
                for b in range(nb)
            ],
            axis=1,
        )

    toc = oc if oc <= 512 else next(
        t for t in (512, 256, 128, oc) if oc % t == 0
    )
    grid = (n, nb, oc // toc)
    kernel = functools.partial(
        _qconv_kernel, kh=kh, kw=kw, th=tile_h, ow=ow, oww=oww, w_zp=w_zp,
        out_zp=out_zp, qmin=qmin, qmax=qmax, rounding=rounding, group=group,
    )
    col = pl.BlockSpec((1, toc), lambda i, b, j: (0, j),
                       memory_space=pltpu.VMEM)
    m_rows = n * oh * oww
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, oc), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bh, wpp, ci),
                             lambda i, b, j: (i, b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, toc), lambda i, b, j: (0, j),
                             memory_space=pltpu.VMEM),
                col, col, col,
            ],
            out_specs=pl.BlockSpec((1, tile_h, ow, toc),
                                   lambda i, b, j: (i, b, 0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_rows * k * oc,
            bytes_accessed=n * nb * bh * wpp * ci + k * oc + m_rows * oc
            + 12 * oc,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"
                   if interpret is None else interpret),
    )(bands, w_km, bias.reshape(1, oc), qm.reshape(1, oc),
      shift.reshape(1, oc))
