"""Pallas TPU kernel: fused int8 depthwise conv + bit-exact requant.

Depthwise convs cannot use the MXU (each output channel contracts only
its own input channel), and XLA's grouped-conv lowering runs them at
0.1-1.7 int8 TOPS on the mobilenet-family shapes (docs/performance.md)
— the dominant cost of the depthwise-separable models at small channel
counts.  This kernel runs the op at the VPU's native layout instead:

  - the input is viewed as 2-D rows [H, W*C] so a horizontal tap shift
    (dx) becomes a contiguous lane slice at offset dx*C — every lane
    stays busy regardless of C (XLA's NHWC lowering wastes 1 - C/128
    of the VPU for C < 128);
  - per-tap weights / bias / requant multipliers are pre-tiled to the
    [W*C] lane layout outside the kernel, so the inner loop is
    kh*kw shifted int32 multiply-accumulates with zero relayouts;
  - the exact TFLite requant pipeline (ops/quant.py) runs in the same
    program, so the int32 accumulator never leaves VMEM.

Strided depthwise (e.g. the stride-2 layers of ICN/mobilenet) is
handled by phase pre-splitting OUTSIDE the kernel: the padded input is
split into sh*sw phase planes P[a][b] = x[a::sh, b::sw] (a cheap XLA
strided-slice relayout), after which tap (dy, dx) of the strided conv
is a contiguous lane slice of plane (dy%sh, dx%sw) at row dy//sh, lane
(dx//sw)*C — identical inner-loop structure to stride 1, every lane
busy, nothing strided inside the kernel.  Stride 1 is the 1-plane case
of the same kernel.

Reference behavior: TFLite DEPTHWISE_CONV_2D int8/uint8 kernels
(invoked by band/backend/tfl/model_executor.cc ExecuteSubgraph).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Budget for the *estimated* per-program footprint below; Mosaic's real
# stack allocation (double-buffered blocks + live vector temporaries of
# the tap loop) runs ~4x the estimate, so this keeps actual usage well
# under the 16 MB scoped-vmem limit (observed: estimate 4.1 MB ->
# actual 16.2 MB OOM at tile_h=112 on 112x112xc32).
_VMEM_BUDGET = int(2.5 * 1024 * 1024)


def _band_rows(th: int, kh: int, sh: int) -> int:
    """Phase-plane rows one band of th output rows reads."""
    return th + (kh - 1) // sh


def _vmem_estimate(th: int, kh: int, kw: int, sh: int, sw: int,
                   wpc: int, owc: int) -> int:
    # wpc here is the total lane width across all phase planes of one
    # band row (nph * plane_cols * c), i.e. the same input bytes as the
    # unsplit stride-1 band.
    band = _band_rows(th, kh, sh) * wpc   # int8 input band
    acc = 4 * th * owc                    # int32 accumulator
    tap = 4 * th * owc                    # int32 shifted view
    consts = 4 * 3 * owc + 4 * kh * kw * owc  # per-tap weights are int32
    return band + acc + tap + consts + th * owc


def pick_tile_h(oh: int, kh: int, kw: int, wpc: int, owc: int,
                sh: int = 1, sw: int = 1) -> Optional[int]:
    # Mosaic constraint: the output block's sublane dim must be
    # divisible by 8 or equal the full array dim (only exercised on
    # real TPU — interpret mode does not check).
    for th in sorted((d for d in range(1, oh + 1) if oh % d == 0
                      and (d == oh or d % 8 == 0)),
                     reverse=True):
        if _vmem_estimate(th, kh, kw, sh, sw, wpc, owc) <= _VMEM_BUDGET:
            return th
    return None


def _qdwconv_kernel(x_ref, w_ref, bias_ref, qm_ref, shift_ref, out_ref, *,
                    kh: int, kw: int, sh: int, sw: int, th: int, c: int,
                    owc: int, w_zp: int, out_zp: int, qmin: int, qmax: int,
                    rounding: str):
    from .. import quant as Q

    acc = None
    rs = None
    for dy in range(kh):
        for dx in range(kw):
            plane = (dy % sh) * sw + (dx % sw)
            r0 = dy // sh
            l0 = (dx // sw) * c
            v = x_ref[0, 0, plane, r0:r0 + th, l0:l0 + owc]
            vi = v.astype(jnp.int32)
            part = vi * w_ref[dy * kw + dx, :]
            acc = part if acc is None else acc + part
            if w_zp != 0:
                rs = vi if rs is None else rs + vi
    if w_zp != 0:
        acc = acc - jnp.int32(w_zp) * rs
    acc = acc + bias_ref[:]
    out_ref[0] = Q.requantize_exact(
        acc, qm_ref[:], shift_ref[:], out_zp, qmin, qmax, out_ref.dtype,
        rounding=rounding,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kh", "kw", "sh", "sw", "out_zp", "qmin", "qmax",
                     "rounding", "w_zp", "out_dtype", "tile_h", "interpret"),
)
def qdwconv2d_exact(
    x_pad: jax.Array,   # [N, (OH-1)*sh+kh, (OW-1)*sw+kw, C] int8, zp-padded
    w: jax.Array,       # [kh*kw, C] int32 per-tap weight rows
    bias: jax.Array,    # [C] int32 (zero-point-folded)
    qm: jax.Array,      # [C] int32 fixed-point multipliers
    shift: jax.Array,   # [C] int32
    kh: int,
    kw: int,
    sh: int = 1,
    sw: int = 1,
    out_zp: int = 0,
    qmin: int = -128,
    qmax: int = 127,
    rounding: str = "ruy",
    w_zp: int = 0,
    out_dtype=jnp.int8,
    tile_h: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    n, hp, wp, c = x_pad.shape
    oh, ow = (hp - kh) // sh + 1, (wp - kw) // sw + 1
    assert w.shape == (kh * kw, c), (w.shape, kh, kw, c)
    owc = ow * c
    # phase planes: plane (a, b) holds x_pad[a::sh, b::sw]; plane (a, b)
    # natively has exactly oh-1+ceil((kh-a)/sh) rows = oh+(kh-1-a)//sh,
    # pad all to the a=0 extent (padding is never read by that plane's
    # own taps)
    prow = oh + (kh - 1) // sh
    pcol = ow + (kw - 1) // sw
    planes = []
    for a in range(sh):
        for b in range(sw):
            p = x_pad[:, a::sh, b::sw, :]
            pr, pc = p.shape[1], p.shape[2]
            p = p[:, :min(pr, prow), :min(pc, pcol), :]
            dr, dc = prow - p.shape[1], pcol - p.shape[2]
            if dr or dc:
                p = jnp.pad(p, ((0, 0), (0, dr), (0, dc), (0, 0)))
            planes.append(p.reshape(n, prow, pcol * c))
    nph = sh * sw
    xph = jnp.stack(planes, axis=1) if nph > 1 else planes[0].reshape(
        n, 1, prow, pcol * c)
    w2c = pcol * c

    if tile_h is None:
        tile_h = pick_tile_h(oh, kh, kw, nph * w2c, owc, sh, sw)
    assert tile_h is not None and oh % tile_h == 0, (oh, tile_h)
    nb = oh // tile_h
    bh = _band_rows(tile_h, kh, sh)

    if nb == 1:
        bands = xph.reshape(n, 1, nph, prow, w2c)
    else:
        bands = jnp.stack(
            [
                lax.slice_in_dim(xph, b * tile_h, b * tile_h + bh, axis=2)
                for b in range(nb)
            ],
            axis=1,
        )
    # pre-tile per-channel vectors to the [OW*C] lane layout
    w_rows = jnp.tile(w.astype(jnp.int32), (1, ow))
    bias_t = jnp.tile(bias.reshape(1, c), (1, ow))
    qm_t = jnp.tile(qm.reshape(1, c), (1, ow))
    shift_t = jnp.tile(shift.reshape(1, c), (1, ow))

    grid = (n, nb)
    kernel = functools.partial(
        _qdwconv_kernel, kh=kh, kw=kw, sh=sh, sw=sw, th=tile_h, c=c,
        owc=owc, w_zp=w_zp, out_zp=out_zp, qmin=qmin, qmax=qmax,
        rounding=rounding,
    )
    row = pl.BlockSpec((1, owc), lambda i, b: (0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, oh, owc), out_dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, nph, bh, w2c),
                             lambda i, b: (i, b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kh * kw, owc), lambda i, b: (0, 0),
                             memory_space=pltpu.VMEM),
                row, row, row,
            ],
            out_specs=pl.BlockSpec((1, tile_h, owc), lambda i, b: (i, b, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * oh * owc * kh * kw,
            bytes_accessed=n * nb * nph * bh * w2c + n * oh * owc
            + (kh * kw + 12) * owc,
            transcendentals=0,
        ),
        interpret=(jax.default_backend() == "cpu"
                   if interpret is None else interpret),
    )(bands, w_rows, bias_t, qm_t, shift_t)
    return out.reshape(n, oh, ow, c)
