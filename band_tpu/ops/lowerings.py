"""JAX lowerings of TFLite builtin ops (quantized + float).

Conv/matmul ops run as int8xint8->int32 contractions (the TPU MXU
path) with zero-point corrections folded host-side into the bias at
prepare time; requantization is bit-exact TFLite fixed-point by default
(see ops/quant.py).  Elementwise/shape ops either run natively in the
quantized domain or fall back to dequant -> float -> requant, matching
what the reference's GPU/NNAPI delegates do for non-integer kernels.

Reference parity: these lowerings replace the TFLite kernel library the
reference delegates to (band/backend/tfl/model_executor.cc:249-255).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..errors import LoweringError
from ..ir.graph import Graph, OpNode, QuantParams, TensorDef
from . import quant as Q
from .registry import register


# --------------------------------------------------------------------------
# Lowering context
# --------------------------------------------------------------------------

class LowerCtx:
    """State threaded through one subgraph trace."""

    def __init__(
        self,
        graph: Graph,
        params: Dict[str, Any],
        meta: Dict[str, Any],
        exact: bool = True,
        conv_mode: str = "int8",
    ):
        self.graph = graph
        self.params = params
        self.meta = meta
        self.env: Dict[int, Any] = {}
        # tensor ids that enter this program from HBM (subgraph inputs);
        # set by SubgraphProgram.make_fn.  Kernels whose custom memory
        # layout would force a relayout of an in-program producer's
        # output (the Pallas depthwise kernel's flat [H, W*C] view) are
        # only routed when their input crosses this boundary.
        self.boundary_inputs: frozenset = frozenset()
        # vmap batch this trace will run under (continuous-batching
        # bucket size); under vmap the batch dim is invisible to the
        # trace, so the executor passes it through make_fn.  Lowerings
        # with batch-dependent strategy choices (window-sum form) read
        # it.
        self.batch_hint: int = 1
        self.exact = exact
        # "int8": native s8xs8->s32 contractions (TPU MXU path).
        # "f32_split": weights split into hi/lo nibbles, two f32 convs
        #   summed in int32 — bit-exact (all integers < 2^24) and fast on
        #   CPU backends whose int8 convs lower to scalar code.
        self.conv_mode = conv_mode

    # runtime value of a tensor (activation or weight param)
    def arr(self, tid: int):
        if tid in self.env:
            return self.env[tid]
        td = self.graph.tensor(tid)
        key = f"t{tid}"
        if key in self.params:
            return self.params[key]
        if td.is_constant:
            raise LoweringError(
                f"constant tensor {tid} ({td.name}) not prepared as param"
            )
        raise LoweringError(f"tensor {tid} ({td.name}) undefined during trace")

    def static(self, tid: int) -> np.ndarray:
        td = self.graph.tensor(tid)
        if not td.is_constant:
            raise LoweringError(
                f"tensor {tid} ({td.name}) must be a constant for this op"
            )
        return td.data

    def qp(self, tid: int) -> Optional[QuantParams]:
        return self.graph.tensor(tid).quant

    def is_quantized(self, tid: int) -> bool:
        td = self.graph.tensor(tid)
        return td.quant is not None and td.dtype.kind in ("i", "u")

    def set(self, tid: int, value) -> None:
        self.env[tid] = value

    def param(self, op: OpNode, name: str):
        return self.params[f"op{op.index}/{name}"]

    def smeta(self, op: OpNode, name: str):
        return self.meta[f"op{op.index}/{name}"]


# --------------------------------------------------------------------------
# Shared helpers
# --------------------------------------------------------------------------

def _scalar_qp(qp: QuantParams) -> Tuple[float, int]:
    return float(qp.scale[0]), int(qp.zero_point[0])


def _to_int8_domain(x, zp: int) -> Tuple[Any, int]:
    """Shift uint8 tensors into int8 so contractions hit the int8 MXU."""
    if x.dtype == jnp.uint8:
        x = lax.bitcast_convert_type(x ^ np.uint8(128), jnp.int8)
        zp -= 128
    return x, zp


def _same_pads(in_size: int, k: int, stride: int, dilation: int) -> Tuple[int, int]:
    eff_k = (k - 1) * dilation + 1
    out = -(-in_size // stride)
    total = max((out - 1) * stride + eff_k - in_size, 0)
    before = total // 2
    return before, total - before


def _conv_pads(opts, in_h, in_w, kh, kw) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    if opts["padding"] == "SAME":
        ph = _same_pads(in_h, kh, opts["stride_h"], opts.get("dilation_h", 1))
        pw = _same_pads(in_w, kw, opts["stride_w"], opts.get("dilation_w", 1))
        return ph, pw
    return (0, 0), (0, 0)


def as_float(ctx: LowerCtx, tid: int):
    """Runtime value of tensor `tid` as float32 (dequantizing if needed)."""
    x = ctx.arr(tid)
    if ctx.is_quantized(tid):
        s, zp = _scalar_qp(ctx.qp(tid))
        return Q.dequantize(x, s, zp)
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x

def store_real(ctx: LowerCtx, tid: int, val_f32) -> None:
    """Store a float32 result, quantizing if the tensor is quantized."""
    td = ctx.graph.tensor(tid)
    if ctx.is_quantized(tid):
        s, zp = _scalar_qp(td.quant)
        ctx.set(tid, Q.quantize(val_f32, s, zp, td.dtype))
    else:
        ctx.set(tid, val_f32.astype(td.dtype))


def _apply_float_activation(x, activation: str):
    if activation == "NONE":
        return x
    if activation == "RELU":
        return jnp.maximum(x, 0.0)
    if activation == "RELU6":
        return jnp.clip(x, 0.0, 6.0)
    if activation == "RELU_N1_TO_1":
        return jnp.clip(x, -1.0, 1.0)
    if activation == "TANH":
        return jnp.tanh(x)
    raise LoweringError(f"unsupported activation {activation}")


# --------------------------------------------------------------------------
# Integer contraction helpers
# --------------------------------------------------------------------------

def _int_conv(
    ctx: LowerCtx,
    x_i8,
    w_i8,
    strides,
    dil,
    dn,
    feature_group_count: int = 1,
    padding="VALID",
):
    """s8 x s8 -> s32 convolution (VALID by default; explicit padding
    pairs use the conv op's own ZERO halo).

    int8 mode contracts natively (MXU); f32_split mode runs two f32
    convolutions on hi/lo weight nibbles and recombines in int32 —
    exact because every partial value stays below 2^24."""
    if ctx.conv_mode == "int8":
        return lax.conv_general_dilated(
            x_i8, w_i8, strides, padding, rhs_dilation=dil,
            dimension_numbers=dn, feature_group_count=feature_group_count,
            preferred_element_type=jnp.int32,
        )
    w_i = w_i8.astype(jnp.int32)
    w_lo = (w_i & 15).astype(jnp.float32)
    w_hi = (w_i >> 4).astype(jnp.float32)
    xf = x_i8.astype(jnp.float32)
    if padding != "VALID":
        # zero halo, matching the int8 branch's conv-internal padding
        ph_, pw_ = padding
        xf = jnp.pad(xf, ((0, 0), tuple(ph_), tuple(pw_), (0, 0)))

    # |x|<=128, w_lo<=15, w_hi<=8 -> per-conv |acc| <= 1920*k; need
    # k <= 8192 for f32 exactness; chunk the input channels otherwise
    kh, kw = w_i8.shape[0], w_i8.shape[1]
    ci = w_i8.shape[2]
    k_taps = kh * kw * ci
    max_ci = max(8192 // (kh * kw), 1)

    def one(xs, wlo, whi):
        lo = lax.conv_general_dilated(
            xs, wlo, strides, "VALID", rhs_dilation=dil,
            dimension_numbers=dn, feature_group_count=feature_group_count,
            preferred_element_type=jnp.float32,
        )
        hi = lax.conv_general_dilated(
            xs, whi, strides, "VALID", rhs_dilation=dil,
            dimension_numbers=dn, feature_group_count=feature_group_count,
            preferred_element_type=jnp.float32,
        )
        return (hi.astype(jnp.int32) << 4) + lo.astype(jnp.int32)

    if k_taps <= 8192 or feature_group_count > 1:
        return one(xf, w_lo, w_hi)
    acc = None
    for c0 in range(0, ci, max_ci):
        c1 = min(c0 + max_ci, ci)
        part = one(
            xf[..., c0:c1], w_lo[:, :, c0:c1, :], w_hi[:, :, c0:c1, :]
        )
        acc = part if acc is None else acc + part
    return acc


def _int_dot(ctx: LowerCtx, x2_i8, w_io):
    """s8[b,k] x s8[k,n] -> s32 matmul with the same exactness strategy."""
    if ctx.conv_mode == "int8":
        return jnp.dot(x2_i8, w_io, preferred_element_type=jnp.int32)
    w_i = w_io.astype(jnp.int32)
    w_lo = (w_i & 15).astype(jnp.float32)
    w_hi = (w_i >> 4).astype(jnp.float32)
    xf = x2_i8.astype(jnp.float32)
    k = w_io.shape[0]
    acc = None
    for k0 in range(0, k, 8192):
        k1 = min(k0 + 8192, k)
        lo = jnp.dot(xf[:, k0:k1], w_lo[k0:k1],
                     preferred_element_type=jnp.float32)
        hi = jnp.dot(xf[:, k0:k1], w_hi[k0:k1],
                     preferred_element_type=jnp.float32)
        part = (hi.astype(jnp.int32) << 4) + lo.astype(jnp.int32)
        acc = part if acc is None else acc + part
    return acc


def _ones_conv(ctx: LowerCtx, x_i8, kh, kw, ci, strides, dil, dn,
               feature_group_count: int = 1):
    """Window-sum of x (the wzp correction term for nonzero weight zp,
    i.e. every uint8-weight model: TFLite conv reference kernel's
    sum_of_inputs term).

    Undilated windows are contiguous boxes, so at batch >= 4 the sum is
    computed as an integral image — channel reduce (dense case) +
    cumsum differences along H then W — pure vector adds instead of an
    all-ones conv whose 1-wide output occupies a full MXU pass per
    model conv.  At small batch the per-op overhead of the cumsum chain
    outweighs the MXU saving (mobilenet-v2-uint8, same phase: b1
    1.30 ms ones-conv vs 3.0 ms integral; b8/batch 13.3 ms ones-conv
    vs 6.15 ms integral), so b1/b2 keep the fused ones-conv.  Under
    vmap the batch dim is invisible, hence ctx.batch_hint.
    Exact either way: integer adds reproduce the conv's int32 sums
    bit-for-bit.
    """
    # NOTE (round-3 xprof study): computing the window sum as channel-
    # reduced tap-sums was tried and REGRESSED dense corrections — the
    # channel reduce leaves a C=1 minor dim, so every shifted add runs
    # at 1/128 lane utilization (ICN b1 device time 1.48 -> 2.37 ms).
    # Dense corrections stay on integral image (batch >= 4) / ones-conv
    # (below); the cheap paths for the expensive cases are ALGEBRAIC:
    # depthwise folds the zp into int32 tap weights, narrow-input stems
    # fold it into split int8 weights (two convs), pointwise convs
    # handle it inside the Pallas kernel.
    eff_batch = ctx.batch_hint * int(x_i8.shape[0])
    # the W-axis cumsum of row-box sums reaches ~127*ci*kh*Wp in int32
    # (dense case after the channel reduce) — far beyond the ones-conv
    # accumulator's ~127*ci*kh*kw; guard statically and fall back to the
    # conv when a pathological wide/deep input could overflow (ADVICE r2)
    ci_r = ci if feature_group_count == 1 else 1
    hp, wp = int(x_i8.shape[1]), int(x_i8.shape[2])
    cumsum_safe = 127 * ci_r * kh * max(hp, wp) < 2**31
    if dil == (1, 1) and eff_batch >= 4 and cumsum_safe:
        xi = x_i8.astype(jnp.int32)
        if feature_group_count == 1:
            xi = xi.sum(axis=-1)                     # [N, Hp, Wp]
        sh, sw = strides
        cs = jnp.cumsum(xi, axis=1)
        cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
        box = cs[:, kh:] - cs[:, :-kh]               # rows summed
        cs = jnp.cumsum(box, axis=2)
        cs = jnp.concatenate([jnp.zeros_like(cs[:, :, :1]), cs], axis=2)
        box = cs[:, :, kw:] - cs[:, :, :-kw]         # full kh*kw boxes
        box = box[:, ::sh, ::sw]
        if feature_group_count == 1:
            box = box[..., None]                     # [N, OH, OW, 1]
        return box
    # dilated windows are not contiguous boxes: all-ones conv fallback
    oc = 1 if feature_group_count == 1 else ci
    rhs_ci = ci if feature_group_count == 1 else 1
    if ctx.conv_mode == "int8":
        ones = jnp.ones((kh, kw, rhs_ci, oc), jnp.int8)
        return lax.conv_general_dilated(
            x_i8, ones, strides, "VALID", rhs_dilation=dil,
            dimension_numbers=dn, feature_group_count=feature_group_count,
            preferred_element_type=jnp.int32,
        )
    ones = jnp.ones((kh, kw, rhs_ci, oc), jnp.float32)
    s = lax.conv_general_dilated(
        x_i8.astype(jnp.float32), ones, strides, "VALID", rhs_dilation=dil,
        dimension_numbers=dn, feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32,
    )
    return s.astype(jnp.int32)


# --------------------------------------------------------------------------
# CONV_2D
# --------------------------------------------------------------------------

def _prepare_conv_common(
    graph: Graph,
    op: OpNode,
    w_td: TensorDef,
    w_hwio: np.ndarray,
    sum_axes: Tuple[int, ...],
    k_taps: int,
    exact: bool,
) -> Dict[str, Any]:
    """Shared quantized-conv prep: int8 weights + folded bias + multipliers.

    acc_true = conv(x', w') - w_zp * S(x'_pad) - x_zp * sum(w') + k*x_zp*w_zp
    The x_zp terms are static -> folded into bias.  w_hwio is the kernel
    already in HWIO layout; sum_axes are the axes summed per out-channel.
    """
    g = graph
    x_td = g.tensor(op.inputs[0])
    out_td = g.tensor(op.outputs[0])
    xs, xzp = _scalar_qp(x_td.quant)
    os_, ozp = _scalar_qp(out_td.quant)
    wq = w_td.quant
    # shift into int8 domain
    w_i = w_hwio.astype(np.int32)
    wzp_arr = wq.zero_point.astype(np.int32)
    if w_td.dtype == np.uint8:
        w_i = w_i - 128
        wzp_arr = wzp_arr - 128
        xzp -= 128
    w_i8 = w_i.astype(np.int8)
    wzp = int(wzp_arr[0]) if wzp_arr.size == 1 else 0
    if wzp_arr.size > 1 and np.any(wzp_arr != 0):
        raise LoweringError("per-channel weights must have zero_point 0")

    bias = np.zeros(w_hwio.shape[-1], np.int32)
    if len(op.inputs) > 2 and op.inputs[2] >= 0:
        bias = g.tensor(op.inputs[2]).data.astype(np.int32).copy()
    w_sum = w_i.sum(axis=sum_axes).astype(np.int64)
    bias_eff = (
        bias.astype(np.int64) - xzp * w_sum + k_taps * xzp * wzp
    ).astype(np.int32)

    # TFLite multiplier precision semantics (bit-exactness matters):
    # per-tensor: double(float32(s_x * s_w)) / double(s_out)
    #   (GetQuantizedConvolutionMultipler does the product in float)
    # per-channel: double(s_x) * double(s_w_i) / double(s_out)
    if wq.scale.size == 1:
        prod = np.float64(np.float32(np.float32(xs) * wq.scale[0]))
        multipliers = np.array([prod / np.float64(os_)])
    else:
        multipliers = (
            np.float64(xs) * wq.scale.astype(np.float64)
        ) / np.float64(os_)
    out = {
        "w": w_i8,
        "bias": bias_eff,
        "x_zp": xzp,
        "w_zp": wzp,
    }
    if exact:
        qm, shift = Q.quantize_multipliers(multipliers)
        out["qm"] = qm
        out["shift"] = shift
    else:
        out["mult"] = multipliers.astype(np.float32)
    act = op.options.get("activation", "NONE")
    qmin, qmax = Q.activation_range(act, os_, ozp, out_td.dtype)
    out["qmin"], out["qmax"], out["out_zp"] = qmin, qmax, ozp
    # conv kernels requantize through ruy's pipeline (SRDHM + half-up
    # rounding shift), the cpu_backend_gemm path in TFLite 2.9+
    out["rounding"] = "ruy"
    return out


def _asym_quant_rows(x):
    """Dynamic-range activations: quantize a float batch to int8 per
    batch element (asymmetric, TFLite tensor_utils semantics).  Returns
    (q, zp, scale) broadcastable over x; degenerate (all-zero) rows get
    q=0, zp=0, scale=1 exactly as AsymmetricQuantizeFloats does."""
    n = x.shape[0]
    flat = x.reshape(n, -1)
    bshape = (n,) + (1,) * (x.ndim - 1)
    rmin = jnp.minimum(flat.min(axis=1), 0.0).reshape(bshape)
    rmax = jnp.maximum(flat.max(axis=1), 0.0).reshape(bshape)
    degenerate = rmax <= rmin
    scale = jnp.where(degenerate, 1.0, (rmax - rmin) / 255.0)
    zp = jnp.clip(Q.round_ties_away(-128.0 - rmin / scale), -128.0, 127.0)
    zp = jnp.where(degenerate, 0.0, zp)
    q = jnp.clip(Q.round_ties_away(x / scale) + zp, -128.0, 127.0)
    q = jnp.where(degenerate, 0.0, q)
    return q, zp, scale


def _hybrid_quant_input(x):
    """Conv flavor of the above: subtract the zero point up front so
    padded zeros represent real 0.0 exactly.  Returns (residual float32
    integers in [-255, 255], per-batch scale broadcastable over x)."""
    q, zp, scale = _asym_quant_rows(x)
    return (q - zp).astype(jnp.float32), scale


def _prepare_hybrid_conv(graph: Graph, op: OpNode, w_layout) -> Dict[str, Any]:
    w_td = graph.tensor(op.inputs[1])
    d: Dict[str, Any] = {
        "w_q": w_layout.astype(np.float32),  # small ints, f32 conv-ready
        "w_scale": w_td.quant.scale.astype(np.float32),  # [out]
    }
    if len(op.inputs) > 2 and op.inputs[2] >= 0:
        d["bias"] = graph.tensor(op.inputs[2]).data.astype(np.float32)
    return d


def _prepare_conv2d(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
    w_td = graph.tensor(op.inputs[1])
    x_td = graph.tensor(op.inputs[0])
    if x_td.quant is None or x_td.dtype.kind == "f":
        w = np.transpose(w_td.data, (1, 2, 3, 0))  # OHWI -> HWIO
        if w.dtype.kind in "iu" and w_td.quant is not None:
            return _prepare_hybrid_conv(graph, op, w)
        # float conv: just re-layout weights
        d: Dict[str, Any] = {"w": w.astype(np.float32)}
        if len(op.inputs) > 2 and op.inputs[2] >= 0:
            d["bias"] = graph.tensor(op.inputs[2]).data.astype(np.float32)
        return d
    w_hwio = np.transpose(w_td.data, (1, 2, 3, 0))  # OHWI -> HWIO
    kh, kw, ci, _ = w_hwio.shape
    out = _prepare_conv_common(
        graph, op, w_td, w_hwio, sum_axes=(0, 1, 2), k_taps=kh * kw * ci,
        exact=exact,
    )
    # (Negative result, round 4: H-folding tiny-ci stems into the
    # channel dim — concat kh H-shifted views, one [1, kw] conv over
    # kh*ci channels — REGRESSED on device (ICN op050 0.75 -> 0.98
    # ms/iter): the concat write costs more than the contraction-lane
    # win.  Space-to-depth phase-folding of stride-2 stems regressed
    # the same way (mobilenet op000 1.58 -> 2.06 ms/iter at b32: the
    # strided lane-dim phase extraction is the cost).  The tiny-ci
    # stem wall is data movement in every reformulation tried;
    # docs/performance.md.)
    # narrow-input convs with nonzero weight zp (e.g. a uint8 model's
    # stem conv, ci=3): the window-sum correction runs at ci/128 lane
    # utilization and can cost several times the conv itself (xprof:
    # mobilenet's stem correction was 28% of the whole b1 program).
    # Fold the zp into the weights instead — conv(x, w - wzp) — split
    # into two int8 tensors since w - wzp spans [-255, 255]: two cheap
    # convs replace conv + correction, bit-exactly.
    if out.get("w_zp") and ci <= 16 and (kh, kw) != (1, 1):
        w_i = w_hwio.astype(np.int32)
        if w_td.dtype == np.uint8:
            w_i = w_i - 128
        wp_ = w_i - int(out["w_zp"])
        # clip the first tensor to [-127, 127] so the remainder stays in
        # int8 for |wp_| <= 254; wp_ == 255 (weight 127 with recentered
        # wzp == -128) has no exact two-int8 split — skip the fold
        # rather than let .astype(int8) wrap 128 -> -128 (ADVICE r4)
        w_a = np.clip(wp_, -127, 127)
        if (wp_ - w_a).max() > 127:  # remainder -128 is still valid int8
            return out
        out["w_split_a"] = w_a.astype(np.int8)
        out["w_split_b"] = (wp_ - w_a).astype(np.int8)
        # edge-correction plane: the split-stem conv runs with the
        # conv op's own ZERO padding (no explicit x_zp-filled pad —
        # the jnp.pad relayout copy was 47% of retinaface's b1 device
        # time); zero instead of x_zp in the halo under-counts each
        # border output by x_zp * (sum of the w' taps hanging off the
        # input), a STATIC per-position constant added back here.
        o = op.options
        sh_, sw_ = o["stride_h"], o["stride_w"]
        dh_ = o.get("dilation_h", 1)
        dw2 = o.get("dilation_w", 1)
        in_h, in_w = int(x_td.shape[1]), int(x_td.shape[2])
        ph_, pw_ = _conv_pads(o, in_h, in_w, kh, kw)
        hp, wp2 = in_h + ph_[0] + ph_[1], in_w + pw_[0] + pw_[1]
        oh = (hp - (kh - 1) * dh_ - 1) // sh_ + 1
        ow = (wp2 - (kw - 1) * dw2 - 1) // sw_ + 1
        wsum_ab = wp_.sum(axis=2)  # [kh, kw, oc]
        inside_h = np.zeros((oh, kh), bool)
        inside_w = np.zeros((ow, kw), bool)
        for a in range(kh):
            rows = np.arange(oh) * sh_ + a * dh_ - ph_[0]
            inside_h[:, a] = (rows >= 0) & (rows < in_h)
        for b in range(kw):
            cols = np.arange(ow) * sw_ + b * dw2 - pw_[0]
            inside_w[:, b] = (cols >= 0) & (cols < in_w)
        # plane[i,j,c] = xzp * sum over taps OUTSIDE the input
        outside = ~(inside_h[:, None, :, None]
                    & inside_w[None, :, None, :])  # [oh, ow, kh, kw]
        plane = np.int32(out["x_zp"]) * np.einsum(
            "ijab,abc->ijc", outside.astype(np.int64), wsum_ab
        ).astype(np.int32)
        out["edge_plane"] = plane
    return out


def _pallas_qmm(ctx: LowerCtx, op: OpNode, x2, w2, wzp: int, out_td):
    """Fused Pallas int8 matmul + bit-exact requant for ops that reduce
    to a GEMM (FC, pointwise conv).  x2 [M, K] int8-domain, w2 [K, N].

    M is padded up to the kernel's 256-row tile (zero rows, sliced off
    after) so every pointwise conv rides the fused kernel — round-2's
    divisibility routing sent e.g. mobilenet's 56^2/28^2 pointwise
    convs (m = 3136/784) down the generic conv + window-sum path,
    whose correction ran at 1/128 lane utilization (xprof round 3)."""
    from .pallas.qmatmul import qmatmul_exact

    m = x2.shape[0]
    m_pad = -m % 256 if m > 256 else 0
    if m_pad:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((m_pad, x2.shape[1]), x2.dtype)], axis=0
        )
    n_out = w2.shape[1]
    qm = jnp.broadcast_to(
        jnp.asarray(ctx.param(op, "qm"), jnp.int32).reshape(-1), (n_out,)
    )
    shift = jnp.broadcast_to(
        jnp.asarray(ctx.param(op, "shift"), jnp.int32).reshape(-1),
        (n_out,),
    )
    out = qmatmul_exact(
        x2, w2, ctx.param(op, "bias"), qm, shift,
        out_zp=int(ctx.smeta(op, "out_zp")),
        qmin=int(ctx.smeta(op, "qmin")),
        qmax=int(ctx.smeta(op, "qmax")),
        rounding=ctx.smeta(op, "rounding"),
        w_zp=int(wzp),
        out_dtype=out_td.dtype,
    )
    return out[:m] if m_pad else out


def _conv_requant(ctx: LowerCtx, op: OpNode, acc):
    qmin = ctx.smeta(op, "qmin")
    qmax = ctx.smeta(op, "qmax")
    ozp = ctx.smeta(op, "out_zp")
    out_td = ctx.graph.tensor(op.outputs[0])
    if ctx.exact:
        return Q.requantize_exact(
            acc, ctx.param(op, "qm"), ctx.param(op, "shift"), ozp, qmin, qmax,
            out_td.dtype, rounding=ctx.smeta(op, "rounding"),
        )
    return Q.requantize_fast(
        acc, ctx.param(op, "mult"), ozp, qmin, qmax, out_td.dtype
    )


@register("CONV_2D", prepare=_prepare_conv2d)
def _conv2d(ctx: LowerCtx, op: OpNode) -> None:
    g = ctx.graph
    x = ctx.arr(op.inputs[0])
    hybrid = f"op{op.index}/w_q" in ctx.params
    w = ctx.param(op, "w_q" if hybrid else "w")
    opts = op.options
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = _conv_pads(opts, x.shape[1], x.shape[2], kh, kw)
    dil = (opts.get("dilation_h", 1), opts.get("dilation_w", 1))
    strides = (opts["stride_h"], opts["stride_w"])
    dn = ("NHWC", "HWIO", "NHWC")

    if not ctx.is_quantized(op.inputs[0]):
        scale = None
        if hybrid:
            x, scale = _hybrid_quant_input(x)
        acc = lax.conv_general_dilated(
            x, w, strides, (ph, pw), rhs_dilation=dil, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        if hybrid:
            acc = acc * (scale * ctx.param(op, "w_scale"))
        if f"op{op.index}/bias" in ctx.params:
            acc = acc + ctx.param(op, "bias")
        out = _apply_float_activation(acc, opts.get("activation", "NONE"))
        ctx.set(op.outputs[0], out.astype(g.tensor(op.outputs[0]).dtype))
        return

    xzp = ctx.smeta(op, "x_zp")
    wzp = ctx.smeta(op, "w_zp")
    x, _ = _to_int8_domain(x, 0)
    # pointwise (1x1/s1) convs are matmuls: fuse contraction + bit-exact
    # requant in one Pallas program (the dominant op class of the
    # mobilenet family); conditions mirror the FC routing
    out_td = g.tensor(op.outputs[0])
    if (
        ctx.conv_mode == "int8"
        and ctx.exact
        and (kh, kw) == (1, 1)
        and strides == (1, 1)
        and dil == (1, 1)
        and ph == (0, 0)
        and pw == (0, 0)
        and (w.shape[-1] <= 256 or w.shape[-1] % 256 == 0)
    ):
        n, hh, ww, ci = x.shape
        oc = w.shape[-1]
        m = n * hh * ww
        # wzp != 0: ANY m rides the kernel (_pallas_qmm zero-pads the
        # row tile) — in-kernel zp handling beats generic conv + a
        # 1/128-lane window-sum correction at every shape.  wzp == 0:
        # keep the aligned-tile routing only (XLA's fused conv wins at
        # odd shapes — ICN b1 regression study, docs/performance.md).
        if (wzp != 0 and m >= 64) or m <= 256 or m % 256 == 0:
            out = _pallas_qmm(ctx, op, x.reshape(m, ci), w.reshape(ci, oc),
                              wzp, out_td)
            ctx.set(op.outputs[0], out.reshape(n, hh, ww, oc))
            return
    if f"op{op.index}/w_split_a" in ctx.params:
        # zp folded into split weights (narrow-input conv): two int8
        # convs, no window-sum correction (see _prepare_conv2d).  At
        # serving buckets the convs use their own ZERO padding + the
        # prepare-time edge plane (no pad copy); at b1 reading the
        # plane constant costs more than the pad (mobilenet b1 0.89 ->
        # 1.04 ms/iter same-trace A/B), so small batches keep the
        # x_zp-filled pad.
        if ctx.batch_hint * int(x.shape[0]) >= 4:
            acc = _int_conv(
                ctx, x, ctx.param(op, "w_split_a"), strides, dil, dn,
                padding=(ph, pw),
            ) + _int_conv(
                ctx, x, ctx.param(op, "w_split_b"), strides, dil, dn,
                padding=(ph, pw),
            ) + ctx.param(op, "edge_plane")
        else:
            x_pad = jnp.pad(x, ((0, 0), ph, pw, (0, 0)),
                            constant_values=np.int8(xzp))
            acc = _int_conv(
                ctx, x_pad, ctx.param(op, "w_split_a"), strides, dil, dn
            ) + _int_conv(
                ctx, x_pad, ctx.param(op, "w_split_b"), strides, dil, dn
            )
    elif wzp == 0 and ctx.batch_hint * int(x.shape[0]) >= 4:
        # Serving buckets only: conv-internal ZERO padding + an
        # in-graph edge plane instead of an explicit x_zp-filled pad.
        # jnp.pad materializes a relayout copy of the whole activation
        # per conv (3 x 1 ms of s8[32,114,114,64] copies per ICN b32
        # iteration — removing them measured 66.7 -> 63.0 ms); zero
        # instead of x_zp in the halo under-counts each border output
        # by x_zp * (sum of taps hanging off the input), computed here
        # from tiny static masks and fused by XLA into the conv
        # epilogue.  At b1 the per-conv plane einsum costs more than
        # the pad copy (retinaface b1 1.13 -> 1.21 ms), so small
        # batches keep the pad.  Bit-exact either way.
        acc = _int_conv(ctx, x, w, strides, dil, dn, padding=(ph, pw))
        if xzp != 0 and (ph != (0, 0) or pw != (0, 0)):
            in_h, in_w = int(x.shape[1]), int(x.shape[2])
            oh = int(acc.shape[1])
            ow = int(acc.shape[2])
            dh_, dw2 = dil
            ins_h = np.zeros((oh, kh), np.int32)
            ins_w = np.zeros((ow, kw), np.int32)
            for a in range(kh):
                rows = np.arange(oh) * strides[0] + a * dh_ - ph[0]
                ins_h[:, a] = (rows >= 0) & (rows < in_h)
            for b in range(kw):
                cols = np.arange(ow) * strides[1] + b * dw2 - pw[0]
                ins_w[:, b] = (cols >= 0) & (cols < in_w)
            wsum_ab = (
                jnp.asarray(w, jnp.int32).sum(axis=2)  # [kh, kw, oc]
            )
            total = wsum_ab.sum(axis=(0, 1))  # [oc]
            inside = jnp.einsum(
                "ia,jb,abc->ijc", jnp.asarray(ins_h), jnp.asarray(ins_w),
                wsum_ab,
            )
            acc = acc + jnp.int32(xzp) * (total[None, None, :] - inside)
    else:
        # pad explicitly with the zero point so padded taps vanish in
        # real space (wzp != 0: the window-sum correction needs the
        # x_zp-filled halo)
        x_pad = jnp.pad(x, ((0, 0), ph, pw, (0, 0)),
                        constant_values=np.int8(xzp))
        acc = _int_conv(ctx, x_pad, w, strides, dil, dn)
        if wzp != 0:
            s = _ones_conv(ctx, x_pad, kh, kw, x.shape[-1], strides, dil,
                           dn)
            acc = acc - jnp.int32(wzp) * s
    acc = acc + ctx.param(op, "bias")
    ctx.set(op.outputs[0], _conv_requant(ctx, op, acc))


# --------------------------------------------------------------------------
# DEPTHWISE_CONV_2D
# --------------------------------------------------------------------------

def _prepare_dwconv2d(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
    w_td = graph.tensor(op.inputs[1])
    x_td = graph.tensor(op.inputs[0])
    # TFLite layout [1, kh, kw, out_c]; lax wants HWIO [kh, kw, 1, out_c]
    w_hwio = np.transpose(w_td.data, (1, 2, 0, 3))
    if x_td.quant is None or x_td.dtype.kind == "f":
        if w_hwio.dtype.kind in "iu" and w_td.quant is not None:
            return _prepare_hybrid_conv(graph, op, w_hwio)
        d: Dict[str, Any] = {"w": w_hwio.astype(np.float32)}
        if len(op.inputs) > 2 and op.inputs[2] >= 0:
            d["bias"] = graph.tensor(op.inputs[2]).data.astype(np.float32)
        return d
    kh, kw = w_hwio.shape[0], w_hwio.shape[1]
    out = _prepare_conv_common(
        graph, op, w_td, w_hwio, sum_axes=(0, 1, 2), k_taps=kh * kw,
        exact=exact,
    )
    # Dense block-diagonal formulation: a depthwise conv with C <= 128
    # re-expressed as a DENSE conv whose weight is delta-diagonal —
    # w_dense[a,b,i,j] = w[a,b,j] * (i == j).  The MXU is idle during a
    # grouped conv / tap accumulation anyway (both are relayout- or
    # lane-bound); the dense conv rides the same near-roofline emitter
    # as every other conv, and the off-diagonal zeros contribute
    # exactly 0 to the int32 accumulator, so it is bit-exact by
    # construction.  Measured on ICN b32 (ops 39/51, 112^2 s2 C=64):
    # 2.9 ms/iter of per-slice tap converts -> ~0.3 ms of MXU time.
    # wzp != 0 (uint8-era models): fold the zp into the diagonal —
    # conv(x, w - wzp) == conv(x, w) - wzp*winsum(x) exactly — and
    # split into TWO int8 delta tensors since w - wzp spans
    # [-255, 255] (the stem w_split trick, applied diagonally).  The
    # doubled MACs bound the worthwhile C lower (<= 96: mobilenet's
    # 112^2/56^2 dw layers, its round-4 b32 hot spots).
    c = w_hwio.shape[-1]
    x_shape = x_td.shape
    wzp = out.get("w_zp", 0)
    # C gate: the dense emitter is contraction-lane-starved below
    # C=64 (mobilenet's C=32 112^2 layer regressed 0.39 -> 1.74 ms at
    # b32; its C=96 layer won 2.45 -> 0.57 — xprof round 4), and the
    # doubled-MAC split variant stops paying above C=96.
    if x_shape and x_shape[-1] == c and c >= 64:  # depth multiplier 1
        idx = np.arange(c)
        if wzp == 0 and c <= 128:
            dense = np.zeros((kh, kw, c, c), np.int8)
            dense[:, :, idx, idx] = out["w"][:, :, 0, :]
            out["w_dense"] = dense
        elif wzp != 0 and c <= 96:
            w_i = out["w"][:, :, 0, :].astype(np.int32) - int(wzp)
            # clip to [-127, 127] so the remainder fits int8 for
            # |w_i| <= 254; w_i == 255 can't split into two int8 taps —
            # keep tap accumulation there instead of wrapping a
            # diagonal by 256 (ADVICE r4)
            a = np.clip(w_i, -127, 127)
            if (w_i - a).max() <= 127:  # remainder -128 is valid int8
                dense = np.zeros((kh, kw, c, c), np.int8)
                dense[:, :, idx, idx] = a.astype(np.int8)
                out["w_dense"] = dense
                dense_b = np.zeros((kh, kw, c, c), np.int8)
                dense_b[:, :, idx, idx] = (w_i - a).astype(np.int8)
                out["w_dense_b"] = dense_b
    return out


def _dw_tap_acc(x_pad, w, ksize, strides, dil, mult=1, wzp=0,
                cast_per_slice=True):
    """Depthwise conv as shifted elementwise multiply-adds.

    y[n,i,j,c] = sum_{a,b} x[n, i*sh + a*dh, j*sw + b*dw, c//mult]
                 * (w[a, b, c] - wzp) accumulated in int32 — kh*kw
    strided slices of the padded input, each multiplied by the tap's
    per-channel weight row and added.  The weight zero point folds
    directly into the int32 tap weights (conv(x, w) - wzp*winsum(x)
    == conv(x, w - wzp) exactly), so no correction term exists at
    all — the int8-range constraint that forces TFLite's
    sum-of-inputs term only applies to int8 MXU operands."""
    kh, kw = ksize
    sh, sw = strides
    dh, dw_ = dil
    hp, wp = int(x_pad.shape[1]), int(x_pad.shape[2])
    oh = (hp - (kh - 1) * dh - 1) // sh + 1
    ow = (wp - (kw - 1) * dw_ - 1) // sw + 1
    xi = x_pad if cast_per_slice else x_pad.astype(jnp.int32)
    if mult > 1:
        xi = jnp.repeat(xi, mult, axis=-1)
    wv = jnp.asarray(w).reshape(kh, kw, -1).astype(jnp.int32) - jnp.int32(
        wzp
    )
    acc = None
    for a in range(kh):
        for b in range(kw):
            sl = xi[
                :,
                a * dh: a * dh + (oh - 1) * sh + 1: sh,
                b * dw_: b * dw_ + (ow - 1) * sw + 1: sw,
                :,
            ]
            # serving buckets cast per tap AFTER slicing: an up-front
            # astype(int32) of the whole padded tensor materializes an
            # int32 relayout copy (int8 (32,128) vs int32 (8,128)
            # tiling — 2 x 0.5 ms per ICN b32 iteration); at b1 the
            # up-front cast wins (mobilenet b1 0.89 vs 1.05 ms/iter)
            term = (sl.astype(jnp.int32) if cast_per_slice else sl) \
                * wv[a, b]
            acc = term if acc is None else acc + term
    return acc


@register("DEPTHWISE_CONV_2D", prepare=_prepare_dwconv2d)
def _dwconv2d(ctx: LowerCtx, op: OpNode) -> None:
    g = ctx.graph
    x = ctx.arr(op.inputs[0])
    hybrid = f"op{op.index}/w_q" in ctx.params
    w = ctx.param(op, "w_q" if hybrid else "w")
    opts = op.options
    kh, kw = w.shape[0], w.shape[1]
    ci = x.shape[-1]
    mult = w.shape[-1] // ci
    ph, pw = _conv_pads(opts, x.shape[1], x.shape[2], kh, kw)
    dil = (opts.get("dilation_h", 1), opts.get("dilation_w", 1))
    strides = (opts["stride_h"], opts["stride_w"])
    dn = ("NHWC", "HWIO", "NHWC")

    if not ctx.is_quantized(op.inputs[0]):
        scale = None
        if hybrid:
            x, scale = _hybrid_quant_input(x)
        acc = lax.conv_general_dilated(
            x, w, strides, (ph, pw), rhs_dilation=dil, dimension_numbers=dn,
            feature_group_count=ci, preferred_element_type=jnp.float32,
        )
        if hybrid:
            acc = acc * (scale * ctx.param(op, "w_scale"))
        if f"op{op.index}/bias" in ctx.params:
            acc = acc + ctx.param(op, "bias")
        out = _apply_float_activation(acc, opts.get("activation", "NONE"))
        ctx.set(op.outputs[0], out.astype(g.tensor(op.outputs[0]).dtype))
        return

    xzp = ctx.smeta(op, "x_zp")
    wzp = ctx.smeta(op, "w_zp")
    x, _ = _to_int8_domain(x, 0)
    x_pad = jnp.pad(x, ((0, 0), ph, pw, (0, 0)),
                    constant_values=np.int8(xzp))
    # Narrow-channel depthwise runs on the Pallas VPU kernel: XLA's
    # grouped-conv lowering wastes 1 - C/128 of the lanes and is
    # 1.3-5x slower for C <= 64 as a standalone op (docs/
    # performance.md); the kernel keeps all lanes busy in the flattened
    # [H, W*C] layout and fuses the bit-exact requant.  Strided layers
    # ride the same kernel via phase pre-splitting (qdwconv.py).
    # ONLY when the input enters the program from HBM: mid-model (dw
    # consuming a conv's output) the relayout into the flat lane view
    # costs far more than the kernel saves — measured conv0+dw1 of
    # mobilenet-v2 0.77 ms fused-Pallas vs 0.25 ms XLA, and whole-model
    # regressions on every dw model (2026-08-20 probes).
    out_td = g.tensor(op.outputs[0])
    if (
        ctx.conv_mode == "int8"
        and ctx.exact
        and mult == 1
        and dil == (1, 1)
        and ci <= 64
        and op.inputs[0] in ctx.boundary_inputs
    ):
        from .pallas.qdwconv import pick_tile_h, qdwconv2d_exact

        sh_, sw_ = strides
        oh = (x_pad.shape[1] - kh) // sh_ + 1
        ow = (x_pad.shape[2] - kw) // sw_ + 1
        if pick_tile_h(oh, kh, kw,
                       sh_ * sw_ * (ow + (kw - 1) // sw_) * ci,
                       ow * ci, sh_, sw_) is not None:
            qm = jnp.broadcast_to(
                jnp.asarray(ctx.param(op, "qm"), jnp.int32).reshape(-1),
                (ci,))
            shift = jnp.broadcast_to(
                jnp.asarray(ctx.param(op, "shift"), jnp.int32).reshape(-1),
                (ci,))
            out = qdwconv2d_exact(
                x_pad, w.reshape(kh * kw, ci).astype(jnp.int32),
                ctx.param(op, "bias"), qm, shift, kh=kh, kw=kw,
                sh=sh_, sw=sw_,
                out_zp=int(ctx.smeta(op, "out_zp")),
                qmin=int(ctx.smeta(op, "qmin")),
                qmax=int(ctx.smeta(op, "qmax")),
                rounding=ctx.smeta(op, "rounding"), w_zp=int(wzp),
                out_dtype=out_td.dtype,
            )
            ctx.set(op.outputs[0], out)
            return
    # Tap-accumulation instead of lax grouped conv: a depthwise conv is
    # kh*kw shifted elementwise multiply-adds over the FULL channel
    # lane dim — int32 VPU work at 100% lane utilization for any C,
    # where XLA's grouped-conv lowering wastes 1 - C/128 of the lanes
    # (measured 6-7 Gelem/s for C < 128, docs/performance.md) and the
    # Pallas flat-lane kernel costs a relayout mid-model.  Bit-exact:
    # the integer adds reproduce the conv's int32 sums exactly; the
    # weight-zero-point window sum rides the same slices for free.
    # Default for ALL strides: same-phase A/Bs measured strided taps
    # ~10-25% faster than grouped conv on mobilenet-v2 (b32 0.66 vs
    # 0.87 ms/inf) and identical on ICN (docs/performance.md round-3
    # table).  Experiment knobs: BAND_DW_TAP=0 disables tap-
    # accumulation entirely (grouped conv); BAND_DW_TAP_STRIDED=0
    # reverts only strided layers.
    # taps pay off whenever they fold a zero point away (every uint8-
    # weight model) or the batch is a serving bucket (b>=4: full-lane
    # elementwise beats the lane-starved grouped conv; measured neutral
    # for the zp-free b1 case, where grouped conv stays)
    eff_batch = ctx.batch_hint * int(x.shape[0])
    # dense block-diagonal routing (see _prepare_dwconv2d): serving
    # buckets put the depthwise on the MXU via a delta-diagonal dense
    # weight — bit-exact, and ~10x faster than tap accumulation on the
    # strided ICN layers (BAND_DW_DENSE=0 reverts)
    dense_key = f"op{op.index}/w_dense"
    if (
        dense_key in ctx.params
        and ctx.conv_mode == "int8"
        and (eff_batch >= 4 or os.environ.get("BAND_DW_DENSE_B1") == "1")
        and os.environ.get("BAND_DW_DENSE", "1") != "0"
    ):
        acc = _int_conv(ctx, x_pad, ctx.param(op, "w_dense"), strides, dil,
                        dn)
        if f"op{op.index}/w_dense_b" in ctx.params:
            # zp-folded diagonal split into two int8 tensors (values
            # span [-255, 255]); no window-sum correction term at all
            acc = acc + _int_conv(ctx, x_pad, ctx.param(op, "w_dense_b"),
                                  strides, dil, dn)
        acc = acc + ctx.param(op, "bias")
        ctx.set(op.outputs[0], _conv_requant(ctx, op, acc))
        return
    use_tap = os.environ.get("BAND_DW_TAP", "1") != "0" and (
        wzp != 0 or eff_batch >= 4
    ) and (
        strides == (1, 1)
        or os.environ.get("BAND_DW_TAP_STRIDED", "1") != "0"
    )
    if use_tap:
        acc = _dw_tap_acc(x_pad, w, (kh, kw), strides, dil, mult, wzp=wzp,
                          cast_per_slice=eff_batch >= 4)
        acc = acc + ctx.param(op, "bias")
        ctx.set(op.outputs[0], _conv_requant(ctx, op, acc))
        return
    acc = _int_conv(ctx, x_pad, w, strides, dil, dn, feature_group_count=ci)
    if wzp != 0:
        # per-input-channel window sums via depthwise ones kernel
        s = _ones_conv(ctx, x_pad, kh, kw, ci, strides, dil, dn,
                       feature_group_count=ci)
        if mult > 1:
            s = jnp.repeat(s, mult, axis=-1)
        acc = acc - jnp.int32(wzp) * s
    acc = acc + ctx.param(op, "bias")
    ctx.set(op.outputs[0], _conv_requant(ctx, op, acc))


# --------------------------------------------------------------------------
# FULLY_CONNECTED
# --------------------------------------------------------------------------

def _hybrid_fc_matmul(ctx: LowerCtx, op: OpNode, x2):
    """Dynamic-range (hybrid) FC: float activations quantized to int8
    per batch row at runtime, int8 x int8 -> int32 contraction on the
    MXU, result rescaled to float (TFLite fully_connected.cc
    EvalHybrid + tensor_utils::{Symmetric,Asymmetric}QuantizeFloats)."""
    wq = ctx.param(op, "w_q")          # [in, out] int8
    w_scale = ctx.param(op, "w_scale")  # [out]
    if op.options.get("asymmetric_quantize_inputs", False):
        q, zp, scale = _asym_quant_rows(x2)
        acc = _int_dot(ctx, q.astype(jnp.int8), wq).astype(jnp.float32)
        rowsum = ctx.param(op, "w_rowsum").astype(jnp.float32)  # [out]
        acc = acc - zp * rowsum[None, :]
    else:
        amax = jnp.abs(x2).max(axis=1, keepdims=True)
        degenerate = amax == 0.0
        scale = jnp.where(degenerate, 1.0, amax / 127.0)
        q = jnp.clip(Q.round_ties_away(x2 / scale), -127.0, 127.0)
        q = jnp.where(degenerate, 0.0, q).astype(jnp.int8)
        acc = _int_dot(ctx, q, wq).astype(jnp.float32)
    return acc * (scale * w_scale[None, :])


def _prepare_fc(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
    w_td = graph.tensor(op.inputs[1])
    x_td = graph.tensor(op.inputs[0])
    w = w_td.data  # [out, in]
    if w is None:
        # runtime weights (e.g. captured by a control-flow branch
        # subgraph): nothing to prepare; the float trace reads them from
        # the environment
        return {}
    if x_td.quant is None or x_td.dtype.kind == "f":
        d: Dict[str, Any]
        if w.dtype.kind in "iu" and w_td.quant is not None:
            # hybrid / dynamic-range quantization: int8 weights with
            # per-output-channel scales, float activations quantized
            # per batch row at runtime (TFLite EvalHybrid)
            d = {
                "w_q": np.ascontiguousarray(
                    np.transpose(w, (1, 0)).astype(np.int8)
                ),  # [in, out]
                "w_scale": w_td.quant.scale.astype(np.float32),  # [out]
                "w_rowsum": w.astype(np.int64)
                .sum(axis=1)
                .astype(np.int32),  # [out]
            }
        else:
            d = {"w": w.astype(np.float32)}
        if len(op.inputs) > 2 and op.inputs[2] >= 0:
            d["bias"] = graph.tensor(op.inputs[2]).data.astype(np.float32)
        return d
    return _prepare_conv_common(
        graph, op, w_td, np.transpose(w, (1, 0)), sum_axes=(0,),
        k_taps=w.shape[1], exact=exact,
    )


@register("FULLY_CONNECTED", prepare=_prepare_fc)
def _fully_connected(ctx: LowerCtx, op: OpNode) -> None:
    g = ctx.graph
    x = ctx.arr(op.inputs[0])
    out_td = g.tensor(op.outputs[0])

    if not ctx.is_quantized(op.inputs[0]):
        x2 = x.reshape(-1, x.shape[-1]) if x.ndim != 2 else x
        if f"op{op.index}/w_q" in ctx.params:
            acc = _hybrid_fc_matmul(ctx, op, x2)
        else:
            # float path; weights may be runtime values (control-flow
            # branches capture them as subgraph inputs)
            if f"op{op.index}/w" in ctx.params:
                w = ctx.param(op, "w")  # [out, in]
            else:
                w = ctx.arr(op.inputs[1])
            acc = jnp.dot(x2, w.T, preferred_element_type=jnp.float32)
        if f"op{op.index}/bias" in ctx.params:
            acc = acc + ctx.param(op, "bias")
        elif len(op.inputs) > 2 and op.inputs[2] >= 0:
            b_td = g.tensor(op.inputs[2])
            acc = acc + (
                jnp.asarray(b_td.data.astype(np.float32))
                if b_td.is_constant
                else ctx.arr(op.inputs[2])
            )
        out = _apply_float_activation(acc, op.options.get("activation", "NONE"))
        ctx.set(op.outputs[0], out.reshape(out_td.shape).astype(out_td.dtype))
        return

    w = ctx.param(op, "w")  # quant: [in, out]

    xzp = ctx.smeta(op, "x_zp")
    wzp = ctx.smeta(op, "w_zp")
    x, _ = _to_int8_domain(x, 0)
    x2 = x.reshape(-1, x.shape[-1])
    n_out = w.shape[1]
    # the hot int8 FC fuses contraction + bit-exact requant (and the
    # per-tensor weight-zp row-sum correction) in one Pallas program;
    # fallback covers shapes the tiling rejects
    if (
        ctx.conv_mode == "int8"
        and ctx.exact
        and (n_out <= 256 or n_out % 256 == 0)
        and (x2.shape[0] <= 256 or x2.shape[0] % 256 == 0)
    ):
        out = _pallas_qmm(ctx, op, x2, w, wzp, out_td)
        ctx.set(op.outputs[0], out.reshape(out_td.shape))
        return
    acc = _int_dot(ctx, x2, w)  # [batch, out]
    if wzp != 0:
        # -wzp * sum(raw x'); the xzp cross-terms are folded into bias_eff
        row_sum = x2.astype(jnp.int32).sum(axis=1, keepdims=True)
        acc = acc - jnp.int32(wzp) * row_sum
    acc = acc + ctx.param(op, "bias")
    out = _conv_requant(ctx, op, acc)
    ctx.set(op.outputs[0], out.reshape(out_td.shape))


# --------------------------------------------------------------------------
# Elementwise binary ops (quantized-exact ADD/SUB, MUL; float fallback DIV)
# --------------------------------------------------------------------------

def _prepare_addsub(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
    t1, t2 = graph.tensor(op.inputs[0]), graph.tensor(op.inputs[1])
    out_td = graph.tensor(op.outputs[0])
    if t1.quant is None or t1.dtype.kind == "f":
        d: Dict[str, Any] = {}
        for tid in op.inputs:
            td = graph.tensor(tid)
            if td.is_constant:
                d[f"c{tid}"] = td.data
        return d
    s1, zp1 = _scalar_qp(t1.quant)
    s2, zp2 = _scalar_qp(t2.quant)
    so, zpo = _scalar_qp(out_td.quant)
    left_shift = 20
    twice_max = 2.0 * max(s1, s2)
    qm1, sh1 = Q.quantize_multiplier(s1 / twice_max)
    qm2, sh2 = Q.quantize_multiplier(s2 / twice_max)
    qmo, sho = Q.quantize_multiplier(twice_max / ((1 << left_shift) * so))
    act = op.options.get("activation", "NONE")
    qmin, qmax = Q.activation_range(act, so, zpo, out_td.dtype)
    d = {
        "zp1": zp1, "zp2": zp2, "zpo": zpo,
        "qm1": np.int32(qm1), "sh1": sh1,
        "qm2": np.int32(qm2), "sh2": sh2,
        "qmo": np.int32(qmo), "sho": sho,
        "left_shift": left_shift, "qmin": qmin, "qmax": qmax,
    }
    # 8-bit inputs: plan the 5-op exact input rescale (split-multiplier
    # identity, quant.addsub_input_rescale_plan) — replaces the two
    # general-MBQM input rescales (~25 VPU ops each) that dominate the
    # quantized ADD pipeline
    if (
        Q.DEFAULT_ROUNDING == "single"
        and t1.dtype.itemsize == 1
        and t2.dtype.itemsize == 1
    ):
        d["lin1"] = Q.addsub_input_rescale_plan(qm1, sh1, left_shift)
        d["lin2"] = Q.addsub_input_rescale_plan(qm2, sh2, left_shift)
    if not exact:
        # throughput mode: one f32 FMA per input + one round replaces
        # the three-MBQM fixed-point pipeline (the measured ADD islands
        # of ICN's b32 profile); ±1 quant unit of the exact path
        d["f1"] = float(s1 / so)
        d["f2"] = float(s2 / so)
    for tid in op.inputs:
        td = graph.tensor(tid)
        if td.is_constant:
            d[f"c{tid}"] = td.data
    return d


def _binary_inputs(ctx: LowerCtx, op: OpNode):
    vals = []
    for tid in op.inputs[:2]:
        key = f"op{op.index}/c{tid}"
        vals.append(ctx.params[key] if key in ctx.params else ctx.arr(tid))
    return vals


def _addsub(ctx: LowerCtx, op: OpNode, sign: int) -> None:
    g = ctx.graph
    out_td = g.tensor(op.outputs[0])
    x1, x2 = _binary_inputs(ctx, op)
    if not ctx.is_quantized(op.outputs[0]):
        out = x1 + sign * x2 if out_td.dtype.kind != "f" else (
            _apply_float_activation(
                x1.astype(jnp.float32) + sign * x2.astype(jnp.float32),
                op.options.get("activation", "NONE"),
            )
        )
        ctx.set(op.outputs[0], out.astype(out_td.dtype))
        return
    ls = int(ctx.smeta(op, "left_shift"))
    a1 = x1.astype(jnp.int32) - ctx.smeta(op, "zp1")
    a2 = x2.astype(jnp.int32) - ctx.smeta(op, "zp2")
    if not ctx.exact and f"op{op.index}/f1" in ctx.meta:
        # throughput mode (RuntimeConfig.numerics == "fast"): rescale in
        # float32 — exact-path agreement within ±1 quant unit, a
        # fraction of the VPU ops (accuracy-gated by tools/evaluate)
        f = (
            a1.astype(jnp.float32) * ctx.smeta(op, "f1")
            + sign * a2.astype(jnp.float32) * ctx.smeta(op, "f2")
        )
        out = jnp.round(f).astype(jnp.int32) + ctx.smeta(op, "zpo")
        out = jnp.clip(out, ctx.smeta(op, "qmin"), ctx.smeta(op, "qmax"))
        ctx.set(op.outputs[0], out.astype(out_td.dtype))
        return
    # 8-bit inputs: the input rescale is the 5-op exact split-multiplier
    # form (quant.addsub_input_rescale — plain mul/add/shift, no 64-bit
    # limbs), planned at prepare time.  Unlike the round-3 small-MBQM
    # limb path (kernel-faster but whole-model slower: its jaxpr shape
    # perturbed XLA fusion/layout around the dw taps), this form is
    # fusion-friendly elementwise arithmetic.  BAND_ADD_LINEAR=0
    # reverts to the general MBQM pipeline.
    lin1 = ctx.smeta(op, "lin1") if "op%d/lin1" % op.index in ctx.meta else None
    lin2 = ctx.smeta(op, "lin2") if "op%d/lin2" % op.index in ctx.meta else None
    if (
        lin1 is not None
        and lin2 is not None
        and os.environ.get("BAND_ADD_LINEAR", "1") != "0"
    ):
        s1 = Q.addsub_input_rescale(a1, *lin1)
        s2 = Q.addsub_input_rescale(a2, *lin2)
    else:
        s1 = Q.multiply_by_quantized_multiplier(
            a1 << ls, ctx.smeta(op, "qm1"), ctx.smeta(op, "sh1")
        )
        s2 = Q.multiply_by_quantized_multiplier(
            a2 << ls, ctx.smeta(op, "qm2"), ctx.smeta(op, "sh2")
        )
    raw = s1 + sign * s2
    out = Q.multiply_by_quantized_multiplier(
        raw, ctx.smeta(op, "qmo"), ctx.smeta(op, "sho")
    ) + ctx.smeta(op, "zpo")
    out = jnp.clip(out, ctx.smeta(op, "qmin"), ctx.smeta(op, "qmax"))
    ctx.set(op.outputs[0], out.astype(out_td.dtype))


@register("ADD", prepare=_prepare_addsub)
def _add(ctx: LowerCtx, op: OpNode) -> None:
    _addsub(ctx, op, +1)


@register("SUB", prepare=_prepare_addsub)
def _sub(ctx: LowerCtx, op: OpNode) -> None:
    _addsub(ctx, op, -1)


def _prepare_mul(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
    t1, t2 = graph.tensor(op.inputs[0]), graph.tensor(op.inputs[1])
    out_td = graph.tensor(op.outputs[0])
    d: Dict[str, Any] = {}
    for tid in op.inputs:
        td = graph.tensor(tid)
        if td.is_constant:
            d[f"c{tid}"] = td.data
    if t1.quant is None or t1.dtype.kind == "f" or out_td.quant is None:
        return d
    s1, zp1 = _scalar_qp(t1.quant)
    s2, zp2 = _scalar_qp(t2.quant)
    so, zpo = _scalar_qp(out_td.quant)
    # TFLite computes the MUL multiplier fully in float32 before widening
    qm, sh = Q.quantize_multiplier(
        float(np.float32(np.float32(s1) * np.float32(s2) / np.float32(so)))
    )
    act = op.options.get("activation", "NONE")
    qmin, qmax = Q.activation_range(act, so, zpo, out_td.dtype)
    d.update({"zp1": zp1, "zp2": zp2, "zpo": zpo, "qm": np.int32(qm),
              "sh": sh, "qmin": qmin, "qmax": qmax})
    if not exact:
        d["fm"] = float(np.float32(s1) * np.float32(s2) / np.float32(so))
    return d


@register("MUL", prepare=_prepare_mul)
def _mul(ctx: LowerCtx, op: OpNode) -> None:
    g = ctx.graph
    out_td = g.tensor(op.outputs[0])
    x1, x2 = _binary_inputs(ctx, op)
    if ctx.is_quantized(op.outputs[0]) and f"op{op.index}/qm" in ctx.meta:
        acc = (x1.astype(jnp.int32) - ctx.smeta(op, "zp1")) * (
            x2.astype(jnp.int32) - ctx.smeta(op, "zp2")
        )
        if not ctx.exact and f"op{op.index}/fm" in ctx.meta:
            # throughput mode: f32 rescale (±1 LSB of the exact path)
            out = jnp.round(
                acc.astype(jnp.float32) * ctx.smeta(op, "fm")
            ).astype(jnp.int32) + ctx.smeta(op, "zpo")
            out = jnp.clip(out, ctx.smeta(op, "qmin"),
                           ctx.smeta(op, "qmax"))
            ctx.set(op.outputs[0], out.astype(out_td.dtype))
            return
        # TFLite's builtin int8 MUL kernels (both the elementwise and the
        # BroadcastMul4DSlow paths) requantize with the gemmlowp
        # double-rounding MBQM, unlike ADD/MEAN which use single-rounding
        # (verified per-op against the builtin-kernel interpreter on all
        # 39 quantized MULs of magenta style-transfer; see
        # tests/test_executor_exact.py)
        out = Q.multiply_by_quantized_multiplier(
            acc, ctx.smeta(op, "qm"), ctx.smeta(op, "sh"), rounding="double"
        ) + ctx.smeta(op, "zpo")
        out = jnp.clip(out, ctx.smeta(op, "qmin"), ctx.smeta(op, "qmax"))
        ctx.set(op.outputs[0], out.astype(out_td.dtype))
        return
    f1 = x1.astype(jnp.float32)
    f2 = x2.astype(jnp.float32)
    out = _apply_float_activation(f1 * f2, op.options.get("activation", "NONE"))
    store_real(ctx, op.outputs[0], out)


@register("DIV")
def _div(ctx: LowerCtx, op: OpNode) -> None:
    f1 = as_float(ctx, op.inputs[0])
    f2 = as_float(ctx, op.inputs[1])
    out = _apply_float_activation(f1 / f2, op.options.get("activation", "NONE"))
    store_real(ctx, op.outputs[0], out)


# --------------------------------------------------------------------------
# Pooling
# --------------------------------------------------------------------------

def _pool_prep(ctx: LowerCtx, op: OpNode):
    x = ctx.arr(op.inputs[0])
    o = op.options
    ph, pw = (
        (_same_pads(x.shape[1], o["filter_h"], o["stride_h"], 1),
         _same_pads(x.shape[2], o["filter_w"], o["stride_w"], 1))
        if o["padding"] == "SAME"
        else ((0, 0), (0, 0))
    )
    window = (1, o["filter_h"], o["filter_w"], 1)
    strides = (1, o["stride_h"], o["stride_w"], 1)
    pads = ((0, 0), ph, pw, (0, 0))
    return x, window, strides, pads


@register("MAX_POOL_2D")
def _max_pool(ctx: LowerCtx, op: OpNode) -> None:
    x, window, strides, pads = _pool_prep(ctx, op)
    td = ctx.graph.tensor(op.outputs[0])
    init = (
        np.iinfo(x.dtype).min if np.dtype(x.dtype).kind in "iu"
        else -np.inf
    )
    out = lax.reduce_window(x, np.asarray(init, x.dtype), lax.max, window,
                            strides, pads)
    if td.dtype.kind == "f":
        out = _apply_float_activation(out, op.options.get("activation", "NONE"))
    ctx.set(op.outputs[0], out.astype(td.dtype))


@register("AVERAGE_POOL_2D")
def _avg_pool(ctx: LowerCtx, op: OpNode) -> None:
    x, window, strides, pads = _pool_prep(ctx, op)
    td = ctx.graph.tensor(op.outputs[0])
    if ctx.is_quantized(op.inputs[0]):
        xi = x.astype(jnp.int32)
        acc = lax.reduce_window(xi, jnp.int32(0), lax.add, window, strides,
                                pads)
        ones = jnp.ones(x.shape[1:3], jnp.int32)[None, :, :, None]
        count = lax.reduce_window(ones, jnp.int32(0), lax.add, window,
                                  strides, pads)
        # round-to-nearest, ties away from zero, C-style trunc division
        pos = (acc + count // 2) // count
        neg = -((-acc + count // 2) // count)
        out = jnp.where(acc >= 0, pos, neg)
        qmin, qmax = Q.quantized_range(td.dtype)
        # fused activation clamps in the quantized domain
        s, zp = _scalar_qp(td.quant)
        aqmin, aqmax = Q.activation_range(
            op.options.get("activation", "NONE"), s, zp, td.dtype
        )
        out = jnp.clip(out, max(qmin, aqmin), min(qmax, aqmax))
        ctx.set(op.outputs[0], out.astype(td.dtype))
        return
    acc = lax.reduce_window(x, jnp.float32(0), lax.add, window, strides, pads)
    ones = jnp.ones(x.shape[1:3], jnp.float32)[None, :, :, None]
    count = lax.reduce_window(ones, jnp.float32(0), lax.add, window, strides,
                              pads)
    out = _apply_float_activation(acc / count,
                                  op.options.get("activation", "NONE"))
    ctx.set(op.outputs[0], out.astype(td.dtype))


# --------------------------------------------------------------------------
# Shape / data-movement ops
# --------------------------------------------------------------------------

@register("RESHAPE", static_inputs=(1,))
def _reshape(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    out_shape = ctx.graph.tensor(op.outputs[0]).shape
    ctx.set(op.outputs[0], x.reshape(out_shape))


@register("SQUEEZE")
def _squeeze(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    ctx.set(op.outputs[0], x.reshape(ctx.graph.tensor(op.outputs[0]).shape))


@register("EXPAND_DIMS", static_inputs=(1,))
def _expand_dims(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    ctx.set(op.outputs[0], x.reshape(ctx.graph.tensor(op.outputs[0]).shape))


@register("TRANSPOSE", static_inputs=(1,))
def _transpose(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    perm = [int(v) for v in ctx.static(op.inputs[1])]
    ctx.set(op.outputs[0], jnp.transpose(x, perm))


class _DynSlice:
    """Deferred dynamic-SIZE slice: XLA cannot produce a dynamically
    shaped value, but the only place TFLite emits one is the TensorArray
    write pattern `concat(buf[:i], v, buf[i+1:])` (keras-3 converted
    RNN loop bodies).  SLICE parks the pieces here; CONCATENATION
    recognizes the pattern and lowers the whole thing as one
    `lax.dynamic_update_slice` (static shapes throughout).  Any other
    consumer raises the pointed error below."""

    def __init__(self, src, begin, sizes):
        self.src = src      # the buffer being sliced (traced array)
        self.begin = begin  # traced begin vector (or list of ints)
        self.sizes = sizes  # traced size vector

    def fail(self) -> "NoReturn":
        raise LoweringError(
            "SLICE: dynamic sizes are not expressible in XLA outside the "
            "TensorArray-write pattern (concat(buf[:i], v, buf[i+1:])); "
            "convert growing-loop models through the fused kernel path "
            "(e.g. UNIDIRECTIONAL_SEQUENCE_LSTM)"
        )

    # any accidental arithmetic/inspection use surfaces the real story
    def __getattr__(self, name):
        self.fail()


@register("CONCATENATION")
def _concat(ctx: LowerCtx, op: OpNode) -> None:
    g = ctx.graph
    out_td = g.tensor(op.outputs[0])
    axis = op.options.get("axis", 0)
    raw = [ctx.arr(tid) for tid in op.inputs]
    if any(isinstance(v, _DynSlice) for v in raw):
        _concat_tensorarray_write(ctx, op, raw, axis)
        return
    parts = []
    out_q = out_td.quant
    for tid in op.inputs:
        td = g.tensor(tid)
        v = ctx.arr(tid)
        if (
            out_q is not None
            and ctx.is_quantized(tid)
            and (
                float(td.quant.scale[0]) != float(out_q.scale[0])
                or int(td.quant.zero_point[0]) != int(out_q.zero_point[0])
            )
        ):
            # exact TFLite concat requant: float32 scale/bias + ties-away round
            s_i, zp_i = _scalar_qp(td.quant)
            s_o, zp_o = _scalar_qp(out_q)
            scale = np.float32(np.float32(s_i) * np.float32(1.0 / s_o))
            bias = np.float32(-zp_i * scale)
            val = Q.round_ties_away(v.astype(jnp.float32) * scale + bias)
            qmin, qmax = Q.quantized_range(out_td.dtype)
            v = jnp.clip(val.astype(jnp.int32) + zp_o, qmin, qmax).astype(
                out_td.dtype
            )
        parts.append(v)
    ctx.set(op.outputs[0], jnp.concatenate(parts, axis=axis))


def _concat_tensorarray_write(ctx: LowerCtx, op: OpNode, raw, axis) -> None:
    """concat(buf[:i], v, buf[i+1:]) -> lax.dynamic_update_slice."""
    markers = [v for v in raw if isinstance(v, _DynSlice)]
    dense = [v for v in raw if not isinstance(v, _DynSlice)]
    if len(dense) != 1 or len(markers) not in (1, 2):
        markers[0].fail()
    src = markers[0].src
    for m in markers[1:]:
        if m.src is not src:
            m.fail()
    update = dense[0]
    # the update's position along `axis` is the length of the prefix
    # slice (= its dynamic size), or begin-minus-one of the suffix slice
    # when the prefix is absent (i == 0 writes)
    prefix = None
    for m in markers:
        b = m.begin
        is_prefix = (
            not hasattr(b, "dtype") and all(int(x) == 0 for x in b)
        )
        if is_prefix:
            prefix = m
    if prefix is not None:
        idx = jnp.reshape(prefix.sizes[axis], ())
    else:
        b = markers[0].begin
        idx = jnp.reshape(
            (b[axis] if hasattr(b, "dtype") else jnp.asarray(b[axis]))
            - update.shape[axis], ()
        )
    starts = [
        idx if d == axis else jnp.zeros((), idx.dtype)
        for d in range(update.ndim)
    ]
    ctx.set(op.outputs[0], lax.dynamic_update_slice(src, update, starts))


@register("PAD", static_inputs=(1,))
def _pad(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    pads = [tuple(int(v) for v in row) for row in ctx.static(op.inputs[1])]
    td = ctx.graph.tensor(op.inputs[0])
    fill = 0
    if ctx.is_quantized(op.inputs[0]):
        fill = int(td.quant.zero_point[0])
    ctx.set(op.outputs[0], jnp.pad(x, pads,
                                   constant_values=np.asarray(fill, x.dtype)))


@register("PADV2", static_inputs=(1,))
def _padv2(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    pads = [tuple(int(v) for v in row) for row in ctx.static(op.inputs[1])]
    fill = ctx.static(op.inputs[2]).reshape(())
    ctx.set(op.outputs[0], jnp.pad(x, pads,
                                   constant_values=np.asarray(fill, x.dtype)))


@register("MIRROR_PAD", static_inputs=(1,))
def _mirror_pad(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    pads = [tuple(int(v) for v in row) for row in ctx.static(op.inputs[1])]
    mode = "reflect" if op.options.get("mode", 0) == 0 else "symmetric"
    ctx.set(op.outputs[0], jnp.pad(x, pads, mode=mode))


@register("STRIDED_SLICE", static_inputs=(1, 2, 3))
def _strided_slice(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    begin = ctx.static(op.inputs[1]).astype(np.int64)
    end = ctx.static(op.inputs[2]).astype(np.int64)
    strides = ctx.static(op.inputs[3]).astype(np.int64)
    o = op.options
    idx = []
    for d in range(len(begin)):
        b = None if (o.get("begin_mask", 0) >> d) & 1 else int(begin[d])
        e = None if (o.get("end_mask", 0) >> d) & 1 else int(end[d])
        s = int(strides[d])
        if (o.get("shrink_axis_mask", 0) >> d) & 1:
            idx.append(int(begin[d]))
        else:
            idx.append(slice(b, e, s))
    out = x[tuple(idx)]
    ctx.set(op.outputs[0], out.reshape(ctx.graph.tensor(op.outputs[0]).shape))


@register("SLICE", static_inputs=(1, 2))
def _slice(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    size_td = ctx.graph.tensor(op.inputs[2])
    begin_td = ctx.graph.tensor(op.inputs[1])
    if begin_td.is_constant and size_td.is_constant:
        begin = [int(v) for v in ctx.static(op.inputs[1])]
        size = [int(v) for v in ctx.static(op.inputs[2])]
        size = [
            x.shape[d] - begin[d] if s == -1 else s
            for d, s in enumerate(size)
        ]
        ctx.set(op.outputs[0], lax.slice(x, begin,
                                         [b + s for b, s in zip(begin, size)]))
        return
    begin = (
        [int(v) for v in begin_td.data]
        if begin_td.is_constant
        else ctx.arr(op.inputs[1])
    )
    if size_td.is_constant:
        size = [int(v) for v in ctx.static(op.inputs[2])]
        if not any(s == -1 for s in size):
            # dynamic begin (e.g. a loop counter), static shape
            starts = [begin[i] for i in range(len(size))]
            ctx.set(op.outputs[0], lax.dynamic_slice(x, starts, size))
            return
        # -1 ("to end") with dynamic begin => dynamically shaped result
        sizes = size
    else:
        sizes = ctx.arr(op.inputs[2])
    # dynamically shaped result: only legal as a TensorArray-write
    # operand, resolved by CONCATENATION (see _DynSlice)
    ctx.set(op.outputs[0], _DynSlice(x, begin, sizes))


@register("SPLIT", static_inputs=(0,))
def _split(ctx: LowerCtx, op: OpNode) -> None:
    axis = int(ctx.static(op.inputs[0]).reshape(()))
    x = ctx.arr(op.inputs[1])
    parts = jnp.split(x, len(op.outputs), axis=axis)
    for tid, part in zip(op.outputs, parts):
        ctx.set(tid, part)


@register("SPLIT_V", static_inputs=(1, 2))
def _split_v(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    sizes = [int(v) for v in ctx.static(op.inputs[1])]
    axis = int(ctx.static(op.inputs[2]).reshape(()))
    offsets = np.cumsum([0] + sizes)
    for i, tid in enumerate(op.outputs):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(int(offsets[i]), int(offsets[i + 1]))
        ctx.set(tid, x[tuple(idx)])


@register("PACK")
def _pack(ctx: LowerCtx, op: OpNode) -> None:
    # constants may carry data in flat (1,) form while the tensor
    # declares scalar (); normalize to the declared shape — but only
    # when that shape is fully static (a dynamic dim or a runtime shape
    # that disagrees with the declaration must pass through unchanged,
    # ADVICE r2)
    vals = []
    for t in op.inputs:
        v = ctx.arr(t)
        decl = tuple(ctx.graph.tensor(t).shape)
        static = all(isinstance(s, int) and s > 0 for s in decl) or decl == ()
        if static and tuple(v.shape) != decl and (
            ctx.graph.tensor(t).is_constant
            or int(np.prod(decl or (1,))) == int(np.prod(v.shape or (1,)))
        ):
            v = v.reshape(decl)
        vals.append(v)
    ctx.set(op.outputs[0], jnp.stack(vals, axis=op.options.get("axis", 0)))


@register("UNPACK")
def _unpack(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    axis = op.options.get("axis", 0)
    parts = jnp.split(x, x.shape[axis], axis=axis)
    for tid, part in zip(op.outputs, parts):
        ctx.set(tid, jnp.squeeze(part, axis=axis))


@register("GATHER")
def _gather(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    td = ctx.graph.tensor(op.inputs[1])
    indices = (
        jnp.asarray(td.data) if td.is_constant else ctx.arr(op.inputs[1])
    )
    ctx.set(op.outputs[0],
            jnp.take(x, indices, axis=op.options.get("axis", 0)))


@register("SHAPE")
def _shape(ctx: LowerCtx, op: OpNode) -> None:
    x_shape = ctx.graph.tensor(op.inputs[0]).shape
    dt = ctx.graph.tensor(op.outputs[0]).dtype
    ctx.set(op.outputs[0], jnp.asarray(np.asarray(x_shape, dt)))


@register("CAST")
def _cast(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    ctx.set(op.outputs[0], x.astype(ctx.graph.tensor(op.outputs[0]).dtype))


@register("ARG_MAX", static_inputs=(1,))
def _arg_max(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    axis = int(ctx.static(op.inputs[1]).reshape(()))
    dt = ctx.graph.tensor(op.outputs[0]).dtype
    ctx.set(op.outputs[0], jnp.argmax(x, axis=axis).astype(dt))


@register("SPACE_TO_DEPTH")
def _space_to_depth(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    b = op.options["block_size"]
    n, h, w, c = x.shape
    x = x.reshape(n, h // b, b, w // b, b, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    ctx.set(op.outputs[0], x.reshape(n, h // b, w // b, b * b * c))


@register("DEPTH_TO_SPACE")
def _depth_to_space(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    b = op.options.get("block_size", 2)
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, b, b, c // (b * b))
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    ctx.set(op.outputs[0], x.reshape(n, h * b, w * b, c // (b * b)))


# --------------------------------------------------------------------------
# Quantize / dequantize / requantize
# --------------------------------------------------------------------------

def _prepare_quantize(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
    in_td = graph.tensor(op.inputs[0])
    out_td = graph.tensor(op.outputs[0])
    if in_td.quant is None or in_td.dtype.kind == "f":
        return {}
    s_i, _ = _scalar_qp(in_td.quant)
    s_o, _ = _scalar_qp(out_td.quant)
    qm, sh = Q.quantize_multiplier(np.float64(s_i) / np.float64(s_o))
    return {"qm": np.int32(qm), "sh": sh}


@register("QUANTIZE", prepare=_prepare_quantize)
def _quantize_op(ctx: LowerCtx, op: OpNode) -> None:
    g = ctx.graph
    out_td = g.tensor(op.outputs[0])
    s_o, zp_o = _scalar_qp(out_td.quant)
    x = ctx.arr(op.inputs[0])
    if ctx.is_quantized(op.inputs[0]):
        # exact TFLite Requantize: MBQM(q - zp_in) + zp_out, clamped
        _, zp_i = _scalar_qp(g.tensor(op.inputs[0]).quant)
        acc = x.astype(jnp.int32) - jnp.int32(zp_i)
        out = Q.multiply_by_quantized_multiplier(
            acc, ctx.smeta(op, "qm"), ctx.smeta(op, "sh"), rounding="ruy"
        ) + jnp.int32(zp_o)
        qmin, qmax = Q.quantized_range(out_td.dtype)
        ctx.set(op.outputs[0], jnp.clip(out, qmin, qmax).astype(out_td.dtype))
        return
    ctx.set(op.outputs[0], Q.quantize(x, s_o, zp_o, out_td.dtype))


@register("DEQUANTIZE")
def _dequantize_op(ctx: LowerCtx, op: OpNode) -> None:
    td = ctx.graph.tensor(op.inputs[0])
    key = f"t{op.inputs[0]}"
    x = ctx.params[key] if (td.is_constant and key in ctx.params) else ctx.arr(
        op.inputs[0]
    )
    if td.quant is not None and td.quant.per_channel:
        # per-channel constant dequant (e.g. magenta style weights)
        shape = [1] * len(td.shape)
        shape[td.quant.quantized_dimension] = -1
        s = jnp.asarray(td.quant.scale).reshape(shape)
        zp = jnp.asarray(td.quant.zero_point).reshape(shape)
        ctx.set(op.outputs[0],
                (x.astype(jnp.int32) - zp).astype(jnp.float32) * s)
        return
    s, zp = _scalar_qp(td.quant)
    ctx.set(op.outputs[0], Q.dequantize(x, s, zp))


# --------------------------------------------------------------------------
# Activations & unary float ops
# --------------------------------------------------------------------------

def _prepare_relu(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
    in_td = graph.tensor(op.inputs[0])
    out_td = graph.tensor(op.outputs[0])
    if in_td.quant is None or in_td.dtype.kind == "f":
        return {}
    s_i, _ = _scalar_qp(in_td.quant)
    s_o, _ = _scalar_qp(out_td.quant)
    qm, sh = Q.quantize_multiplier(np.float64(s_i) / np.float64(s_o))
    return {"qm": np.int32(qm), "sh": sh}


def _quantized_relu(ctx: LowerCtx, op: OpNode, act: str) -> None:
    """TFLite ReluQuantized: rescale input to output params, then clamp."""
    g = ctx.graph
    td = g.tensor(op.outputs[0])
    x = ctx.arr(op.inputs[0])
    _, zp_i = _scalar_qp(g.tensor(op.inputs[0]).quant)
    s_o, zp_o = _scalar_qp(td.quant)
    val = Q.multiply_by_quantized_multiplier(
        x.astype(jnp.int32) - jnp.int32(zp_i), ctx.smeta(op, "qm"),
        ctx.smeta(op, "sh"), rounding="single",
    ) + jnp.int32(zp_o)
    qmin, qmax = Q.activation_range(act, s_o, zp_o, td.dtype)
    ctx.set(op.outputs[0], jnp.clip(val, qmin, qmax).astype(td.dtype))


@register("RELU", prepare=_prepare_relu)
def _relu(ctx: LowerCtx, op: OpNode) -> None:
    if ctx.is_quantized(op.inputs[0]):
        _quantized_relu(ctx, op, "RELU")
    else:
        ctx.set(op.outputs[0], jnp.maximum(ctx.arr(op.inputs[0]), 0.0))


@register("RELU6", prepare=_prepare_relu)
def _relu6(ctx: LowerCtx, op: OpNode) -> None:
    if ctx.is_quantized(op.inputs[0]):
        _quantized_relu(ctx, op, "RELU6")
    else:
        ctx.set(op.outputs[0], jnp.clip(ctx.arr(op.inputs[0]), 0.0, 6.0))


def _float_unary(fn):
    def lower(ctx: LowerCtx, op: OpNode) -> None:
        store_real(ctx, op.outputs[0], fn(as_float(ctx, op.inputs[0])))

    return lower


# Quantized LOGISTIC/TANH/ELU run through TFLite's 256-entry lookup
# tables (activations.cc PopulateLookupTable/EvalUsingLookupTable) —
# the table replication makes them bit-exact; float tensors keep the
# jnp path.
import math as _math  # noqa: E402  (scalar float transforms for LUTs)

_LUT_TRANSFORMS = {
    "LOGISTIC": lambda v: 1.0 / (1.0 + _math.exp(-v)),
    "TANH": _math.tanh,
    "ELU": lambda v: v if v >= 0.0 else _math.expm1(v),
}


def _prepare_unary_lut(name: str):
    def prep(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
        in_td = graph.tensor(op.inputs[0])
        out_td = graph.tensor(op.outputs[0])
        if (
            in_td.quant is None or in_td.dtype.itemsize != 1
            or in_td.dtype.kind == "f"
            or out_td.quant is None or out_td.dtype.itemsize != 1
        ):
            return {}
        xs, xzp = _scalar_qp(in_td.quant)
        os_, ozp = _scalar_qp(out_td.quant)
        return {"lut": Q.activation_lut(_LUT_TRANSFORMS[name], xs, xzp,
                                        os_, ozp, out_td.dtype)}

    return prep


def _float_unary_or_lut(fn):
    base = _float_unary(fn)

    def lower(ctx: LowerCtx, op: OpNode) -> None:
        if f"op{op.index}/lut" in ctx.params:
            ctx.set(op.outputs[0],
                    Q.apply_lut(ctx.arr(op.inputs[0]), ctx.param(op, "lut")))
        else:
            base(ctx, op)

    return lower


for _name, _fn in {
    "LOGISTIC": jax.nn.sigmoid,
    "TANH": jnp.tanh,
    "EXP": jnp.exp,
    "LOG": jnp.log,
    "SQRT": jnp.sqrt,
    "RSQRT": lax.rsqrt,
    "SQUARE": jnp.square,
    "ABS": jnp.abs,
    "NEG": jnp.negative,
    "SIN": jnp.sin,
    "COS": jnp.cos,
    "FLOOR": jnp.floor,
    "CEIL": jnp.ceil,
    "ROUND": jnp.round,
    "ELU": jax.nn.elu,
    "GELU": jax.nn.gelu,
    "HARD_SWISH": jax.nn.hard_swish,
}.items():
    if _name in _LUT_TRANSFORMS:
        register(_name, prepare=_prepare_unary_lut(_name))(
            _float_unary_or_lut(_fn))
    else:
        register(_name)(_float_unary(_fn))


@register("LEAKY_RELU")
def _leaky_relu(ctx: LowerCtx, op: OpNode) -> None:
    alpha = op.options.get("alpha", 0.0)
    x = as_float(ctx, op.inputs[0])
    store_real(ctx, op.outputs[0], jnp.where(x >= 0, x, alpha * x))


@register("PRELU")
def _prelu(ctx: LowerCtx, op: OpNode) -> None:
    x = as_float(ctx, op.inputs[0])
    td = ctx.graph.tensor(op.inputs[1])
    if td.is_constant:
        alpha = td.data.astype(np.float32)
        if td.quant is not None and td.dtype.kind in "iu":
            alpha = (td.data.astype(np.float32)
                     - td.quant.zero_point.astype(np.float32)) * td.quant.scale
        alpha = jnp.asarray(alpha)
    else:
        alpha = as_float(ctx, op.inputs[1])
    store_real(ctx, op.outputs[0], jnp.where(x >= 0, x, alpha * x))


def _prepare_softmax(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
    in_td = graph.tensor(op.inputs[0])
    out_td = graph.tensor(op.outputs[0])
    if (
        in_td.quant is None or in_td.dtype.kind == "f"
        or out_td.quant is None or out_td.dtype.itemsize != 1
    ):
        return {}
    xs, _ = _scalar_qp(in_td.quant)
    return {"sm_table": Q.softmax_table(xs, op.options.get("beta", 1.0))}


@register("SOFTMAX", prepare=_prepare_softmax)
def _softmax(ctx: LowerCtx, op: OpNode) -> None:
    beta = op.options.get("beta", 1.0)
    if f"op{op.index}/sm_table" in ctx.params:
        # bit-exact TFLite quantized softmax (exp LUT + float32 rows)
        out_td = ctx.graph.tensor(op.outputs[0])
        os_, ozp = _scalar_qp(out_td.quant)
        out = Q.lut_softmax(
            ctx.arr(op.inputs[0]), ctx.param(op, "sm_table"), os_, ozp,
            out_td.dtype,
        )
        ctx.set(op.outputs[0], out)
        return
    x = as_float(ctx, op.inputs[0])
    store_real(ctx, op.outputs[0], jax.nn.softmax(beta * x, axis=-1))


@register("LOG_SOFTMAX")
def _log_softmax(ctx: LowerCtx, op: OpNode) -> None:
    x = as_float(ctx, op.inputs[0])
    store_real(ctx, op.outputs[0], jax.nn.log_softmax(x, axis=-1))


@register("L2_NORMALIZATION")
def _l2_norm(ctx: LowerCtx, op: OpNode) -> None:
    x = as_float(ctx, op.inputs[0])
    norm = lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-6)
    store_real(ctx, op.outputs[0], x * norm)


@register("SQUARED_DIFFERENCE")
def _squared_difference(ctx: LowerCtx, op: OpNode) -> None:
    a = as_float(ctx, op.inputs[0])
    b = as_float(ctx, op.inputs[1])
    store_real(ctx, op.outputs[0], jnp.square(a - b))


@register("POW")
def _pow(ctx: LowerCtx, op: OpNode) -> None:
    a = as_float(ctx, op.inputs[0])
    b = as_float(ctx, op.inputs[1])
    store_real(ctx, op.outputs[0], jnp.power(a, b))


def _minmax(fn):
    def lower(ctx: LowerCtx, op: OpNode) -> None:
        g = ctx.graph
        t1, t2 = g.tensor(op.inputs[0]), g.tensor(op.inputs[1])
        out_td = g.tensor(op.outputs[0])
        same_q = (
            t1.quant is not None
            and t2.quant is not None
            and out_td.quant is not None
            and float(t1.quant.scale[0]) == float(out_td.quant.scale[0])
            and int(t1.quant.zero_point[0]) == int(out_td.quant.zero_point[0])
            and float(t2.quant.scale[0]) == float(out_td.quant.scale[0])
        )
        x1, x2 = ctx.arr(op.inputs[0]), ctx.arr(op.inputs[1])
        if same_q or out_td.quant is None:
            ctx.set(op.outputs[0], fn(x1, x2).astype(out_td.dtype))
        else:
            store_real(ctx, op.outputs[0],
                       fn(as_float(ctx, op.inputs[0]),
                          as_float(ctx, op.inputs[1])))

    return lower


register("MAXIMUM")(_minmax(jnp.maximum))
register("MINIMUM")(_minmax(jnp.minimum))


# --------------------------------------------------------------------------
# Reductions
# --------------------------------------------------------------------------

def _prepare_mean(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
    in_td = graph.tensor(op.inputs[0])
    out_td = graph.tensor(op.outputs[0])
    if in_td.quant is None or in_td.dtype.kind == "f":
        return {}
    axes = tuple(int(v) for v in np.ravel(graph.tensor(op.inputs[1]).data))
    num = 1
    for a in axes:
        num *= in_td.shape[a]
    s_i, zp_i = _scalar_qp(in_td.quant)
    s_o, zp_o = _scalar_qp(out_td.quant)
    qm, sh = Q.quantize_multiplier(
        float(np.float64(s_i) / (np.float64(s_o) * num))
    )
    # host-side MBQM of the zero-point mass (single-rounding semantics)
    t = 31 - sh
    zp_term = (zp_i * num * qm + (1 << (t - 1))) >> t
    return {"qm": np.int32(qm), "sh": sh, "bias": int(zp_o - zp_term)}


@register("MEAN", prepare=_prepare_mean, static_inputs=(1,))
def _mean(ctx: LowerCtx, op: OpNode) -> None:
    axes = tuple(int(v) for v in np.ravel(ctx.static(op.inputs[1])))
    out_td = ctx.graph.tensor(op.outputs[0])
    keep_dims = len(out_td.shape) == len(ctx.graph.tensor(op.inputs[0]).shape)
    if ctx.is_quantized(op.inputs[0]):
        # integer mean: MBQM(sum) - MBQM(zp_in*num) + zp_out (TFLite exact)
        x = ctx.arr(op.inputs[0])
        acc = x.astype(jnp.int32).sum(axis=axes, keepdims=keep_dims)
        out = Q.multiply_by_quantized_multiplier(
            acc, ctx.smeta(op, "qm"), ctx.smeta(op, "sh"), rounding="single"
        ) + jnp.int32(ctx.smeta(op, "bias"))
        qmin, qmax = Q.quantized_range(out_td.dtype)
        ctx.set(op.outputs[0], jnp.clip(out, qmin, qmax).astype(out_td.dtype))
        return
    x = as_float(ctx, op.inputs[0])
    store_real(ctx, op.outputs[0], jnp.mean(x, axis=axes, keepdims=keep_dims))


@register("SUM", static_inputs=(1,))
def _sum(ctx: LowerCtx, op: OpNode) -> None:
    axes = tuple(int(v) for v in np.ravel(ctx.static(op.inputs[1])))
    keep_dims = op.options.get("keep_dims", False)
    x = as_float(ctx, op.inputs[0])
    store_real(ctx, op.outputs[0], jnp.sum(x, axis=axes, keepdims=keep_dims))


@register("REDUCE_MAX", static_inputs=(1,))
def _reduce_max(ctx: LowerCtx, op: OpNode) -> None:
    axes = tuple(int(v) for v in np.ravel(ctx.static(op.inputs[1])))
    keep_dims = op.options.get("keep_dims", False)
    x = ctx.arr(op.inputs[0])
    out = jnp.max(x, axis=axes, keepdims=keep_dims)
    ctx.set(op.outputs[0], out.astype(ctx.graph.tensor(op.outputs[0]).dtype))


# --------------------------------------------------------------------------
# Resize
# --------------------------------------------------------------------------

def _resize_indices(in_size: int, out_size: int, align_corners: bool,
                    half_pixel: bool, nearest: bool) -> np.ndarray:
    i = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
    if half_pixel:
        src = (i + 0.5) * scale - (0.5 if not nearest else 0.0)
        if nearest:
            src = (i + 0.5) * scale
    else:
        src = i * scale
    return src


@register("RESIZE_NEAREST_NEIGHBOR", static_inputs=(1,))
def _resize_nearest(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    out_h, out_w = [int(v) for v in ctx.static(op.inputs[1])]
    ac = op.options.get("align_corners", False)
    hp = op.options.get("half_pixel_centers", False)

    def idx(in_size, out_size):
        src = _resize_indices(in_size, out_size, ac, hp, nearest=True)
        if ac:
            sel = np.round(src)
        else:
            sel = np.floor(src)
        return np.clip(sel.astype(np.int64), 0, in_size - 1)

    hi = idx(x.shape[1], out_h)
    wi = idx(x.shape[2], out_w)
    out = jnp.take(jnp.take(x, jnp.asarray(hi), axis=1), jnp.asarray(wi),
                   axis=2)
    ctx.set(op.outputs[0], out)


@register("RESIZE_BILINEAR", static_inputs=(1,))
def _resize_bilinear(ctx: LowerCtx, op: OpNode) -> None:
    td_out = ctx.graph.tensor(op.outputs[0])
    x = as_float(ctx, op.inputs[0])
    out_h, out_w = [int(v) for v in ctx.static(op.inputs[1])]
    ac = op.options.get("align_corners", False)
    hp = op.options.get("half_pixel_centers", False)

    def lerp_axis(v, in_size, out_size, axis):
        src = _resize_indices(in_size, out_size, ac, hp, nearest=False)
        lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
        hi = np.clip(lo + 1, 0, in_size - 1)
        frac = np.clip(src - lo, 0.0, 1.0).astype(np.float32)
        shape = [1] * v.ndim
        shape[axis] = out_size
        f = jnp.asarray(frac).reshape(shape)
        vlo = jnp.take(v, jnp.asarray(lo), axis=axis)
        vhi = jnp.take(v, jnp.asarray(hi), axis=axis)
        return vlo + (vhi - vlo) * f

    out = lerp_axis(x, x.shape[1], out_h, axis=1)
    out = lerp_axis(out, out.shape[2], out_w, axis=2)
    store_real(ctx, op.outputs[0], out)


# --------------------------------------------------------------------------
# TRANSPOSE_CONV
# --------------------------------------------------------------------------

def _tconv_pads(o, in_h, in_w, kh, kw, sh, sw, out_h, out_w):
    """TFLite transpose-conv pad-before: total = (in-1)*s + k - out (SAME)."""
    if o["padding"] == "SAME":
        tp_h = max((in_h - 1) * sh + kh - out_h, 0)
        tp_w = max((in_w - 1) * sw + kw - out_w, 0)
        return tp_h // 2, tp_w // 2
    return 0, 0


def _tconv_phases(k: int, s: int, pb: int, out_size: int):
    """Sub-pixel (phase) decomposition of a 1-D transpose conv.

    The scatter-form semantics are o[p] = sum_u dil[p + u - cb] * w[u]
    with cb = k-1-pb and dil[m] = x[m/s] when s|m.  Splitting outputs by
    p mod s turns this into s independent *dense* VALID convolutions of
    the undilated input with strided kernel slices — the classic
    sub-pixel convolution identity, bit-identical in integer arithmetic
    and ~s^2x fewer MACs than convolving the zero-stuffed buffer:

      o[s*t + r] = sum_a x[t + a + off_r] * w[s*a + u0_r],
      u0_r = (cb - r) mod s,  off_r = (r + u0_r - cb) / s.

    Returns [(u0, ka, off, T)] per phase r, where ka is the phase kernel
    length and T the number of phase outputs.
    """
    cb = k - 1 - pb
    out = []
    for r in range(s):
        u0 = (cb - r) % s
        ka = max(-(-(k - u0) // s), 0)
        off = (r + u0 - cb) // s
        T = -(-(out_size - r) // s)
        out.append((u0, ka, off, T))
    return out


def _prepare_transpose_conv(graph: Graph, op: OpNode, exact: bool) -> Dict[str, Any]:
    # inputs: [output_shape, weights(OHWI), x, bias?]
    w_td = graph.tensor(op.inputs[1])
    x_td = graph.tensor(op.inputs[2])
    # rotate 180° and move to HWIO so a VALID conv reproduces the
    # scatter semantics (reference kernel: tflite TransposeConv)
    w = w_td.data[:, ::-1, ::-1, :]  # [O, kh, kw, I]
    w_hwio = np.transpose(w, (1, 2, 3, 0))
    if x_td.quant is None or x_td.dtype.kind == "f":
        d: Dict[str, Any] = {"w": w_hwio.astype(np.float32)}
        if len(op.inputs) > 3 and op.inputs[3] >= 0:
            d["bias"] = graph.tensor(op.inputs[3]).data.astype(np.float32)
        return d
    fake = OpNode(index=op.index, opname=op.opname,
                  inputs=[op.inputs[2], op.inputs[1],
                          op.inputs[3] if len(op.inputs) > 3 else -1],
                  outputs=op.outputs, options=dict(op.options))
    fake.options.setdefault("activation", "NONE")
    kh, kw, ci, _ = w_hwio.shape
    out = _prepare_conv_common(
        graph, fake, w_td, w_hwio, sum_axes=(0, 1, 2), k_taps=kh * kw * ci,
        exact=exact,
    )
    # Per-phase kernel slices + folded constants for the sub-pixel
    # decomposition (see _tconv_phases).  Each output owes k_taps "taps"
    # whose fill value is x_zp; a phase conv only computes taps_p of
    # them, so the missing xzp*w mass (and the matching wzp*S term) is
    # folded into a per-phase, per-out-channel constant.
    o = op.options
    sh, sw = o["stride_h"], o["stride_w"]
    # the output_shape input may be computed (SHAPE->PACK prelude from
    # converters with dynamic batch); the IR's static output shape is
    # authoritative either way
    out_shape = graph.tensor(op.outputs[0]).shape
    if out_shape[1] is None or out_shape[1] < 0:
        out_shape = graph.tensor(op.inputs[0]).data
    out_h, out_w = int(out_shape[1]), int(out_shape[2])
    in_h, in_w = int(x_td.shape[1]), int(x_td.shape[2])
    pb_h, pb_w = _tconv_pads(o, in_h, in_w, kh, kw, sh, sw, out_h, out_w)
    w_i8 = out["w"]  # already shifted into the int8 domain
    xzp = out["x_zp"]
    wzp = out["w_zp"]
    full_sum = w_i8.astype(np.int64).sum(axis=(0, 1, 2))
    ph_h = _tconv_phases(kh, sh, pb_h, out_h)
    ph_w = _tconv_phases(kw, sw, pb_w, out_w)
    for rh, (u0h, kah, _, _) in enumerate(ph_h):
        for rw, (u0w, kaw, _, _) in enumerate(ph_w):
            wp = np.ascontiguousarray(w_i8[u0h::sh, u0w::sw])
            taps_p = wp.shape[0] * wp.shape[1] * ci
            badj = (
                xzp * (full_sum - wp.astype(np.int64).sum(axis=(0, 1, 2)))
                - wzp * (kh * kw * ci - taps_p) * xzp
            ).astype(np.int32)
            out[f"w_{rh}_{rw}"] = wp
            out[f"badj_{rh}_{rw}"] = badj
    return out


@register("TRANSPOSE_CONV", prepare=_prepare_transpose_conv,
          static_inputs=(0,))
def _transpose_conv(ctx: LowerCtx, op: OpNode) -> None:
    g = ctx.graph
    x = ctx.arr(op.inputs[2])
    w = ctx.param(op, "w")
    out_td_shape = g.tensor(op.outputs[0]).shape
    if out_td_shape[1] is not None and out_td_shape[1] > 0:
        out_shape = [int(v) for v in out_td_shape]
    else:
        out_shape = [int(v) for v in ctx.static(op.inputs[0])]
    o = op.options
    sh, sw = o["stride_h"], o["stride_w"]
    kh, kw = w.shape[0], w.shape[1]
    oc = w.shape[-1]
    n, in_h, in_w, cin = x.shape
    out_h, out_w = out_shape[1], out_shape[2]

    quant = ctx.is_quantized(op.inputs[2])
    if quant:
        xzp = ctx.smeta(op, "x_zp")
        wzp = ctx.smeta(op, "w_zp")
        x, _ = _to_int8_domain(x, 0)
        fill = np.int8(xzp)
        acc_dtype = jnp.int32
    else:
        x = x.astype(jnp.float32)
        fill = np.float32(0.0)
        acc_dtype = jnp.float32

    pb_h, pb_w = _tconv_pads(o, in_h, in_w, kh, kw, sh, sw, out_h, out_w)
    dn = ("NHWC", "HWIO", "NHWC")
    # (Round-4 negative result: folding the s^2 phase convs into ONE
    # conv with sh*sw*oc output channels — bit-exact, tested — ran
    # 4x SLOWER on device (ICN tconvs 0.58 -> 2.3 ms/iter each): the
    # emitter handles s^2 small-K convs better than one wide-N conv
    # whose kernel is half zero-taps.  The per-phase form below stands.)
    # Quant path: bias + the exact requant run PER PHASE (elementwise
    # per-out-channel, so phase-wise application is bit-identical), so
    # the s^2 phase results interleave as int8 — 4x fewer bytes moved
    # than interleaving the int32 accumulator, and XLA fuses the requant
    # epilogue into each phase conv.  Float path keeps the int32/float
    # scatter accumulator.
    acc = None if quant else jnp.zeros((n, out_h, out_w, oc), acc_dtype)
    phases_out = {}
    for rh, (u0h, kah, offh, th) in enumerate(
            _tconv_phases(kh, sh, pb_h, out_h)):
        for rw, (u0w, kaw, offw, tw) in enumerate(
                _tconv_phases(kw, sw, pb_w, out_w)):
            if th <= 0 or tw <= 0:
                continue
            if kah == 0 or kaw == 0:
                # no real taps in this phase: all-fill window
                acc_p = jnp.zeros((n, th, tw, oc), acc_dtype)
                if quant:
                    acc_p = acc_p + ctx.param(op, f"badj_{rh}_{rw}")
            else:
                lo_h, hi_h = offh, offh + th + kah - 1
                lo_w, hi_w = offw, offw + tw + kaw - 1
                xs = x[:, max(lo_h, 0):min(hi_h, in_h),
                       max(lo_w, 0):min(hi_w, in_w), :]
                pads = ((0, 0),
                        (max(0, -lo_h), max(0, hi_h - in_h)),
                        (max(0, -lo_w), max(0, hi_w - in_w)),
                        (0, 0))
                if any(p != (0, 0) for p in pads[1:3]):
                    xs = jnp.pad(xs, pads, constant_values=fill)
                if quant:
                    wp = ctx.param(op, f"w_{rh}_{rw}")
                    acc_p = _int_conv(ctx, xs, wp, (1, 1), (1, 1), dn)
                    acc_p = acc_p + ctx.param(op, f"badj_{rh}_{rw}")
                    if wzp != 0:
                        s_p = _ones_conv(ctx, xs, kah, kaw, cin,
                                         (1, 1), (1, 1), dn)
                        acc_p = acc_p - jnp.int32(wzp) * s_p
                else:
                    wp = w[u0h::sh, u0w::sw]
                    acc_p = lax.conv_general_dilated(
                        xs, wp, (1, 1), "VALID", dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    )
            if quant:
                acc_p = acc_p + ctx.param(op, "bias")
                phases_out[(rh, rw)] = _conv_requant(ctx, op, acc_p)
            else:
                acc = acc.at[:, rh:rh + sh * th:sh,
                             rw:rw + sw * tw:sw, :].set(acc_p)

    if quant:
        out_dt = g.tensor(op.outputs[0]).dtype
        shapes = {k: v.shape for k, v in phases_out.items()}
        even = (
            out_h % sh == 0 and out_w % sw == 0
            and len(phases_out) == sh * sw
            and all(s_[1] == out_h // sh and s_[2] == out_w // sw
                    for s_ in shapes.values())
        )
        if even:
            # perfect tiling: interleave = pixel shuffle (pure relayout,
            # no scatter)
            th, tw = out_h // sh, out_w // sw
            stack = jnp.stack(
                [phases_out[(rh, rw)]
                 for rh in range(sh) for rw in range(sw)],
                axis=3,
            )  # [n, th, tw, sh*sw, oc]
            res = (
                stack.reshape(n, th, tw, sh, sw, oc)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, out_h, out_w, oc)
            )
        else:
            res = jnp.zeros((n, out_h, out_w, oc), out_dt)
            for (rh, rw), p in phases_out.items():
                res = res.at[:, rh:rh + sh * p.shape[1]:sh,
                             rw:rw + sw * p.shape[2]:sw, :].set(p)
        # pin the interleave to int8: without the barrier XLA commutes
        # the pixel shuffle past the CONSUMER's elementwise requant and
        # relayouts the u32 64-bit-limb intermediates instead — 8x the
        # copied bytes (ICN b32 xprof: 4 x 1.9 ms u32 data-formatting
        # copies from the downstream ADD's MBQM pipeline)
        ctx.set(op.outputs[0], lax.optimization_barrier(res))
    else:
        if f"op{op.index}/bias" in ctx.params:
            acc = acc + ctx.param(op, "bias")
        ctx.set(op.outputs[0],
                acc.astype(g.tensor(op.outputs[0]).dtype))


# --------------------------------------------------------------------------
# BATCH_MATMUL (float / dequant fallback)
# --------------------------------------------------------------------------

@register("BATCH_MATMUL")
def _batch_matmul(ctx: LowerCtx, op: OpNode) -> None:
    a = as_float(ctx, op.inputs[0])
    b = as_float(ctx, op.inputs[1])
    store_real(ctx, op.outputs[0], jnp.matmul(a, b))


# --------------------------------------------------------------------------
# Misc
# --------------------------------------------------------------------------

@register("FILL", static_inputs=(0,))
def _fill(ctx: LowerCtx, op: OpNode) -> None:
    dims = [int(v) for v in ctx.static(op.inputs[0])]
    td = ctx.graph.tensor(op.inputs[1])
    value = (
        jnp.asarray(td.data.reshape(())) if td.is_constant
        else ctx.arr(op.inputs[1]).reshape(())
    )
    ctx.set(op.outputs[0], jnp.full(dims, value))


@register("TILE", static_inputs=(1,))
def _tile(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    reps = [int(v) for v in ctx.static(op.inputs[1])]
    ctx.set(op.outputs[0], jnp.tile(x, reps))


@register("BROADCAST_TO", static_inputs=(1,))
def _broadcast_to(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    shape = [int(v) for v in ctx.static(op.inputs[1])]
    ctx.set(op.outputs[0], jnp.broadcast_to(x, shape))


# --------------------------------------------------------------------------
# Comparison / logical / select — the support-op tail the reference gets
# for free from the TFLite CPU kernels (comparisons.cc, select.cc,
# logical.cc); here they lower to the matching jnp primitives.
# --------------------------------------------------------------------------

def _compare_operands(ctx: LowerCtx, op: OpNode):
    """Quantized comparisons happen in real space; raw otherwise."""
    if ctx.is_quantized(op.inputs[0]) or ctx.is_quantized(op.inputs[1]):
        return as_float(ctx, op.inputs[0]), as_float(ctx, op.inputs[1])
    return ctx.arr(op.inputs[0]), ctx.arr(op.inputs[1])


def _comparison(fn):
    def lower(ctx: LowerCtx, op: OpNode) -> None:
        a, b = _compare_operands(ctx, op)
        ctx.set(op.outputs[0], fn(a, b))

    return lower


for _name, _fn in {
    "EQUAL": jnp.equal,
    "NOT_EQUAL": jnp.not_equal,
    "GREATER": jnp.greater,
    "GREATER_EQUAL": jnp.greater_equal,
    "LESS": jnp.less,
    "LESS_EQUAL": jnp.less_equal,
    "LOGICAL_AND": jnp.logical_and,
    "LOGICAL_OR": jnp.logical_or,
}.items():
    register(_name)(_comparison(_fn))


@register("LOGICAL_NOT")
def _logical_not(ctx: LowerCtx, op: OpNode) -> None:
    ctx.set(op.outputs[0], jnp.logical_not(ctx.arr(op.inputs[0])))


def _select(ctx: LowerCtx, op: OpNode) -> None:
    cond = ctx.arr(op.inputs[0])
    t1, t2 = op.inputs[1], op.inputs[2]
    out_td = ctx.graph.tensor(op.outputs[0])
    if ctx.is_quantized(t1) or ctx.is_quantized(t2):
        store_real(ctx, op.outputs[0],
                   jnp.where(cond, as_float(ctx, t1), as_float(ctx, t2)))
        return
    # SELECT (v1) allows a rank-1 condition selecting whole rows
    a, b = ctx.arr(t1), ctx.arr(t2)
    if cond.ndim == 1 and a.ndim > 1:
        cond = cond.reshape((-1,) + (1,) * (a.ndim - 1))
    ctx.set(op.outputs[0], jnp.where(cond, a, b).astype(out_td.dtype))


register("SELECT")(_select)
register("SELECT_V2")(_select)


# --------------------------------------------------------------------------
# Remaining reductions (reference: TFLite reduce.cc)
# --------------------------------------------------------------------------

@register("REDUCE_MIN", static_inputs=(1,))
def _reduce_min(ctx: LowerCtx, op: OpNode) -> None:
    # min commutes with the (monotonic) affine quantization: raw compute
    axes = tuple(int(v) for v in np.ravel(ctx.static(op.inputs[1])))
    keep_dims = op.options.get("keep_dims", False)
    out = jnp.min(ctx.arr(op.inputs[0]), axis=axes, keepdims=keep_dims)
    ctx.set(op.outputs[0], out.astype(ctx.graph.tensor(op.outputs[0]).dtype))


@register("REDUCE_PROD", static_inputs=(1,))
def _reduce_prod(ctx: LowerCtx, op: OpNode) -> None:
    axes = tuple(int(v) for v in np.ravel(ctx.static(op.inputs[1])))
    keep_dims = op.options.get("keep_dims", False)
    if ctx.is_quantized(op.inputs[0]):
        x = as_float(ctx, op.inputs[0])
        store_real(ctx, op.outputs[0],
                   jnp.prod(x, axis=axes, keepdims=keep_dims))
        return
    out = jnp.prod(ctx.arr(op.inputs[0]), axis=axes, keepdims=keep_dims)
    ctx.set(op.outputs[0], out.astype(ctx.graph.tensor(op.outputs[0]).dtype))


@register("REDUCE_ANY", static_inputs=(1,))
def _reduce_any(ctx: LowerCtx, op: OpNode) -> None:
    axes = tuple(int(v) for v in np.ravel(ctx.static(op.inputs[1])))
    keep_dims = op.options.get("keep_dims", False)
    ctx.set(op.outputs[0],
            jnp.any(ctx.arr(op.inputs[0]), axis=axes, keepdims=keep_dims))


@register("REDUCE_ALL", static_inputs=(1,))
def _reduce_all(ctx: LowerCtx, op: OpNode) -> None:
    axes = tuple(int(v) for v in np.ravel(ctx.static(op.inputs[1])))
    keep_dims = op.options.get("keep_dims", False)
    ctx.set(op.outputs[0],
            jnp.all(ctx.arr(op.inputs[0]), axis=axes, keepdims=keep_dims))


@register("ARG_MIN", static_inputs=(1,))
def _arg_min(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    axis = int(ctx.static(op.inputs[1]).reshape(()))
    dt = ctx.graph.tensor(op.outputs[0]).dtype
    ctx.set(op.outputs[0], jnp.argmin(x, axis=axis).astype(dt))


@register("ADD_N")
def _add_n(ctx: LowerCtx, op: OpNode) -> None:
    acc = ctx.arr(op.inputs[0])
    for tid in op.inputs[1:]:
        acc = acc + ctx.arr(tid)
    ctx.set(op.outputs[0], acc)


# --------------------------------------------------------------------------
# Integer/float division tail (reference: TFLite floor_div.cc/floor_mod.cc)
# --------------------------------------------------------------------------

@register("FLOOR_DIV")
def _floor_div(ctx: LowerCtx, op: OpNode) -> None:
    a, b = _compare_operands(ctx, op)
    out = jnp.floor_divide(a, b)
    ctx.set(op.outputs[0],
            out.astype(ctx.graph.tensor(op.outputs[0]).dtype))


@register("FLOOR_MOD")
def _floor_mod(ctx: LowerCtx, op: OpNode) -> None:
    # numpy mod == floor-mod (result takes the divisor's sign)
    a, b = _compare_operands(ctx, op)
    out = jnp.mod(a, b)
    ctx.set(op.outputs[0],
            out.astype(ctx.graph.tensor(op.outputs[0]).dtype))


# --------------------------------------------------------------------------
# Data movement tail (reference: TFLite reverse.cc, gather_nd.cc,
# space_to_batch_nd.cc, batch_to_space_nd.cc, one_hot.cc, cumsum.cc)
# --------------------------------------------------------------------------

@register("REVERSE_V2", static_inputs=(1,))
def _reverse_v2(ctx: LowerCtx, op: OpNode) -> None:
    axes = [int(v) for v in np.ravel(ctx.static(op.inputs[1]))]
    ctx.set(op.outputs[0], jnp.flip(ctx.arr(op.inputs[0]), axis=axes))


@register("GATHER_ND")
def _gather_nd(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    td = ctx.graph.tensor(op.inputs[1])
    idx = jnp.asarray(td.data) if td.is_constant else ctx.arr(op.inputs[1])
    ctx.set(op.outputs[0], x[tuple(jnp.moveaxis(idx, -1, 0))])


@register("SPACE_TO_BATCH_ND", static_inputs=(1, 2))
def _space_to_batch_nd(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    block = [int(v) for v in np.ravel(ctx.static(op.inputs[1]))]
    pads = np.asarray(ctx.static(op.inputs[2])).reshape(-1, 2)
    qp = ctx.qp(op.inputs[0])
    pad_val = int(qp.zero_point[0]) if qp is not None else 0
    m = len(block)
    pad_cfg = [(0, 0)] + [tuple(int(p) for p in pads[i]) for i in range(m)]
    pad_cfg += [(0, 0)] * (x.ndim - 1 - m)
    x = jnp.pad(x, pad_cfg, constant_values=np.asarray(pad_val, x.dtype))
    n = x.shape[0]
    rest = list(x.shape[1 + m:])
    # split each spatial dim by its block, hoist blocks into batch
    split = [n]
    for i in range(m):
        split += [x.shape[1 + i] // block[i], block[i]]
    x = x.reshape(split + rest)
    perm = [2 * i + 2 for i in range(m)] + [0]
    perm += [2 * i + 1 for i in range(m)]
    perm += list(range(1 + 2 * m, x.ndim))
    x = jnp.transpose(x, perm)
    out_shape = [n * int(np.prod(block))] + [
        split[1 + 2 * i] for i in range(m)
    ] + rest
    ctx.set(op.outputs[0], x.reshape(out_shape))


@register("BATCH_TO_SPACE_ND", static_inputs=(1, 2))
def _batch_to_space_nd(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    block = [int(v) for v in np.ravel(ctx.static(op.inputs[1]))]
    crops = np.asarray(ctx.static(op.inputs[2])).reshape(-1, 2)
    m = len(block)
    n = x.shape[0] // int(np.prod(block))
    rest = list(x.shape[1 + m:])
    spatial = [x.shape[1 + i] for i in range(m)]
    x = x.reshape(block + [n] + spatial + rest)
    perm = [m]
    for i in range(m):
        perm += [m + 1 + i, i]
    perm += list(range(1 + 2 * m, x.ndim))
    x = jnp.transpose(x, perm)
    x = x.reshape([n] + [spatial[i] * block[i] for i in range(m)] + rest)
    slices = [slice(None)]
    for i in range(m):
        c0, c1 = int(crops[i][0]), int(crops[i][1])
        slices.append(slice(c0, x.shape[1 + i] - c1))
    ctx.set(op.outputs[0], x[tuple(slices)])


@register("ONE_HOT", static_inputs=(1,))
def _one_hot(ctx: LowerCtx, op: OpNode) -> None:
    idx = ctx.arr(op.inputs[0])
    depth = int(ctx.static(op.inputs[1]).reshape(()))
    on_td = ctx.graph.tensor(op.inputs[2])
    off_td = ctx.graph.tensor(op.inputs[3])
    on = jnp.asarray(on_td.data.reshape(())) if on_td.is_constant \
        else ctx.arr(op.inputs[2]).reshape(())
    off = jnp.asarray(off_td.data.reshape(())) if off_td.is_constant \
        else ctx.arr(op.inputs[3]).reshape(())
    axis = op.options.get("axis", -1)
    if axis < 0:
        axis += idx.ndim + 1
    shape = [1] * (idx.ndim + 1)
    shape[axis] = depth
    iota = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    hot = jnp.expand_dims(idx.astype(jnp.int32), axis) == iota
    out = jnp.where(hot, on, off)
    ctx.set(op.outputs[0],
            out.astype(ctx.graph.tensor(op.outputs[0]).dtype))


@register("CUMSUM", static_inputs=(1,))
def _cumsum(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    axis = int(ctx.static(op.inputs[1]).reshape(()))
    exclusive = op.options.get("exclusive", False)
    reverse = op.options.get("reverse", False)
    if reverse:
        x = jnp.flip(x, axis)
    out = jnp.cumsum(x, axis=axis, dtype=x.dtype)
    if exclusive:
        out = out - x
    if reverse:
        out = jnp.flip(out, axis)
    ctx.set(op.outputs[0], out)


@register("TOPK_V2", static_inputs=(1,))
def _topk_v2(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    k = int(ctx.static(op.inputs[1]).reshape(()))
    values, indices = lax.top_k(x, k)
    ctx.set(op.outputs[0], values)
    ctx.set(op.outputs[1],
            indices.astype(ctx.graph.tensor(op.outputs[1]).dtype))


@register("LOCAL_RESPONSE_NORMALIZATION")
def _lrn(ctx: LowerCtx, op: OpNode) -> None:
    """x / (bias + alpha * sum_{c-r..c+r} x^2)^beta over channels
    (TF/TFLite semantics; rolling window via prefix sums)."""
    x = as_float(ctx, op.inputs[0])
    r = int(op.options.get("radius", 5))
    bias = op.options.get("bias", 1.0)
    alpha = op.options.get("alpha", 1.0)
    beta = op.options.get("beta", 0.5)
    c = x.shape[-1]
    sq = jnp.pad(x * x, [(0, 0)] * (x.ndim - 1) + [(r, r)])
    cs = jnp.cumsum(sq, axis=-1)
    zero = jnp.zeros(cs.shape[:-1] + (1,), cs.dtype)
    cs = jnp.concatenate([zero, cs], axis=-1)
    wsum = cs[..., 2 * r + 1: 2 * r + 1 + c] - cs[..., :c]
    store_real(ctx, op.outputs[0], x * (bias + alpha * wsum) ** (-beta))


@register("RANK")
def _rank(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    ctx.set(op.outputs[0], jnp.asarray(x.ndim, np.int32))


@register("ZEROS_LIKE")
def _zeros_like(ctx: LowerCtx, op: OpNode) -> None:
    ctx.set(op.outputs[0], jnp.zeros_like(ctx.arr(op.inputs[0])))


@register("UNIDIRECTIONAL_SEQUENCE_LSTM")
def _useq_lstm(ctx: LowerCtx, op: OpNode) -> None:
    """Fused sequence LSTM, float path (reference backend: TFLite
    lstm_eval float kernel; keras converts LSTM layers to this op).

    Implements the full float semantics — CIFG (absent input gate
    weights), peephole connections, projection, per-gate layer norm,
    cell/projection clips, time-major or batch-major — as one
    `lax.scan` over time so XLA compiles the recurrence into a single
    on-device loop.  Quantized LSTM variants are out of scope (raise)."""
    g = ctx.graph

    def opt(i):
        tid = op.inputs[i] if i < len(op.inputs) else -1
        if tid < 0:
            return None
        v = ctx.arr(tid)
        # zero-size placeholders also mean "absent"
        return None if (hasattr(v, "size") and v.size == 0) else v

    x_td = g.tensor(op.inputs[0])
    quantized = x_td.dtype.kind in "iu"
    if quantized and (x_td.dtype != np.int8 or x_td.quant is None):
        raise LoweringError(
            "UNIDIRECTIONAL_SEQUENCE_LSTM: unsupported input type "
            f"{x_td.dtype} (float32 and full-int8 are implemented)"
        )

    def real(i, v):
        """Dequantize an operand to real values for the float-domain
        simulation of the 8x8_16 integer kernel."""
        if v is None or not quantized:
            return v
        td = g.tensor(op.inputs[i])
        if td.quant is None:
            return v.astype(jnp.float32)
        s = float(td.quant.scale[0])
        zp = int(td.quant.zero_point[0])
        return (v.astype(jnp.float32) - zp) * s

    x = real(0, ctx.arr(op.inputs[0]))
    w_i, w_f, w_c, w_o = (real(i, opt(i)) for i in (1, 2, 3, 4))
    r_i, r_f, r_c, r_o = (real(i, opt(i)) for i in (5, 6, 7, 8))
    p_i, p_f, p_o = (real(i, opt(i)) for i in (9, 10, 11))
    b_i, b_f, b_c, b_o = (real(i, opt(i)) for i in (12, 13, 14, 15))
    proj_w, proj_b = real(16, opt(16)), real(17, opt(17))
    ln_i, ln_f, ln_c, ln_o = (real(i, opt(i)) for i in (20, 21, 22, 23))
    cifg = w_i is None

    # the integer kernel quantizes both states every step (int8 output
    # state, int16 cell state) — simulate that information loss so the
    # recurrence tracks the interpreter, not the ideal float LSTM
    quant_h = quant_c = None
    if quantized:
        h_td = g.tensor(op.inputs[18])
        c_td = g.tensor(op.inputs[19])
        hs_, hzp = float(h_td.quant.scale[0]), int(h_td.quant.zero_point[0])
        cs_ = float(c_td.quant.scale[0])

        def quant_h(h):
            qh = jnp.clip(Q.round_ties_away(h / hs_) + hzp, -128, 127)
            return (qh - hzp) * hs_

        def quant_c(c):
            qc = jnp.clip(Q.round_ties_away(c / cs_), -32768, 32767)
            return qc * cs_

    time_major = bool(op.options.get("time_major", False))
    cell_clip = float(op.options.get("cell_clip", 0.0))
    proj_clip = float(op.options.get("proj_clip", 0.0))
    act_name = op.options.get("activation", "TANH")
    act = (lambda v: v) if act_name == "NONE" else (
        jnp.tanh if act_name == "TANH" else
        (lambda v: _apply_float_activation(v, act_name))
    )

    xs = x if time_major else jnp.swapaxes(x, 0, 1)  # [T, B, I]
    batch = xs.shape[1]
    n_cell = w_f.shape[0]
    n_output = r_f.shape[1]

    def gate(xt, h, c_prev, w, r, p, b, ln):
        z = xt @ w.T + h @ r.T
        if p is not None:
            z = z + c_prev * p
        if ln is not None:
            # TFLite MeanStddevNormalization over the cell dim, then the
            # per-gate coefficient; the gate bias applies after the norm
            mu = jnp.mean(z, axis=-1, keepdims=True)
            var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
            z = (z - mu) * jax.lax.rsqrt(var + 1e-8) * ln
        if b is not None:
            z = z + b
        return z

    def step(carry, xt):
        h, c = carry
        f = jax.nn.sigmoid(gate(xt, h, c, w_f, r_f, p_f, b_f, ln_f))
        if cifg:
            i = 1.0 - f
        else:
            i = jax.nn.sigmoid(gate(xt, h, c, w_i, r_i, p_i, b_i, ln_i))
        gc = act(gate(xt, h, c, w_c, r_c, None, b_c, ln_c))
        c_new = f * c + i * gc
        if cell_clip > 0.0:
            c_new = jnp.clip(c_new, -cell_clip, cell_clip)
        if quant_c is not None:
            c_new = quant_c(c_new)
        # the output gate's peephole reads the UPDATED cell state
        o = jax.nn.sigmoid(gate(xt, h, c_new, w_o, r_o, p_o, b_o, ln_o))
        h_new = o * act(c_new)
        if proj_w is not None:
            h_new = h_new @ proj_w.T
            if proj_b is not None:
                h_new = h_new + proj_b
            if proj_clip > 0.0:
                h_new = jnp.clip(h_new, -proj_clip, proj_clip)
        if quant_h is not None:
            h_new = quant_h(h_new)
        return (h_new, c_new), h_new

    h0 = jnp.zeros((batch, n_output), np.float32)
    c0 = jnp.zeros((batch, n_cell), np.float32)
    _, hs = jax.lax.scan(step, (h0, c0), xs)
    out = hs if time_major else jnp.swapaxes(hs, 0, 1)
    if quantized:
        out_td = g.tensor(op.outputs[0])
        s = float(out_td.quant.scale[0])
        zp = int(out_td.quant.zero_point[0])
        q = jnp.clip(Q.round_ties_away(out / s) + zp, -128, 127)
        out = q.astype(out_td.dtype)
    ctx.set(op.outputs[0], out)


# --------------------------------------------------------------------------
# Control flow (WHILE/IF over sibling subgraphs).  The reference backend
# runs these through the TFLite interpreter's control-flow kernels; here
# each referenced subgraph lowers to a traced child program inside
# lax.while_loop / lax.cond, so the whole loop compiles into ONE XLA
# computation.  Bodies must be static-shape (XLA's model); TFLite models
# whose loops grow tensors per iteration (keras-3 TensorArray writes)
# are rejected with a clear error — the fused LSTM path covers those.
# --------------------------------------------------------------------------

class _ChildProgram:
    """A sibling subgraph prepared for tracing inside a parent lowering."""

    def __init__(self, graph, exact: bool):
        from ..backend.program import prepare_params

        self.graph = graph
        self.exact = exact
        self.params, self.meta = prepare_params(
            graph, range(len(graph.ops)), exact
        )

    def __call__(self, conv_mode: str, values):
        from ..ops.registry import get_lowering as _get

        ctx = LowerCtx(
            self.graph,
            {k: jnp.asarray(v) for k, v in self.params.items()},
            self.meta,
            exact=self.exact,
            conv_mode=conv_mode,
        )
        for tid, v in zip(self.graph.inputs, values):
            ctx.set(tid, v)
        for op_ in self.graph.ops:
            _get(op_.opname).trace(ctx, op_)
        return [ctx.arr(t) for t in self.graph.outputs]


def _prepare_control_flow(graph, op: OpNode, exact: bool):
    subs = graph.subgraphs
    if not subs:
        raise LoweringError(f"{op.opname}: model has no subgraph table")
    if op.opname == "WHILE":
        roles = (
            ("cond", op.options.get("cond_subgraph_index", 0)),
            ("body", op.options.get("body_subgraph_index", 0)),
        )
    else:
        roles = (
            ("then", op.options.get("then_subgraph_index", 0)),
            ("else", op.options.get("else_subgraph_index", 0)),
        )
    return {name: _ChildProgram(subs[idx], exact) for name, idx in roles}


def _cf_arr(ctx: LowerCtx, tid: int):
    """Operand of a control-flow op: constants come straight from the
    graph (ops with a `prepare` hook skip generic param registration)."""
    td = ctx.graph.tensor(tid)
    if td.is_constant and tid not in ctx.env:
        return jnp.asarray(td.data)
    return ctx.arr(tid)


@register("WHILE", prepare=_prepare_control_flow)
def _while(ctx: LowerCtx, op: OpNode) -> None:
    cond = ctx.meta[f"op{op.index}/cond"]
    body = ctx.meta[f"op{op.index}/body"]
    init = tuple(_cf_arr(ctx, t) for t in op.inputs)

    def cond_fn(carry):
        out = cond(ctx.conv_mode, list(carry))
        if len(out) != 1:
            raise LoweringError("WHILE: cond subgraph must yield one bool")
        return jnp.reshape(out[0], ()).astype(bool)

    def body_fn(carry):
        out = body(ctx.conv_mode, list(carry))
        if len(out) != len(carry):
            raise LoweringError(
                f"WHILE: body arity {len(out)} != carry {len(carry)}"
            )
        # loop-carried values must keep their dtypes (weak-type drift
        # from python scalars would fail while_loop's structure check)
        return tuple(
            o.astype(c.dtype) if o.dtype != c.dtype else o
            for o, c in zip(out, carry)
        )

    final = jax.lax.while_loop(cond_fn, body_fn, init)
    for tid, v in zip(op.outputs, final):
        ctx.set(tid, v)


@register("IF", prepare=_prepare_control_flow)
def _if(ctx: LowerCtx, op: OpNode) -> None:
    then_p = ctx.meta[f"op{op.index}/then"]
    else_p = ctx.meta[f"op{op.index}/else"]
    pred = jnp.reshape(_cf_arr(ctx, op.inputs[0]), ()).astype(bool)
    args = tuple(_cf_arr(ctx, t) for t in op.inputs[1:])
    outs = jax.lax.cond(
        pred,
        lambda a: tuple(then_p(ctx.conv_mode, list(a))),
        lambda a: tuple(else_p(ctx.conv_mode, list(a))),
        args,
    )
    for tid, v in zip(op.outputs, outs):
        ctx.set(tid, v)


@register("SCATTER_ND", static_inputs=(2,))
def _scatter_nd(ctx: LowerCtx, op: OpNode) -> None:
    """TFLite SCATTER_ND: zeros(shape) scattered with updates at indices
    (overlapping indices sum, matching the TF op)."""
    idx_td = ctx.graph.tensor(op.inputs[0])
    indices = (
        jnp.asarray(idx_td.data) if idx_td.is_constant
        else ctx.arr(op.inputs[0])
    )
    updates = ctx.arr(op.inputs[1])
    shape = [int(v) for v in ctx.static(op.inputs[2])]
    out = jnp.zeros(shape, updates.dtype)
    ctx.set(op.outputs[0],
            out.at[tuple(jnp.moveaxis(indices, -1, 0))].add(updates))


# --------------------------------------------------------------------------
# Support tail 2: segment reductions, sequence reversal, matrix diag,
# pointwise/bitwise stragglers, 3-D convolution, spectral ops.  Oracle
# bundle: tests/gen_support_ops2_model.py -> tests/test_support_ops.py.
# The reference gets these from the TFLite CPU kernel library
# (band/backend/tfl/model_executor.cc:249-255).
# --------------------------------------------------------------------------

def _const_or_arr(ctx: LowerCtx, tid: int):
    td = ctx.graph.tensor(tid)
    return jnp.asarray(td.data) if td.is_constant else ctx.arr(tid)


@register("SEGMENT_SUM")
def _segment_sum(ctx: LowerCtx, op: OpNode) -> None:
    data = ctx.arr(op.inputs[0])
    seg_td = ctx.graph.tensor(op.inputs[1])
    seg = _const_or_arr(ctx, op.inputs[1])
    if seg_td.is_constant:  # segment count is data-dependent: resolve
        n = int(np.max(seg_td.data)) + 1  # host-side when ids are static
    else:  # dynamic ids: trust the (converter-pinned) output shape
        n = int(ctx.graph.tensor(op.outputs[0]).shape[0])
        if n <= 0:
            # converters may leave the leading dim dynamic (-1/0); a
            # silent wrong segment count here would corrupt results
            raise LoweringError(
                "SEGMENT_SUM with non-constant segment ids needs a "
                f"static positive output dim 0, got {n}"
            )
    ctx.set(op.outputs[0], jax.ops.segment_sum(data, seg, num_segments=n))


def _unsorted_segment(kind: str):
    fns = {
        "sum": jax.ops.segment_sum,
        "prod": jax.ops.segment_prod,
        "max": jax.ops.segment_max,
        "min": jax.ops.segment_min,
    }

    def lower(ctx: LowerCtx, op: OpNode) -> None:
        data = ctx.arr(op.inputs[0])
        seg = _const_or_arr(ctx, op.inputs[1])
        n = int(np.ravel(ctx.static(op.inputs[2]))[0])
        out = fns[kind](data, seg, num_segments=n)
        if kind in ("max", "min"):
            # TF fills empty segments with the dtype's lowest/highest
            # value; JAX uses the monoid identity (+-inf for floats)
            if jnp.issubdtype(data.dtype, jnp.floating):
                info = jnp.finfo(data.dtype)
            else:
                info = jnp.iinfo(data.dtype)
            fill = info.min if kind == "max" else info.max
            counts = jax.ops.segment_sum(
                jnp.ones(seg.shape, jnp.int32), seg, num_segments=n
            )
            empty = (counts == 0).reshape((n,) + (1,) * (out.ndim - 1))
            out = jnp.where(empty, jnp.asarray(fill, data.dtype), out)
        ctx.set(op.outputs[0], out.astype(data.dtype))

    return lower


register("UNSORTED_SEGMENT_SUM", static_inputs=(2,))(_unsorted_segment("sum"))
register("UNSORTED_SEGMENT_PROD", static_inputs=(2,))(_unsorted_segment("prod"))
register("UNSORTED_SEGMENT_MAX", static_inputs=(2,))(_unsorted_segment("max"))
register("UNSORTED_SEGMENT_MIN", static_inputs=(2,))(_unsorted_segment("min"))


@register("REVERSE_SEQUENCE")
def _reverse_sequence(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    lens = _const_or_arr(ctx, op.inputs[1]).astype(jnp.int32)
    s = int(op.options.get("seq_dim", 0))
    b = int(op.options.get("batch_dim", 0))
    seq_len = x.shape[s]
    pos_shape = [1] * x.ndim
    pos_shape[s] = seq_len
    pos = jnp.arange(seq_len, dtype=jnp.int32).reshape(pos_shape)
    len_shape = [1] * x.ndim
    len_shape[b] = x.shape[b]
    ln = lens.reshape(len_shape)
    idx = jnp.where(pos < ln, ln - 1 - pos, pos)
    idx = jnp.broadcast_to(idx, x.shape)
    ctx.set(op.outputs[0], jnp.take_along_axis(x, idx, axis=s))


@register("MATRIX_DIAG")
def _matrix_diag(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    n = x.shape[-1]
    ctx.set(op.outputs[0], jnp.where(
        jnp.eye(n, dtype=bool), x[..., :, None],
        jnp.zeros((), x.dtype)))


@register("MATRIX_SET_DIAG")
def _matrix_set_diag(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    d = ctx.arr(op.inputs[1])
    k = min(x.shape[-2], x.shape[-1])
    i = jnp.arange(k)
    ctx.set(op.outputs[0], x.at[..., i, i].set(d))


@register("ATAN2")
def _atan2(ctx: LowerCtx, op: OpNode) -> None:
    ctx.set(op.outputs[0],
            jnp.arctan2(ctx.arr(op.inputs[0]), ctx.arr(op.inputs[1])))


@register("SIGN")
def _sign(ctx: LowerCtx, op: OpNode) -> None:
    ctx.set(op.outputs[0], jnp.sign(ctx.arr(op.inputs[0])))


@register("BITWISE_XOR")
def _bitwise_xor(ctx: LowerCtx, op: OpNode) -> None:
    ctx.set(op.outputs[0], jnp.bitwise_xor(
        ctx.arr(op.inputs[0]), _const_or_arr(ctx, op.inputs[1])))


@register("RIGHT_SHIFT")
def _right_shift(ctx: LowerCtx, op: OpNode) -> None:
    ctx.set(op.outputs[0], jnp.right_shift(
        ctx.arr(op.inputs[0]), _const_or_arr(ctx, op.inputs[1])))


@register("CONV_3D")
def _conv3d(ctx: LowerCtx, op: OpNode) -> None:
    """Float 3-D convolution (video model family). TFLite CONV_3D is
    float-only; weights are DHWIO, input NDHWC."""
    x = ctx.arr(op.inputs[0])
    w = _const_or_arr(ctx, op.inputs[1])
    opts = op.options
    kd, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    st = (opts["stride_d"], opts["stride_h"], opts["stride_w"])
    dil = (opts.get("dilation_d", 1), opts.get("dilation_h", 1),
           opts.get("dilation_w", 1))
    if opts["padding"] == "SAME":
        pads = [
            _same_pads(x.shape[1], kd, st[0], dil[0]),
            _same_pads(x.shape[2], kh, st[1], dil[1]),
            _same_pads(x.shape[3], kw, st[2], dil[2]),
        ]
    else:
        pads = [(0, 0)] * 3
    acc = lax.conv_general_dilated(
        x, w, st, pads, rhs_dilation=dil,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    if len(op.inputs) > 2 and op.inputs[2] >= 0:
        acc = acc + _const_or_arr(ctx, op.inputs[2])
    out = _apply_float_activation(acc, opts.get("activation", "NONE"))
    ctx.set(op.outputs[0], out.astype(ctx.graph.tensor(op.outputs[0]).dtype))


@register("RFFT2D", static_inputs=(1,))
def _rfft2d(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    fft_len = [int(v) for v in np.ravel(ctx.static(op.inputs[1]))]
    out = jnp.fft.rfftn(x, s=fft_len, axes=(-2, -1))
    ctx.set(op.outputs[0], out.astype(jnp.complex64))


@register("COMPLEX_ABS")
def _complex_abs(ctx: LowerCtx, op: OpNode) -> None:
    x = ctx.arr(op.inputs[0])
    ctx.set(op.outputs[0],
            jnp.abs(x).astype(ctx.graph.tensor(op.outputs[0]).dtype))


@register("REAL")
def _real(ctx: LowerCtx, op: OpNode) -> None:
    ctx.set(op.outputs[0], jnp.real(ctx.arr(op.inputs[0])))


@register("IMAG")
def _imag(ctx: LowerCtx, op: OpNode) -> None:
    ctx.set(op.outputs[0], jnp.imag(ctx.arr(op.inputs[0])))
