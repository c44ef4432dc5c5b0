"""Quantization arithmetic for INT8/UINT8 inference.

Provides bit-exact TFLite-style fixed-point requantization
(SaturatingRoundingDoublingHighMul + RoundingDivideByPOT, the gemmlowp
pipeline the reference's CPU kernels use) implemented with 32-bit limb
arithmetic so it runs on the TPU VPU without int64 support, plus a fast
float32 path for throughput mode.

Reference semantics: band's backend executes TFLite quantized kernels
(band/backend/tfl/model_executor.cc:249-255 → tflite::Interpreter);
this module reproduces their requantization contract.
"""

from __future__ import annotations

import math
from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

ArrayLike = Union[jnp.ndarray, np.ndarray]


# --------------------------------------------------------------------------
# Host-side multiplier decomposition (numpy, done once at prepare time)
# --------------------------------------------------------------------------

def quantize_multiplier(m: float) -> Tuple[int, int]:
    """Decompose a positive real multiplier into (q, shift) with
    m == q * 2^(shift - 31), q in [2^30, 2^31)."""
    if m == 0.0:
        return 0, 0
    mant, exp = math.frexp(m)  # m = mant * 2^exp, mant in [0.5, 1)
    q = int(round(mant * (1 << 31)))
    if q == (1 << 31):
        q //= 2
        exp += 1
    if exp < -31:
        # TFLite QuantizeMultiplier clamp: the multiplier underflows the
        # fixed-point range entirely (quantized_util.cc) — downstream
        # shift logic would otherwise shift by >= 32 (undefined)
        return 0, 0
    return q, exp


def quantize_multipliers(ms: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized quantize_multiplier for per-channel scales."""
    qs = np.empty(ms.shape, np.int32)
    shifts = np.empty(ms.shape, np.int32)
    for i, m in enumerate(np.ravel(ms)):
        q, s = quantize_multiplier(float(m))
        qs.flat[i] = q
        shifts.flat[i] = s
    return qs, shifts


# --------------------------------------------------------------------------
# 64-bit arithmetic with 32-bit limbs (runs on the VPU)
# --------------------------------------------------------------------------

def _mul64(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full signed 64-bit product of int32 a*b as (hi, lo) uint32 limbs."""
    au = a.astype(jnp.uint32)
    bu = b.astype(jnp.uint32)
    al, ah = au & 0xFFFF, au >> 16
    bl, bh = bu & 0xFFFF, bu >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    cross = lh + hl
    carry1 = (cross < lh).astype(jnp.uint32)
    lo = ll + (cross << 16)
    carry2 = (lo < ll).astype(jnp.uint32)
    hi = hh + (cross >> 16) + (carry1 << 16) + carry2
    # unsigned -> signed product correction (two's complement identity)
    hi = hi - jnp.where(a < 0, bu, jnp.uint32(0)) - jnp.where(
        b < 0, au, jnp.uint32(0)
    )
    return hi, lo


def _srdhm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SaturatingRoundingDoublingHighMul: int32((2*a*b + nudge) / 2^31),
    division truncating toward zero (gemmlowp exact semantics)."""
    hi, lo = _mul64(a, b)
    neg = hi.astype(jnp.int32) < 0
    # nudge = 1<<30 for non-negative product else 1 - (1<<30)
    nudge_lo = jnp.where(neg, jnp.uint32(1 - (1 << 30) & 0xFFFFFFFF),
                         jnp.uint32(1 << 30))
    nudge_hi = jnp.where(neg, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    lo2 = lo + nudge_lo
    carry = (lo2 < lo).astype(jnp.uint32)
    hi2 = hi + nudge_hi + carry
    v_neg = hi2.astype(jnp.int32) < 0
    # divide by 2^31 truncating toward zero
    q_pos = ((hi2 << 1) | (lo2 >> 31)).astype(jnp.int32)
    # negate 64-bit, shift, negate back
    nlo = (~lo2) + jnp.uint32(1)
    nhi = (~hi2) + (nlo == 0).astype(jnp.uint32)
    q_neg = -(((nhi << 1) | (nlo >> 31)).astype(jnp.int32))
    return jnp.where(v_neg, q_neg, q_pos)


def _rounding_divide_by_pot(x: jnp.ndarray, exponent: jnp.ndarray) -> jnp.ndarray:
    """RoundingDivideByPOT: round-to-nearest, ties away from zero."""
    exponent = jnp.asarray(exponent, jnp.int32)
    mask = (jnp.int32(1) << exponent) - 1
    remainder = jnp.bitwise_and(x, mask)
    threshold = (mask >> 1) + jnp.where(x < 0, jnp.int32(1), jnp.int32(0))
    return (x >> exponent) + jnp.where(remainder > threshold, jnp.int32(1),
                                       jnp.int32(0))


# "single" matches TFLite >= 2.16 (TFLITE_SINGLE_ROUNDING, the LiteRT
# default); "double" matches the gemmlowp pipeline of TFLite 2.9.2 that
# the reference links against (band WORKSPACE:9-15).
DEFAULT_ROUNDING = "single"


def _shr64_floor(hi: jnp.ndarray, lo: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Arithmetic (floor) right shift of a 64-bit (hi,lo) value by t in
    [1, 62], returning the low 32 bits of the result as int32.

    Clamps run in SIGNED int32: this code executes both under XLA and
    inside Pallas kernels (ops/pallas/qmatmul.py), and Mosaic does not
    legalize unsigned vector min/max (arith.maxui)."""
    ti = jnp.asarray(t, jnp.int32)
    t_lo = jnp.clip(ti, 1, 31).astype(jnp.uint32)
    t_hi = jnp.clip(ti - 32, 0, 31)
    # t < 32: (hi << (32-t)) | (lo >> t)
    small = ((hi << (32 - t_lo)) | (lo >> t_lo)).astype(jnp.int32)
    # t >= 32: asr(hi, t-32)
    big = hi.astype(jnp.int32) >> t_hi
    return jnp.where(ti < 32, small, big)


def _mbqm_single_from_limbs(
    hi: jnp.ndarray, lo: jnp.ndarray, shift: jnp.ndarray
) -> jnp.ndarray:
    """Single-rounding tail on a prebuilt 64-bit product (hi, lo):
    floor((P + 2^(t-1)) >> t), t = 31 - shift."""
    t = 31 - jnp.asarray(shift, jnp.int32)
    tm1 = t - 1
    r_lo = jnp.where(
        tm1 < 32,
        jnp.uint32(1) << jnp.clip(tm1, 0, 31).astype(jnp.uint32),
        jnp.uint32(0),
    )
    r_hi = jnp.where(
        tm1 >= 32,
        jnp.uint32(1) << jnp.clip(tm1 - 32, 0, 31).astype(jnp.uint32),
        jnp.uint32(0),
    )
    lo2 = lo + r_lo
    carry = (lo2 < lo).astype(jnp.uint32)
    hi2 = hi + r_hi + carry
    return _shr64_floor(hi2, lo2, t)


def _mbqm_single(x: jnp.ndarray, qm: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Single-rounding MBQM: floor((x*qm + 2^(t-1)) >> t), t = 31 - shift.
    Clamps in signed int32 for Mosaic compatibility (see _shr64_floor)."""
    hi, lo = _mul64(x, jnp.asarray(qm, jnp.int32))
    return _mbqm_single_from_limbs(hi, lo, shift)


def _mul64_shifted_small(a: jnp.ndarray, qm: jnp.ndarray, ls: int):
    """(hi, lo) u32 limbs of (a << ls) * qm for |a| < 2^15 and qm >= 0.

    The small operand lets the 64-bit product split into TWO int32
    multiplies (vs the four of the general _mul64 plus its carry and
    sign-correction chain): a*qm = (a*(qm>>16))<<16 + a*(qm&0xFFFF),
    both partials int32-exact.  The static left shift rides the limbs.
    This is the quantized ADD/SUB hot path: the input rescale operates
    on (x - zp) of an 8-bit tensor, |.| <= 510."""
    qmi = jnp.asarray(qm, jnp.int32)
    p_lo = a * (qmi & 0xFFFF)   # |a| * 2^16 < 2^31: int32-exact
    p_hi = a * (qmi >> 16)      # |a| * 2^15 < 2^30: int32-exact
    hi1 = (p_hi >> 16).astype(jnp.uint32)   # arithmetic: sign extends
    lo1 = p_hi.astype(jnp.uint32) << 16
    hi2 = (p_lo >> 31).astype(jnp.uint32)   # sign extension limb
    lo2 = p_lo.astype(jnp.uint32)
    lo = lo1 + lo2
    hi = hi1 + hi2 + (lo < lo1).astype(jnp.uint32)
    if ls:
        hi = (hi << ls) | (lo >> (32 - ls))
        lo = lo << ls
    return hi, lo


def mbqm_single_shifted_small(
    a: jnp.ndarray, qm: ArrayLike, shift: ArrayLike, ls: int
) -> jnp.ndarray:
    """multiply_by_quantized_multiplier((a << ls), qm, shift) with
    single rounding, bit-identical to the general path, for |a| < 2^15
    and qm >= 0 (TFLite multipliers are always positive)."""
    hi, lo = _mul64_shifted_small(a, jnp.asarray(qm, jnp.int32), ls)
    return _mbqm_single_from_limbs(hi, lo, jnp.asarray(shift, jnp.int32))


def addsub_input_rescale_plan(qm: int, shift: int, ls: int, amax: int = 255):
    """Host-side plan for the 5-op exact ADD/SUB input rescale below.

    The exact rescale is s(a) = floor(((a << ls)*qm + 2^(t-1)) >> t)
    with t = 31 - shift.  Dividing numerator and denominator by 2^ls
    (both exactly divisible / floor-invariant):
        s(a) = floor((a*qm + 2^(t'-1)) >> t'),  t' = t - ls.
    Splitting qm = qh*2^t' + ql (ql = low t' bits) makes the first
    term's division exact, so the floor distributes:
        s(a) = a*qh + ((a*ql + 2^(t'-1)) >> t')
    — five int32 ops, NO 64-bit limbs, exact for every |a| <= amax
    provided both products fit int32:  amax*qh < 2^31 and
    amax*ql + 2^(t'-1) < 2^31.  Returns (qh, ql, half, t') or None
    when the preconditions fail (then callers use the general path).

    This replaces the general-MBQM input rescale (~25 VPU ops/element,
    the dominant cost of the quantized ADD pipeline — ops 68/71/74 of
    ICN b32 run 2x slower than their twins purely because the residual
    ADD fused into their conv epilogue, docs/performance.md round 4)."""
    t = 31 - int(shift)
    tp = t - int(ls)
    if tp < 1 or qm < 0:
        return None
    qh, ql = qm >> tp, qm & ((1 << tp) - 1)
    half = 1 << (tp - 1)
    if amax * qh >= 1 << 31 or amax * ql + half >= 1 << 31:
        return None
    return int(qh), int(ql), int(half), int(tp)


def addsub_input_rescale(a: jnp.ndarray, qh: int, ql: int, half: int,
                         tp: int) -> jnp.ndarray:
    """The 5-op exact input rescale (see addsub_input_rescale_plan)."""
    return a * jnp.int32(qh) + ((a * jnp.int32(ql) + jnp.int32(half)) >> tp)


def _collapsed_double_pipeline(
    x: jnp.ndarray, qm: jnp.ndarray, right: jnp.ndarray, rounding: str
) -> jnp.ndarray:
    """SRDHM followed by a rounding right shift, collapsed to ONE
    64-bit add + ONE shift of the raw product P = x*qm (qm > 0).

    gemmlowp's SRDHM (qm > 0, so never the saturating case) is
    h = trunc((P + nudge)/2^31) with nudge = 2^30 or 1-2^30 by sign —
    which is UNIFORMLY h = floor((P + 2^30)/2^31) for both signs (the
    trunc/nudge sign terms cancel).  Composing with the rounding right
    shift via floor((floor((P+a)/2^31)+c)/2^r) =
    floor((P + a + c*2^31)/2^(31+r)):
      ruy    (half UP):          y = floor((P + 2^30 + 2^(30+r)) >> (31+r))
      double (RDBPOT ties away): y = floor((P + 2^30 + 2^(30+r)
                                            - [h<0]*2^31) >> (31+r))
    with [h<0] = [(P + 2^30) < 0].  Verified exact against the
    reference two-step pipelines over the full int32 range for every
    r in [0, 30] (tests/test_quant.py) and by the model-level oracle
    tests.  This is the serving hot path: round-1's two-step limb
    pipeline cost 2-4x the conv MACs themselves at 112^2 activations
    (docs/performance.md round-2 notes)."""
    hi, lo = _mul64(x, qm)  # P as (hi, lo) limbs
    # sum0 = P + 2^30
    lo1 = lo + jnp.uint32(1 << 30)
    hi1 = hi + (lo1 < lo).astype(jnp.uint32)
    e = 30 + right  # in [31, 61] when right > 0
    add_lo = jnp.where(
        (right > 0) & (e < 32),
        jnp.uint32(1) << jnp.clip(e, 0, 31).astype(jnp.uint32),
        jnp.uint32(0),
    )
    add_hi = jnp.where(
        (right > 0) & (e >= 32),
        jnp.uint32(1) << jnp.clip(e - 32, 0, 31).astype(jnp.uint32),
        jnp.uint32(0),
    )
    if rounding != "ruy":  # gemmlowp double rounding: - [h<0]*2^31
        hneg = (hi1.astype(jnp.int32) < 0) & (right > 0)
        sub_lo = hneg.astype(jnp.uint32) << 31
        borrow = (sub_lo > add_lo).astype(jnp.uint32)
        add_lo = add_lo - sub_lo
        add_hi = add_hi - borrow
    lo2 = lo1 + add_lo
    hi2 = hi1 + add_hi + (lo2 < lo1).astype(jnp.uint32)
    return _shr64_floor(hi2, lo2, (31 + right).astype(jnp.uint32))


def multiply_by_quantized_multiplier(
    x: jnp.ndarray, qm: ArrayLike, shift: ArrayLike, rounding: str = None
) -> jnp.ndarray:
    """x * qm * 2^(shift-31), TFLite-exact rounding. qm/shift broadcast."""
    rounding = rounding or DEFAULT_ROUNDING
    qm = jnp.asarray(qm, jnp.int32)
    shift = jnp.asarray(shift, jnp.int32)
    if rounding == "single":
        return _mbqm_single(x, qm, shift)
    left = jnp.maximum(shift, 0)
    right = jnp.maximum(-shift, 0)
    shifted = x * (jnp.int32(1) << left)
    return _collapsed_double_pipeline(shifted, qm, right, rounding)


def _reference_two_step(
    x: jnp.ndarray, qm: jnp.ndarray, shift: jnp.ndarray, rounding: str
) -> jnp.ndarray:
    """The literal two-step pipeline (SRDHM then rounding shift), kept
    as the behavioral reference for the collapsed hot path above
    (tests/test_quant.py asserts equivalence on randomized inputs)."""
    left = jnp.maximum(shift, 0)
    right = jnp.maximum(-shift, 0)
    shifted = x * (jnp.int32(1) << left)
    high = _srdhm(shifted, qm)
    if rounding == "ruy":
        # ruy's rounding right shift: floor((x + 2^(e-1)) >> e) — round
        # half UP, computed wrap-safely
        half = jnp.where(right > 0,
                         jnp.int32(1) << jnp.maximum(right - 1, 0),
                         jnp.int32(0))
        mask = (jnp.int32(1) << right) - jnp.int32(1)
        carry = ((high & mask) + half) >> right
        return (high >> right) + carry
    return _rounding_divide_by_pot(high, right)


# --------------------------------------------------------------------------
# Requantization entry points
# --------------------------------------------------------------------------

def requantize_exact(
    acc: jnp.ndarray,
    qm: ArrayLike,
    shift: ArrayLike,
    out_zp: int,
    qmin: int,
    qmax: int,
    out_dtype,
    rounding: str = None,
) -> jnp.ndarray:
    """int32 accumulator -> quantized output, bit-exact TFLite pipeline."""
    scaled = multiply_by_quantized_multiplier(acc, qm, shift, rounding)
    out = scaled + jnp.int32(out_zp)
    out = jnp.clip(out, qmin, qmax)
    return out.astype(out_dtype)


def requantize_fast(
    acc: jnp.ndarray,
    multiplier: ArrayLike,
    out_zp: int,
    qmin: int,
    qmax: int,
    out_dtype,
) -> jnp.ndarray:
    """float32 multiply + round-to-nearest-even; ±1 LSB of the exact path."""
    scaled = jnp.round(acc.astype(jnp.float32) * jnp.asarray(multiplier,
                                                             jnp.float32))
    out = scaled.astype(jnp.int32) + jnp.int32(out_zp)
    out = jnp.clip(out, qmin, qmax)
    return out.astype(out_dtype)


def quantized_range(dtype: np.dtype) -> Tuple[int, int]:
    info = np.iinfo(dtype)
    return int(info.min), int(info.max)


def activation_range(
    activation: str, scale: float, zero_point: int, dtype: np.dtype
) -> Tuple[int, int]:
    """Clamp bounds of a fused activation in the quantized domain
    (reference semantics: tflite CalculateActivationRangeQuantized)."""
    qmin, qmax = quantized_range(dtype)

    def quantize(v: float) -> int:
        # TfLiteRound = half away from zero (kernel_util.cc); Python's
        # round() is half-to-even and differs on exact ties
        import math

        r = v / scale
        return int(zero_point + math.floor(abs(r) + 0.5) * (1 if r >= 0 else -1))

    if activation == "RELU":
        qmin = max(qmin, quantize(0.0))
    elif activation == "RELU6":
        qmin = max(qmin, quantize(0.0))
        qmax = min(qmax, quantize(6.0))
    elif activation == "RELU_N1_TO_1":
        qmin = max(qmin, quantize(-1.0))
        qmax = min(qmax, quantize(1.0))
    elif activation in ("NONE", "TANH", "SIGN_BIT"):
        pass
    else:
        raise ValueError(f"unsupported fused activation {activation}")
    return qmin, qmax


def round_ties_away(x: jnp.ndarray) -> jnp.ndarray:
    """std::round semantics: round half away from zero (TfLiteRound)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def dequantize(q: jnp.ndarray, scale, zero_point) -> jnp.ndarray:
    return (q.astype(jnp.int32) - jnp.asarray(zero_point, jnp.int32)).astype(
        jnp.float32
    ) * jnp.asarray(scale, jnp.float32)


def quantize(x: jnp.ndarray, scale, zero_point, dtype) -> jnp.ndarray:
    # deliberately round-half-EVEN: TFLite's own QUANTIZE kernel mixes a
    # half-even SIMD main loop with a half-away scalar tail (its two
    # halves disagree with each other on ties, docs/dev-notes.md item 9);
    # half-even matches the main loop and maximizes byte agreement
    qmin, qmax = quantized_range(np.dtype(dtype))
    q = jnp.round(x / jnp.asarray(scale, jnp.float32)).astype(jnp.int32) + (
        jnp.asarray(zero_point, jnp.int32)
    )
    return jnp.clip(q, qmin, qmax).astype(dtype)



# --------------------------------------------------------------------------
# TFLite integer SOFTMAX (bit-exact)
#
# TFLite >= 2.x computes quantized softmax with a 256-entry float exp
# lookup table and float32 row arithmetic
# (tflite optimized_ops::PopulateSoftmaxLookupTable + Softmax,
# lite/kernels/internal/optimized/optimized_ops.h; selected by the
# builtin SOFTMAX kernel the reference invokes via the interpreter,
# band/backend/tfl/model_executor.cc ExecuteSubgraph).  Bit-exactness
# requires replicating three details: the table entries (expf of a
# float32 product), the row sum's left-to-right float32 association
# (tree reductions round differently), and the final
# truncate(prob + 0.5f) quantization.
# --------------------------------------------------------------------------

def softmax_table(input_scale: float, beta: float) -> np.ndarray:
    """PopulateSoftmaxLookupTable: table[255 - v] = expf(scale * v)."""
    scale = np.float32(-float(input_scale) * float(beta))
    table = np.empty(256, np.float32)
    for v in range(256):
        table[255 - v] = np.float32(math.exp(float(scale * np.float32(v))))
    return table


def lut_softmax(
    x: jnp.ndarray,
    table: jnp.ndarray,
    out_scale: float,
    out_zp: int,
    out_dtype,
) -> jnp.ndarray:
    """Bit-exact TFLite quantized softmax over the last axis (int8 or
    uint8 activations, any depth)."""
    from jax import lax

    out_dtype = np.dtype(out_dtype)
    qmin, qmax = quantized_range(out_dtype)
    xi = x.astype(jnp.int32)
    mx = jnp.max(xi, axis=-1, keepdims=True)
    e = jnp.asarray(table, jnp.float32)[255 - mx + xi]
    # left-to-right float32 accumulation (C loop order)
    s, _ = lax.scan(
        lambda carry, ec: (carry + ec, None),
        jnp.zeros(e.shape[:-1], jnp.float32),
        jnp.moveaxis(e, -1, 0),
    )
    inv = jnp.float32(1.0) / (s * jnp.float32(out_scale))
    prob = e * inv[..., None]
    q = (prob + jnp.float32(0.5)).astype(jnp.int32) + jnp.int32(out_zp)
    return jnp.clip(q, qmin, qmax).astype(out_dtype)


def activation_lut(fn, in_scale: float, in_zp: int, out_scale: float,
                   out_zp: int, dtype) -> np.ndarray:
    """TFLite PopulateLookupTable (lite/kernels/activations.cc): the
    256-entry int8/uint8 table for a quantized elementwise activation,
    indexed by the uint8 reinterpretation of the input byte.  TfLiteRound
    is half-away-from-zero."""
    dtype = np.dtype(dtype)
    info = np.iinfo(dtype)
    table = np.zeros(256, dtype)
    inv = np.float32(1.0) / np.float32(out_scale)
    for val in range(info.min, info.max + 1):
        deq = np.float32(in_scale) * np.float32(val - in_zp)
        tr = np.float32(fn(float(deq)))
        x = np.float32(tr * inv)
        rescaled = np.float32(np.sign(x) * np.floor(np.abs(x) + 0.5))
        quantized = int(rescaled) + out_zp
        table[val & 0xFF] = np.clip(quantized, info.min, info.max)
    return table


def apply_lut(x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """out[i] = table[uint8(x[i])] (TFLite EvalUsingLookupTable)."""
    idx = x.astype(jnp.uint8).astype(jnp.int32)
    return jnp.asarray(table)[idx]
