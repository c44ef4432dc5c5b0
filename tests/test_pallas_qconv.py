"""Pallas fused int8 conv kernel: bit-exactness vs the lax conv + exact
requant oracle (the serving path), across tap groupings, dtypes, weight
zero points, and width padding.  Runs in interpreter mode on the CPU
test platform."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from band_tpu.ops import quant as Q  # noqa: E402
from band_tpu.ops.pallas.qconv import pick_tile_h, qconv2d_exact  # noqa: E402

DN = ("NHWC", "HWIO", "NHWC")


def oracle(x, w, bias, qm, shift, wzp, ozp, qmin, qmax, out_dt, rounding):
    kh, kw, ci, _ = w.shape
    acc = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=DN, preferred_element_type=jnp.int32)
    if wzp:
        ones = jnp.ones((kh, kw, ci, 1), jnp.int8)
        s = lax.conv_general_dilated(
            jnp.asarray(x), ones, (1, 1), "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        acc = acc - wzp * s
    acc = acc + jnp.asarray(bias)
    return np.asarray(Q.requantize_exact(
        acc, jnp.asarray(qm), jnp.asarray(shift), ozp, qmin, qmax, out_dt,
        rounding=rounding))


CASES = [
    # n, oh, ow, ci, oc, kh, kw, wzp, out_dt, rounding
    (1, 14, 14, 8, 16, 3, 3, 0, np.int8, "ruy"),
    (2, 8, 8, 16, 8, 3, 3, 0, np.int8, "gemmlowp"),
    (1, 6, 6, 8, 8, 1, 1, 0, np.int8, "ruy"),
    (1, 12, 12, 8, 8, 3, 3, 5, np.uint8, "ruy"),
    (1, 10, 10, 4, 8, 5, 5, 0, np.int8, "ruy"),
    (1, 35, 33, 8, 8, 3, 3, 0, np.int8, "ruy"),  # width padding path
]


@pytest.mark.parametrize("group", ["full", "row", "none"])
@pytest.mark.parametrize("case", CASES[:3])
def test_qconv_groups_exact(case, group):
    _check(case, group)


@pytest.mark.parametrize("case", CASES[3:])
def test_qconv_variants_exact(case):
    _check(case, "full")


def _check(case, group):
    n, oh, ow, ci, oc, kh, kw, wzp, out_dt, rounding = case
    rng = np.random.default_rng(42)
    hp, wp = oh + kh - 1, ow + kw - 1
    x = rng.integers(-128, 128, (n, hp, wp, ci), dtype=np.int8)
    w = rng.integers(-127, 128, (kh, kw, ci, oc), dtype=np.int8)
    bias = rng.integers(-1000, 1000, (oc,), dtype=np.int32)
    qm, shift = Q.quantize_multipliers(rng.uniform(1e-4, 0.9, oc))
    ozp = 3 if out_dt == np.int8 else 128
    qmin, qmax = (-128, 127) if out_dt == np.int8 else (0, 255)

    ref = oracle(x, w, bias, qm, shift, wzp, ozp, qmin, qmax, out_dt,
                 rounding)
    got = qconv2d_exact(
        jnp.asarray(x), jnp.asarray(w.reshape(kh * kw * ci, oc)),
        jnp.asarray(bias), jnp.asarray(qm), jnp.asarray(shift),
        kh=kh, kw=kw, out_zp=ozp, qmin=qmin, qmax=qmax,
        rounding=rounding, w_zp=wzp, out_dtype=out_dt, group=group)
    np.testing.assert_array_equal(ref, np.asarray(got))


def test_pick_tile_h():
    assert pick_tile_h(112, 112, 3, 3, 64, 64) == 56
    assert pick_tile_h(14, 14, 3, 3, 64, 64) == 14
    # a divisor is always found for sane CNN shapes
    assert pick_tile_h(5, 5, 3, 3, 960, 160) is not None


# --------------------------------------------------------------------------
# depthwise kernel (ops/pallas/qdwconv.py)
# --------------------------------------------------------------------------

DW_CASES = [
    # n, oh, ow, c, kh, kw, wzp, out_dt, rounding
    (1, 14, 14, 32, 3, 3, 0, np.int8, "ruy"),
    (2, 8, 8, 16, 3, 3, 0, np.int8, "gemmlowp"),
    (1, 12, 12, 8, 3, 3, 5, np.uint8, "ruy"),
    (1, 10, 10, 4, 5, 5, 0, np.int8, "ruy"),
    (1, 7, 9, 24, 3, 3, 0, np.int8, "ruy"),  # odd spatial dims
]


@pytest.mark.parametrize("case", DW_CASES)
def test_qdwconv_exact(case):
    from band_tpu.ops.pallas.qdwconv import qdwconv2d_exact

    n, oh, ow, c, kh, kw, wzp, out_dt, rounding = case
    rng = np.random.default_rng(7)
    hp, wp = oh + kh - 1, ow + kw - 1
    x = rng.integers(-128, 128, (n, hp, wp, c), dtype=np.int8)
    w = rng.integers(-127, 128, (kh, kw, 1, c), dtype=np.int8)
    bias = rng.integers(-1000, 1000, (c,), dtype=np.int32)
    qm, shift = Q.quantize_multipliers(rng.uniform(1e-4, 0.9, c))
    ozp = 3 if out_dt == np.int8 else 128
    qmin, qmax = (-128, 127) if out_dt == np.int8 else (0, 255)

    acc = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=DN, feature_group_count=c,
        preferred_element_type=jnp.int32)
    if wzp:
        ones = jnp.ones((kh, kw, 1, c), jnp.int8)
        s = lax.conv_general_dilated(
            jnp.asarray(x), ones, (1, 1), "VALID", dimension_numbers=DN,
            feature_group_count=c, preferred_element_type=jnp.int32)
        acc = acc - wzp * s
    acc = acc + jnp.asarray(bias)
    ref = np.asarray(Q.requantize_exact(
        acc, jnp.asarray(qm), jnp.asarray(shift), ozp, qmin, qmax, out_dt,
        rounding=rounding))

    got = qdwconv2d_exact(
        jnp.asarray(x),
        jnp.asarray(w.reshape(kh * kw, c).astype(np.int32)),
        jnp.asarray(bias), jnp.asarray(qm), jnp.asarray(shift),
        kh=kh, kw=kw, out_zp=ozp, qmin=qmin, qmax=qmax, rounding=rounding,
        w_zp=wzp, out_dtype=out_dt)
    np.testing.assert_array_equal(ref, np.asarray(got))


DW_STRIDED_CASES = [
    # n, oh, ow, c, kh, kw, sh, sw, wzp, out_dt, rounding
    (1, 14, 14, 32, 3, 3, 2, 2, 0, np.int8, "ruy"),
    (1, 8, 8, 16, 3, 3, 2, 2, 4, np.uint8, "gemmlowp"),
    (2, 7, 9, 8, 5, 5, 2, 2, 0, np.int8, "ruy"),   # odd dims, 5x5
    (1, 6, 10, 24, 3, 3, 3, 2, 0, np.int8, "ruy"),  # mixed strides
    (1, 56, 56, 64, 3, 3, 2, 2, 0, np.int8, "ruy"),  # ICN's layer shape
]


@pytest.mark.parametrize("case", DW_STRIDED_CASES)
def test_qdwconv_strided_exact(case):
    """Strided depthwise rides the same kernel via phase pre-split."""
    from band_tpu.ops.pallas.qdwconv import qdwconv2d_exact

    n, oh, ow, c, kh, kw, sh, sw, wzp, out_dt, rounding = case
    rng = np.random.default_rng(11)
    hp, wp = (oh - 1) * sh + kh, (ow - 1) * sw + kw
    x = rng.integers(-128, 128, (n, hp, wp, c), dtype=np.int8)
    w = rng.integers(-127, 128, (kh, kw, 1, c), dtype=np.int8)
    bias = rng.integers(-1000, 1000, (c,), dtype=np.int32)
    qm, shift = Q.quantize_multipliers(rng.uniform(1e-4, 0.9, c))
    ozp = 3 if out_dt == np.int8 else 128
    qmin, qmax = (-128, 127) if out_dt == np.int8 else (0, 255)

    acc = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (sh, sw), "VALID",
        dimension_numbers=DN, feature_group_count=c,
        preferred_element_type=jnp.int32)
    if wzp:
        ones = jnp.ones((kh, kw, 1, c), jnp.int8)
        s = lax.conv_general_dilated(
            jnp.asarray(x), ones, (sh, sw), "VALID", dimension_numbers=DN,
            feature_group_count=c, preferred_element_type=jnp.int32)
        acc = acc - wzp * s
    acc = acc + jnp.asarray(bias)
    ref = np.asarray(Q.requantize_exact(
        acc, jnp.asarray(qm), jnp.asarray(shift), ozp, qmin, qmax, out_dt,
        rounding=rounding))

    got = qdwconv2d_exact(
        jnp.asarray(x),
        jnp.asarray(w.reshape(kh * kw, c).astype(np.int32)),
        jnp.asarray(bias), jnp.asarray(qm), jnp.asarray(shift),
        kh=kh, kw=kw, sh=sh, sw=sw, out_zp=ozp, qmin=qmin, qmax=qmax,
        rounding=rounding, w_zp=wzp, out_dtype=out_dt)
    np.testing.assert_array_equal(ref, np.asarray(got))


def test_dwconv_s2_lowering_via_pallas_bit_exact():
    """conv_mode=int8 routes ICN's stride-2 c64 DEPTHWISE_CONV_2D
    through the strided Pallas kernel; must agree with f32_split."""
    from band_tpu.backend.program import build_program
    from band_tpu.tflite.parser import parse_tflite_file
    from tests.conftest import has_model, model_path

    if not has_model("ICN_quant"):
        pytest.skip("reference model not available")
    import jax

    rng = np.random.default_rng(5)
    g = parse_tflite_file(model_path("ICN_quant"))
    op = next(
        op for op in g.ops
        if op.opname == "DEPTHWISE_CONV_2D"
        and op.options["stride_h"] == 2
    )
    prog = build_program(g, [op.index], exact=True, conv_mode="int8")
    params = {k: np.asarray(v) for k, v in prog.params.items()}
    xs = [rng.integers(-128, 128, s).astype(d) for s, d in prog.input_specs]
    a = np.asarray(jax.jit(prog.make_fn())(params, xs)[0])
    prog2 = build_program(g, [op.index], exact=True, conv_mode="f32_split")
    b = np.asarray(jax.jit(prog2.make_fn())(params, xs)[0])
    assert a.dtype == b.dtype
    np.testing.assert_array_equal(a, b)


def test_dwconv_lowering_via_pallas_bit_exact():
    """conv_mode=int8 routes narrow-channel stride-1 DEPTHWISE_CONV_2D
    through the Pallas VPU kernel; mobilenet's 112x112 c32 depthwise
    (uint8, nonzero w_zp) must agree with the f32_split exact path."""
    from band_tpu.backend.program import build_program
    from band_tpu.tflite.parser import parse_tflite_file
    from tests.conftest import has_model, model_path

    if not has_model("mobilenet_v2_1.0_224_quant"):
        pytest.skip("reference model not available")
    import jax

    rng = np.random.default_rng(3)
    g = parse_tflite_file(model_path("mobilenet_v2_1.0_224_quant"))
    op = next(
        op for op in g.ops
        if op.opname == "DEPTHWISE_CONV_2D"
        and g.tensor(op.inputs[1]).shape[-1] <= 64
        and op.options["stride_h"] == 1
    )
    prog = build_program(g, [op.index], exact=True, conv_mode="int8")
    params = {k: np.asarray(v) for k, v in prog.params.items()}
    xs = [rng.integers(0, 256, s).astype(d) for s, d in prog.input_specs]
    a = np.asarray(jax.jit(prog.make_fn())(params, xs)[0])
    prog2 = build_program(g, [op.index], exact=True, conv_mode="f32_split")
    b = np.asarray(jax.jit(prog2.make_fn())(params, xs)[0])
    assert a.dtype == b.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
