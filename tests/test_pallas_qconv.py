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
