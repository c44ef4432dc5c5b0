"""Integral-image window sum (the uint8 wzp correction) vs the
all-ones conv it replaced — must be bit-identical int32 for every
stride/kernel/odd-size combination, dense and depthwise.

Reference semantics: TFLite conv reference kernels' sum-of-inputs
term for nonzero weight zero-point (uint8 models).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from band_tpu.ops.lowerings import LowerCtx, _ones_conv

DN = ("NHWC", "HWIO", "NHWC")


def _ctx(conv_mode="f32_split", batch_hint=4):
    # _ones_conv only touches ctx.conv_mode / ctx.batch_hint; hint >= 4
    # selects the integral-image path under test (small batches keep
    # the fused ones-conv)
    c = LowerCtx.__new__(LowerCtx)
    c.conv_mode = conv_mode
    c.batch_hint = batch_hint
    return c


def _ref(x, kh, kw, ci, strides, dil, fg):
    oc = 1 if fg == 1 else ci
    rhs_ci = ci if fg == 1 else 1
    ones = jnp.ones((kh, kw, rhs_ci, oc), jnp.float32)
    s = lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), ones, strides, "VALID",
        rhs_dilation=dil, dimension_numbers=DN, feature_group_count=fg,
        preferred_element_type=jnp.float32,
    )
    return np.asarray(s).astype(np.int32)


CASES = [
    # hp, wp, ci, kh, kw, sh, sw, depthwise
    (9, 9, 3, 3, 3, 1, 1, False),
    (10, 13, 8, 3, 5, 2, 2, False),
    (11, 7, 4, 5, 3, 2, 1, False),
    (14, 14, 16, 3, 3, 2, 2, True),
    (9, 12, 6, 3, 3, 1, 2, True),
    (7, 7, 2, 7, 7, 1, 1, False),  # window == image
    (8, 8, 3, 1, 1, 1, 1, False),  # 1x1 window
    (15, 9, 5, 4, 2, 3, 3, True),
]


@pytest.mark.parametrize("case", CASES)
def test_integral_matches_ones_conv(case):
    hp, wp, ci, kh, kw, sh, sw, dw = case
    rng = np.random.default_rng(sum(case[:-1]))
    x = rng.integers(-128, 128, (2, hp, wp, ci)).astype(np.int8)
    fg = ci if dw else 1
    got = np.asarray(
        _ones_conv(_ctx(), jnp.asarray(x), kh, kw, ci, (sh, sw), (1, 1),
                   DN, feature_group_count=fg)
    )
    ref = _ref(x, kh, kw, ci, (sh, sw), (1, 1), fg)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_array_equal(got, ref)


def test_small_batch_keeps_ones_conv_and_matches():
    """batch_hint < 4 (and batch 1 arrays) selects the fused ones-conv
    path; values must match the integral form regardless."""
    rng = np.random.default_rng(1)
    x = rng.integers(-128, 128, (1, 10, 10, 4)).astype(np.int8)
    a = np.asarray(_ones_conv(_ctx(batch_hint=1), jnp.asarray(x), 3, 3, 4,
                              (1, 1), (1, 1), DN))
    b = np.asarray(_ones_conv(_ctx(batch_hint=8), jnp.asarray(x), 3, 3, 4,
                              (1, 1), (1, 1), DN))
    np.testing.assert_array_equal(a, b)


def test_dilated_falls_back_to_conv():
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (1, 12, 12, 4)).astype(np.int8)
    got = np.asarray(
        _ones_conv(_ctx(), jnp.asarray(x), 3, 3, 4, (1, 1), (2, 2), DN)
    )
    ref = _ref(x, 3, 3, 4, (1, 1), (2, 2), 1)
    np.testing.assert_array_equal(got, ref)
