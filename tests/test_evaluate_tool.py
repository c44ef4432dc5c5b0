"""Accuracy evaluation tool test."""

import pytest

from band_tpu.tools.evaluate import evaluate
from tests.conftest import has_model, model_path


def test_evaluate_icn_exact():
    if not has_model("ICN_quant"):
        pytest.skip("reference model not available")
    pytest.importorskip("tensorflow")
    report = evaluate(model_path("ICN_quant"), n_samples=2)
    for st in report["outputs"].values():
        assert st["max_diff"] == 0
        assert st["exact_frac"] == 1.0
