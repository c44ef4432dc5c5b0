"""Host-side (non-jittable) implementations of TFLite custom ops.

The reference handles ops its delegates cannot run by falling back to
CPU interpreters (band/model_analyzer.cc:627-789 partitions around
them).  Here, custom ops run as numpy functions on a host worker; the
analyzer routes the containing unit-subgraph to a host (CPU) worker.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import numpy as np

HOST_OPS: Dict[str, Callable] = {}


def register_host_op(name: str):
    def deco(fn):
        HOST_OPS[name] = fn
        return fn

    return deco


def has_host_impl(opname: str) -> bool:
    return opname in HOST_OPS


def run_host_op(opname: str, graph, op, inputs: List[np.ndarray]):
    return HOST_OPS[opname](graph, op, inputs)


@register_host_op("CUSTOM:TFLite_Detection_PostProcess")
def _detection_postprocess(graph, op, inputs: List[np.ndarray]):
    """SSD detection post-processing: box decode + per-class NMS.

    Mirrors tflite::ops::custom::detection_postprocess semantics with
    default-ish options (custom options are flexbuffer-encoded; we use
    the common defaults: 10 detections, IoU 0.5, score 0.0).
    """
    boxes_enc, scores, anchors = inputs[0], inputs[1], inputs[2]
    opts = op.options
    max_det = opts.get("max_detections", 10)
    iou_thr = opts.get("nms_iou_threshold", 0.5)
    score_thr = opts.get("nms_score_threshold", 0.0)
    scale_y = opts.get("y_scale", 10.0)
    scale_x = opts.get("x_scale", 10.0)
    scale_h = opts.get("h_scale", 5.0)
    scale_w = opts.get("w_scale", 5.0)

    boxes_enc = boxes_enc.reshape(-1, 4).astype(np.float32)
    anchors = anchors.reshape(-1, 4).astype(np.float32)
    scores = scores.reshape(boxes_enc.shape[0], -1).astype(np.float32)

    ya, xa, ha, wa = anchors.T
    ty, tx, th, tw = boxes_enc.T
    ycenter = ty / scale_y * ha + ya
    xcenter = tx / scale_x * wa + xa
    h = np.exp(th / scale_h) * ha
    w = np.exp(tw / scale_w) * wa
    decoded = np.stack(
        [ycenter - h / 2, xcenter - w / 2, ycenter + h / 2, xcenter + w / 2],
        axis=1,
    )

    def iou(box, rest):
        yx1 = np.maximum(box[:2], rest[:, :2])
        yx2 = np.minimum(box[2:], rest[:, 2:])
        inter = np.prod(np.clip(yx2 - yx1, 0, None), axis=1)
        a1 = np.prod(box[2:] - box[:2])
        a2 = np.prod(rest[:, 2:] - rest[:, :2], axis=1)
        return inter / np.maximum(a1 + a2 - inter, 1e-9)

    out_boxes, out_classes, out_scores = [], [], []
    num_classes = scores.shape[1] - 1 if scores.shape[1] > 1 else 1
    cls_scores = scores[:, 1:] if scores.shape[1] > 1 else scores
    for c in range(num_classes):
        s = cls_scores[:, c]
        idx = np.argsort(-s)
        idx = idx[s[idx] > score_thr]
        keep = []
        while idx.size and len(keep) < max_det:
            i = idx[0]
            keep.append(i)
            if idx.size == 1:
                break
            rest = idx[1:]
            ious = iou(decoded[i], decoded[rest])
            idx = rest[ious <= iou_thr]
        for i in keep:
            out_boxes.append(decoded[i])
            out_classes.append(c)
            out_scores.append(s[i])

    order = np.argsort(-np.asarray(out_scores)) if out_scores else []
    order = list(order)[:max_det]
    n = len(order)
    boxes = np.zeros((1, max_det, 4), np.float32)
    classes = np.zeros((1, max_det), np.float32)
    confs = np.zeros((1, max_det), np.float32)
    for j, oi in enumerate(order):
        boxes[0, j] = out_boxes[oi]
        classes[0, j] = out_classes[oi]
        confs[0, j] = out_scores[oi]
    return [boxes, classes, confs, np.asarray([n], np.float32)]
