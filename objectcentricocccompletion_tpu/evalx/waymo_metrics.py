"""Python wrapper around the native Waymo detection-metrics binary.

Mirrors the reference's subprocess flow
(``datasets/waymo_tracklet_dataset.py:350-428``): run the C++ evaluator on
(predictions.bin, gt.bin), parse the printed mAP/mAPH table into a dict.
The binary builds on demand with the in-tree Makefile.
"""
from __future__ import annotations

import os
import re
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "waymo_metrics")
_BINARY = os.path.join(_NATIVE_DIR, "compute_detection_metrics_main")


def ensure_built() -> str:
    src = os.path.join(_NATIVE_DIR, "compute_detection_metrics_main.cc")
    if (not os.path.exists(_BINARY)
            or os.path.getmtime(_BINARY) < os.path.getmtime(src)):
        subprocess.check_call(["make", "-C", _NATIVE_DIR])
    return _BINARY


def compute_metrics(pred_bin: str, gt_bin: str) -> dict:
    binary = ensure_built()
    out = subprocess.check_output([binary, pred_bin, gt_bin],
                                  text=True)
    metrics = {}
    pat = re.compile(
        r"^(.+): \[mAP ([0-9.eE+-]+)\] \[mAPH ([0-9.eE+-]+)\]$")
    for line in out.splitlines():
        m = pat.match(line.strip())
        if m:
            metrics[f"{m.group(1)}/mAP"] = float(m.group(2))
            metrics[f"{m.group(1)}/mAPH"] = float(m.group(3))
    metrics["_raw"] = out
    return metrics
