"""Roofline tooling: the committed FLOP numbers must stay consistent with
the bench configs and with an analytic lower bound (guards against the XLA
cost-analysis scan under-count regressing — see tools/roofline.py)."""
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RL_PATH = os.path.join(REPO, "tools", "roofline.json")


def _load():
    with open(RL_PATH) as f:
        return json.load(f)


def test_roofline_json_covers_bench_configs():
    rl = _load()
    for name in ("controlvar_d16_cond", "vqvae_recon", "var_d12_sample",
                 "controlvar_d24_joint"):
        assert name in rl, name
        assert rl[name]["tflop_per_img"] > 0


def test_headline_flops_exceed_analytic_transformer_floor():
    """The d16 conditional workload must include the full 16-layer stack:
    weight matmuls alone are 2 * 12C^2 * depth * L * R / B per image
    (C=1024, L=1360 tokens, R=4 CFG rows) = 2.19 TFLOP. Without the scan
    trip-count correction the tool reports ~0.97 — this asserts the
    correction is live."""
    rl = _load()
    C, depth, L, R = 1024, 16, 1360, 4
    floor = 2 * 12 * C * C * depth * L * R / 1e12
    got = rl["controlvar_d16_cond"]["tflop_per_img"]
    assert got > floor, (got, floor)
    # and the total is not wildly above the floor either (attention, head,
    # VQVAE epilogue and sampling add < 60%)
    assert got < 1.6 * floor, (got, floor)


def test_bench_annotation_attaches_mfu():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    cfgs = {"controlvar_d16_cond": {"img_s": 22.4, "batch": 16},
            "controlvar_d30_train": {"sec_per_step": None}}
    bench._annotate_roofline(cfgs)
    e = cfgs["controlvar_d16_cond"]
    assert e["tflop_per_img"] == pytest.approx(3.336, abs=0.01)
    assert e["mfu_at_244tflops"] == pytest.approx(
        22.4 * e["tflop_per_img"] / 244.0, abs=1e-3)
    assert "tflop_per_img" not in cfgs["controlvar_d30_train"]


def test_scan_body_counted_once_calibration():
    """Documents the XLA behavior the correction rests on; if this starts
    failing (cost_analysis begins multiplying scan bodies by trip count),
    _scan_correction auto-disables and roofline.json must be regenerated."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import roofline

    assert isinstance(roofline.scan_body_counted_once(), bool)
