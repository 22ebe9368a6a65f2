"""Smoke test for the equal-time comparison harness (runtime/compare.py)."""
import numpy as np

from evplp_tpu.runtime.compare import (
    converged_pt, run_pt_equal_time, run_technique)
from evplp_tpu.scene.procedural import plane_light_scene

RES = 12


def test_compare_harness_smoke():
    scene = plane_light_scene()
    ref, mask, _ = converged_pt(scene, RES, iterations=4, num_bounces=2)
    assert ref.shape == (RES, RES, 3) and np.isfinite(ref).all()
    assert mask.shape == (RES, RES)

    img, iters = run_technique(scene, RES, time_ms=1.0, name="x",
                               num_light_paths=32, num_vpl=4, mis_mode=1,
                               radius_pct=0.05, num_bounces=2)
    assert iters >= 1
    assert img.shape == (RES, RES, 3) and np.isfinite(img).all()

    img2, iters2 = run_pt_equal_time(scene, RES, time_ms=1.0, num_bounces=2)
    assert iters2 >= 1 and np.isfinite(img2).all()
