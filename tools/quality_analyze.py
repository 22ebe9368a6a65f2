"""Diagnose quality-table anomalies: per-variant error decomposition vs
ground truth (CPU-only; reads bench_artifacts/quality_r02/*.npz).

For each (scene, variant): masked MSE/RelMSE, error concentration (what
fraction of total squared error lives in the top-K pixels), where those
pixels are, and RelMSE restricted to dark pixels (the round-1 cornell
pathology: RelMSE ~20 dominated by near-zero-reference pixels).

Usage: python tools/quality_analyze.py [scene]
"""
from __future__ import annotations

import os
import sys

import numpy as np

ART = "/root/repo/bench_artifacts/quality_r02"
VARIANTS = ("pt", "pm", "vpl", "vsl", "ours", "ours_progressive")


def analyze(scene):
    gt = np.load(os.path.join(ART, f"{scene}_gt.npz"))
    ref = gt["img"].astype(np.float64)
    mask = gt["mask"].astype(bool) if "mask" in gt else np.ones(
        ref.shape[:2], bool)
    m3 = mask[..., None]
    print(f"== {scene} (gt {int(gt['iters'])} iters, "
          f"{(~mask).sum()} emitter px) ==")
    for variant in VARIANTS:
        path = os.path.join(ART, f"{scene}_{variant}.npz")
        if not os.path.exists(path):
            continue
        z = np.load(path)
        img = z["img"].astype(np.float64)
        d2 = (((img - ref) * m3) ** 2).mean(axis=-1)      # (H, W)
        mse = d2.mean()
        rel = (((img - ref) * m3) ** 2 /
               (ref ** 2 + 1e-3)).mean(axis=-1)
        rel_mse = rel.mean()

        flat = np.argsort(d2.ravel())[::-1]
        tot = d2.sum()
        top10 = d2.ravel()[flat[:10]].sum() / max(tot, 1e-30)
        top100 = d2.ravel()[flat[:100]].sum() / max(tot, 1e-30)
        ys, xs = np.unravel_index(flat[:5], d2.shape)

        dark = mask & (ref.mean(axis=-1) < 0.01)
        rel_dark = rel[dark].mean() if dark.any() else 0.0
        rel_lit = rel[mask & ~dark[..., ]].mean()

        print(f"{variant:17s} iters {int(z['iters']):5d}  "
              f"MSE {mse:9.4f}  RelMSE {rel_mse:9.3f}  "
              f"top10 {100*top10:4.1f}%  top100 {100*top100:4.1f}%  "
              f"relDark {rel_dark:9.3f} relLit {rel_lit:9.3f}  "
              f"worst@{list(zip(ys.tolist(), xs.tolist()))[:3]}")


if __name__ == "__main__":
    scenes = sys.argv[1:] or ("cornell", "glossy", "box_field")
    for s in scenes:
        if os.path.exists(os.path.join(ART, f"{s}_gt.npz")):
            analyze(s)
