"""Checkpoint / resume for progressive renders.

The reference has none (SURVEY.md §5); its resumable state is exactly
(accumulation buffers, numIterations, photonRadius, clampingValue, pdfMc,
vslRadius) plus the RNG offset — all captured here.  Format: a single .npz
(device buffers pulled to host) so checkpoints need no extra deps and are
portable across device counts (buffers are re-sharded on load).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from evplp_tpu.integrators.photon_fam import FrameState

FORMAT_VERSION = 1


def save_checkpoint(path: str, state: FrameState, num_iterations: int,
                    schedule) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    np.savez(
        tmp,
        version=FORMAT_VERSION,
        vpl_acc=np.asarray(state.vpl_acc),
        photon_acc=np.asarray(state.photon_acc),
        light_img=np.asarray(state.light_img),
        dropped=np.asarray(state.dropped),
        num_iterations=num_iterations,
        radius=schedule.radius,
        clamp=schedule.clamp,
        clamp_start=schedule.clamp_start,
        alpha=schedule.alpha,
        vsl_radius=schedule.vsl_radius,
        pdf_mc=schedule.pdf_mc,
    )
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_checkpoint(path: str):
    """-> (FrameState, num_iterations, schedule_fields dict)."""
    z = np.load(path)
    assert int(z["version"]) == FORMAT_VERSION
    state = FrameState(
        vpl_acc=jnp.asarray(z["vpl_acc"]),
        photon_acc=jnp.asarray(z["photon_acc"]),
        light_img=jnp.asarray(z["light_img"]),
        dropped=jnp.asarray(z["dropped"]),
    )
    sched = {
        "radius": float(z["radius"]),
        "clamp": float(z["clamp"]),
        "clamp_start": float(z["clamp_start"]),
        "alpha": float(z["alpha"]),
        "vsl_radius": float(z["vsl_radius"]),
        "pdf_mc": float(z["pdf_mc"]),
    }
    return state, int(z["num_iterations"]), sched
