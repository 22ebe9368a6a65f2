"""Pinhole camera (reference: RtStableCamera, rtcommon.h:546-598).

JSON "direction" is the look-AT POINT (glm::lookAt(origin, lookAt, up)).
fovx converts to fovy via 2*atan(tan(fovx/2)/aspect) (rtcommon.h:555-561).

Instead of a raster VP matrix, we generate primary rays.  Film convention:
row 0 = top of the image (so saved files match the reference's FlipY'd
dumps); pixel (0, 0) is the top-left.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from evplp_tpu.core import mathutil as mu


@dataclass(frozen=True)
class Camera:
    origin: tuple
    look_at: tuple
    up: tuple
    fovy: float      # radians
    aspect: float    # width / height

    @staticmethod
    def from_json(json_cam: dict, aspect: float) -> "Camera":
        if "fovy" in json_cam:
            fovy = math.radians(float(json_cam["fovy"]))
        elif "fovx" in json_cam:
            fovx = math.radians(float(json_cam["fovx"]))
            fovy = 2.0 * math.atan2(math.tan(fovx * 0.5), aspect)
        else:
            raise ValueError("camera needs fovy or fovx")
        return Camera(
            origin=tuple(float(v) for v in json_cam["origin"]),
            look_at=tuple(float(v) for v in json_cam["direction"]),
            up=tuple(float(v) for v in json_cam["up"]),
            fovy=fovy,
            aspect=aspect,
        )

    def basis(self):
        """Right-handed view basis (fwd toward the scene)."""
        origin = jnp.asarray(self.origin, jnp.float32)
        fwd = mu.normalize(jnp.asarray(self.look_at, jnp.float32) - origin)
        right = mu.normalize(jnp.cross(fwd, jnp.asarray(self.up, jnp.float32)))
        upv = jnp.cross(right, fwd)
        return origin, fwd, right, upv

    def generate_rays(self, width: int, height: int, jitter_ndc=None,
                      row_start=0, row_count=None):
        """Primary rays for the film (or a horizontal band of it, for
        pixel-sharded execution).

        jitter_ndc: optional (2,) global NDC translation per frame,
        mirroring the reference's whole-image jitter matrix
        (rtcomphoton.h:946-952).  The image shifted by +j means sampling
        geometry at (ndc - j).

        Returns (origins (rows*W, 3), directions (rows*W, 3)).
        """
        origin, fwd, right, upv = self.basis()
        tan_half_fovy = math.tan(self.fovy * 0.5)
        tan_half_fovx = tan_half_fovy * self.aspect
        rows = height if row_count is None else row_count

        xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
        row_idx = row_start + jnp.arange(rows, dtype=jnp.float32)
        ys = 1.0 - (row_idx + 0.5) / height * 2.0
        ndc_x = jnp.tile(xs, (rows,))
        ndc_y = jnp.repeat(ys, width)
        if jitter_ndc is not None:
            ndc_x = ndc_x - jitter_ndc[0]
            ndc_y = ndc_y - jitter_ndc[1]

        d = (
            fwd[None, :]
            + (ndc_x * tan_half_fovx)[:, None] * right[None, :]
            + (ndc_y * tan_half_fovy)[:, None] * upv[None, :]
        )
        d = mu.normalize(d)
        o = jnp.broadcast_to(origin, d.shape)
        return o, d


@dataclass(frozen=True)
class AnimationCamera:
    """Linear camera interpolation (reference: RtAnimationCamera,
    rtcommon.h:600-629 — present in the reference but unused by main).

    at(time_ms) returns a Camera lerped between start and end."""
    start: Camera
    end: Camera
    total_time_ms: float

    def at(self, time_ms: float) -> Camera:
        s = min(max(time_ms / self.total_time_ms, 0.0), 1.0)

        def lerp(a, b):
            return tuple(av * (1 - s) + bv * s for av, bv in zip(a, b))

        return Camera(
            origin=lerp(self.start.origin, self.end.origin),
            look_at=lerp(self.start.look_at, self.end.look_at),
            up=lerp(self.start.up, self.end.up),
            fovy=self.start.fovy * (1 - s) + self.end.fovy * s,
            aspect=self.start.aspect,
        )
