"""Primary visibility pass.

TPU-native replacement for the deferred raster G-buffer (reference:
shaders/deferred.* + rtcomphoton.h:710-754): one bounce of the ray tracer
fills the same per-pixel channels — position+stencil, geometric face normal,
lambert reflectance, phong reflectance+exponent — plus the emitter-visibility
channel produced by the light raster pass (shaders/light.frag; it shares the
deferred depth buffer, so "emitter visible" == the primary hit is the light
mesh).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import jax.tree_util as jtu

from evplp_tpu.core import mathutil as mu
from evplp_tpu.scene.scene import SceneData
from evplp_tpu.scene.textures import fetch_hit_shading
from evplp_tpu.trace.intersect import intersect_closest


@dataclass(frozen=True)
class GBuffer:
    """Flat per-pixel SoA, length H*W (row 0 = image top)."""
    position: jnp.ndarray   # (N, 3)
    normal: jnp.ndarray     # (N, 3) geometric, winding-orientation
    kd: jnp.ndarray         # (N, 3)
    ks: jnp.ndarray         # (N, 3)
    ns: jnp.ndarray         # (N,)
    stencil: jnp.ndarray    # (N,) 1.0 where any geometry (incl. emitter)
    hit_light: jnp.ndarray  # (N,) bool — primary hit is the emitter mesh

    def tree_flatten(self):  # pragma: no cover
        return (self.position, self.normal, self.kd, self.ks, self.ns,
                self.stencil, self.hit_light), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves)


jtu.register_pytree_node(GBuffer, GBuffer.tree_flatten, GBuffer.tree_unflatten)


def trace_gbuffer(scene: SceneData, width: int, height: int,
                  jitter_ndc=None, row_start=0, row_count=None) -> GBuffer:
    """Trace primary rays and gather shading data (optionally only a
    horizontal band [row_start, row_start+row_count) for pixel sharding).

    The emitter mesh participates like any geometry but carries black
    material (rtcommon.h:786-791), so downstream estimators naturally
    produce zero there — matching the reference.
    """
    o, d = scene.camera.generate_rays(width, height, jitter_ndc,
                                      row_start=row_start, row_count=row_count)
    rows = height if row_count is None else row_count
    hit = intersect_closest(scene.tris, scene.bvh, o, d, t_min=1e-4,
                            tile_shape=(rows, width))
    valid = hit.valid
    prim = jnp.maximum(hit.prim, 0)

    position = o + hit.t[:, None] * d
    kd, ks, ns, normal, is_light_row = fetch_hit_shading(
        scene, prim, hit.u, hit.v)
    is_light = is_light_row & valid

    zero3 = jnp.zeros_like(position)
    return GBuffer(
        position=jnp.where(valid[:, None], position, zero3),
        normal=jnp.where(valid[:, None], normal, zero3),
        kd=jnp.where(valid[:, None], kd, zero3),
        ks=jnp.where(valid[:, None], ks, zero3),
        ns=jnp.where(valid, ns, 0.0),
        stencil=valid.astype(jnp.float32),
        hit_light=is_light,
    )


def zero_gbuffer(n: int) -> GBuffer:
    """The never-rendered G-buffer the reference has when run.deferredShading
    is disabled (rtcomphoton.h:188-197): stencil 0 everywhere, so every
    downstream estimator produces black."""
    z3 = jnp.zeros((n, 3), jnp.float32)
    z1 = jnp.zeros((n,), jnp.float32)
    return GBuffer(position=z3, normal=z3, kd=z3, ks=z3, ns=z1, stencil=z1,
                   hit_light=jnp.zeros((n,), bool))


def light_image(scene: SceneData, gbuf: GBuffer) -> jnp.ndarray:
    """Emitter forward pass (shaders/light.frag): flat *unpremultiplied*
    intensity where the emitter is directly visible."""
    raw_rgb = scene.light.intensity[:3] / jnp.pi  # undo the pi-premultiply
    return jnp.where(gbuf.hit_light[:, None], raw_rgb[None, :], 0.0)
