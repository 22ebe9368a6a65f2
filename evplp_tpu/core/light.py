"""Area-light sampling (reference: reflectcuts/realtimetechniques/rtlightsource.cuh,
rtcommon.h:488-539 RtAreaLight::createOptixCdf).

One mesh area light per scene (the reference asserts this, rtcommon.h:795).
Emission: intensity RGB is premultiplied by pi at scene load (rtcommon.h:782);
the emitter's directional profile is a power-cosine lobe with exponent
intensity.w, evaluated through PhongEvalF in all estimators.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from evplp_tpu.core import mathutil as mu
from evplp_tpu.core.sampling import sample_cdf


@dataclass(frozen=True)
class AreaLight:
    """Device-resident SoA for the single mesh area light.

    v0/v1/v2: (T, 3) triangle vertices; cdf: (T,) inclusive normalized area
    CDF; area: () total light area; intensity: (4,) pi-premultiplied RGB +
    phong exponent in w.
    """
    v0: jnp.ndarray
    v1: jnp.ndarray
    v2: jnp.ndarray
    cdf: jnp.ndarray
    area: jnp.ndarray
    intensity: jnp.ndarray

    def tree_flatten(self):  # pragma: no cover - pytree plumbing
        return (self.v0, self.v1, self.v2, self.cdf, self.area, self.intensity), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves)


jtu.register_pytree_node(AreaLight, AreaLight.tree_flatten, AreaLight.tree_unflatten)


def build_area_light(vertices: np.ndarray, indices: np.ndarray,
                     intensity_rgb_exp: np.ndarray) -> AreaLight:
    """Host-side construction: per-triangle area CDF + pi-premultiply.

    vertices: (V, 3) float; indices: (T, 3) int; intensity_rgb_exp: (4,)
    raw JSON intensity [r, g, b, phongExp].
    """
    v0 = vertices[indices[:, 0]].astype(np.float32)
    v1 = vertices[indices[:, 1]].astype(np.float32)
    v2 = vertices[indices[:, 2]].astype(np.float32)
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    total = float(areas.sum())
    cdf = np.cumsum(areas) / total
    cdf[-1] = 1.0
    premult = np.asarray(intensity_rgb_exp, dtype=np.float32).copy()
    premult[:3] *= np.pi
    return AreaLight(
        v0=jnp.asarray(v0), v1=jnp.asarray(v1), v2=jnp.asarray(v2),
        cdf=jnp.asarray(cdf.astype(np.float32)),
        area=jnp.asarray(total, dtype=jnp.float32),
        intensity=jnp.asarray(premult),
    )


def light_sample(light: AreaLight, u3: jnp.ndarray):
    """Uniform-area position sample (rtlightsource.cuh:24-80), batched.

    u3: (..., 3) uniforms (CDF draw + two barycentric draws).
    Returns (position, normal, pdf_a, emitted) with emitted =
    intensity_rgb * area (the intensity/pdf product the reference returns).
    """
    tri = sample_cdf(light.cdf, u3[..., 0])
    p0 = light.v0[tri]
    p1 = light.v1[tri]
    p2 = light.v2[tri]
    beta, gamma = mu.square_to_barycentric(u3[..., 1:3])
    position = (
        p0 * beta[..., None]
        + p1 * gamma[..., None]
        + p2 * (1.0 - beta - gamma)[..., None]
    )
    normal = mu.normalize(jnp.cross(p1 - p0, p2 - p0))
    pdf_a = jnp.broadcast_to(1.0 / light.area, tri.shape)
    emitted = jnp.broadcast_to(light.intensity[:3] * light.area, position.shape)
    return position, normal, pdf_a, emitted


def light_pdf_a(light: AreaLight):
    """Uniform-area pdf 1/area (rtlightsource.cuh:82-84)."""
    return 1.0 / light.area
