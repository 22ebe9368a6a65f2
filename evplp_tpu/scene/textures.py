"""Texture support (reference: RtTexture, rtcommon.h:22-277).

Semantics kept from the reference: map_Kd images are loaded 8-bit, flipped
vertically (stbi_set_flip_vertically_on_load), used linearly (gamma 1.0,
rtcommon.h:68), sampled bilinearly with REPEAT wrap and normalized
coordinates; files are deduplicated by path (the global texture cache,
rtcommon.h:33).

TPU-native storage: all layers padded to the pool's max extent in one
(L, TH, TW, 3) float32 array + per-layer true sizes; a lookup is two
gathers + bilinear mix, fully batched.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass
class TexturePoolBuilder:
    """Host-side accumulation of texture layers (deduped by path)."""

    def __init__(self):
        self.images: list[np.ndarray] = []
        self.by_path: dict[str, int] = {}

    def add_file(self, path: str) -> int:
        if path in self.by_path:
            return self.by_path[path]
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
        img = img[::-1]  # stb-style vertical flip: row 0 = v=0 (bottom)
        idx = self.add_image(img)
        self.by_path[path] = idx
        return idx

    def add_image(self, img: np.ndarray) -> int:
        self.images.append(np.ascontiguousarray(img, dtype=np.float32))
        return len(self.images) - 1

    def build(self):
        """-> (data (L, TH, TW, 3) f32, sizes (L, 2) i32 as (h, w))."""
        if not self.images:
            return (np.zeros((1, 1, 1, 3), np.float32),
                    np.ones((1, 2), np.int32))
        th = max(i.shape[0] for i in self.images)
        tw = max(i.shape[1] for i in self.images)
        data = np.zeros((len(self.images), th, tw, 3), np.float32)
        sizes = np.zeros((len(self.images), 2), np.int32)
        for l, img in enumerate(self.images):
            h, w = img.shape[:2]
            data[l, :h, :w] = img
            sizes[l] = (h, w)
        return data, sizes


def sample_bilinear(tex_data: jnp.ndarray, tex_size: jnp.ndarray,
                    layer: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """GL_LINEAR + GL_REPEAT lookup, batched.

    tex_data: (L, TH, TW, 3); tex_size: (L, 2) (h, w); layer: (R,) int32
    (callers clamp to >= 0); uv: (R, 2) normalized, v up (GL convention,
    matching the flipped storage).
    """
    h = tex_size[layer, 0].astype(jnp.float32)
    w = tex_size[layer, 1].astype(jnp.float32)

    # REPEAT wrap on normalized coords, then texel-center bilinear
    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def wrap(i, n):
        return jnp.mod(i.astype(jnp.int32), jnp.maximum(n.astype(jnp.int32), 1))

    x0i = wrap(x0, w)
    x1i = wrap(x0 + 1, w)
    y0i = wrap(y0, h)
    y1i = wrap(y0 + 1, h)

    c00 = tex_data[layer, y0i, x0i]
    c10 = tex_data[layer, y0i, x1i]
    c01 = tex_data[layer, y1i, x0i]
    c11 = tex_data[layer, y1i, x1i]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def _hit_uv(scene, prim, bary_u, bary_v):
    uv0 = scene.tri_uv0[prim]
    uv1 = scene.tri_uv1[prim]
    uv2 = scene.tri_uv2[prim]
    return uv0 + bary_u[:, None] * (uv1 - uv0) + bary_v[:, None] * (uv2 - uv0)


def _no_textures(scene) -> bool:
    return scene.tex_data.shape[0] == 1 and scene.tex_data.shape[1] == 1


def fetch_kd(scene, prim, bary_u, bary_v) -> jnp.ndarray:
    """Lambert reflectance at a hit: textured when the triangle has a
    map_Kd layer, constant otherwise.

    prim: (R,) clamped triangle ids; bary_u/v: Moller-Trumbore barycentrics
    (weights of e1/e2).
    """
    kd_const = scene.tri_kd[prim]
    if _no_textures(scene):
        return kd_const  # no textures in the scene: skip the gathers
    layer = scene.tri_kd_layer[prim]
    uv = _hit_uv(scene, prim, bary_u, bary_v)
    tex = sample_bilinear(scene.tex_data, scene.tex_size,
                          jnp.maximum(layer, 0), uv)
    return jnp.where((layer >= 0)[:, None], tex, kd_const)


def fetch_hit_shading(scene, prim, bary_u, bary_v):
    """(kd, ks, ns, normal, is_light) at a hit batch via ONE row gather of
    the packed tri_shade table — ten separate per-field gathers measured
    ~6x slower on TPU (XLA gathers are row-oriented).  Texture channels
    (map_Kd/map_Ks/map_Ns) overlay the constants exactly as the reference
    routes them through RtTexture (rtcommon.h:751-753; map_Ns uses the
    red channel like phongExponentTexture.x, lighttracing.cu:133)."""
    row = scene.tri_shade[prim]               # (N, 16) single gather
    kd = row[:, 0:3]
    ks = row[:, 3:6]
    ns = row[:, 6]
    is_light = row[:, 7] > 0.5
    normal = row[:, 8:11]
    if _no_textures(scene):
        return kd, ks, ns, normal, is_light
    uv = _hit_uv(scene, prim, bary_u, bary_v)

    def pick(layer, const, scalar=False):
        tex = sample_bilinear(scene.tex_data, scene.tex_size,
                              jnp.maximum(layer, 0), uv)
        if scalar:
            return jnp.where(layer >= 0, tex[:, 0], const)
        return jnp.where((layer >= 0)[:, None], tex, const)

    kd_l = row[:, 11].astype(jnp.int32)
    ks_l = row[:, 12].astype(jnp.int32)
    ns_l = row[:, 13].astype(jnp.int32)
    return (pick(kd_l, kd), pick(ks_l, ks), pick(ns_l, ns, scalar=True),
            normal, is_light)


def fetch_material(scene, prim, bary_u, bary_v):
    """(kd, ks, ns) at a hit — see fetch_hit_shading."""
    kd, ks, ns, _, _ = fetch_hit_shading(scene, prim, bary_u, bary_v)
    return kd, ks, ns
