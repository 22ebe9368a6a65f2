"""Axis-aligned bounding boxes (reference: reflectcuts/math/aabb.h).

Batched jnp implementation of the reference's Aabb toolkit: union,
intersection, transform, diagonal, surface area, and the lightcuts-style
MaxCosBound (aabb.h:139) — the max cosine between a direction cone apex and
any point in the box.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import jax.tree_util as jtu

from evplp_tpu.core import mathutil as mu


@dataclass(frozen=True)
class Aabb:
    lo: jnp.ndarray  # (..., 3)
    hi: jnp.ndarray  # (..., 3)

    def tree_flatten(self):  # pragma: no cover
        return (self.lo, self.hi), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves)


jtu.register_pytree_node(Aabb, Aabb.tree_flatten, Aabb.tree_unflatten)


def empty(shape=()) -> Aabb:
    big = jnp.full(shape + (3,), 3.0e38, jnp.float32)
    return Aabb(lo=big, hi=-big)


def from_points(points: jnp.ndarray, axis=0) -> Aabb:
    return Aabb(lo=jnp.min(points, axis=axis), hi=jnp.max(points, axis=axis))


def union(a: Aabb, b: Aabb) -> Aabb:
    return Aabb(lo=jnp.minimum(a.lo, b.lo), hi=jnp.maximum(a.hi, b.hi))


def intersect(a: Aabb, b: Aabb) -> Aabb:
    return Aabb(lo=jnp.maximum(a.lo, b.lo), hi=jnp.minimum(a.hi, b.hi))


def is_valid(a: Aabb) -> jnp.ndarray:
    return jnp.all(a.lo <= a.hi, axis=-1)


def diagonal_length2(a: Aabb) -> jnp.ndarray:
    d = jnp.maximum(a.hi - a.lo, 0.0)
    return jnp.sum(d * d, axis=-1)


def surface_area(a: Aabb) -> jnp.ndarray:
    d = jnp.maximum(a.hi - a.lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def contains(a: Aabb, p: jnp.ndarray) -> jnp.ndarray:
    return jnp.all((p >= a.lo) & (p <= a.hi), axis=-1)


def transform(a: Aabb, matrix: jnp.ndarray) -> Aabb:
    """Transform by a 4x4 matrix: bbox of the 8 transformed corners."""
    corners = jnp.stack([
        jnp.stack([jnp.where(m & 1, a.hi[..., 0], a.lo[..., 0]),
                   jnp.where(m & 2, a.hi[..., 1], a.lo[..., 1]),
                   jnp.where(m & 4, a.hi[..., 2], a.lo[..., 2])], axis=-1)
        for m in range(8)
    ])  # (8, ..., 3)
    h = jnp.concatenate([corners, jnp.ones(corners.shape[:-1] + (1,))], axis=-1)
    out = jnp.einsum("ij,c...j->c...i", matrix, h)[..., :3]
    return Aabb(lo=jnp.min(out, axis=0), hi=jnp.max(out, axis=0))


def max_cos_bound(a: Aabb, origin: jnp.ndarray, axis_dir: jnp.ndarray) -> jnp.ndarray:
    """Upper bound on cos(angle) between axis_dir and directions from origin
    to any point of the box (the lightcuts bound, aabb.h:139): evaluated
    exactly over the 8 corners, which attains the max for convex boxes."""
    best = jnp.full(a.lo.shape[:-1], -1.0)
    for m in range(8):
        corner = jnp.stack([
            jnp.where(jnp.bool_(m & 1), a.hi[..., 0], a.lo[..., 0]),
            jnp.where(jnp.bool_(m & 2), a.hi[..., 1], a.lo[..., 1]),
            jnp.where(jnp.bool_(m & 4), a.hi[..., 2], a.lo[..., 2]),
        ], axis=-1)
        c = mu.dot(mu.normalize(corner - origin), axis_dir)
        best = jnp.maximum(best, c)
    inside = contains(a, origin)
    return jnp.where(inside, 1.0, best)
