"""Ray-triangle intersection + stackless BVH traversal (pure JAX).

TPU-native replacement for OptiX rtTrace + the per-primitive programs
(reference: reflectcuts/realtimetechniques/triangleintersect.cu and the
Trbvh accel).  Rays are SoA batches; traversal is a lax.while_loop over a
threaded (skip-pointer) BVH — no stack, loop state is (node, best_t, prim).

Directions may be unnormalized: t is measured in units of |d|, which the
reference exploits for segment shadow rays (origin=photon, dir=-v12,
t in (eps, 1-eps); lighttracing.cu:292).

This module is the readable/correctness implementation and the fallback for
CPU tests; the Pallas packet kernel (trace/packet.py) is the TPU hot path.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from evplp_tpu.accel.bvh import BVH

TRI_EPS = 1e-9          # determinant cutoff
BIG = jnp.float32(3.4e38)


@dataclass(frozen=True)
class Triangles:
    """Leaf-ordered triangle SoA (permuted by BVH build).

    v0: (T, 3); e1 = v1 - v0; e2 = v2 - v0; n: (T, 3) geometric normal
    normalize(cross(e1, e2)) (winding order, deferred.geom:16-18).
    """
    v0: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray
    n: jnp.ndarray

    def tree_flatten(self):  # pragma: no cover
        return (self.v0, self.e1, self.e2, self.n), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves)


jtu.register_pytree_node(Triangles, Triangles.tree_flatten, Triangles.tree_unflatten)


@dataclass(frozen=True)
class Hit:
    """Closest-hit result. prim == -1 means miss. t in |d| units."""
    t: jnp.ndarray
    prim: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray

    @property
    def valid(self):
        return self.prim >= 0

    def tree_flatten(self):  # pragma: no cover
        return (self.t, self.prim, self.u, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves)


jtu.register_pytree_node(Hit, Hit.tree_flatten, Hit.tree_unflatten)


def _ray_tri(o, d, v0, e1, e2):
    """Moller-Trumbore, double-sided. Returns (t, u, v, ok-geometry)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (jnp.abs(det) > TRI_EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, u, v, ok


def _slab_test(o, inv_d, nmin, nmax, t_max):
    """Ray/AABB slab test; robust to inf*0 via explicit min/max order."""
    t0 = (nmin - o) * inv_d
    t1 = (nmax - o) * inv_d
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    t_near = jnp.max(tsm, axis=-1)
    t_far = jnp.min(tbg, axis=-1)
    return (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_max)


def _traverse_one(tris: Triangles, bvh: BVH, o, d, t_min, t_max,
                  any_hit: bool, leaf_size: int):
    """Single-ray traversal; vmapped by the public entry points."""
    num_nodes = bvh.node_min.shape[0]
    inv_d = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, jnp.where(d >= 0, BIG, -BIG))

    def cond(state):
        node, t, prim, _, _ = state
        return node < num_nodes

    def body(state):
        node, t, prim, u, v = state
        count = bvh.node_count[node]
        first = bvh.node_first[node]
        is_leaf = count > 0

        # --- leaf: intersect up to leaf_size triangles (masked) ---
        def leaf_step(i, carry):
            t, prim, u, v = carry
            idx = jnp.minimum(first + i, tris.v0.shape[0] - 1)
            tt, uu, vv, ok = _ray_tri(o, d, tris.v0[idx], tris.e1[idx], tris.e2[idx])
            ok = ok & (i < count) & is_leaf & (tt > t_min) & (tt < t)
            return (
                jnp.where(ok, tt, t),
                jnp.where(ok, idx, prim),
                jnp.where(ok, uu, u),
                jnp.where(ok, vv, v),
            )

        t, prim, u, v = jax.lax.fori_loop(0, leaf_size, leaf_step, (t, prim, u, v))

        # --- internal: descend on bbox hit, else skip ---
        bbox_hit = _slab_test(o, inv_d, bvh.node_min[node], bvh.node_max[node], t)
        next_node = jnp.where(is_leaf | ~bbox_hit, bvh.node_skip[node], node + 1)
        if any_hit:
            next_node = jnp.where(prim >= 0, num_nodes, next_node)
        return (next_node, t, prim, u, v)

    init = (jnp.int32(0), t_max, jnp.int32(-1), jnp.float32(0), jnp.float32(0))
    _, t, prim, u, v = jax.lax.while_loop(cond, body, init)
    return t, prim, u, v


@partial(jax.jit, static_argnames=("leaf_size",))
def intersect_closest(tris: Triangles, bvh: BVH, o, d,
                      t_min=1e-5, t_max=BIG, leaf_size: int = 8) -> Hit:
    """Closest hit for a batch of rays. o, d: (R, 3); t_min/t_max scalar or (R,)."""
    r = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    f = jax.vmap(
        lambda oo, dd, lo, hi: _traverse_one(tris, bvh, oo, dd, lo, hi, False, leaf_size)
    )
    t, prim, u, v = f(o, d, t_min, t_max)
    return Hit(t=t, prim=prim, u=u, v=v)


@partial(jax.jit, static_argnames=("leaf_size",))
def intersect_any(tris: Triangles, bvh: BVH, o, d,
                  t_min=1e-5, t_max=BIG, leaf_size: int = 8):
    """True where any primitive lies in (t_min, t_max) along the ray."""
    r = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    f = jax.vmap(
        lambda oo, dd, lo, hi: _traverse_one(tris, bvh, oo, dd, lo, hi, True, leaf_size)
    )
    _, prim, _, _ = f(o, d, t_min, t_max)
    return prim >= 0


def occluded_segment(tris: Triangles, bvh: BVH, p_from, p_to,
                     eps: float = 1e-4, leaf_size: int = 8):
    """Segment occlusion the reference's way (lighttracing.cu:290-294):
    origin = p_from, unnormalized dir = p_to - p_from, t in (eps, 1-eps)."""
    d = p_to - p_from
    return intersect_any(tris, bvh, p_from, d,
                         t_min=eps, t_max=1.0 - eps, leaf_size=leaf_size)


@jax.jit
def intersect_closest_brute(tris: Triangles, o, d, t_min=1e-5, t_max=BIG) -> Hit:
    """Dense rays-x-triangles reference oracle for tests (small inputs only)."""
    t, u, v, ok = _ray_tri(
        o[:, None, :], d[:, None, :],
        tris.v0[None, :, :], tris.e1[None, :, :], tris.e2[None, :, :],
    )
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (o.shape[0],))[:, None]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (o.shape[0],))[:, None]
    ok = ok & (t > t_min) & (t < t_max)
    t = jnp.where(ok, t, BIG)
    best = jnp.argmin(t, axis=1)
    rows = jnp.arange(o.shape[0])
    hit_any = ok[rows, best]
    return Hit(
        t=jnp.where(hit_any, t[rows, best], t_max[:, 0]),
        prim=jnp.where(hit_any, best, -1),
        u=u[rows, best],
        v=v[rows, best],
    )
