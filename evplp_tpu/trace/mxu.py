"""MXU ray tracing: rays-x-triangles intersection as matmuls.

The TPU's FLOPs live in the systolic array, so for small scenes (where every
ray tests every triangle) we reformulate intersection with Pluecker
coordinates to make it three matmuls instead of VPU elementwise chains:

  side_e(ray, edge) = L_mom_e . d  +  L_dir_e . (o x d)
     -> S = P @ W^T with P = [d, o x d] (R, 6), W = [L_mom, L_dir] (3T, 6);
        a ray passes through a triangle iff its three edge sides share a
        sign (double-sided, like the reference's OptiX setup)
  t(ray, tri) = (n.v0 - n.o) / (n.d)
     -> two more matmuls O @ N^T and D @ N^T.

Barycentrics come free: (u, v) = (S1, S2) / (S0+S1+S2) with edges ordered
opposite v0/v1/v2 — matching Moller-Trumbore's (e1, e2) weights.

~48 MACs per (ray, triangle).  MEASURED OUTCOME (v5e, 126M segments x 62
tris): 617 ms vs 538 ms for the fused-VPU brute force — the contraction dim
is only K=6, leaving the 128x128 systolic array ~95% idle, and the (R, 3T)
side matrices round-trip HBM.  Kept as a documented alternative strategy
(and for scenes whose triangle count pushes K*N efficiency up), but the
default small-scene dispatch stays on the VPU path (trace/intersect.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

SIDE_EPS = 0.0          # strict sign agreement (edge hits count both sides)
DEN_EPS = 1e-12
RAY_BLOCK = 262144      # bounds the (rays, tris) working set


@dataclass(frozen=True)
class PlueckerTris:
    """Precomputed per-scene matmul operands (device-resident)."""
    w: jnp.ndarray        # (3T, 6) edge pluecker rows [L_mom, L_dir]
    n: jnp.ndarray        # (T, 3) unnormalized face normal (cross(e1, e2))
    c: jnp.ndarray        # (T,) n . v0
    num_tris: int

    def tree_flatten(self):  # pragma: no cover
        return (self.w, self.n, self.c), (self.num_tris,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves, *aux)


jtu.register_pytree_node(PlueckerTris, PlueckerTris.tree_flatten,
                         PlueckerTris.tree_unflatten)


def build_pluecker(v0, e1, e2, pad_to: int = 8) -> PlueckerTris:
    """Host/device prep from the triangle SoA (leaf order preserved)."""
    v0 = jnp.asarray(v0)
    v1 = v0 + jnp.asarray(e1)
    v2 = v0 + jnp.asarray(e2)
    t = v0.shape[0]
    pad = (-t) % pad_to
    if pad:
        # degenerate padding triangles: zero normal -> never hit
        z = jnp.zeros((pad, 3), v0.dtype)
        v0p, v1p, v2p = (jnp.concatenate([a, z]) for a in (v0, v1, v2))
    else:
        v0p, v1p, v2p = v0, v1, v2

    def edge(a, b):
        return jnp.concatenate([jnp.cross(a, b), b - a], axis=-1)  # (Tp, 6)

    # edge i is opposite vertex i: S0 ~ weight of v0 etc.
    w = jnp.stack([edge(v1p, v2p), edge(v2p, v0p), edge(v0p, v1p)],
                  axis=1)                       # (Tp, 3, 6)
    n = jnp.cross(v1p - v0p, v2p - v0p)
    c = jnp.sum(n * v0p, axis=-1)
    return PlueckerTris(w=w.reshape(-1, 6), n=n, c=c, num_tris=t)


def _blocks(o, d, t_min, t_max):
    r = o.shape[0]
    block = min(RAY_BLOCK, max(r, 1))
    pad = (-r) % block
    o = jnp.pad(o, ((0, pad), (0, 0)))
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    t_min = jnp.pad(t_min, (0, pad), constant_values=1.0)
    t_max = jnp.pad(t_max, (0, pad))  # pad tmax=0 -> no hits
    nb = (r + pad) // block
    return (o.reshape(nb, block, 3), d.reshape(nb, block, 3),
            t_min.reshape(nb, block), t_max.reshape(nb, block), r)


def _block_test(pt: PlueckerTris, o, d, t_min, t_max):
    """One ray block vs all triangles -> (S-based hit mask, t) as (R, T)."""
    m = jnp.cross(o, d)
    p = jnp.concatenate([d, m], axis=-1)                      # (R, 6)
    s = jax.lax.dot_general(
        p, pt.w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (R, 3T)
    s = s.reshape(o.shape[0], -1, 3)                          # (R, T, 3)
    inside = jnp.all(s >= -SIDE_EPS, axis=-1) | jnp.all(s <= SIDE_EPS, axis=-1)

    nd = jax.lax.dot_general(d, pt.n, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (R, T)
    no = jax.lax.dot_general(o, pt.n, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    safe = jnp.abs(nd) > DEN_EPS
    t = (pt.c[None, :] - no) / jnp.where(safe, nd, 1.0)
    hit = inside & safe & (t > t_min[:, None]) & (t < t_max[:, None])
    return hit, t, s


@jax.jit
def mxu_any(pt: PlueckerTris, o, d, t_min, t_max):
    """Occlusion: any triangle hit in (t_min, t_max). Returns (R,) bool."""
    ob, db, tminb, tmaxb, r = _blocks(o, d, t_min, t_max)

    def step(_, xs):
        o_, d_, tmin_, tmax_ = xs
        hit, _, _ = _block_test(pt, o_, d_, tmin_, tmax_)
        return None, jnp.any(hit, axis=-1)

    _, occ = jax.lax.scan(step, None, (ob, db, tminb, tmaxb))
    return occ.reshape(-1)[:r]


@jax.jit
def mxu_closest(pt: PlueckerTris, o, d, t_min, t_max):
    """Closest hit. Returns (t, prim, u, v); prim == -1 on miss."""
    ob, db, tminb, tmaxb, r = _blocks(o, d, t_min, t_max)

    def step(_, xs):
        o_, d_, tmin_, tmax_ = xs
        hit, t, s = _block_test(pt, o_, d_, tmin_, tmax_)
        t_masked = jnp.where(hit, t, jnp.float32(3.0e38))
        j = jnp.argmin(t_masked, axis=-1)
        rows = jnp.arange(o_.shape[0])
        any_hit = hit[rows, j]
        sj = s[rows, j]                                       # (R, 3)
        denom = sj.sum(axis=-1)
        denom = jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
        u = sj[:, 1] / denom
        v = sj[:, 2] / denom
        return None, (jnp.where(any_hit, t_masked[rows, j], tmax_),
                      jnp.where(any_hit, j.astype(jnp.int32), -1),
                      u, v)

    _, (t, prim, u, v) = jax.lax.scan(step, None, (ob, db, tminb, tmaxb))
    flat = lambda x: x.reshape(-1)[:r]
    return flat(t), flat(prim), flat(u), flat(v)
