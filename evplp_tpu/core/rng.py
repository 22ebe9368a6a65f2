"""Cheap counter-based RNG for per-sample Monte Carlo draws.

The VSL estimator draws 8 uniforms per (pixel, record, sample).  Threefry
key-chains (jax.random.fold_in x3 + uniform) cost ~20 rounds of mixing per
draw and dominate the XLA sample step; pcg4d (Jarzynski & Olano, "Hash
Functions for GPU Rendering", JCGT 2020 — the standard GPU-renderer
choice) produces FOUR well-distributed uniforms in ~20 int ops and is
pure int32 vector math, so the SAME function runs inside Pallas kernels
(enabling bit-level differential tests between the XLA and kernel paths).

Counter scheme: (pixel_id ^ seed0, rec_id, sample ^ seed1, tag).  Pure
function of GLOBAL ids -> any pixel permutation / sharding / chunking
draws identical numbers (the property the VSL pixel-sort exactness test
asserts).
"""
from __future__ import annotations

import jax.numpy as jnp

# plain python ints/floats: materialized INSIDE each trace, so Pallas
# kernels can call these without capturing module-level device constants
_M = 1664525
_A = 1013904223
_INV24 = float(1.0 / (1 << 24))


def pcg4d(x, y, z, w):
    """Vectorized pcg4d: four uint32 counters -> four mixed uint32."""
    m = jnp.uint32(_M)
    a = jnp.uint32(_A)
    x = jnp.asarray(x).astype(jnp.uint32) * m + a
    y = jnp.asarray(y).astype(jnp.uint32) * m + a
    z = jnp.asarray(z).astype(jnp.uint32) * m + a
    w = jnp.asarray(w).astype(jnp.uint32) * m + a
    x += y * w
    y += z * x
    z += x * y
    w += y * z
    x ^= x >> 16
    y ^= y >> 16
    z ^= z >> 16
    w ^= w >> 16
    x += y * w
    y += z * x
    z += x * y
    w += y * z
    return x, y, z, w


def uniform4(x, y, z, w):
    """Four U[0,1) floats from four uint32 counters (24-bit mantissa)."""
    a, b, c, d = pcg4d(x, y, z, w)
    inv = jnp.float32(_INV24)
    # uint32 -> int32 -> f32: exact (top 8 bits shifted off) and Mosaic
    # has no direct uint32->f32 lowering
    to_f = lambda v: (v >> jnp.uint32(8)).astype(jnp.int32).astype(
        jnp.float32) * inv
    return to_f(a), to_f(b), to_f(c), to_f(d)


def seeds_from_key(key):
    """Two uint32 stream seeds from a jax PRNG key (raw or typed)."""
    import jax
    arr = jnp.asarray(key)
    if jnp.issubdtype(arr.dtype, jnp.integer):
        data = arr.astype(jnp.uint32)
    else:
        data = jax.random.key_data(key).astype(jnp.uint32)
    return data[..., 0], data[..., -1]
