"""Counter-based random number generation.

The reference seeds curand per (launchIndex, rngSeed=iteration+rngOffset)
(lighttracing.cu:202-203, pathtracing.cu:364-365), giving deterministic,
replayable streams.  The TPU-native equivalent is JAX's threefry: a stream is
key = fold_in(fold_in(base, iteration_seed), lane_id); decorrelated draws
within the stream come from per-use stream offsets.

For fully vectorized integrators we pre-draw a fixed budget of uniforms per
lane per iteration: `uniform_grid(key, shape, n)` -> (n, *shape) in [0,1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def iteration_key(base_seed, iteration) -> jax.Array:
    """Stream root for one frame: mirrors rngSeed = iteration + rngOffset."""
    return jax.random.fold_in(jax.random.PRNGKey(0), base_seed + iteration)


def lane_uniforms(key: jax.Array, lane_shape, num: int, dtype=jnp.float32):
    """num decorrelated uniform draws per lane; returns (num, *lane_shape).

    Each draw is what a per-lane curand_uniform() call produces in the
    reference's loops, vectorized over all lanes at once.
    """
    return jax.random.uniform(key, (num, *tuple(lane_shape)), dtype=dtype)


def uniform_not_one(u: jnp.ndarray) -> jnp.ndarray:
    """min(u, 0.999999) - the reference's guard before material selection
    (lighttracing.cu:160, pathtracing.cu:176)."""
    return jnp.minimum(u, 0.999999)


def sample_cdf(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF draw: first index with cdf[i] >= u.

    jnp.searchsorted(side='left') reproduces the reference's lower-bound
    binary search over the normalized inclusive CDF (rtlightsource.cuh:38-56).
    cdf: (n,) nondecreasing with cdf[-1] == 1.  u: any shape in [0,1).
    """
    idx = jnp.searchsorted(cdf, u, side="left")
    return jnp.minimum(idx, cdf.shape[0] - 1)
