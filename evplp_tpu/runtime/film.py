"""Device-resident accumulation + final composite.

The reference keeps three separate results — the OptiX VPL/PT buffer, the
photon-splat texture, and the light raster texture — and composites them in
a fullscreen pass (shaders/final.frag):

    sum = step(light.x <= 0) * (vpl*s_v + photon*s_p) + light*s_l

i.e. indirect estimates are masked out wherever the emitter is directly
visible.  Same here, as one jnp expression over flat (N, 3) buffers.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def composite(vpl, photon, light, vpl_scale=1.0, photon_scale=1.0,
              light_scale=1.0, gamma: bool = False):
    """final.frag equivalent. All inputs (N, 3)."""
    gi_mask = (light[:, 0:1] * light_scale <= 0.0).astype(jnp.float32)
    s = gi_mask * (vpl * vpl_scale + photon * photon_scale) + light * light_scale
    if gamma:
        s = jnp.power(jnp.maximum(s, 0.0), 1.0 / 2.2)
    return s


def to_image(flat: jnp.ndarray, width: int, height: int) -> np.ndarray:
    """(H*W, 3) device buffer -> (H, W, 3) numpy image (row 0 = top)."""
    return np.asarray(flat).reshape(height, width, 3)
