"""evplp_tpu — a TPU-native re-implementation of the EVPLP renderer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference "reflectcuts" code release for the paper
"Efficient Energy-Compensated VPLs using Photon Splatting"
(Sriwasansak, Gruson, Hachisuka).

The reference is a single-GPU OpenGL+OptiX interactive renderer; this
framework is a headless, device-resident, multi-chip-shardable renderer:

* one jitted frame function per technique, all buffers HBM-resident,
* ray tracing (primary visibility, photon tracing, shadow rays) through a
  flattened BVH with packet traversal (Pallas kernel on the TPU hot path,
  pure-JAX fallback everywhere),
* photon splatting as tile-binned scatter-add KDE instead of rasterized
  instanced icospheres,
* pixel-sharded + ring-rotated light-block multi-chip execution via
  jax.sharding / shard_map instead of GL<->OptiX interop.

Implemented technique families (reference parity):
  pt            path tracing with MIS next-event estimation
  photonfam     VPL / VSL / photon-mapping / EVPLP ("ours") + progressive
  lvcphotonfam  LVC variant (per-pixel randomized light subpath selection)
"""

__version__ = "0.1.0"


def render_config(*args, **kwargs):
    """Lazy alias for evplp_tpu.runtime.render.render_config."""
    from evplp_tpu.runtime.render import render_config as _rc
    return _rc(*args, **kwargs)
