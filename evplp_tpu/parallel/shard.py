"""Multi-chip execution: pixel-sharded film + ring-rotated light blocks.

The reference is strictly single-GPU (SURVEY.md §2.4); its only "transport"
is GL<->OptiX interop.  The TPU design shards the two big axes the renderer
actually has:

  * film rows   -> data-parallel shards over the mesh axis "px",
  * light paths -> one block per device.  The photon splat (which consumes
    ALL paths) sees every block by rotating blocks around the ring with
    lax.ppermute — the ring-attention/blockwise pattern applied to the dense
    pixels x light-vertices interaction: pixels stay put, light blocks ride
    the ICI ring.
  * the VPL/VSL gather reads only the FIRST numVplLightPaths paths of the
    global pool (rtcomphoton.h:857-868) — a tiny working set (30/100 paths),
    so every device traces it locally instead of shipping block 0 around.
  * LVC needs random access into the whole pool (per-pixel windows,
    lvclighttracing.cu:366-384), so the pool is all_gathered — ~100 MB at
    reference scale, one ICI collective, then the gather is local.
  * framebuffers never need a psum: each device only ever shades its own
    rows; the ring/all_gather deliver all remote light vertices to them.

Light-path RNG is counter-based per GLOBAL path id (light_trace.py), so the
union of the per-device blocks IS the single-device path set: the sharded
frame computes bit-for-the-same estimator as photon_fam_frame, which the
shard tests assert directly against the single-device output.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evplp_tpu.integrators.gbuffer import (light_image, trace_gbuffer,
                                           zero_gbuffer)
from evplp_tpu.integrators.light_trace import trace_light_paths
from evplp_tpu.integrators.lvc import lvc_offsets, lvc_gather
from evplp_tpu.integrators.photon_fam import FrameState, PhotonFamConfig
from evplp_tpu.integrators.photon_splat import photon_splat_tiled
from evplp_tpu.integrators.pt import render_pt_frame
from evplp_tpu.integrators.vpl import vpl_gather
from evplp_tpu.integrators.vsl import vsl_gather
from evplp_tpu.scene.scene import SceneData

AXIS = "px"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (AXIS,))


def _local_rows(height: int, n: int):
    assert height % n == 0, f"height {height} must divide device count {n}"
    return height // n


def sharded_photon_fam_frame(scene: SceneData, cfg: PhotonFamConfig,
                             mesh: Mesh, state: FrameState, key,
                             radius, clamping_value, pdf_mc,
                             vsl_radius=0.0):
    """One EVPLP/LVC frame over the mesh; equals the single-device
    photon_fam_frame output (same estimator, same RNG streams).

    state buffers are sharded on rows.  cfg.num_light_paths is the GLOBAL
    count; each device traces one block of paths (per-path-id RNG keeps the
    global set device-count invariant).
    """
    n = mesh.devices.size
    rows = _local_rows(cfg.height, n)
    assert cfg.num_light_paths % n == 0, \
        f"numLightPaths {cfg.num_light_paths} must divide device count {n}"
    paths_blk = cfg.num_light_paths // n
    n_vpl = cfg.num_vpl_light_paths
    assert n_vpl <= cfg.num_light_paths

    def frame(state, key, radius, clamping_value, pdf_mc, vsl_radius):
        d = jax.lax.axis_index(AXIS)
        n_local = rows * cfg.width

        if cfg.use_jitter:
            u = jax.random.uniform(jax.random.fold_in(key, 999), (2,))
            jitter = (2.0 * u - 1.0) / jnp.asarray(
                [cfg.width, cfg.height], jnp.float32)
        else:
            jitter = None

        if cfg.do_deferred:
            gbuf = trace_gbuffer(scene, cfg.width, cfg.height, jitter,
                                 row_start=d * rows, row_count=rows)
        else:
            gbuf = zero_gbuffer(n_local)

        vpl_img = jnp.zeros((n_local, 3), jnp.float32)
        photon_img = jnp.zeros((n_local, 3), jnp.float32)
        dropped = jnp.zeros((), jnp.int32)

        if cfg.do_light_tracing:
            key_lt = jax.random.fold_in(key, 1)
            # local block of the global path pool
            pm = trace_light_paths(scene, key_lt, paths_blk, cfg.num_records,
                                   path_offset=d * paths_blk)

            if cfg.do_vpl and n_vpl:
                if cfg.lvc:
                    # whole-pool random access: gather the ring into a full
                    # local pool, then the standard per-pixel-window gather
                    pm_full = jax.tree.map(
                        lambda x: jax.lax.all_gather(x, AXIS, tiled=True), pm)
                    off = jax.lax.dynamic_slice(
                        lvc_offsets(jax.random.fold_in(key, 3),
                                    cfg.width * cfg.height,
                                    cfg.num_light_paths),
                        (d * n_local,), (n_local,))
                    vpl_img = lvc_gather(
                        scene, gbuf, pm_full, jax.random.fold_in(key, 3),
                        cfg.mis_mode, pdf_mc, clamping_value, n_vpl,
                        offsets=off, tile_shape=(rows, cfg.width))
                elif cfg.force_vsl:
                    pm_vpl = trace_light_paths(scene, key_lt, n_vpl,
                                               cfg.num_records, path_offset=0)
                    vpl_img = vsl_gather(scene, gbuf, pm_vpl,
                                         jax.random.fold_in(key, 2),
                                         vsl_radius, n_vpl,
                                         pixel_offset=d * n_local,
                                         tile_shape=(rows, cfg.width),
                                         record_chunk=None)
                else:
                    pm_vpl = trace_light_paths(scene, key_lt, n_vpl,
                                               cfg.num_records, path_offset=0)
                    vpl_img = vpl_gather(scene, gbuf, pm_vpl, cfg.mis_mode,
                                         pdf_mc, clamping_value, n_vpl,
                                         tile_shape=(rows, cfg.width))

            if cfg.do_photon:
                block = pm
                for step in range(n):
                    img, drop = photon_splat_tiled(
                        scene, gbuf, block, radius, cfg.mis_mode, pdf_mc,
                        clamping_value, 1.0 / cfg.num_light_paths,
                        cfg.width, rows, jitter,
                        tile=cfg.splat_tile, cap=cfg.splat_cap,
                        span=cfg.splat_span,
                        row_offset=jnp.float32(d * rows),
                        full_height=cfg.height)
                    photon_img = photon_img + img
                    dropped = dropped + drop.astype(jnp.int32)
                    if step != n - 1:
                        perm = [(i, (i + 1) % n) for i in range(n)]
                        block = jax.lax.ppermute(block, AXIS, perm)

        light_img = light_image(scene, gbuf) if cfg.do_light_render \
            else state.light_img

        vpl_acc = state.vpl_acc + vpl_img if cfg.accumulate else vpl_img
        photon_acc = (state.photon_acc + photon_img if cfg.accumulate
                      else photon_img)
        return FrameState(vpl_acc=vpl_acc, photon_acc=photon_acc,
                          light_img=light_img,
                          dropped=state.dropped + jax.lax.psum(dropped, AXIS))

    state_spec = FrameState(vpl_acc=P(AXIS), photon_acc=P(AXIS),
                            light_img=P(AXIS), dropped=P())
    fn = jax.jit(
        jax.shard_map(
            frame, mesh=mesh,
            in_specs=(state_spec, P(), P(), P(), P(), P()),
            out_specs=state_spec,
            check_vma=False,
        ))
    return fn(state, key, jnp.float32(radius), jnp.float32(clamping_value),
              jnp.float32(pdf_mc), jnp.float32(vsl_radius))


def sharded_pt_frame(scene: SceneData, mesh: Mesh, width: int, height: int,
                     key, num_bounces: int, use_jitter: bool = True,
                     jitter=None):
    """Pixel-sharded path-tracing frame: embarrassingly data-parallel.

    ESTIMATOR-IDENTICAL to the single-device frame: render_pt_frame's
    per-pixel draws are counter draws on the GLOBAL pixel id (pt.py), so
    each device renders exactly its rows of the one canonical image —
    the same device-count invariance light_trace.py and vsl.py have.
    `jitter` (2,) may be passed in to share the caller's per-frame camera
    jitter; otherwise it derives from the frame key (same on all devices)."""
    n = mesh.devices.size
    rows = _local_rows(height, n)
    if use_jitter and jitter is None:
        u = jax.random.uniform(jax.random.fold_in(key, 999), (2,))
        jitter = (2.0 * u - 1.0) / jnp.asarray([width, height], jnp.float32)

    def frame(key, jitter):
        d = jax.lax.axis_index(AXIS)
        gbuf = trace_gbuffer(scene, width, height,
                             jitter if use_jitter else None,
                             row_start=d * rows, row_count=rows)
        img = render_pt_frame(scene, gbuf, key, num_bounces,
                              tile_shape=(rows, width),
                              pixel_offset=d * rows * width)
        return img, light_image(scene, gbuf)

    if jitter is None:
        jitter = jnp.zeros((2,), jnp.float32)
    fn = jax.jit(
        jax.shard_map(frame, mesh=mesh, in_specs=(P(), P()),
                      out_specs=(P(AXIS), P(AXIS)), check_vma=False))
    return fn(key, jitter)


def shard_state(state: FrameState, mesh: Mesh) -> FrameState:
    """Place accumulation buffers row-sharded on the mesh."""
    s = NamedSharding(mesh, P(AXIS))
    r = NamedSharding(mesh, P())
    return FrameState(
        vpl_acc=jax.device_put(state.vpl_acc, s),
        photon_acc=jax.device_put(state.photon_acc, s),
        light_img=jax.device_put(state.light_img, s),
        dropped=jax.device_put(state.dropped, r),
    )
