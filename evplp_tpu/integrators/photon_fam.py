"""EVPLP technique family — one jitted frame function (reference driver:
rtcomphoton/rtcomphoton.h `run`:883-1133 and rtlvccomphoton.h).

One frame = G-buffer -> light tracing -> VPL (or VSL / LVC) gather ->
photon splat -> emitter image, all device-resident (the reference's
GL<->OptiX interop buffers collapse into values flowing through one XLA
program; accumulation buffers live in FrameState).

Progressive-mode scalars (photon radius, clamping value, pdfMc, VSL radius)
are *dynamic* arguments so the Knaus-Zwicker schedule (rtcomphoton.h:
1033-1063) never retriggers compilation.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from evplp_tpu.integrators.gbuffer import (light_image, trace_gbuffer,
                                           zero_gbuffer)
from evplp_tpu.integrators.light_trace import (trace_light_paths,
                                               zero_photon_map)
from evplp_tpu.integrators.lvc import lvc_gather
from evplp_tpu.integrators.photon_splat import photon_splat_tiled
from evplp_tpu.integrators.vpl import vpl_gather
from evplp_tpu.integrators.vsl import vsl_gather
from evplp_tpu.scene.scene import SceneData


@dataclass(frozen=True)
class PhotonFamConfig:
    """Static (hashable) frame configuration."""
    width: int
    height: int
    num_light_paths: int
    num_vpl_light_paths: int
    num_records: int            # numMaxBounces + 1
    mis_mode: int
    accumulate: bool            # frameMode == accumulate
    use_jitter: bool
    do_deferred: bool = True
    do_light_tracing: bool = True
    do_vpl: bool = True
    do_photon: bool = True
    do_light_render: bool = True
    # run.finalize gates only the reference's on-screen composite; every
    # image dump re-runs the final program regardless (rtcomphoton.h:1084,
    # 1121-1132), so headless it is a no-op — kept for schema parity.
    do_finalize: bool = True
    force_vsl: bool = False
    lvc: bool = False
    splat_tile: int = 16
    # cap is a lossless-path bound per tile: the bulk pass handles
    # cap_bulk pairs/tile densely, the overflow pass drains the rest at
    # per-pair cost, so a large cap costs nothing unless actually hit
    splat_cap: int = 1 << 20
    splat_span: int = 2


@dataclass(frozen=True)
class FrameState:
    vpl_acc: jnp.ndarray      # (N, 3)
    photon_acc: jnp.ndarray   # (N, 3)
    light_img: jnp.ndarray    # (N, 3) latest emitter image (not accumulated)
    dropped: jnp.ndarray      # () int32 — splat pairs lost to caps (metric)

    def tree_flatten(self):  # pragma: no cover
        return (self.vpl_acc, self.photon_acc, self.light_img, self.dropped), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves)


jtu.register_pytree_node(FrameState, FrameState.tree_flatten, FrameState.tree_unflatten)


def init_state(cfg: PhotonFamConfig) -> FrameState:
    n = cfg.width * cfg.height
    z = jnp.zeros((n, 3), jnp.float32)
    return FrameState(vpl_acc=z, photon_acc=z, light_img=z,
                      dropped=jnp.zeros((), jnp.int32))


# Each pass is jitted separately: one fused mega-program compiles ~5x
# slower in XLA for no runtime benefit (every pass is already a fat kernel
# over HBM-resident arrays).
_gbuffer_jit = partial(jax.jit, static_argnames=("width", "height"))(
    trace_gbuffer)
_light_trace_jit = partial(jax.jit,
                           static_argnames=("num_paths", "num_records"))(
    trace_light_paths)
_light_image_jit = jax.jit(light_image)


def photon_fam_frame(scene: SceneData, cfg: PhotonFamConfig,
                     state: FrameState, key, radius, clamping_value,
                     pdf_mc, vsl_radius, timer=None) -> FrameState:
    """Advance one iteration (the beforeSwap body, rtcomphoton.h:936-1005).

    timer: optional runtime.profiling.PassTimer for per-pass device timing.
    """
    if timer is None:
        from evplp_tpu.runtime.profiling import PassTimer
        timer = PassTimer(enabled=False)

    if cfg.use_jitter:
        u = jax.random.uniform(jax.random.fold_in(key, 999), (2,))
        jitter = (2.0 * u - 1.0) / jnp.asarray(
            [cfg.width, cfg.height], jnp.float32)
    else:
        jitter = None

    if cfg.do_deferred:
        gbuf = timer.time_call("gbuffer", _gbuffer_jit, scene, cfg.width,
                               cfg.height, jitter)
    else:
        # run.deferredShading=false: the G-buffer is never rendered
        # (rtcomphoton.h:954-960 skipped) — stencil 0 -> black estimators
        gbuf = zero_gbuffer(cfg.width * cfg.height)

    if cfg.do_light_tracing:
        pm = timer.time_call("light_trace", _light_trace_jit, scene,
                             jax.random.fold_in(key, 1),
                             cfg.num_light_paths, cfg.num_records)
    else:
        # run.lightTracing=false: the photon SSBO is never written
        # (rtcomphoton.h:962-966 skipped) — flags 0 -> no usable records
        pm = zero_photon_map(cfg.num_light_paths, cfg.num_records)

    vpl_acc = state.vpl_acc
    ts = (cfg.height, cfg.width)
    if cfg.do_vpl and cfg.num_vpl_light_paths > 0:
        if cfg.force_vsl:
            img = timer.time_call(
                "vsl_gather", vsl_gather, scene, gbuf, pm,
                jax.random.fold_in(key, 2), vsl_radius,
                cfg.num_vpl_light_paths, tile_shape=ts)
        elif cfg.lvc:
            img = timer.time_call(
                "lvc_gather", lvc_gather, scene, gbuf, pm,
                jax.random.fold_in(key, 3), cfg.mis_mode, pdf_mc,
                clamping_value, cfg.num_vpl_light_paths, tile_shape=ts)
        else:
            img = timer.time_call(
                "vpl_gather", vpl_gather, scene, gbuf, pm, cfg.mis_mode,
                pdf_mc, clamping_value, cfg.num_vpl_light_paths,
                tile_shape=ts)
        vpl_acc = vpl_acc + img if cfg.accumulate else img

    photon_acc = state.photon_acc
    dropped = state.dropped
    if cfg.do_photon:
        img, d = timer.time_call(
            "photon_splat", photon_splat_tiled, scene, gbuf, pm, radius,
            cfg.mis_mode, pdf_mc, clamping_value,
            1.0 / cfg.num_light_paths, cfg.width, cfg.height, jitter,
            tile=cfg.splat_tile, cap=cfg.splat_cap, span=cfg.splat_span)
        photon_acc = photon_acc + img if cfg.accumulate else img
        dropped = dropped + d.astype(jnp.int32)

    light_img = _light_image_jit(scene, gbuf) if cfg.do_light_render \
        else state.light_img

    return FrameState(vpl_acc=vpl_acc, photon_acc=photon_acc,
                      light_img=light_img, dropped=dropped)
