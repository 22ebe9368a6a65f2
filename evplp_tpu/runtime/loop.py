"""Headless frame loop: stop conditions, progressive schedule, dumps, stats.

Replaces the reference's GLFW render loop (common/realtime.h:100-146) and
the per-technique run() methods.  All rendering state stays on device; the
host only advances iteration counters, the Knaus-Zwicker schedule, and the
wall-clock stop condition (numMaxIteration / timeLimitMs,
rtcomphoton.h:938-941,1065).
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from evplp_tpu.core.sampling import iteration_key
from evplp_tpu.integrators.gbuffer import light_image, trace_gbuffer
from evplp_tpu.integrators.photon_fam import (
    FrameState, PhotonFamConfig, init_state, photon_fam_frame)
from evplp_tpu.integrators.pt import render_pt_frame
from evplp_tpu.runtime import film
from evplp_tpu.scene.config import RenderJob
from evplp_tpu.utils import image as im


@dataclass
class RunResult:
    images: dict            # name -> (H, W, 3) numpy
    num_iterations: int
    time_ms: float
    stats: dict = field(default_factory=dict)


def _out_path(configured: str, output_dir: str | None) -> str | None:
    if not configured:
        return None
    if output_dir is None:
        return configured
    return os.path.join(output_dir, os.path.basename(configured.replace("\\", "/")))


def _write_stat(params, time_ms: float, iters: int, output_dir: str | None):
    if params.use_stat and params.stat_filename:
        path = _out_path(params.stat_filename, output_dir)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"time": time_ms, "numIterations": iters}, f, indent=4)


class ProgressiveSchedule:
    """Knaus-Zwicker radius/clamp schedule (rtcomphoton.h:1033-1063)."""

    def __init__(self, radius0, clamp0, alpha, num_vpl, num_lp, vsl_radius0):
        self.radius = radius0
        self.clamp_start = clamp0
        self.clamp = clamp0
        self.alpha = alpha
        self.num_vpl = num_vpl
        self.num_lp = num_lp
        self.vsl_radius = vsl_radius0
        self.pdf_mc = self._pdf_mc()

    def _pdf_mc(self):
        if self.num_lp == 0:
            return 0.0
        return (self.num_vpl / self.num_lp) / np.pi / (self.radius * self.radius)

    def update(self, num_iterations: int):
        """Call after incrementing the iteration counter."""
        ratio = (num_iterations + self.alpha) / (num_iterations + 1.0)
        self.radius *= float(np.sqrt(ratio))
        self.clamp = self.clamp_start * float(num_iterations) ** self.alpha
        self.pdf_mc = self._pdf_mc()
        if self.vsl_radius > 0.0:
            self.vsl_radius = max(self.vsl_radius * float(np.sqrt(ratio)), 0.008)


# The axon tunnel's block_until_ready returns before device work completes,
# so a dispatch loop can run thousands of frames ahead of execution (the
# backlog then wedges the final result fetch).  A tiny host FETCH is a real
# synchronization point; do one at most every SYNC_EVERY iterations.
SYNC_EVERY = max(1, int(os.environ.get("EVPLP_SYNC_EVERY", "25")))


def _host_sync(x):
    """Force real completion of everything `x` depends on."""
    np.asarray(jax.device_get(x))


class BudgetPacer:
    """Equal-time stop condition with adaptive sync cadence.

    Real host fences cost a tunnel round-trip, so they run at most every
    SYNC_EVERY frames — but a fixed cadence lets slow techniques overshoot
    a time budget by up to a whole sync interval (the reference checks its
    budget every frame, rtcomphoton.h:938-941).  The pacer schedules the
    NEXT fence from the measured frame rate: far from the budget it syncs
    every SYNC_EVERY frames, near the budget every frame, so overshoot is
    bounded by ~one frame for every technique regardless of frame cost.
    """

    def __init__(self, time_limit_ms: float, t0: float):
        self.time_limit_ms = time_limit_ms
        self.t0 = t0
        self.next_sync = 1        # sync after the first frame: seeds the est
        self.last_now = 0.0
        self.last_iters = 0

    def should_stop(self, iters: int, sync_value) -> bool:
        """Call once per frame with a device value to fence on. Returns
        True when the budget is exhausted (measured at a REAL fence)."""
        if iters < self.next_sync:
            return False
        _host_sync(sync_value)
        now = (time.perf_counter() - self.t0) * 1000.0
        if self.time_limit_ms > 0 and now >= self.time_limit_ms:
            return True
        frame_ms = (now - self.last_now) / max(iters - self.last_iters, 1)
        self.last_now, self.last_iters = now, iters
        if self.time_limit_ms > 0:
            remaining = self.time_limit_ms - now
            step = int(remaining / max(frame_ms, 1e-3) * 0.5)
            self.next_sync = iters + max(1, min(SYNC_EVERY, step))
        else:
            self.next_sync = iters + SYNC_EVERY
        return False


def run_photon_fam(job: RenderJob, output_dir: str | None = None,
                   splat_tile: int = 16, splat_cap: int = 1 << 20,
                   splat_span: int = 2, max_wall_s: float | None = None,
                   progress_every: int = 20,
                   checkpoint_path: str | None = None,
                   checkpoint_every: int | None = None,
                   resume_from: str | None = None,
                   profile: bool | None = None,
                   mesh=None, display_gamma: bool = False) -> RunResult:
    """Full photonfam / lvcphotonfam run following the reference driver.

    checkpoint_path/_every + resume_from: progressive-state checkpointing
    (runtime.checkpoint) — an addition over the reference, which has none.
    profile: per-pass device timing into RunResult.stats["passes"].
    display_gamma: apply the final.frag display transform (pow 1/2.2,
    final.frag:27-30) to saved outputs — the reference uses it only for the
    on-screen composite and dumps linear images (rtcomphoton.h:1121-1132).
    mesh: optional jax.sharding.Mesh — runs the frame pixel-sharded with
    ring-rotated light blocks (parallel/shard.py); all variants (VPL, VSL,
    LVC, PM) supported, same estimator as the single-device run.
    """
    from evplp_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
    from evplp_tpu.runtime.profiling import PassTimer

    p = job.params
    scene = job.scene
    num_records = p.num_max_bounces + 1
    timer = PassTimer(enabled=profile)

    radius0 = scene.bounding_radius * p.radius_percentage
    # avoid div-by-zero for pure-VPL configs (radiusPercentage == 0)
    radius0 = max(radius0, 1e-6)
    clamp0 = (1.0 / scene.total_area if p.clamping_coeff is None
              else p.clamping_coeff)
    vsl_radius0 = 0.0
    if p.force_vsl:
        vsl_radius0 = max(scene.bounding_radius * p.vsl_radius_percentage, 0.008)

    sched = ProgressiveSchedule(radius0, clamp0, p.alpha_progressive,
                                p.num_vpl_light_paths, p.num_light_paths,
                                vsl_radius0)

    cfg = PhotonFamConfig(
        width=job.width, height=job.height,
        num_light_paths=p.num_light_paths,
        num_vpl_light_paths=p.num_vpl_light_paths,
        num_records=num_records,
        mis_mode=p.mis_mode,
        accumulate=(p.frame_mode == "accumulate"),
        use_jitter=p.use_jitter,
        do_deferred=p.run_passes["deferredShading"],
        do_light_tracing=p.run_passes["lightTracing"],
        do_finalize=p.run_passes["finalize"],
        do_vpl=p.run_passes["vplSplat"],
        do_photon=p.run_passes["photonSplat"],
        do_light_render=p.run_passes["lightRender"],
        force_vsl=p.force_vsl,
        lvc=(p.technique == "lvcphotonfam"),
        splat_tile=splat_tile, splat_cap=splat_cap, splat_span=splat_span,
    )

    if mesh is not None:
        from evplp_tpu.parallel.shard import (
            shard_state, sharded_photon_fam_frame)

    state = init_state(cfg)
    iters = 0
    if resume_from:
        state, iters, fields = load_checkpoint(resume_from)
        sched.radius = fields["radius"]
        sched.clamp = fields["clamp"]
        sched.clamp_start = fields["clamp_start"]
        sched.vsl_radius = fields["vsl_radius"]
        sched.pdf_mc = fields["pdf_mc"]
    if mesh is not None:
        state = shard_state(state, mesh)

    # warm-up frame: compile outside the budget clock (the reference's
    # timeLimitMs excludes its setup-time PTX compile, rtcomphoton.h:646
    # runs before the run() stopwatch; compare.py does the same)
    warm_key = iteration_key(0, p.rng_offset)
    if mesh is not None:
        warm = sharded_photon_fam_frame(
            scene, cfg, mesh, state, warm_key,
            sched.radius, sched.clamp, sched.pdf_mc, sched.vsl_radius)
    else:
        warm = photon_fam_frame(
            scene, cfg, state, warm_key,
            jnp.float32(sched.radius), jnp.float32(sched.clamp),
            jnp.float32(sched.pdf_mc), jnp.float32(sched.vsl_radius))
    _host_sync(warm.dropped)
    del warm

    t0 = time.perf_counter()
    prev_ms = 0.0
    pacer = BudgetPacer(p.time_limit_ms, t0)

    def elapsed_ms():
        return (time.perf_counter() - t0) * 1000.0

    while True:
        if iters == p.num_max_iteration:
            break
        key = iteration_key(0, iters + p.rng_offset)
        if mesh is not None:
            state = sharded_photon_fam_frame(
                scene, cfg, mesh, state, key,
                sched.radius, sched.clamp, sched.pdf_mc, sched.vsl_radius)
        else:
            state = photon_fam_frame(
                scene, cfg, state, key,
                jnp.float32(sched.radius), jnp.float32(sched.clamp),
                jnp.float32(sched.pdf_mc), jnp.float32(sched.vsl_radius),
                timer=timer)
        iters += 1

        if iters % progress_every == 0:
            jax.block_until_ready(state.vpl_acc)
            now = elapsed_ms()
            frame_ms = (now - prev_ms) / progress_every
            prev_ms = now
            print(f"numIter: {iters} | radius: {sched.radius:.6g} | "
                  f"clamping: {sched.clamp:.6g} | time: {now:.1f}ms")
            # adaptive light-path suggestion (log-only, rtcomphoton.h:1017-1030)
            if p.target_rendering_time > 0 and frame_ms > 0:
                factor = p.target_rendering_time / frame_ms
                if p.num_vpl_light_paths:
                    new_vpl = int(p.num_vpl_light_paths * factor)
                    ratio = p.num_light_paths // max(p.num_vpl_light_paths, 1)
                    print(f"change number of samples: {factor:.3f} | "
                          f"Nb light paths: {new_vpl * ratio} | "
                          f"Nb VPL paths: {new_vpl}")
                else:
                    print(f"Nb light paths: {int(p.num_light_paths * factor)}")

        if p.do_progressive:
            sched.update(iters)

        if checkpoint_path and checkpoint_every and iters % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, state, iters, sched)

        if p.write_every_frame:
            imgs = finalize(state, cfg, iters, job)
            path = _out_path(p.weighted_photon_filename, output_dir)
            if path:
                stem, ext = os.path.splitext(path)
                im.save(f"{stem}_{iters}{ext}", imgs["combined"])

        if pacer.should_stop(iters, state.dropped):
            break
        if max_wall_s is not None and elapsed_ms() >= max_wall_s * 1000.0:
            break

    _host_sync(state.dropped)
    time_ms = elapsed_ms()
    imgs = finalize(state, cfg, iters, job, gamma=display_gamma)

    for name, fname in (("combined", p.combined_filename),
                        ("weighted_vpl", p.weighted_vpl_filename),
                        ("weighted_photon", p.weighted_photon_filename)):
        path = _out_path(fname, output_dir)
        if path:
            im.save(path, imgs[name])
    _write_stat(p, time_ms, iters, output_dir)

    if checkpoint_path and checkpoint_every:
        save_checkpoint(checkpoint_path, state, iters, sched)

    stats = {"dropped_splat_pairs": int(state.dropped)}
    if timer.enabled:
        stats["passes"] = timer.report()
    return RunResult(images=imgs, num_iterations=iters, time_ms=time_ms,
                     stats=stats)


def finalize(state: FrameState, cfg: PhotonFamConfig, iters: int,
             job: RenderJob, gamma: bool = False) -> dict:
    """The three-way output split (rtcomphoton.h:1121-1132).

    Dumps always re-run the final program — run.finalize gates only the
    reference's on-screen composite (rtcomphoton.h:997-1004 vs :1084), so
    it does not affect these outputs.  gamma: display transform, off for
    reference-parity linear dumps.
    """
    param = 1.0 if not cfg.accumulate else 1.0 / max(iters, 1)
    light = film.to_image(state.light_img, job.width, job.height)
    vpl = film.to_image(state.vpl_acc, job.width, job.height) * param
    photon = film.to_image(state.photon_acc, job.width, job.height) * param
    # final.frag's step-mask: GI terms are zeroed on directly visible
    # emitter pixels (film.composite:21-22).  With the reference's black
    # emitter material both estimators are exactly 0 there anyway; the
    # mask keeps the invariant local instead of two modules apart.
    gi_mask = (light[:, :, 0:1] <= 0.0).astype(np.float32)
    vpl = gi_mask * vpl
    photon = gi_mask * photon
    out = {
        "combined": light + vpl + photon,
        "weighted_vpl": light + vpl,
        "weighted_photon": photon,
        "light": light,
    }
    if gamma:
        for k in ("combined", "weighted_vpl", "weighted_photon"):
            out[k] = np.power(np.maximum(out[k], 0.0), 1.0 / 2.2)
    return out


def run_pt(job: RenderJob, output_dir: str | None = None,
           max_wall_s: float | None = None,
           display_gamma: bool = False, mesh=None) -> RunResult:
    """Path-tracing run (reference driver: rtpt/rtpt2.h:575-670).

    mesh: optional jax.sharding.Mesh — pixel rows shard data-parallel
    (parallel/shard.py sharded_pt_frame); accumulation stays sharded."""
    p = job.params
    scene = job.scene
    n = job.width * job.height
    accumulate = p.frame_mode == "accumulate"

    if mesh is not None:
        from evplp_tpu.parallel.shard import sharded_pt_frame

        def frame(acc, light_acc, key):
            result = jnp.zeros((n, 3), jnp.float32)
            light = light_acc
            # one camera jitter per FRAME (matches the unsharded branch and
            # the reference's per-frame jitter): derive from the frame key
            # here so every sample shares it and the g-buffer is reusable
            if p.use_jitter:
                u = jax.random.uniform(jax.random.fold_in(key, 999), (2,))
                jitter = (2.0 * u - 1.0) / jnp.asarray(
                    [job.width, job.height], jnp.float32)
            else:
                jitter = None
            for s in range(p.num_sample_per_pixel):
                img, light = sharded_pt_frame(
                    scene, mesh, job.width, job.height,
                    jax.random.fold_in(key, s), p.num_max_bounces,
                    use_jitter=p.use_jitter, jitter=jitter)
                result = result + img
            result = result / p.num_sample_per_pixel
            new_acc = acc + result if accumulate else result
            return new_acc, light
    else:
        # scene rides as a jit ARGUMENT (pytree leaves -> runtime
        # parameters): closing over a multi-M-triangle scene would bake
        # 100+ MB of constants into the serialized module, which the
        # remote-compile service rejects (HTTP 413) and which bloats the
        # compile cache even where it is accepted.
        @jax.jit
        def _frame(sc, acc, light_acc, key):
            if p.use_jitter:
                u = jax.random.uniform(jax.random.fold_in(key, 999), (2,))
                jitter = (2.0 * u - 1.0) / jnp.asarray(
                    [job.width, job.height], jnp.float32)
            else:
                jitter = None
            gbuf = trace_gbuffer(sc, job.width, job.height, jitter)
            result = jnp.zeros((n, 3), jnp.float32)
            for s in range(p.num_sample_per_pixel):
                result += render_pt_frame(sc, gbuf,
                                          jax.random.fold_in(key, s),
                                          p.num_max_bounces,
                                          tile_shape=(job.height, job.width))
            result /= p.num_sample_per_pixel
            light = light_image(sc, gbuf)
            new_acc = acc + result if accumulate else result
            return new_acc, light

        def frame(acc, light_acc, key):
            return _frame(scene, acc, light_acc, key)

    acc = jnp.zeros((n, 3), jnp.float32)
    light = jnp.zeros((n, 3), jnp.float32)
    iters = 0
    # warm-up: compile outside the budget clock (see run_photon_fam)
    warm, _ = frame(acc, light, iteration_key(0, p.rng_offset))
    _host_sync(warm[0])
    del warm
    t0 = time.perf_counter()
    pacer = BudgetPacer(p.time_limit_ms, t0)
    while True:
        if iters == p.num_max_iteration:
            break
        acc, light = frame(acc, light, iteration_key(0, iters + p.rng_offset))
        iters += 1
        if p.write_every_frame and p.output_filename:
            param = 1.0 / iters if accumulate else 1.0
            snap = film.composite(acc, jnp.zeros_like(acc), light,
                                  vpl_scale=param, photon_scale=0.0)
            path = _out_path(p.output_filename, output_dir)
            stem, ext = os.path.splitext(path)
            im.save(f"{stem}_{iters}{ext}",
                    film.to_image(snap, job.width, job.height))
        if pacer.should_stop(iters, acc[0]):
            break
        if max_wall_s is not None and (time.perf_counter() - t0) >= max_wall_s:
            break

    _host_sync(acc[0])
    time_ms = (time.perf_counter() - t0) * 1000.0

    param = 1.0 / max(iters, 1) if accumulate else 1.0
    final = film.composite(acc, jnp.zeros_like(acc), light,
                           vpl_scale=param, photon_scale=0.0, light_scale=1.0,
                           gamma=display_gamma)
    imgs = {
        "output": film.to_image(final, job.width, job.height),
        "pt": film.to_image(acc * param, job.width, job.height),
        "light": film.to_image(light, job.width, job.height),
    }
    path = _out_path(p.output_filename, output_dir)
    if path:
        im.save(path, imgs["output"])
    _write_stat(p, time_ms, iters, output_dir)
    return RunResult(images=imgs, num_iterations=iters, time_ms=time_ms)
