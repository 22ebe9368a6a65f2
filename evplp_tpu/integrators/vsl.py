"""Virtual Spherical Lights gather (reference: lighttracing.cu:382-722,
a translation of Hasan's vsl.fx; enabled by forceVsl + vslRadiusPercentage).

Per (pixel, VSL) pair: one shadow segment, then a cone-solid-angle MC
integral with 3-strategy MIS (uniform-cone, eye-BRDF, light-BRDF), with the
reference's adaptive sample count numSamples = int(halfCone*200/pi)+1.

TPU shape: the adaptive count is per (pixel, record), but a SIMD batch's
sample loop runs to the batch MAX — one near pixel makes every pixel pay
~101 steps.  Fix (pixel_sort): pixels are permuted ONCE per frame by their
aggregate difficulty (sum of numSamples over all records — pure vector
math), each record's sample loop then runs per CHUNK of the sorted order
with that chunk's own bound, and fully-occluded or far chunks exit after
1-2 steps.  Per-pixel RNG is counter-based on the GLOBAL pixel id, so the
sorted evaluation draws the same numbers and the estimator is EXACTLY the
unsorted one (tests assert equality).

Reference quirks kept for estimator parity:
  * MIS weights use the CUDA LambertPdfW *without* the 1/pi factor
    (rtmaterial.cuh:40-44),
  * pdfBrdf2's lambert term is weighted by the *shading point's*
    pSelectLambert, and in sampleCone/sampleBrdf1 the phong term of pdfBrdf2
    is NOT multiplied by (1 - pSelect) (lighttracing.cu:440-441,515-516).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from evplp_tpu.core import brdf
from evplp_tpu.core import mathutil as mu
from evplp_tpu.core import rng
from evplp_tpu.integrators.gbuffer import GBuffer
from evplp_tpu.integrators.light_trace import FLAG_VPL, PhotonMap
from evplp_tpu.scene.scene import SceneData
from evplp_tpu.trace.intersect import occluded_segment

MAX_VSL_SAMPLES = 101  # halfCone <= pi/2 -> numSamples <= 101
SORT_CHUNKS = 16       # sorted-pixel chunks (own sample bound each)


def _combined_eval_f(out, inc, n, kd, ks, ns):
    return (kd * mu.INV_PI
            + ks * brdf.phong_eval_f(out, inc, n, ns)[..., None])


def _pdf_brdf1(n, wi12, wi10, ks, ns, p_l):
    return (brdf.lambert_pdf_w_nopi(n, wi12) * p_l
            + brdf.phong_pdf_w(n, wi12, wi10, ks, ns) * (1.0 - p_l))


def _pdf_brdf2(rec, wi12, p_l_shading):
    """lighttracing.cu:440-441: lambert term uses the SHADING point's
    pSelectLambert; phong term is unweighted (reference quirk)."""
    return (brdf.lambert_pdf_w_nopi(rec["normal"], -wi12) * p_l_shading
            + brdf.phong_pdf_w(rec["normal"], -wi12, rec["flux_dir"],
                               rec["ks"][None, :], rec["ns"]))


def _num_samples_of(rec_pos, positions, vsl_radius):
    """The reference's adaptive count as f(distance) (lighttracing.cu:
    621-632): numSamples = int(halfCone * 200/pi) + 1."""
    v12 = rec_pos[None, :] - positions
    d2 = jnp.maximum(mu.dot(v12, v12), 1e-20)
    rdratio = vsl_radius / jnp.sqrt(d2)
    half_cone = jnp.where(rdratio >= 1.0, jnp.pi / 2.0,
                          jnp.arcsin(jnp.minimum(rdratio, 1.0)))
    return (half_cone * (200.0 / jnp.pi)).astype(jnp.int32) + 1


def _group_occlusion(scene, screen_pos, screen_normal, screen_stencil,
                     recs, tile_shape):
    """Batched screen-order shadow trace for a GROUP of records.

    recs: (G, ...) record fields.  One record-major trace over G*N
    segments (each packet shares one VSL origin + screen-tile targets —
    the same supremely coherent shape as vpl_gather's, vpl.py:54-64).
    Returns gate (G, N) = pre & ~occluded."""
    g = recs["pos"].shape[0]
    n = screen_pos.shape[0]
    v12 = recs["pos"][:, None, :] - screen_pos[None, :, :]        # (G, N, 3)
    ucos1 = jnp.maximum(jnp.sum(screen_normal[None] * v12, -1), 0.0)
    ucos2 = jnp.maximum(-jnp.sum(recs["normal"][:, None, :] * v12, -1), 0.0)
    d2 = jnp.maximum(jnp.sum(v12 * v12, -1), 1e-20)
    # cos1*cos2 > 1e-9 on NORMALIZED cosines (the reference's cull),
    # written on the unnormalized products: ucos1*ucos2 = cos1*cos2*d2
    pre = ((ucos1 * ucos2) > 1e-9 * d2) \
        & (screen_stencil > 0.0)[None, :] \
        & (((recs["flags"] & FLAG_VPL) != 0))[:, None]
    seg_from = jnp.broadcast_to(recs["pos"][:, None, :],
                                (g, n, 3)).reshape(-1, 3)
    seg_to = jnp.broadcast_to(screen_pos[None], (g, n, 3)).reshape(-1, 3)
    ts = None if tile_shape is None else (g * tile_shape[0],
                                          tile_shape[1])
    occ = occluded_segment(scene.tris, scene.bvh, seg_from, seg_to,
                           eps=1e-4, live=pre.reshape(-1),
                           tile_shape=ts).reshape(g, n)
    return pre & ~occ


def _record_ctx(gbuf, rec, vsl_radius, gate, wi10):
    """Per-(pixel, record) sampling quantities (pixel order = gbuf order)."""
    v12 = rec["pos"][None, :] - gbuf.position
    d2 = jnp.maximum(mu.dot(v12, v12), 1e-20)
    dist = jnp.sqrt(d2)
    nv12 = v12 / dist[:, None]

    rdratio = vsl_radius / dist
    half_cone = jnp.where(rdratio >= 1.0, jnp.pi / 2.0,
                          jnp.arcsin(jnp.minimum(rdratio, 1.0)))
    cos_half = jnp.cos(half_cone)
    solid_angle = 2.0 * jnp.pi * (1.0 - cos_half)
    return {
        "nv12": nv12,
        "gate": gate,
        "half_cone": half_cone,
        "cos_half": cos_half,
        "solid_angle": solid_angle,
        "inv_sa": 1.0 / jnp.maximum(solid_angle, 1e-12),
        "num_samples": (half_cone * (200.0 / jnp.pi)).astype(jnp.int32) + 1,
        "p_l": brdf.p_select_lambert(gbuf.kd, gbuf.ks),
        "black1": brdf.is_black(gbuf.kd, gbuf.ks),
        "wi10": wi10,
        "pos": gbuf.position, "n": gbuf.normal,
        "kd": gbuf.kd, "ks": gbuf.ks, "ns": gbuf.ns,
    }


def _sample_step(rec, ctx, rng_ctx, flux, black2, acc, s):
    """One MC sample of the 3-strategy MIS estimator over a pixel batch.

    rng_ctx = (seed0, seed1, pixel_ids, rec_id): the 8 uniforms of this
    sample are two pcg4d draws on (pixel_id^seed0, rec_id, s^seed1, tag)
    — a pure function of GLOBAL ids, so any pixel permutation / chunking
    draws the same numbers (and the Pallas kernel can reproduce them
    bit-for-bit)."""
    n = ctx["pos"].shape[0]
    nv12 = ctx["nv12"]
    half_cone = ctx["half_cone"]
    cos_half = ctx["cos_half"]
    solid_angle = ctx["solid_angle"]
    inv_sa = ctx["inv_sa"]
    p_l = ctx["p_l"]
    black1 = ctx["black1"]
    wi10 = ctx["wi10"]
    num_samples = ctx["num_samples"]

    seed0, seed1, pixel_ids, rec_id = rng_ctx
    c0 = pixel_ids.astype(jnp.uint32) ^ seed0
    c1 = jnp.uint32(rec_id)
    c2 = jnp.uint32(s) ^ seed1
    u0, u1, u2, u3 = rng.uniform4(c0, c1, c2, jnp.uint32(0))
    u4, u5, u6, u7 = rng.uniform4(c0, c1, c2, jnp.uint32(1))

    # ---- strategy 1: uniform cone (lighttracing.cu:395-446) ----
    u_cone = jnp.stack([u0, u1], axis=-1)
    local = mu.square_to_solid_angle(u_cone, half_cone)
    w12c = mu.normalize(mu.from_local(local, nv12))
    cc = (jnp.maximum(mu.dot(ctx["n"], w12c), 0.0)
          * jnp.maximum(-mu.dot(rec["normal"], w12c), 0.0))
    f2 = _combined_eval_f(-w12c, rec["flux_dir"], rec["normal"],
                          rec["kd"][None, :], rec["ks"][None, :], rec["ns"])
    f1 = _combined_eval_f(wi10, w12c, ctx["n"], ctx["kd"], ctx["ks"],
                          ctx["ns"])
    pdf_b1 = _pdf_brdf1(ctx["n"], w12c, wi10, ctx["ks"], ctx["ns"], p_l)
    pdf_b2 = _pdf_brdf2(rec, w12c, p_l)
    w_cone = inv_sa / jnp.maximum(pdf_b1 + pdf_b2 + inv_sa, 1e-20)
    c_cone = flux * (cc * solid_angle)[:, None] * f1 * f2
    c_cone = jnp.where(((cc > 1e-9) & ~black1)[:, None],
                       w_cone[:, None] * c_cone, 0.0)

    # ---- strategy 2: eye-side BRDF sampling (:448-521) ----
    u_sel1 = u2
    u_b1 = jnp.stack([u3, u4], axis=-1)
    w12b, _, lobe_w1, _ = brdf.sample_combined(
        jnp.minimum(u_sel1, 0.999999), u_b1, wi10, ctx["n"],
        ctx["n"], ctx["kd"], ctx["ks"], ctx["ns"])
    in_cone1 = mu.dot(w12b, nv12) > cos_half
    cos1b = jnp.maximum(mu.dot(ctx["n"], w12b), 0.0)
    cos2b = jnp.maximum(-mu.dot(rec["normal"], w12b), 0.0)
    f2b = _combined_eval_f(-w12b, rec["flux_dir"], rec["normal"],
                           rec["kd"][None, :], rec["ks"][None, :], rec["ns"])
    pdf_b1b = _pdf_brdf1(ctx["n"], w12b, wi10, ctx["ks"], ctx["ns"], p_l)
    pdf_b2b = _pdf_brdf2(rec, w12b, p_l)
    w_b1 = pdf_b1b / jnp.maximum(pdf_b1b + pdf_b2b + inv_sa, 1e-20)
    c_b1 = flux * cos2b[:, None] * lobe_w1 * f2b
    c_b1 = jnp.where((in_cone1 & (cos1b > 1e-9) & ~black1)[:, None],
                     w_b1[:, None] * c_b1, 0.0)

    # ---- strategy 3: light-side BRDF sampling (:523-594) ----
    u_sel2 = u5
    u_b2 = jnp.stack([u6, u7], axis=-1)
    rec_kd = jnp.broadcast_to(rec["kd"], (n, 3))
    rec_ks = jnp.broadcast_to(rec["ks"], (n, 3))
    rec_n = jnp.broadcast_to(rec["normal"], (n, 3))
    rec_in = jnp.broadcast_to(rec["flux_dir"], (n, 3))
    w21, _, lobe_w2, _ = brdf.sample_combined(
        jnp.minimum(u_sel2, 0.999999), u_b2, rec_in, rec_n, rec_n,
        rec_kd, rec_ks, rec["ns"])
    in_cone2 = -mu.dot(w21, nv12) > cos_half
    cos2c = jnp.maximum(mu.dot(rec["normal"], w21), 0.0)
    f1c = _combined_eval_f(wi10, -w21, ctx["n"], ctx["kd"], ctx["ks"],
                           ctx["ns"])
    pdf_b1c = _pdf_brdf1(ctx["n"], -w21, wi10, ctx["ks"], ctx["ns"], p_l)
    # sampleBrdf2's weight block uses the shading-point pSelect again
    # and unweighted phong, same quirk (:584-589)
    pdf_b2c = (brdf.lambert_pdf_w_nopi(rec["normal"], w21) * p_l
               + brdf.phong_pdf_w(rec["normal"], w21, rec["flux_dir"],
                                  rec_ks, rec["ns"]))
    w_b2 = pdf_b2c / jnp.maximum(pdf_b1c + pdf_b2c + inv_sa, 1e-20)
    c_b2 = flux * cos2c[:, None] * lobe_w2 * f1c
    c_b2 = jnp.where((in_cone2 & (cos2c > 1e-8) & ~black1 & ~black2)[:, None],
                     w_b2[:, None] * c_b2, 0.0)

    use = (s < num_samples)[:, None]
    return acc + jnp.where(use, c_cone + c_b1 + c_b2, 0.0)


def _sample_loop(rec, ctx, rng_ctx, flux, black2):
    """Sample loop to THIS batch's max needed count; returns (n, 3)."""
    n = ctx["pos"].shape[0]
    s_needed = jnp.minimum(
        jnp.max(jnp.where(ctx["gate"], ctx["num_samples"], 0)),
        MAX_VSL_SAMPLES)

    def cond(carry):
        s, _ = carry
        return s < s_needed

    def body(carry):
        s, acc = carry
        return s + 1, _sample_step(rec, ctx, rng_ctx, flux, black2, acc, s)

    acc0 = jnp.zeros((n, 3), jnp.float32)
    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))
    out = acc / jnp.maximum(ctx["num_samples"].astype(jnp.float32),
                            1.0)[:, None]
    return jnp.where(ctx["gate"][:, None], out, 0.0)


def _sample_record(gbuf, rec, gate, rng_ctx, vsl_radius, vsl_inv_pi_r2,
                   wi10, chunks: int = 1):
    """Sampling of one VSL record vs all pixels (gbuf order): (N, 3).

    rng_ctx = (seed0, seed1, pixel_ids, rec_id) — draws are counter-based
    on the GLOBAL pixel id, so any pixel permutation/sharding draws the
    same numbers.
    chunks > 1: pixels are processed in `chunks` equal slices, each with its
    OWN adaptive sample bound (callers pass difficulty-sorted pixels)."""
    n = gbuf.position.shape[0]
    ctx = _record_ctx(gbuf, rec, vsl_radius, gate, wi10)
    flux = rec["flux"][None, :] * vsl_inv_pi_r2
    black2 = brdf.is_black(rec["kd"][None, :], rec["ks"][None, :])
    seed0, seed1, pixel_ids, rec_id = rng_ctx

    if chunks <= 1 or n % chunks != 0:
        return _sample_loop(rec, ctx, rng_ctx, flux, black2)

    cn = n // chunks

    def chunk_body(acc, c):
        start = c * cn

        def dsl(v):
            return jax.lax.dynamic_slice_in_dim(v, start, cn, axis=0)

        ctx_c = {k: dsl(v) for k, v in ctx.items()}
        rng_c = (seed0, seed1, dsl(pixel_ids), rec_id)
        out_c = _sample_loop(rec, ctx_c, rng_c, flux, black2)
        return jax.lax.dynamic_update_slice_in_dim(acc, out_c, start,
                                                   axis=0), None

    acc0 = jnp.zeros((n, 3), jnp.float32)
    acc, _ = jax.lax.scan(chunk_body, acc0,
                          jnp.arange(chunks, dtype=jnp.int32))
    return acc


def _records_of(pm: PhotonMap, num_vsl_paths: int):
    flat = pm.slice_paths(num_vsl_paths).flat()
    return {
        "pos": flat.pos, "normal": flat.normal, "flux": flat.flux,
        "flux_dir": flat.flux_dir, "kd": flat.kd, "ks": flat.ks,
        "ns": flat.ns, "p_select": flat.p_select, "flags": flat.flags,
    }


@partial(jax.jit, static_argnames=("tile_shape", "chunks", "sorted_px",
                                   "kernel_rows"))
def _vsl_scan(scene: SceneData, gbuf: GBuffer, screen, perm,
              records_grouped, key, i0, vsl_radius, vsl_inv_pi_r2, wi10,
              pixel_ids, acc0, tile_shape=None, chunks: int = 1,
              sorted_px: bool = False, kernel_rows: int = 0):
    """Scan over GROUPS of records: one record-major batched shadow trace
    per group (screen order, tile-shaped — vpl_gather's coherent shape),
    then the sampling loops per record over the (possibly sorted) pixels.

    gbuf/wi10/pixel_ids are in sampling order; `screen` = (pos, normal,
    stencil) in screen order with `perm` mapping screen -> sampling order
    (both None-equivalent when sorted_px is False, where gbuf IS screen
    order).

    kernel_rows > 0: run the whole group's sample loops in the Pallas
    kernel (vsl_kernel.vsl_sample_group, block = kernel_rows*128 pixels)
    instead of the XLA per-record loop.  Same counters -> same draws;
    outputs agree to float tolerance (tests/test_vsl_kernel.py)."""
    screen_pos, screen_normal, screen_stencil = screen
    seed0, seed1 = rng.seeds_from_key(key)
    group = records_grouped["pos"].shape[1]
    if kernel_rows:
        from evplp_tpu.integrators import vsl_kernel
        pix = vsl_kernel.pack_pixels(gbuf.position, gbuf.normal, gbuf.kd,
                                     gbuf.ks, gbuf.ns, wi10)
        pid_planes = pixel_ids.reshape(-1, 128)
        flts = jnp.asarray([vsl_radius], jnp.float32)

    def group_step(carry, recs):
        acc, i = carry
        gates = _group_occlusion(scene, screen_pos, screen_normal,
                                 screen_stencil, recs, tile_shape)
        if sorted_px:
            gates = gates[:, perm]

        if kernel_rows:
            shifts = jnp.arange(group, dtype=jnp.int32)[:, None]
            mask = jnp.sum(gates.astype(jnp.int32) << shifts,
                           axis=0, dtype=jnp.int32)
            table = vsl_kernel.pack_records(recs, vsl_inv_pi_r2)
            cosh, cnts = vsl_kernel.ctx_planes(gbuf.position, recs["pos"],
                                               vsl_radius)
            ints = jnp.stack([seed0.astype(jnp.int32),
                              seed1.astype(jnp.int32), i])
            out = vsl_kernel.vsl_sample_group(
                pix, pid_planes, mask.reshape(-1, 128), cosh, cnts,
                table, ints, flts, group=group, rows=kernel_rows)
            contrib = jnp.stack(
                [out[c].reshape(-1) for c in range(3)], axis=-1)
            return (acc + contrib, i + group), None

        def rec_step(c2, xs):
            acc2, i2 = c2
            rec, gate = xs
            rng_ctx = (seed0, seed1, pixel_ids, i2)
            contrib = _sample_record(gbuf, rec, gate, rng_ctx, vsl_radius,
                                     vsl_inv_pi_r2, wi10, chunks=chunks)
            return (acc2 + contrib, i2 + 1), None

        (acc, i), _ = jax.lax.scan(rec_step, (acc, i), (recs, gates))
        return (acc, i), None

    (acc, _), _ = jax.lax.scan(group_step, (acc0, i0), records_grouped)
    return acc


@partial(jax.jit, static_argnames=())
def _difficulty_key(records, positions, stencil, vsl_radius):
    """Aggregate per-pixel cost proxy: sum of adaptive sample counts over
    all VPL-usable records (occlusion ignored — it only lowers a chunk's
    bound further)."""
    def step(acc, rec):
        ns = _num_samples_of(rec["pos"], positions, vsl_radius)
        usable = (rec["flags"] & FLAG_VPL) != 0
        return acc + jnp.where(usable, ns, 0), None

    acc0 = jnp.zeros(positions.shape[0], jnp.int32)
    key, _ = jax.lax.scan(step, acc0, records)
    return jnp.where(stencil > 0.0, key, 0)


def _permute_gbuf(gbuf: GBuffer, perm):
    return jax.tree_util.tree_map(lambda v: v[perm], gbuf)


# Records dispatched per device program on the single-device path.  One
# program over all 120 reference-scale records can run tens of seconds
# and trips the remote runtime's execution watchdog; chunked dispatch
# keeps programs short.
VSL_RECORD_CHUNK = 16
# Records per dispatch on the Pallas-kernel path.  The 16-record chunk
# exists for the XLA sample loop, whose per-record programs can run
# tens of seconds (watchdog).  With the kernel a GROUP costs ~20 ms, so
# 16-record chunks mean 25 dispatches/frame at protocol scale — and the
# remote-tunnel RPC overhead of those dispatches was measured at ~25% of
# the VSL frame (NOTES round 5).  128 records/dispatch keeps programs
# ~0.3 s (far under the watchdog) with 4 dispatches/frame.
VSL_RECORD_CHUNK_KERNEL = 128
TRACE_GROUP = 8          # records per batched record-major shadow trace
KERNEL_ROWS = 32         # Pallas sample-kernel block = KERNEL_ROWS*128 px


def _use_sample_kernel() -> bool:
    """Pallas sample-loop kernel: on for TPU, off for CPU (tests/XLA
    fallback); EVPLP_VSL_KERNEL=0/1 overrides."""
    import os
    env = os.environ.get("EVPLP_VSL_KERNEL")
    if env is not None:
        return env not in ("0", "false", "")
    import jax as _jax
    return _jax.default_backend() not in ("cpu",)


def vsl_gather(scene: SceneData, gbuf: GBuffer, pm: PhotonMap, key,
               vsl_radius, num_vsl_paths: int,
               pixel_offset=0, tile_shape=None,
               record_chunk: int | None | str = "auto",
               pixel_sort: bool = True) -> jnp.ndarray:
    """VSL pass over the first num_vsl_paths paths (splatSplotch:689-722).

    pixel_offset: global id of gbuf's first pixel (row-sharded runs).
    record_chunk: None -> one fused scan (required inside shard_map);
    an int -> python-driven chunks of that many records per dispatch;
    "auto" -> VSL_RECORD_CHUNK_KERNEL on the Pallas-kernel path, else
    VSL_RECORD_CHUNK (EVPLP_VSL_CHUNK overrides both).
    pixel_sort: difficulty-sort pixels so each sorted chunk's sample loop
    runs to its own bound (exact same estimator; ~an order of magnitude
    faster at protocol scale).  Shadow traces always run in SCREEN order
    (record-major tile-shaped batches of TRACE_GROUP records — the
    vpl_gather shape); only the sampling runs over sorted pixels."""
    records = _records_of(pm, num_vsl_paths)
    cam = jnp.asarray(scene.camera.origin, jnp.float32)
    vsl_inv_pi_r2 = mu.INV_PI / (vsl_radius * vsl_radius)
    pixel_ids = pixel_offset + jnp.arange(gbuf.position.shape[0],
                                          dtype=jnp.int32)
    n = gbuf.position.shape[0]
    m = records["pos"].shape[0]
    screen = (gbuf.position, gbuf.normal, gbuf.stencil)

    # Pallas sample-loop kernel: needs 128-lane plane layout and a row
    # count divisible by the block (TPU block rows must be 8-aligned).
    # Its per-block (KERNEL_ROWS*128 px) sample bounds are finer than the
    # sorted chunks', and screen order is already spatially coherent, so
    # the difficulty sort's permutation gathers are a net LOSS with the
    # kernel (measured: 2.47 s sorted vs 1.58 s unsorted at protocol
    # scale) — skip it.
    kernel_rows = 0
    if _use_sample_kernel() and n % (KERNEL_ROWS * 128) == 0:
        kernel_rows = KERNEL_ROWS

    chunks = 1
    inv = None
    perm = jnp.zeros((0,), jnp.int32)
    sorted_px = False
    if (pixel_sort and not kernel_rows and n % SORT_CHUNKS == 0
            and n >= SORT_CHUNKS * 64):
        diff = _difficulty_key(records, gbuf.position, gbuf.stencil,
                               vsl_radius)
        perm = jnp.argsort(-diff, stable=True)
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(n, dtype=perm.dtype))
        gbuf = _permute_gbuf(gbuf, perm)
        pixel_ids = pixel_ids[perm]
        chunks = SORT_CHUNKS
        sorted_px = True

    wi10 = mu.normalize(cam[None, :] - gbuf.position)
    acc = jnp.zeros_like(gbuf.position)

    # pad the record count to a trace-group multiple (flags=0 rows gate to
    # zero and their sample loops run zero steps)
    pad = (-m) % TRACE_GROUP
    if pad:
        records = {k: jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
            for k, v in records.items()}
    mg = (m + pad) // TRACE_GROUP
    grouped = {k: v.reshape((mg, TRACE_GROUP) + v.shape[1:])
               for k, v in records.items()}

    if record_chunk == "auto":
        import os
        env = os.environ.get("EVPLP_VSL_CHUNK")
        if env:
            record_chunk = int(env)
        else:
            record_chunk = (VSL_RECORD_CHUNK_KERNEL if kernel_rows
                            else VSL_RECORD_CHUNK)
    if record_chunk is None or record_chunk >= m + pad:
        gstep = mg
    else:
        gstep = max(1, record_chunk // TRACE_GROUP)
    for g in range(0, mg, gstep):
        part = {k: v[g:g + gstep] for k, v in grouped.items()}
        acc = _vsl_scan(scene, gbuf, screen, perm, part, key,
                        jnp.int32(g * TRACE_GROUP), vsl_radius,
                        vsl_inv_pi_r2, wi10, pixel_ids, acc,
                        tile_shape=tile_shape, chunks=chunks,
                        sorted_px=sorted_px, kernel_rows=kernel_rows)
    if inv is not None:
        acc = acc[inv]
    return acc / float(num_vsl_paths)
