"""VPL gather ("splat") — the hottest pass (reference: lighttracing.cu
`splatColor`:348-379 + `vplSplat`:275-346; ~110M shadow rays/frame at
reference settings).

Structure: the records are processed in CHUNKS — each lax.scan step
evaluates a block of records against every pixel as one dense
(pixels x records) VPU computation plus one batched shadow-segment
traversal over pixels*chunk rays.  Fat steps keep the TPU busy instead of
launch-overhead-bound (one-record-at-a-time was ~20x slower).

All 6 MIS/clamping modes:

  0 one       unweighted VPL (instant radiosity)
  1 balance   vs the photon-mapping density pdfMc
  2 max       |
  3 power2    |
  4 geometryClamp      min(G, b)            — Kollig-Keller clamping
  5 geometryBrdfClamp  min(G*f1*f2, b)      — local clamping
Modes 4/5 are the clamped estimators whose missing energy the photon splat
adds back.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from evplp_tpu.core import brdf
from evplp_tpu.core import mathutil as mu
from evplp_tpu.integrators.gbuffer import GBuffer
from evplp_tpu.integrators.light_trace import FLAG_VPL, PhotonMap
from evplp_tpu.scene.scene import SceneData
from evplp_tpu.trace.intersect import occluded_segment


def vpl_chunk_contribution(scene: SceneData, gbuf: GBuffer, rec: dict,
                           mis_mode: int, pdf_mc, clamping_value, wi10,
                           tile_shape=None):
    """Contribution of a chunk of C records to every pixel: (N, 3).

    rec fields are (C, 3)/(C,) arrays; pixel axis broadcasts in front.
    """
    n = gbuf.position.shape[0]
    c = rec["pos"].shape[0]

    pos_px = gbuf.position[:, None, :]          # (N, 1, 3)
    n_px = gbuf.normal[:, None, :]
    v12 = rec["pos"][None, :, :] - pos_px       # (N, C, 3)
    ucos1 = jnp.maximum(mu.dot(n_px, v12), 0.0)
    ucos2 = jnp.maximum(-mu.dot(rec["normal"][None, :, :], v12), 0.0)
    cull = (ucos1 * ucos2) > 0.0                # (N, C)

    # one batched shadow traversal for all (record, pixel) segments —
    # RECORD-major so each ray packet shares one origin (one VPL), and
    # pre-culled pairs (backfacing / unusable / sky) are never traced
    usable = ((rec["flags"] & FLAG_VPL) != 0)[None, :]
    pretest = cull & (gbuf.stencil > 0.0)[:, None] & usable       # (N, C)
    seg_from = jnp.broadcast_to(rec["pos"][:, None, :],
                                (c, n, 3)).reshape(-1, 3)
    seg_to = jnp.broadcast_to(gbuf.position[None, :, :],
                              (c, n, 3)).reshape(-1, 3)
    ts = None if tile_shape is None else (c * tile_shape[0],
                                          tile_shape[1])
    occ = occluded_segment(scene.tris, scene.bvh, seg_from, seg_to,
                           eps=1e-4, live=pretest.T.reshape(-1),
                           tile_shape=ts).reshape(c, n).T

    d2 = jnp.maximum(mu.dot(v12, v12), 1e-20)
    wi12 = v12 * jax.lax.rsqrt(d2)[..., None]

    # dual BRDF evals (lighttracing.cu:302-306); Lambert kernel is the
    # unconditional 1/pi (rtmaterial.cuh:73-76)
    f2 = (rec["kd"][None, :, :] * mu.INV_PI
          + rec["ks"][None, :, :]
          * brdf.phong_eval_f(-wi12, rec["flux_dir"][None, :, :],
                              rec["normal"][None, :, :],
                              rec["ns"][None, :])[..., None])
    f1 = (gbuf.kd[:, None, :] * mu.INV_PI
          + gbuf.ks[:, None, :]
          * brdf.phong_eval_f(wi10[:, None, :], wi12, n_px,
                              gbuf.ns[:, None])[..., None])

    g21 = ucos1 * ucos2 / (d2 * d2)
    flux = rec["flux"][None, :, :]

    if mis_mode == 0:
        out = flux * f1 * f2 * g21[..., None]
    elif mis_mode in (1, 2, 3):
        pdf_de = (
            brdf.lambert_pdf_a(rec["normal"][None, :, :], n_px, -v12)
            * rec["p_select"][None, :]
            + brdf.phong_pdf_a(rec["normal"][None, :, :], n_px, -v12,
                               rec["flux_dir"][None, :, :],
                               rec["ks"][None, :, :], rec["ns"][None, :])
            * (1.0 - rec["p_select"][None, :])
        )
        h = {1: mu.balance_heuristic, 2: mu.max_heuristic,
             3: mu.power_heuristic2}[mis_mode]
        out = h(pdf_mc, pdf_de)[..., None] * flux * f1 * f2 * g21[..., None]
    elif mis_mode == 4:
        out = flux * jnp.minimum(g21, clamping_value)[..., None] * f1 * f2
    elif mis_mode == 5:
        out = flux * jnp.minimum(g21[..., None] * f1 * f2, clamping_value)
    else:
        raise ValueError(f"unknown misMode {mis_mode}")

    keep = pretest & ~occ
    return jnp.sum(jnp.where(keep[..., None], out, 0.0), axis=1)


@partial(jax.jit, static_argnames=("mis_mode", "num_vpl_paths", "chunk",
                                   "tile_shape"))
def vpl_gather(scene: SceneData, gbuf: GBuffer, pm: PhotonMap,
               mis_mode: int, pdf_mc, clamping_value,
               num_vpl_paths: int, chunk: int = 128,
               tile_shape=None) -> jnp.ndarray:
    """Gather the first num_vpl_paths light paths' records over all pixels.

    Returns the per-frame VPL image (N, 3), already divided by
    num_vpl_paths (lighttracing.cu:378).  chunk caps the records per scan
    step; it is clipped to the (8-rounded) record count so small gathers
    don't pad up (at reference settings 120 records run as one fat step —
    measured 20% faster than 2x64).  tile_shape=(H, W): gbuf pixel grid,
    enables screen-tile ray packets for the shadow segments.
    """
    flat = pm.slice_paths(num_vpl_paths).flat()
    chunk = min(chunk, -(-flat.pos.shape[0] // 8) * 8)
    cam = jnp.asarray(scene.camera.origin, jnp.float32)
    wi10 = mu.normalize(cam[None, :] - gbuf.position)

    records = {
        "pos": flat.pos, "normal": flat.normal, "flux": flat.flux,
        "flux_dir": flat.flux_dir, "kd": flat.kd, "ks": flat.ks,
        "ns": flat.ns, "p_select": flat.p_select, "flags": flat.flags,
    }
    v = flat.pos.shape[0]
    pad = (-v) % chunk
    if pad:
        records = {k: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
                   for k, x in records.items()}
    n_chunks = (v + pad) // chunk
    records = {k: x.reshape((n_chunks, chunk) + x.shape[1:])
               for k, x in records.items()}

    def step(acc, rec):
        return acc + vpl_chunk_contribution(
            scene, gbuf, rec, mis_mode, pdf_mc, clamping_value, wi10,
            tile_shape=tile_shape), None

    acc0 = jnp.zeros_like(gbuf.position)
    acc, _ = jax.lax.scan(step, acc0, records)
    return acc / float(num_vpl_paths)
