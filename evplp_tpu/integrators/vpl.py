"""VPL gather ("splat") — the hottest pass (reference: lighttracing.cu
`splatColor`:348-379 + `vplSplat`:275-346; ~110M shadow rays/frame at
reference settings).

Structure: lax.scan over the VPL records; each step evaluates one record
against every pixel (dense VPU math) and one batched shadow-segment
traversal.  All 6 MIS/clamping modes:

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


def vpl_record_contribution(scene: SceneData, gbuf: GBuffer, rec: dict,
                            mis_mode: int, pdf_mc, clamping_value,
                            wi10):
    """Contribution of ONE record to every pixel: (N, 3).

    rec fields are single-record (3,)/() arrays; wi10 = unit dirs to the eye.
    """
    v12 = rec["pos"][None, :] - gbuf.position
    ucos1 = jnp.maximum(mu.dot(gbuf.normal, v12), 0.0)
    ucos2 = jnp.maximum(-mu.dot(rec["normal"], v12), 0.0)
    cull = (ucos1 * ucos2) > 0.0

    occ = occluded_segment(
        scene.tris, scene.bvh,
        jnp.broadcast_to(rec["pos"], gbuf.position.shape), gbuf.position,
        eps=1e-4)

    d2 = jnp.maximum(mu.dot(v12, v12), 1e-20)
    wi12 = v12 * jax.lax.rsqrt(d2)[:, None]

    # dual BRDF evals (lighttracing.cu:302-306); Lambert kernel is the
    # unconditional 1/pi (rtmaterial.cuh:73-76)
    f2 = (rec["kd"] * mu.INV_PI
          + rec["ks"] * brdf.phong_eval_f(-wi12, rec["flux_dir"],
                                          rec["normal"], rec["ns"])[:, None])
    f1 = (gbuf.kd * mu.INV_PI
          + gbuf.ks * brdf.phong_eval_f(wi10, wi12, gbuf.normal,
                                        gbuf.ns)[:, None])

    g21 = ucos1 * ucos2 / (d2 * d2)
    flux = rec["flux"][None, :]

    if mis_mode == 0:
        out = flux * f1 * f2 * g21[:, None]
    elif mis_mode in (1, 2, 3):
        pdf_de = (
            brdf.lambert_pdf_a(rec["normal"], gbuf.normal, -v12) * rec["p_select"]
            + brdf.phong_pdf_a(rec["normal"], gbuf.normal, -v12, rec["flux_dir"],
                               rec["ks"][None, :], rec["ns"])
            * (1.0 - rec["p_select"])
        )
        if mis_mode == 1:
            w = mu.balance_heuristic(pdf_mc, pdf_de)
        elif mis_mode == 2:
            w = mu.max_heuristic(pdf_mc, pdf_de)
        else:
            w = mu.power_heuristic2(pdf_mc, pdf_de)
        out = w[:, None] * flux * f1 * f2 * g21[:, None]
    elif mis_mode == 4:
        out = flux * jnp.minimum(g21, clamping_value)[:, None] * f1 * f2
    elif mis_mode == 5:
        out = flux * jnp.minimum(g21[:, None] * f1 * f2, clamping_value)
    else:
        raise ValueError(f"unknown misMode {mis_mode}")

    usable = (rec["flags"] & FLAG_VPL) != 0
    keep = cull & ~occ & (gbuf.stencil > 0.0) & usable
    return jnp.where(keep[:, None], out, 0.0)


@partial(jax.jit, static_argnames=("mis_mode", "num_vpl_paths"))
def vpl_gather(scene: SceneData, gbuf: GBuffer, pm: PhotonMap,
               mis_mode: int, pdf_mc, clamping_value,
               num_vpl_paths: int) -> jnp.ndarray:
    """Gather the first num_vpl_paths light paths' records over all pixels.

    Returns the per-frame VPL image (N, 3), already divided by
    num_vpl_paths (lighttracing.cu:378).
    """
    flat = pm.slice_paths(num_vpl_paths).flat()
    cam = jnp.asarray(scene.camera.origin, jnp.float32)
    wi10 = mu.normalize(cam[None, :] - gbuf.position)

    records = {
        "pos": flat.pos, "normal": flat.normal, "flux": flat.flux,
        "flux_dir": flat.flux_dir, "kd": flat.kd, "ks": flat.ks,
        "ns": flat.ns, "p_select": flat.p_select, "flags": flat.flags,
    }

    def step(acc, rec):
        return acc + vpl_record_contribution(
            scene, gbuf, rec, mis_mode, pdf_mc, clamping_value, wi10), None

    acc0 = jnp.zeros_like(gbuf.position)
    acc, _ = jax.lax.scan(step, acc0, records)
    return acc / float(num_vpl_paths)
