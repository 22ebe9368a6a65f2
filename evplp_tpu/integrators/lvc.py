"""LVC (light vertex cache) VPL gather (reference: lvclighttracing.cu
`splatColor`:349-387 + rtcomphoton/rtlvccomphoton.h).

Difference from the plain VPL gather: each *pixel* draws a random offset
into the full light-path pool and gathers numVplLightPaths consecutive
paths (mod numLightPaths), instead of every pixel using the same first
numVplLightPaths paths.  The reference notes it is slower on GPU due to
non-coalesced reads (rtlvccomphoton.h:28-30); on TPU it becomes a batched
gather per scan step.
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


def _lvc_pre(gbuf, rec):
    """Pre-cull mask for a per-pixel record set (backfacing / sky /
    unusable pairs are never traced)."""
    v12 = rec["pos"] - gbuf.position
    ucos1 = jnp.maximum(mu.dot(gbuf.normal, v12), 0.0)
    ucos2 = jnp.maximum(-mu.dot(rec["normal"], v12), 0.0)
    usable = (rec["flags"] & FLAG_VPL) != 0
    return ((ucos1 * ucos2) > 0.0) & (gbuf.stencil > 0.0) & usable


def _lvc_contribution(scene, gbuf, rec, mis_mode, pdf_mc, clamping_value,
                      wi10, tile_shape=None, pre=None, occ=None):
    """vplSplat math with PER-PIXEL records (all rec fields are (N, ...)).

    pre/occ: optional precomputed cull + occlusion; traced here when
    absent."""
    v12 = rec["pos"] - gbuf.position
    ucos1 = jnp.maximum(mu.dot(gbuf.normal, v12), 0.0)
    ucos2 = jnp.maximum(-mu.dot(rec["normal"], v12), 0.0)

    if pre is None:
        pre = _lvc_pre(gbuf, rec)
    if occ is None:
        occ = occluded_segment(scene.tris, scene.bvh, rec["pos"],
                               gbuf.position, eps=1e-4, live=pre,
                               tile_shape=tile_shape)

    d2 = jnp.maximum(mu.dot(v12, v12), 1e-20)
    wi12 = v12 * jax.lax.rsqrt(d2)[:, None]
    f2 = (rec["kd"] * mu.INV_PI
          + rec["ks"] * brdf.phong_eval_f(-wi12, rec["flux_dir"],
                                          rec["normal"], rec["ns"])[:, None])
    f1 = (gbuf.kd * mu.INV_PI
          + gbuf.ks * brdf.phong_eval_f(wi10, wi12, gbuf.normal,
                                        gbuf.ns)[:, None])
    g21 = ucos1 * ucos2 / (d2 * d2)
    flux = rec["flux"]

    if mis_mode == 0:
        out = flux * f1 * f2 * g21[:, None]
    elif mis_mode in (1, 2, 3):
        pdf_de = (
            brdf.lambert_pdf_a(rec["normal"], gbuf.normal, -v12) * rec["p_select"]
            + brdf.phong_pdf_a(rec["normal"], gbuf.normal, -v12,
                               rec["flux_dir"], rec["ks"], rec["ns"])
            * (1.0 - rec["p_select"])
        )
        h = {1: mu.balance_heuristic, 2: mu.max_heuristic,
             3: mu.power_heuristic2}[mis_mode]
        out = h(pdf_mc, pdf_de)[:, None] * flux * f1 * f2 * g21[:, None]
    elif mis_mode == 4:
        out = flux * jnp.minimum(g21, clamping_value)[:, None] * f1 * f2
    elif mis_mode == 5:
        out = flux * jnp.minimum(g21[:, None] * f1 * f2, clamping_value)
    else:
        raise ValueError(f"unknown misMode {mis_mode}")

    keep = pre & ~occ
    return jnp.where(keep[:, None], out, 0.0)


def lvc_offsets(key, n: int, num_paths: int) -> jnp.ndarray:
    """Per-pixel random window starts into the path pool
    (lvclighttracing.cu:366-368)."""
    u = jnp.minimum(jax.random.uniform(key, (n,)), 0.999999)
    return (u * num_paths).astype(jnp.int32)


@partial(jax.jit, static_argnames=("mis_mode", "num_vpl_paths", "tile_shape"))
def lvc_gather(scene: SceneData, gbuf: GBuffer, pm: PhotonMap, key,
               mis_mode: int, pdf_mc, clamping_value,
               num_vpl_paths: int, offsets=None,
               tile_shape=None) -> jnp.ndarray:
    """Per-pixel randomized light-subpath selection.

    offsets: precomputed per-pixel window starts — passed by the sharded
    frame, which draws them over the full image and slices its rows so the
    selection is identical to the single-device run.
    """
    n = gbuf.position.shape[0]
    num_paths = pm.num_paths
    b = pm.num_records
    cam = jnp.asarray(scene.camera.origin, jnp.float32)
    wi10 = mu.normalize(cam[None, :] - gbuf.position)

    offset = lvc_offsets(key, n, num_paths) if offsets is None else offsets

    flat = pm.flat()
    fields = {
        "pos": flat.pos, "normal": flat.normal, "flux": flat.flux,
        "flux_dir": flat.flux_dir, "kd": flat.kd, "ks": flat.ks,
        "ns": flat.ns, "p_select": flat.p_select, "flags": flat.flags,
    }

    def step(acc, ij):
        i, j = ij
        path = (offset + i) % num_paths              # (N,)
        ridx = path * b + j
        rec = {k: v[ridx] for k, v in fields.items()}
        return acc + _lvc_contribution(scene, gbuf, rec, mis_mode, pdf_mc,
                                       clamping_value, wi10,
                                       tile_shape=tile_shape), None

    ii = jnp.repeat(jnp.arange(num_vpl_paths, dtype=jnp.int32), b)
    jj = jnp.tile(jnp.arange(b, dtype=jnp.int32), num_vpl_paths)
    acc0 = jnp.zeros_like(gbuf.position)
    acc, _ = jax.lax.scan(step, acc0, (ii, jj))
    return acc / float(num_vpl_paths)
