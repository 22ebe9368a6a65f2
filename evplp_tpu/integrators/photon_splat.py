"""Image-space photon splatting — the EVPLP energy-compensation pass.

Reference: instanced-icosphere rasterization with additive blending
(shaders/photonsplatinstanced.{vert,geom,frag}, host rtcomphoton.h:789-837).
The fragment shader is a KDE with a 1/(pi r^2) disc kernel and per-MIS-mode
weights; modes 4/5 add back exactly the energy the VPL pass clamped away.

TPU-native design: no rasterizer, no scatter-add serialization — photons are
*binned to 2-D screen tiles by sorting*, each tile keeps a capped dense list,
and the splat becomes a dense (tile-pixels x tile-photons) VPU computation
with a masked sum.  The depth test vs the G-buffer is subsumed by the 3-D
distance check (a shading point within r of the photon always passes the
sphere's front-face depth test).

Photon record j pairs with its predecessor j-1 on the same path for the
incident pdf and BRDF (photonsplatinstanced.frag:163-189).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from evplp_tpu.core import brdf
from evplp_tpu.core import mathutil as mu
from evplp_tpu.integrators.gbuffer import GBuffer
from evplp_tpu.integrators.light_trace import FLAG_PHOTON, PhotonMap
from evplp_tpu.scene.scene import SceneData


def _photon_major(pm: PhotonMap, mis_mode: int, pdf_mc):
    """Per-photon (pixel-independent) quantities, flattened over (P, B-1).

    Pairs record b (photon) with record b-1 (previous vertex).
    """
    cur = jax.tree_util.tree_map(lambda x: x[:, 1:], pm)
    prev = jax.tree_util.tree_map(lambda x: x[:, :-1], pm)

    def f(x):
        return x.reshape((-1,) + x.shape[2:])

    pos = f(cur.pos)
    flux = f(cur.flux)
    n1 = f(cur.normal)
    usable = (f(cur.flags) & FLAG_PHOTON) != 0

    prev_pos = f(prev.pos)
    prev_n = f(prev.normal)
    prev_dir = f(prev.flux_dir)
    prev_kd = f(prev.kd)
    prev_ks = f(prev.ks)
    prev_ns = f(prev.ns)
    prev_ps = f(prev.p_select)

    v12 = prev_pos - pos                      # toward the previous vertex
    d2 = jnp.maximum(mu.dot(v12, v12), 1e-20)
    w12 = v12 * jax.lax.rsqrt(d2)[:, None]

    # incident pdf mixture at the previous vertex (frag:184-189)
    mix_pdf_w = (
        brdf.lambert_pdf_w(prev_n, -w12) * prev_ps
        + brdf.phong_pdf_w(prev_n, -w12, prev_dir, prev_ks, prev_ns)
        * (1.0 - prev_ps)
    )
    mix_pdf_a = mix_pdf_w * jnp.maximum(mu.dot(n1, w12), 0.0) / d2

    # previous-vertex BRDF toward the photon (frag:182)
    brdf2 = (
        prev_kd * brdf.lambert_eval_checked(-w12, prev_dir, prev_n)[:, None]
        + brdf.phong_eval(-w12, prev_dir, prev_n, prev_ks, prev_ns)
    )

    if mis_mode in (1, 2, 3):
        if mis_mode == 1:
            w = mu.balance_heuristic(mix_pdf_a, pdf_mc)
        elif mis_mode == 2:
            w = mu.max_heuristic(mix_pdf_a, pdf_mc)
        else:
            w = mu.power_heuristic2(mix_pdf_a, pdf_mc)
    else:
        w = jnp.ones_like(mix_pdf_a)

    return {
        "pos": pos, "flux": flux, "w12": w12, "d2": d2, "prev_n": prev_n,
        "brdf2": brdf2, "weight": w,
        "gate": usable & (mix_pdf_w > 0.0),
    }


def _splat_eval(ph, px_pos, px_n, px_kd, px_ks, px_ns, px_w10, px_stencil,
                r2, kde, mis_mode: int, clamping_value):
    """Per-(photon, pixel) contribution. ph fields broadcast against px fields
    (append a pixel axis to photon-major values before calling)."""
    dist2 = mu.dot(ph["pos"] - px_pos, ph["pos"] - px_pos)
    inside = dist2 <= r2

    w12 = ph["w12"]
    brdf1 = (
        px_kd * brdf.lambert_eval_checked(px_w10, w12, px_n)[..., None]
        + brdf.phong_eval(px_w10, w12, px_n, px_ks, px_ns)
    )
    base = ph["flux"] * kde  # flux * 1/(pi r^2) * 1/numLightPaths

    if mis_mode in (0, 1, 2, 3):
        out = brdf1 * base * ph["weight"][..., None]
    else:
        cos_cos = (jnp.maximum(mu.dot(px_n, w12), 0.0)
                   * jnp.maximum(-mu.dot(ph["prev_n"], w12), 0.0))
        g = cos_cos / ph["d2"]
        if mis_mode == 4:
            resid = jnp.maximum(g - clamping_value, 0.0) / jnp.maximum(g, 1e-20)
            out = brdf1 * base * resid[..., None]
        elif mis_mode == 5:
            num = jnp.maximum(brdf1 * ph["brdf2"] * g[..., None] - clamping_value, 0.0)
            den = g[..., None] * ph["brdf2"]
            out = base * jnp.where(den > 1e-20, num / jnp.maximum(den, 1e-20), 0.0)
        else:
            raise ValueError(f"unknown misMode {mis_mode}")
        out = jnp.where((cos_cos > 0.0)[..., None], out, 0.0)

    keep = inside & ph["gate"] & (px_stencil > 0.0)
    return jnp.where(keep[..., None], out, 0.0)


# ---------------------------------------------------------------------------
# Dense oracle (tests / tiny resolutions)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("mis_mode",))
def photon_splat_dense(scene: SceneData, gbuf: GBuffer, pm: PhotonMap,
                       radius, mis_mode: int, pdf_mc, clamping_value,
                       inv_num_light_paths) -> jnp.ndarray:
    """Exact reference implementation: every photon vs every pixel."""
    ph = _photon_major(pm, mis_mode, pdf_mc)
    cam = jnp.asarray(scene.camera.origin, jnp.float32)
    w10 = mu.normalize(cam[None, :] - gbuf.position)
    r2 = radius * radius
    kde = mu.INV_PI / r2 * inv_num_light_paths

    def step(acc, rec):
        rec_b = {k: v[None, ...] for k, v in rec.items()}
        c = _splat_eval(rec_b, gbuf.position, gbuf.normal, gbuf.kd, gbuf.ks,
                        gbuf.ns, w10, gbuf.stencil, r2, kde, mis_mode,
                        clamping_value)
        return acc + c, None

    acc, _ = jax.lax.scan(step, jnp.zeros_like(gbuf.position), ph)
    return acc


# ---------------------------------------------------------------------------
# Tiled fast path
# ---------------------------------------------------------------------------

def _project(scene: SceneData, pos, width, height, jitter_ndc):
    """World -> pixel coords + per-axis screen radii scale (camera basis)."""
    import math
    cam = scene.camera
    origin, fwd, right, upv = cam.basis()
    thy = math.tan(cam.fovy * 0.5)
    thx = thy * cam.aspect

    rel = pos - origin[None, :]
    z = mu.dot(rel, fwd)
    x = mu.dot(rel, right)
    y = mu.dot(rel, upv)
    zs = jnp.maximum(z, 1e-6)
    ndc_x = x / (zs * thx)
    ndc_y = y / (zs * thy)
    if jitter_ndc is not None:
        ndc_x = ndc_x + jitter_ndc[0]
        ndc_y = ndc_y + jitter_ndc[1]
    px = (ndc_x + 1.0) * 0.5 * width
    py = (1.0 - ndc_y) * 0.5 * height
    sx = width / (2.0 * thx)    # pixels per (unit offset / z) in x
    sy = height / (2.0 * thy)
    return px, py, zs, (z > 1e-6), sx, sy


@partial(jax.jit,
         static_argnames=("mis_mode", "width", "height", "tile", "cap", "span"))
def photon_splat_tiled(scene: SceneData, gbuf: GBuffer, pm: PhotonMap,
                       radius, mis_mode: int, pdf_mc, clamping_value,
                       inv_num_light_paths, width: int, height: int,
                       jitter_ndc=None, tile: int = 8, cap: int = 128,
                       span: int = 4, row_offset=None, full_height=None):
    """Tile-binned splat. Returns (image (N,3), dropped_pairs count).

    dropped_pairs counts (photon, tile) pairs lost to the per-tile capacity
    or to footprints wider than `span` tiles — the no-silent-caps meter.

    For pixel-sharded execution, gbuf covers rows
    [row_offset, row_offset+height) of a full_height-tall film: projection
    uses the full film, binning the local window.
    """
    ph = _photon_major(pm, mis_mode, pdf_mc)
    m = ph["pos"].shape[0]
    tx_n = -(-width // tile)
    ty_n = -(-height // tile)
    nt = tx_n * ty_n

    px, py, z, in_front, sx, sy = _project(
        scene, ph["pos"], width,
        height if full_height is None else full_height, jitter_ndc)
    if row_offset is not None:
        py = py - row_offset
    r_px_x = radius / z * sx + 1.0
    r_px_y = radius / z * sy + 1.0
    gate = ph["gate"] & in_front

    # unclipped tile ranges; a photon is relevant only if its footprint
    # intersects this film window at all
    tx0u = jnp.floor((px - r_px_x) / tile).astype(jnp.int32)
    tx1u = jnp.floor((px + r_px_x) / tile).astype(jnp.int32)
    ty0u = jnp.floor((py - r_px_y) / tile).astype(jnp.int32)
    ty1u = jnp.floor((py + r_px_y) / tile).astype(jnp.int32)
    gate = gate & (tx1u >= 0) & (tx0u <= tx_n - 1) \
        & (ty1u >= 0) & (ty0u <= ty_n - 1)

    tx0 = jnp.clip(tx0u, 0, tx_n - 1)
    tx1 = jnp.clip(tx1u, 0, tx_n - 1)
    ty0 = jnp.clip(ty0u, 0, ty_n - 1)
    ty1 = jnp.clip(ty1u, 0, ty_n - 1)

    # center-crop footprints wider than span tiles (counted as dropped)
    cx = jnp.clip(jnp.floor(px / tile).astype(jnp.int32), 0, tx_n - 1)
    cy = jnp.clip(jnp.floor(py / tile).astype(jnp.int32), 0, ty_n - 1)
    wide = ((tx1 - tx0 + 1) > span) | ((ty1 - ty0 + 1) > span)
    half = span // 2
    tx0 = jnp.where(wide, jnp.maximum(cx - half, 0), tx0)
    tx1 = jnp.where(wide, jnp.minimum(tx0 + span - 1, tx_n - 1), tx1)
    ty0 = jnp.where(wide, jnp.maximum(cy - half, 0), ty0)
    ty1 = jnp.where(wide, jnp.minimum(ty0 + span - 1, ty_n - 1), ty1)

    # (photon, tile) pair ids; invalid -> nt (drop bucket)
    dys = jnp.arange(span, dtype=jnp.int32)
    dxs = jnp.arange(span, dtype=jnp.int32)
    ty = ty0[:, None] + dys[None, :]                     # (M, span)
    tx = tx0[:, None] + dxs[None, :]
    valid_y = ty <= ty1[:, None]
    valid_x = tx <= tx1[:, None]
    tid = ty[:, :, None] * tx_n + tx[:, None, :]         # (M, span, span)
    valid = (valid_y[:, :, None] & valid_x[:, None, :]
             & gate[:, None, None])
    tid = jnp.where(valid, tid, nt).reshape(-1)          # (M*span*span,)
    pair_photon = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None, None],
        (m, span, span)).reshape(-1)

    # sort pairs by tile; rank within each tile run via neighbor-diff +
    # cumulative max (O(M), cheaper than a second searchsorted)
    order = jnp.argsort(tid)
    stid = tid[order]
    sphoton = pair_photon[order]
    idx = jnp.arange(stid.shape[0], dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), stid[1:] != stid[:-1]])
    run_first = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - run_first

    keep = (stid < nt) & (rank < cap)
    dropped = jnp.sum((stid < nt) & (rank >= cap)) + jnp.sum(wide & gate)

    row = jnp.where(keep, stid, nt)
    col = jnp.where(keep, rank, 0)
    table = jnp.full((nt + 1, cap), -1, jnp.int32)
    table = table.at[row, col].set(jnp.where(keep, sphoton, -1), mode="drop")
    table = table[:nt]

    # ---- pixel side: block layout (NT, tile*tile) via pad + reshape ----
    wp = tx_n * tile
    hp = ty_n * tile

    def blockify(img):
        c = img.shape[-1] if img.ndim == 2 else 0
        shape2 = (height, width, c) if c else (height, width)
        x = img.reshape(shape2)
        pad = ((0, hp - height), (0, wp - width)) + (((0, 0),) if c else ())
        x = jnp.pad(x, pad)
        if c:
            x = x.reshape(ty_n, tile, tx_n, tile, c).transpose(0, 2, 1, 3, 4)
            return x.reshape(nt, tile * tile, c)
        x = x.reshape(ty_n, tile, tx_n, tile).transpose(0, 2, 1, 3)
        return x.reshape(nt, tile * tile)

    cam = jnp.asarray(scene.camera.origin, jnp.float32)
    w10 = mu.normalize(cam[None, :] - gbuf.position)
    px_pos = blockify(gbuf.position)
    px_n = blockify(gbuf.normal)
    px_kd = blockify(gbuf.kd)
    px_ks = blockify(gbuf.ks)
    px_ns = blockify(gbuf.ns)
    px_w10 = blockify(w10)
    px_st = blockify(gbuf.stencil)

    r2 = radius * radius
    kde = mu.INV_PI / r2 * inv_num_light_paths

    # process the capacity dimension in fat chunks: each scan step evaluates
    # CK photons per tile against the tile's pixels as one dense op
    ck = min(16, cap)
    n_ck = -(-cap // ck)
    pad_ck = n_ck * ck - cap
    table_c = jnp.pad(table, ((0, 0), (0, pad_ck)), constant_values=-1)
    table_c = table_c.reshape(nt, n_ck, ck).transpose(1, 0, 2)  # (n_ck, NT, ck)

    def chunk(acc, idx):
        # idx: (NT, ck) photon ids or -1
        ok = idx >= 0
        g = jnp.maximum(idx, 0)
        # photon-major fields -> (NT, ck, 1, ...) broadcasting vs pixels
        rec = {k: v[g][:, :, None, ...] for k, v in ph.items()}
        rec["gate"] = rec["gate"] & ok[:, :, None]
        contrib = _splat_eval(rec, px_pos[:, None], px_n[:, None],
                              px_kd[:, None], px_ks[:, None],
                              px_ns[:, None], px_w10[:, None],
                              px_st[:, None], r2, kde, mis_mode,
                              clamping_value)
        return acc + jnp.sum(contrib, axis=1), None

    acc0 = jnp.zeros((nt, tile * tile, 3), jnp.float32)
    acc, _ = jax.lax.scan(chunk, acc0, table_c)

    # unblockify -> (H*W, 3)
    img = acc.reshape(ty_n, tx_n, tile, tile, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(hp, wp, 3)[:height, :width].reshape(-1, 3)
    return img, dropped
