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
    """Multi-level tile-binned splat. Returns (image (N,3), dropped count).

    Every photon is routed to the FIRST level of a tile pyramid
    (tile, 4*tile, 16*tile, ..., whole-film) whose span-tile window covers
    its screen footprint, so no footprint is ever cropped.  Per-tile photon
    runs live directly in the tile-sorted pair array (no fixed-capacity
    table) and are consumed by a while_loop up to the batch's actual
    maximum occupancy — nothing is ever silently lost.  `cap` remains only
    as a runaway guard on the loop; pairs beyond it are counted in
    `dropped` (0 unless cap is set absurdly low).

    For pixel-sharded execution, gbuf covers rows
    [row_offset, row_offset+height) of a full_height-tall film: projection
    uses the full film, binning the local window.
    """
    ph = _photon_major(pm, mis_mode, pdf_mc)
    m = ph["pos"].shape[0]

    # ---- tile pyramid: fine -> coarse, then one whole-film level ----
    sizes = []
    t = tile
    while t < max(width, height):
        sizes.append(t)
        t *= 4
    sizes.append(-(-max(width, height) // 8) * 8)  # global: one tile
    grids = []   # (tile_l, txn, tyn, id_offset)
    off = 0
    for t in sizes:
        txn, tyn = -(-width // t), -(-height // t)
        grids.append((t, txn, tyn, off))
        off += txn * tyn
    total_tiles = off

    px, py, z, in_front, sx, sy = _project(
        scene, ph["pos"], width,
        height if full_height is None else full_height, jitter_ndc)
    if row_offset is not None:
        py = py - row_offset
    r_px_x = radius / z * sx + 1.0
    r_px_y = radius / z * sy + 1.0
    gate = ph["gate"] & in_front

    # per-level tile ranges + window intersection; route each photon to the
    # finest level whose span-tile window covers its footprint (the last,
    # whole-film level always does)
    lv = []
    for t, txn, tyn, _ in grids:
        tx0u = jnp.floor((px - r_px_x) / t).astype(jnp.int32)
        tx1u = jnp.floor((px + r_px_x) / t).astype(jnp.int32)
        ty0u = jnp.floor((py - r_px_y) / t).astype(jnp.int32)
        ty1u = jnp.floor((py + r_px_y) / t).astype(jnp.int32)
        in_window = ((tx1u >= 0) & (tx0u <= txn - 1)
                     & (ty1u >= 0) & (ty0u <= tyn - 1))
        tx0 = jnp.clip(tx0u, 0, txn - 1)
        tx1 = jnp.clip(tx1u, 0, txn - 1)
        ty0 = jnp.clip(ty0u, 0, tyn - 1)
        ty1 = jnp.clip(ty1u, 0, tyn - 1)
        fits = ((tx1 - tx0 + 1) <= span) & ((ty1 - ty0 + 1) <= span)
        lv.append((tx0, tx1, ty0, ty1, fits, in_window))

    chosen = jnp.full((m,), len(grids) - 1, jnp.int32)
    for li in range(len(grids) - 2, -1, -1):
        chosen = jnp.where(lv[li][4], jnp.int32(li), chosen)

    def sel(field_idx):
        out = lv[-1][field_idx]
        for li in range(len(grids) - 2, -1, -1):
            out = jnp.where(chosen == li, lv[li][field_idx], out)
        return out

    tx0s, tx1s, ty0s, ty1s = sel(0), sel(1), sel(2), sel(3)
    in_window = sel(5)
    txn_s = jnp.zeros((m,), jnp.int32)
    off_s = jnp.zeros((m,), jnp.int32)
    for li, (_, txn, _, o) in enumerate(grids):
        txn_s = jnp.where(chosen == li, txn, txn_s)
        off_s = jnp.where(chosen == li, o, off_s)
    gate = gate & in_window

    # (photon, tile) pair ids in the combined id space; invalid -> drop slot
    dys = jnp.arange(span, dtype=jnp.int32)
    dxs = jnp.arange(span, dtype=jnp.int32)
    ty = ty0s[:, None] + dys[None, :]                    # (M, span)
    tx = tx0s[:, None] + dxs[None, :]
    valid_y = ty <= ty1s[:, None]
    valid_x = tx <= tx1s[:, None]
    tid = (off_s[:, None, None] + ty[:, :, None] * txn_s[:, None, None]
           + tx[:, None, :])                             # (M, span, span)
    valid = (valid_y[:, :, None] & valid_x[:, None, :]
             & gate[:, None, None])
    tid = jnp.where(valid, tid, total_tiles).reshape(-1)
    pair_photon = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[:, None, None],
        (m, span, span)).reshape(-1)

    # sort pairs by tile: each tile's photons become one contiguous run
    order = jnp.argsort(tid)
    stid = tid[order]
    sphoton = pair_photon[order]

    # per-tile runs in the sorted pair array: starts via binary search (the
    # drop bucket at total_tiles terminates the last run).  No per-tile
    # table, no capacity: every pair is consumed, so nothing is ever lost —
    # `cap` only bounds the while_loop as a runaway guard (counted if hit).
    starts = jnp.searchsorted(stid, jnp.arange(total_tiles + 1,
                                               dtype=jnp.int32))
    counts = jnp.diff(starts)
    dropped = jnp.int32(0)   # accounted per level (bulk + overflow)
    n_pairs = stid.shape[0]

    cam = jnp.asarray(scene.camera.origin, jnp.float32)
    w10 = mu.normalize(cam[None, :] - gbuf.position)
    r2 = radius * radius
    kde = mu.INV_PI / r2 * inv_num_light_paths

    # per-level occupancy: chunks run only to the actual max occupancy
    ck = min(16, cap)
    # bulk/overflow split: the bulk pass is dense over ALL tiles up to a
    # DYNAMIC per-level cap (the k_over/2-th largest tile count), so at
    # most k_over/2 hot tiles remain; those are gathered into a compact
    # batch and drained at per-pair cost.  A concentrated light can put
    # 1M pairs into one 16-px tile: a static cap either drops pairs or
    # pays max-occupancy x all-tiles in the dense loop.
    k_over = 64

    img = jnp.zeros((height * width, 3), jnp.float32)
    for li, (t, txn, tyn, o) in enumerate(grids):
        nt = txn * tyn
        starts_l = jax.lax.dynamic_slice(starts, (o,), (nt,))
        counts_l = jax.lax.dynamic_slice(counts, (o,), (nt,))
        if nt <= k_over:
            # few huge tiles (coarse levels): the dense loop is already
            # per-pair cost; no overflow split
            cap_bulk = jnp.int32(cap)
        else:
            cap_bulk = jnp.clip(jnp.sort(counts_l)[nt - k_over // 2],
                                16, cap)
        ends_l = starts_l + jnp.minimum(counts_l, cap_bulk)
        needed = jnp.minimum(jnp.max(counts_l, initial=0), cap_bulk)

        # pixel side: block layout (nt, t*t) via pad + reshape
        wp, hp = txn * t, tyn * t

        def blockify(x, t=t, txn=txn, tyn=tyn, nt=nt, wp=wp, hp=hp):
            c = x.shape[-1] if x.ndim == 2 else 0
            shape2 = (height, width, c) if c else (height, width)
            x = x.reshape(shape2)
            pad = ((0, hp - height), (0, wp - width)) + (((0, 0),) if c else ())
            x = jnp.pad(x, pad)
            if c:
                x = x.reshape(tyn, t, txn, t, c).transpose(0, 2, 1, 3, 4)
                return x.reshape(nt, t * t, c)
            x = x.reshape(tyn, t, txn, t).transpose(0, 2, 1, 3)
            return x.reshape(nt, t * t)

        px_pos = blockify(gbuf.position)
        px_n = blockify(gbuf.normal)
        px_kd = blockify(gbuf.kd)
        px_ks = blockify(gbuf.ks)
        px_ns = blockify(gbuf.ns)
        px_w10 = blockify(w10)
        px_st = blockify(gbuf.stencil)

        def cond(carry):
            c, _ = carry
            return c * ck < needed

        def body(carry, starts_l=starts_l, ends_l=ends_l, px_pos=px_pos,
                 px_n=px_n, px_kd=px_kd, px_ks=px_ks, px_ns=px_ns,
                 px_w10=px_w10, px_st=px_st):
            c, acc = carry
            # gather this chunk's pair slots straight from the sorted runs
            slot = starts_l[:, None] + c * ck + jnp.arange(ck,
                                                           dtype=jnp.int32)
            ok = slot < ends_l[:, None]
            g = sphoton[jnp.minimum(slot, n_pairs - 1)]
            # photon-major fields -> (nt, ck, 1, ...) broadcasting vs pixels
            rec = {k: v[g][:, :, None, ...] for k, v in ph.items()}
            rec["gate"] = rec["gate"] & ok[:, :, None]
            contrib = _splat_eval(rec, px_pos[:, None], px_n[:, None],
                                  px_kd[:, None], px_ks[:, None],
                                  px_ns[:, None], px_w10[:, None],
                                  px_st[:, None], r2, kde, mis_mode,
                                  clamping_value)
            return c + 1, acc + jnp.sum(contrib, axis=1)

        acc0 = jnp.zeros((nt, t * t, 3), jnp.float32)
        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))

        # ---- overflow pass: hot tiles beyond cap_bulk ----
        # (k capped by the level's tile count: the coarse levels have few,
        # HUGE tiles — 64 slots of the whole-film level would be GBs)
        k_ov = min(k_over, nt)
        over = counts_l > cap_bulk
        oidx = jnp.nonzero(over, size=k_ov, fill_value=nt)[0]
        # by construction at most k_over//2 tiles exceed the dynamic cap
        # (plus ties), so the k_ov slots cover them all
        tile_ok = oidx < nt
        oidx_c = jnp.minimum(oidx, nt - 1)
        o_starts = starts_l[oidx_c] + cap_bulk
        o_ends = starts_l[oidx_c] + jnp.minimum(counts_l[oidx_c], cap)
        o_ends = jnp.where(tile_ok, o_ends, o_starts)
        # overflow beyond the k_over hottest-first tiles or beyond cap is
        # counted as dropped (cap is a runaway guard; k_over tiles cover
        # any physical light layout)
        total_over = jnp.sum(jnp.maximum(counts_l - cap_bulk, 0))
        handled_over = jnp.sum(o_ends - o_starts)
        dropped = dropped + (total_over - handled_over)

        opx = {  # gathered pixel blocks of the overflowing tiles
            "pos": px_pos[oidx_c], "n": px_n[oidx_c], "kd": px_kd[oidx_c],
            "ks": px_ks[oidx_c], "ns": px_ns[oidx_c], "w10": px_w10[oidx_c],
            "st": px_st[oidx_c] * tile_ok[:, None],
        }
        needed_o = jnp.max(o_ends - o_starts, initial=0)

        def cond_o(carry):
            c, _ = carry
            return c * ck < needed_o

        def body_o(carry):
            c, acc_o = carry
            slot = o_starts[:, None] + c * ck + jnp.arange(ck,
                                                           dtype=jnp.int32)
            ok = slot < o_ends[:, None]
            g = sphoton[jnp.minimum(slot, n_pairs - 1)]
            rec = {k: v[g][:, :, None, ...] for k, v in ph.items()}
            rec["gate"] = rec["gate"] & ok[:, :, None]
            contrib = _splat_eval(rec, opx["pos"][:, None],
                                  opx["n"][:, None], opx["kd"][:, None],
                                  opx["ks"][:, None], opx["ns"][:, None],
                                  opx["w10"][:, None], opx["st"][:, None],
                                  r2, kde, mis_mode, clamping_value)
            return c + 1, acc_o + jnp.sum(contrib, axis=1)

        acc_o0 = jnp.zeros((k_ov, t * t, 3), jnp.float32)
        _, acc_o = jax.lax.while_loop(cond_o, body_o, (jnp.int32(0), acc_o0))
        acc = acc.at[oidx_c].add(
            jnp.where(tile_ok[:, None, None], acc_o, 0.0))

        # unblockify -> (H*W, 3) and accumulate into the image
        lvl = acc.reshape(tyn, txn, t, t, 3).transpose(0, 2, 1, 3, 4)
        lvl = lvl.reshape(hp, wp, 3)[:height, :width].reshape(-1, 3)
        img = img + lvl

    return img, dropped
