"""Path tracing with MIS next-event estimation (reference:
reflectcuts/realtimetechniques/pathtracing.cu, driver rtpt/rtpt2.h).

One frame = one jitted call: primary hits come from the G-buffer pass, then
`num_bounces` wavefront steps over all pixels with masked lanes (the TPU
equivalent of the per-pixel OptiX megakernel).  Estimator semantics mirror
the reference exactly:

  * explicit NEE at the first vertex (pathtracing.cu:240-331) and at every
    closest hit (112-228) with balance-heuristic MIS between light-area and
    BRDF-solid-angle strategies,
  * emitter hits weighted by MIS vs the NEE strategy; emission profile is a
    power-cosine lobe with exponent intensity.w,
  * lobe selection by max-reflectance, RR with the reference's 0.98-floor
    convention (russian_prob_path),
  * directly visible emission is NOT added here — the composite pass
    overlays the light image (shaders/final.frag).

Trace scheduling: the loop is organized per VERTEX, not per trace — at each
vertex the NEE shadow segment and the sampled extension ray share an origin,
so both ride ONE shared sort permutation
(trace.intersect.closest_and_segment; the reference's two rtTrace calls per
vertex).

RNG: all of vertex v's decisions are counter draws on
(GLOBAL pixel id ^ seed0, PT tag, v ^ seed1) — a pure function of global
ids like the reference's per-(pixel, iteration) seeding
(pathtracing.cu:364-365), so any pixel sharding/chunking draws identical
numbers and sharded PT computes bit-for-bit the single-device estimator
(parallel/shard.py sharded_pt_frame passes pixel_offset per device).
"""
from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

from evplp_tpu.core import brdf
from evplp_tpu.core import mathutil as mu
from evplp_tpu.core import rng as crng
from evplp_tpu.core.light import light_pdf_a, light_sample
from evplp_tpu.core.sampling import uniform_not_one
from evplp_tpu.integrators.gbuffer import GBuffer
from evplp_tpu.scene.scene import SceneData
from evplp_tpu.scene.textures import fetch_hit_shading
from evplp_tpu.trace.intersect import (Hit, closest_and_segment,
                                       closest_and_segment_carry,
                                       intersect_closest, occluded_segment)

# Sorted-state-ACROSS-bounces (roadmap 2a / VERDICT r4 #5): the scan body
# keeps path state in each vertex's sorted order (the trace's carry-column
# row gather permutes it for free), dropping the per-vertex inverse
# permutation; one scatter restores pixel order at frame end.  RNG draws
# key on a carried pixel-index column, so the estimator stream is
# IDENTICAL to the pixel-order formulation.  Default OFF: the round-5
# A/B/A/B sandwich measured the carry path a reproducible 1.088x SLOWER
# (923.7/848.5/923.0/848.5 ms, identical checksums — the carried columns
# widen the hot trace's row gather by more than the dropped inverse
# permutation cost; tools/probe_r05_pt.py, NOTES.md round-5 log).  "1"
# selects the carry path (A/B sandwich knob; estimator-identical).
SORTED_CARRY = _os.environ.get("EVPLP_PT_SORTED_CARRY", "0") not in ("0",)


def _emit_profile(light_n, to_prev, exponent):
    """Emitter directional term (exp+2)/(2pi)*cos^exp — what PhongEvalF
    evaluates at the light surface in the reference's NEE/emission paths."""
    return brdf.phong_eval_f(light_n, to_prev, light_n, exponent)


def _nee_terms(scene: SceneData, position, normal, inc, kd, ks, ns,
               attenuation, chose_l, p_l, l_pos, l_n, l_pdf, l_val):
    """UNOCCLUDED NEE contribution for the sampled light point.

    Computed BEFORE the shadow trace: lanes whose contribution is exactly
    zero (geometry term 0, emitter backfacing, black BRDF product) are
    culled from the segment trace entirely — occlusion can only gate a
    nonzero contribution, so the estimator is unchanged while the
    shadow-segment batch sheds its provably-zero lanes.

    The lobe-selection decision (chose_l) also selects which BRDF the NEE
    contribution uses and its 1/p factor, matching the reference's branch
    structure (pathtracing.cu:178-217)."""
    to_light = l_pos - position
    to_light_n = mu.normalize(to_light)

    g = mu.geometry_term(normal, l_n, to_light)
    emit = _emit_profile(l_n, -to_light_n, scene.light.intensity[3])

    # lambert branch
    w_l = mu.balance_heuristic(l_pdf, brdf.lambert_pdf_a(normal, l_n, to_light))
    f_l = kd * brdf.lambert_eval_f(to_light_n, inc, normal)
    c_l = (w_l * g * emit / jnp.maximum(p_l, 1e-8))[:, None] * l_val * f_l

    # phong branch
    w_p = mu.balance_heuristic(
        l_pdf, brdf.phong_pdf_a(normal, l_n, to_light, inc, ks, ns))
    f_p = brdf.phong_eval(to_light_n, inc, normal, ks, ns)
    c_p = (w_p * g * emit / jnp.maximum(1.0 - p_l, 1e-8))[:, None] * l_val * f_p

    return jnp.where(chose_l[:, None], c_l, c_p) * attenuation


def _vertex_traces(scene, position, direction, ext_active, l_pos, surface,
                   shadow_eps, tile_shape):
    """Trace a vertex's extension ray (closest) + NEE segment (any-hit).

    Bounce vertices (tile_shape None) share ONE sort permutation between
    the two traces (both originate at the vertex).  The first vertex
    keeps its SCREEN-coherent tile NEE + a separate sorted extension
    trace (riding the sorted pair measured 84 ms/frame worse — NOTES.md
    A/B log).  Both formulations compute identical intersections."""
    t_max = jnp.where(ext_active, jnp.float32(3.0e38), jnp.float32(0.0))
    if tile_shape is None:
        return closest_and_segment(
            scene.tris, scene.bvh, position, direction,
            t_min=1e-5, t_max=t_max, seg_to=l_pos, seg_eps=shadow_eps,
            seg_live=surface)
    hit = intersect_closest(scene.tris, scene.bvh, position, direction,
                            t_min=1e-5, t_max=t_max, sort_rays=True)
    occluded = occluded_segment(scene.tris, scene.bvh, l_pos, position,
                                eps=shadow_eps, live=surface,
                                tile_shape=tile_shape,
                                sort_rays=tile_shape is None)
    return hit, occluded


def _process_hit(scene, prev_position, direction, brdf_pdf_w, attenuation,
                 active, hit, result):
    """Shade the closest hit of an extension ray batch: MIS-weighted emitter
    emission into `result`, plus the next vertex's surface state
    (pathtracing.cu:112-176)."""
    prim = jnp.maximum(hit.prim, 0)
    hit_ok = active & hit.valid
    next_position = prev_position + hit.t[:, None] * direction
    kd, ks, ns, geom_n, is_light_row = fetch_hit_shading(
        scene, prim, hit.u, hit.v)

    backface = mu.dot(geom_n, direction) > 0.0
    hit_ok = hit_ok & ~backface

    # emitter hit: MIS-weighted emission, then terminate
    is_light = is_light_row & hit_ok
    to_prev = mu.normalize(prev_position - next_position)
    v = next_position - prev_position
    pdf_w2a = jnp.maximum(-mu.dot(geom_n, mu.normalize(v)), 0.0) / \
        jnp.maximum(mu.dot(v, v), 1e-20)
    w_emit = mu.balance_heuristic(brdf_pdf_w * pdf_w2a, light_pdf_a(scene.light))
    emission = (w_emit * _emit_profile(geom_n, to_prev, scene.light.intensity[3]))[:, None] \
        * attenuation * scene.light.intensity[None, :3]
    result = result + jnp.where(is_light[:, None], emission, 0.0)

    surface = hit_ok & ~is_light & ~brdf.is_black(kd, ks)
    return result, next_position, geom_n, to_prev, kd, ks, ns, surface


def _pt_vertex_draws(c0, s1, vert, with_rr):
    """The 7 per-pixel uniforms of vertex `vert`: lobe select, 3 NEE light
    draws, 2 BRDF-lobe draws, RR — two pcg4d calls on global-pixel counters."""
    c1 = jnp.uint32(0x50545052)  # 'PTPR' stream tag
    c2 = jnp.asarray(vert).astype(jnp.uint32) ^ s1
    u_sel, n0, n1, n2 = crng.uniform4(c0, c1, c2, jnp.uint32(0))
    l0, l1, u_rr, _ = crng.uniform4(c0, c1, c2, jnp.uint32(1))
    u3 = jnp.stack([n0, n1, n2], axis=-1)
    u_lobe = jnp.stack([l0, l1], axis=-1)
    return u_sel, u3, u_lobe, (u_rr if with_rr else None)


def render_pt_frame(scene: SceneData, gbuf: GBuffer, key,
                    num_bounces: int, tile_shape=None,
                    pixel_offset=0) -> jnp.ndarray:
    """One 1-spp path-traced frame over all pixels; returns (N, 3) radiance
    (excluding directly visible emission).

    pixel_offset: global id of the first lane — per-pixel RNG draws are a
    pure function of the GLOBAL pixel id, so row-sharded execution
    reproduces the single-device estimator exactly."""
    n = gbuf.position.shape[0]
    cam_pos = jnp.asarray(scene.camera.origin, jnp.float32)

    s0, s1 = crng.seeds_from_key(key)
    pix = jnp.arange(n, dtype=jnp.uint32) + \
        jnp.asarray(pixel_offset).astype(jnp.uint32)
    c0 = pix ^ s0

    result = jnp.zeros((n, 3), jnp.float32)
    position = gbuf.position
    normal = gbuf.normal
    inc = mu.normalize(cam_pos[None, :] - position)  # toward the eye

    black = brdf.is_black(gbuf.kd, gbuf.ks)
    active = (gbuf.stencil > 0.0) & ~black

    # ---- vertex 0 (peeled: no RR, pathtracing.cu:261-331) ----
    u_sel, u3, u_lobe, _ = _pt_vertex_draws(c0, s1, 0, with_rr=False)
    p_l = brdf.p_select_lambert(gbuf.kd, gbuf.ks)
    u_sel = uniform_not_one(u_sel)
    chose_l = u_sel < p_l

    l_pos, l_n, l_pdf, l_val = light_sample(scene.light, u3)

    direction, brdf_pdf_w, attenuation, _ = brdf.sample_combined(
        u_sel, u_lobe, inc, normal, normal, gbuf.kd, gbuf.ks, gbuf.ns)

    contrib0 = _nee_terms(scene, position, normal, inc, gbuf.kd, gbuf.ks,
                          gbuf.ns, jnp.ones((n, 3)), chose_l, p_l, l_pos,
                          l_n, l_pdf, l_val)
    nee_live = active & jnp.any(contrib0 != 0.0, axis=1)
    hit, occluded = _vertex_traces(scene, position, direction, active,
                                   l_pos, nee_live, shadow_eps=1e-4,
                                   tile_shape=tile_shape)
    result += jnp.where((nee_live & ~occluded)[:, None], contrib0, 0.0)

    # ---- vertices 1..num_bounces-1: process hit, then paired NEE+extension
    # (the reference's closest-hit program, pathtracing.cu:112-228).
    # lax.scan over the vertex index: the body compiles once regardless of
    # num_bounces (an unrolled loop compiled ~3x slower for no gain)
    pixel_offset_u = jnp.asarray(pixel_offset).astype(jnp.uint32)

    def vertex_body(carry, vert):
        (result, prev_position, direction, brdf_pdf_w, attenuation,
         active, hit_t, hit_prim, hit_u, hit_v, c_idx) = carry
        hit = Hit(t=hit_t, prim=hit_prim, u=hit_u, v=hit_v)

        result, position, geom_n, inc, kd, ks, ns, surface = _process_hit(
            scene, prev_position, direction, brdf_pdf_w, attenuation,
            active, hit, result)

        # c_idx: f32 LOCAL pixel index in the current lane order (exact
        # for n < 2^24) — global-pixel-id counter draws survive the
        # sorted-carry permutation unchanged
        c0v = (c_idx.astype(jnp.uint32) + pixel_offset_u) ^ s0
        u_sel, u3, u_lobe, u_rr = _pt_vertex_draws(c0v, s1, vert,
                                                   with_rr=True)
        p_l = brdf.p_select_lambert(kd, ks)
        u_sel = uniform_not_one(u_sel)
        chose_l = u_sel < p_l

        l_pos, l_n, l_pdf, l_val = light_sample(scene.light, u3)

        new_dir, new_pdf, lobe_w, _ = brdf.sample_combined(
            u_sel, u_lobe, inc, geom_n, geom_n, kd, ks, ns)
        attenuation_new = attenuation * lobe_w

        russian = brdf.russian_prob_path(attenuation_new)
        survive = u_rr < russian
        ext_active = surface & survive

        contrib = _nee_terms(scene, position, geom_n, inc, kd, ks, ns,
                             attenuation, chose_l, p_l, l_pos, l_n, l_pdf,
                             l_val)
        nee_live = surface & jnp.any(contrib != 0.0, axis=1)
        ext_attenuation = jnp.where(
            ext_active[:, None],
            attenuation_new / jnp.maximum(russian, 1e-8)[:, None],
            attenuation,
        )

        if SORTED_CARRY:
            t_max_ext = jnp.where(ext_active, jnp.float32(3.0e38),
                                  jnp.float32(0.0))
            cols = jnp.concatenate(
                [result, ext_attenuation, contrib,
                 nee_live.astype(jnp.float32)[:, None],
                 ext_active.astype(jnp.float32)[:, None],
                 new_pdf[:, None], c_idx[:, None]], axis=1)
            new_hit, occluded, o_s, d_s, cs = closest_and_segment_carry(
                scene.tris, scene.bvh, position, new_dir, 1e-5, t_max_ext,
                l_pos, cols, seg_eps=1e-5, seg_live=nee_live)
            nee_live_s = cs[:, 9] > 0.5
            result = cs[:, 0:3] + jnp.where(
                (nee_live_s & ~occluded)[:, None], cs[:, 6:9], 0.0)
            return (result, o_s, d_s, cs[:, 11], cs[:, 3:6],
                    cs[:, 10] > 0.5, new_hit.t, new_hit.prim,
                    new_hit.u, new_hit.v, cs[:, 12]), None

        new_hit, occluded = _vertex_traces(
            scene, position, new_dir, ext_active, l_pos, nee_live,
            shadow_eps=1e-5, tile_shape=None)

        result = result + jnp.where((nee_live & ~occluded)[:, None],
                                    contrib, 0.0)

        direction = jnp.where(ext_active[:, None], new_dir, direction)
        brdf_pdf_w = jnp.where(ext_active, new_pdf, brdf_pdf_w)
        prev_position = jnp.where(ext_active[:, None], position,
                                  prev_position)
        return (result, prev_position, direction, brdf_pdf_w,
                ext_attenuation, ext_active, new_hit.t, new_hit.prim,
                new_hit.u, new_hit.v, c_idx), None

    carry = (result, position, direction, brdf_pdf_w, attenuation, active,
             hit.t, hit.prim, hit.u, hit.v,
             jnp.arange(n, dtype=jnp.float32))
    if num_bounces > 1:
        carry, _ = jax.lax.scan(
            vertex_body, carry,
            jnp.arange(1, num_bounces, dtype=jnp.int32))

    # ---- final vertex: emission only (no NEE, no continuation — prd.done
    # is set before the last rtTrace in the reference) ----
    (result, prev_position, direction, brdf_pdf_w, attenuation, active,
     hit_t, hit_prim, hit_u, hit_v, c_idx) = carry
    result, *_ = _process_hit(
        scene, prev_position, direction, brdf_pdf_w, attenuation, active,
        Hit(t=hit_t, prim=hit_prim, u=hit_u, v=hit_v), result)
    if SORTED_CARRY and num_bounces > 1:
        # one scatter restores pixel order (unique indices: a permutation)
        result = jnp.zeros_like(result).at[c_idx.astype(jnp.int32)].set(
            result)
    return result
