"""Path tracing with MIS next-event estimation (reference:
reflectcuts/realtimetechniques/pathtracing.cu, driver rtpt/rtpt2.h).

One frame = one jitted call: primary hits come from the G-buffer pass, then
`num_bounces` unrolled wavefront steps over all pixels with masked lanes
(the TPU equivalent of the per-pixel OptiX megakernel).  Estimator semantics
mirror the reference exactly:

  * explicit NEE at the first vertex (pathtracing.cu:240-331) and at every
    closest hit (112-228) with balance-heuristic MIS between light-area and
    BRDF-solid-angle strategies,
  * emitter hits weighted by MIS vs the NEE strategy; emission profile is a
    power-cosine lobe with exponent intensity.w,
  * lobe selection by max-reflectance, RR with the reference's 0.98-floor
    convention (russian_prob_path),
  * directly visible emission is NOT added here — the composite pass
    overlays the light image (shaders/final.frag).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from evplp_tpu.core import brdf
from evplp_tpu.core import mathutil as mu
from evplp_tpu.core.light import light_pdf_a, light_sample
from evplp_tpu.core.sampling import uniform_not_one
from evplp_tpu.integrators.gbuffer import GBuffer
from evplp_tpu.scene.scene import SceneData
from evplp_tpu.scene.textures import fetch_hit_shading
from evplp_tpu.trace.intersect import intersect_closest, occluded_segment


def _emit_profile(light_n, to_prev, exponent):
    """Emitter directional term (exp+2)/(2pi)*cos^exp — what PhongEvalF
    evaluates at the light surface in the reference's NEE/emission paths."""
    return brdf.phong_eval_f(light_n, to_prev, light_n, exponent)


def _nee(scene: SceneData, key, position, normal, inc, kd, ks, ns,
         attenuation, chose_l, p_l, shadow_eps, live=None, tile_shape=None,
         sort_rays=False):
    """Next-event estimation at a batch of vertices.

    The lobe-selection decision (chose_l) also selects which BRDF the NEE
    contribution uses and its 1/p factor, matching the reference's
    branch structure (pathtracing.cu:178-217).  live masks lanes whose
    contribution the caller discards — their shadow segments are not traced.
    """
    n = position.shape[0]
    u3 = jax.random.uniform(key, (n, 3))
    l_pos, l_n, l_pdf, l_val = light_sample(scene.light, u3)

    to_light = l_pos - position
    to_light_n = mu.normalize(to_light)
    occluded = occluded_segment(scene.tris, scene.bvh, l_pos, position,
                                eps=shadow_eps, live=live,
                                tile_shape=tile_shape, sort_rays=sort_rays)

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

    contrib = jnp.where(chose_l[:, None], c_l, c_p) * attenuation
    return jnp.where(occluded[:, None], 0.0, contrib)


def render_pt_frame(scene: SceneData, gbuf: GBuffer, key,
                    num_bounces: int, tile_shape=None) -> jnp.ndarray:
    """One 1-spp path-traced frame over all pixels; returns (N, 3) radiance
    (excluding directly visible emission)."""
    n = gbuf.position.shape[0]
    cam_pos = jnp.asarray(scene.camera.origin, jnp.float32)

    result = jnp.zeros((n, 3), jnp.float32)
    position = gbuf.position
    normal = gbuf.normal
    inc = mu.normalize(cam_pos[None, :] - position)  # toward the eye

    black = brdf.is_black(gbuf.kd, gbuf.ks)
    active = (gbuf.stencil > 0.0) & ~black

    # ---- first vertex: NEE + direction sample (pathtracing.cu:261-331) ----
    k_sel, k_nee, k_lobe = jax.random.split(jax.random.fold_in(key, 0), 3)
    p_l = brdf.p_select_lambert(gbuf.kd, gbuf.ks)
    u_sel = uniform_not_one(jax.random.uniform(k_sel, (n,)))
    chose_l = u_sel < p_l

    result += jnp.where(
        active[:, None],
        _nee(scene, k_nee, position, normal, inc, gbuf.kd, gbuf.ks, gbuf.ns,
             jnp.ones((n, 3)), chose_l, p_l, shadow_eps=1e-4,
             live=active, tile_shape=tile_shape),
        0.0,
    )

    u_lobe = jax.random.uniform(k_lobe, (n, 2))
    direction, brdf_pdf_w, attenuation, _ = brdf.sample_combined(
        u_sel, u_lobe, inc, normal, normal, gbuf.kd, gbuf.ks, gbuf.ns)

    prev_position = position

    # ---- bounce loop (pathtracing.cu:333-344 + closest hit 112-228) ----
    # lax.scan over the bounce index: the body compiles once regardless of
    # num_bounces (an unrolled loop compiled ~3x slower for no gain)
    def bounce_body(carry, bounce):
        result, prev_position, direction, brdf_pdf_w, attenuation, active = carry
        kb = jax.random.fold_in(key, 1 + bounce)
        k_sel, k_nee, k_lobe, k_rr = jax.random.split(kb, 4)
        last = bounce == num_bounces - 1

        # dead lanes get an empty interval: the tracer skips them entirely;
        # bounce directions are BRDF samples (incoherent) -> sorted packets
        hit = intersect_closest(scene.tris, scene.bvh, prev_position,
                                direction, t_min=1e-5,
                                t_max=jnp.where(active, 3.0e38, 0.0),
                                sort_rays=True)
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

        surface = hit_ok & ~is_light
        black = brdf.is_black(kd, ks)
        # the last bounce collects emission only (no NEE, no continuation:
        # prd.done is set before the last rtTrace in the reference)
        surface = surface & ~black & ~last

        inc = to_prev
        p_l = brdf.p_select_lambert(kd, ks)
        u_sel = uniform_not_one(jax.random.uniform(k_sel, (n,)))
        chose_l = u_sel < p_l

        result = result + jnp.where(
            surface[:, None],
            # bounce-vertex NEE segments are incoherent (scattered surface
            # points) -> sorted packets instead of screen tiles
            _nee(scene, k_nee, next_position, geom_n, inc, kd, ks, ns,
                 attenuation, chose_l, p_l, shadow_eps=1e-5,
                 live=surface, tile_shape=None, sort_rays=True),
            0.0,
        )

        u_lobe = jax.random.uniform(k_lobe, (n, 2))
        new_dir, new_pdf, lobe_w, _ = brdf.sample_combined(
            u_sel, u_lobe, inc, geom_n, geom_n, kd, ks, ns)
        attenuation_new = attenuation * lobe_w

        russian = brdf.russian_prob_path(attenuation_new)
        survive = jax.random.uniform(k_rr, (n,)) < russian

        active = surface & survive
        direction = jnp.where(active[:, None], new_dir, direction)
        brdf_pdf_w = jnp.where(active, new_pdf, brdf_pdf_w)
        attenuation = jnp.where(
            active[:, None],
            attenuation_new / jnp.maximum(russian, 1e-8)[:, None],
            attenuation,
        )
        prev_position = jnp.where(active[:, None], next_position, prev_position)
        return (result, prev_position, direction, brdf_pdf_w, attenuation,
                active), None

    carry = (result, prev_position, direction, brdf_pdf_w, attenuation, active)
    (result, *_), _ = jax.lax.scan(
        bounce_body, carry, jnp.arange(num_bounces, dtype=jnp.int32))
    return result
