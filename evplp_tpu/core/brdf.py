"""Lambert + modified-Phong BRDF: eval / pdf / sample, batched over lanes.

Single source of truth for formulas the reference duplicates in CUDA
(reflectcuts/realtimetechniques/rtmaterial.cuh) and GLSL
(reflectcuts/shaders/photonsplatinstanced.frag:42-98).  All functions are
pure jnp, broadcast over leading batch dims, directions are unit vectors
unless noted.

Conventions (matching the reference):
  * "inc" is the direction pointing *toward* the previous vertex / viewer
    (the reference's `in`), "out" points toward the next vertex.
  * Modified Phong: f = rho_s * (n+2)/(2pi) * cos^n(alpha) around the mirror
    reflection of inc; sampling pdf uses (n+1)/(2pi) * cos^n.
  * A surface lobe is "black" below EPS_REFL, mirroring the reference's
    early-outs so MIS weights agree bitwise-ish.
"""
from __future__ import annotations

import jax.numpy as jnp

from evplp_tpu.core import mathutil as mu
from evplp_tpu.core.mathutil import (
    EPS_COS,
    EPS_REFL,
    INV_PI,
    dot,
    normalize,
    reflect,
)

# ---------------------------------------------------------------------------
# Lambert
# ---------------------------------------------------------------------------

def lambert_eval_f(out, inc, n):
    """Scalar Lambert kernel 1/pi (rtmaterial.cuh:73-76; no hemisphere check)."""
    del out, inc, n
    return INV_PI


def lambert_eval_checked(w_out, w_in, n):
    """GLSL-variant Lambert kernel: 1/pi only when both directions are above
    the surface (photonsplatinstanced.frag:42-50), else 0."""
    above = (dot(w_out, n) > 0.0) & (dot(w_in, n) > 0.0)
    return jnp.where(above, INV_PI, 0.0)


def lambert_pdf_w(n, v):
    """Cosine-hemisphere pdfW = max(cos,0)/pi (GLSL frag:65-69)."""
    return jnp.maximum(dot(n, normalize(v)), 0.0) * INV_PI


def lambert_pdf_w_nopi(n, v):
    """The reference CUDA LambertPdfW *omits* the 1/pi factor
    (rtmaterial.cuh:40-44).  Only the VSL MIS weights consume it; keep the
    quirk so VSL matches the reference estimator exactly."""
    return jnp.maximum(dot(n, normalize(v)), 0.0)


def lambert_pdf_a(n1, n2, v12):
    """Area-domain cosine pdf with unnormalized v12 (rtmaterial.cuh:46-54):
    cos1_u*cos2_u/(d2*d2) / pi == cos1*cos2/d2 / pi."""
    cos1_u = jnp.maximum(dot(n1, v12), 0.0)
    cos2_u = jnp.maximum(-dot(n2, v12), 0.0)
    d2 = jnp.maximum(dot(v12, v12), 1e-20)
    return cos1_u * cos2_u / (d2 * d2) * INV_PI


def lambert_sample(u2, inc, n, kd):
    """Cosine-weighted sample (rtmaterial.cuh:56-66).

    Returns (direction, pdf_w, weight) with weight = kd (f*cos/pdf).
    """
    local = mu.square_to_cosine_hemisphere(u2)
    direction = mu.from_local(local, n)
    pdf_w = jnp.maximum(dot(direction, n), 0.0) * INV_PI
    return direction, pdf_w, kd


# ---------------------------------------------------------------------------
# Modified Phong
# ---------------------------------------------------------------------------

def phong_eval(out, inc, n, ks, ns):
    """rho_s*(n+2)/(2pi)*cos^n around reflect(inc) (rtmaterial.cuh:104-110).
    Zero when cos <= EPS or the red channel of ks <= EPS (reference quirk:
    the black-lobe test uses .x only)."""
    r = reflect(-inc, n)
    c = jnp.maximum(dot(out, r), 0.0)
    val = ks * ((ns + 2.0) * jnp.power(c, ns) * (0.5 * INV_PI))[..., None]
    ok = (c > EPS_COS) & (ks[..., 0] > EPS_REFL)
    return jnp.where(ok[..., None], val, 0.0)


def phong_eval_f(out, inc, n, ns):
    """Scalar Phong kernel (n+2)/(2pi)*cos^n (rtmaterial.cuh:112-118)."""
    r = reflect(-inc, n)
    c = jnp.maximum(dot(out, r), 0.0)
    val = (ns + 2.0) * jnp.power(c, ns) * (0.5 * INV_PI)
    return jnp.where(c > EPS_COS, val, 0.0)


def phong_pdf_w(n1, v12, inc, ks, ns):
    """Solid-angle pdf (n+1)/(2pi)*cos^n (rtmaterial.cuh:78-85); zero on
    black ks.x, mirroring the reference."""
    w12 = normalize(v12)
    r = normalize(reflect(-inc, n1))
    c = jnp.maximum(dot(w12, r), 0.0)
    val = (ns + 1.0) * (0.5 * INV_PI) * jnp.power(c, ns)
    ok = (c > EPS_COS) & (ks[..., 0] > EPS_REFL)
    return jnp.where(ok, val, 0.0)


def phong_pdf_a(n1, n2, v12, inc, ks, ns):
    """Area-domain Phong pdf (rtmaterial.cuh:87-102): pdfW * cos2/d2."""
    w12 = normalize(v12)
    r = normalize(reflect(-inc, n1))
    c = jnp.maximum(dot(w12, r), 0.0)
    pdf_w = (ns + 1.0) * (0.5 * INV_PI) * jnp.power(c, ns)
    cos2 = jnp.maximum(-dot(n2, w12), 0.0)
    d2 = jnp.maximum(dot(v12, v12), 1e-20)
    ok = (c > EPS_COS) & (ks[..., 0] > EPS_REFL)
    return jnp.where(ok, pdf_w * cos2 / d2, 0.0)


def phong_sample(u2, inc, n, ks, ns):
    """Power-cosine sample around reflect(inc) (rtmaterial.cuh:120-155).

    Returns (direction, pdf_w, weight); weight = (n+2)/(n+1)*max(cos_n,0)*ks,
    pdf zeroed when the sampled direction dives below the surface.
    """
    r = reflect(-inc, n)
    local = mu.square_to_power_cosine(u2, ns)
    direction = mu.from_local(local, r)
    cos_n_unsafe = dot(direction, n)
    cos_n = jnp.maximum(cos_n_unsafe, 0.0)
    cos_r = jnp.maximum(dot(direction, r), 0.0)
    pdf_w = jnp.where(
        cos_n_unsafe > 0.0,
        (ns + 1.0) * (0.5 * INV_PI) * jnp.power(cos_r, ns),
        0.0,
    )
    weight = ((ns + 2.0) / (ns + 1.0) * cos_n)[..., None] * ks
    return direction, pdf_w, weight


# ---------------------------------------------------------------------------
# Combined two-lobe material
# ---------------------------------------------------------------------------

def p_select_lambert(kd, ks):
    """Lobe-selection probability maxL/(maxL+maxP) (lighttracing.cu:159)."""
    max_l = mu.max_color(kd)
    max_p = mu.max_color(ks)
    return max_l / jnp.maximum(max_l + max_p, 1e-20)


def is_black(kd, ks):
    """True when both lobes vanish (the reference's absorb test)."""
    return mu.max_color(kd) + mu.max_color(ks) <= EPS_REFL


def eval_combined_f(out, inc, n, kd, ks, ns):
    """kd*LambertEvalF + ks*PhongEvalF — the dual-BRDF eval used by the VPL
    gather (lighttracing.cu:302-306)."""
    return kd * lambert_eval_f(out, inc, n) + ks * phong_eval_f(out, inc, n, ns)[..., None]


def pdf_a_combined(n1, n2, v12, inc, kd, ks, ns):
    """Lobe-mixture area pdf: pL*LambertPdfA + (1-pL)*PhongPdfA
    (lighttracing.cu:316-317) with pL from the stored records."""
    p_l = p_select_lambert(kd, ks)
    return lambert_pdf_a(n1, n2, v12) * p_l + phong_pdf_a(n1, n2, v12, inc, ks, ns) * (1.0 - p_l)


def sample_combined(u_select, u2, inc, n_shading, n_geom, kd, ks, ns):
    """Lobe-select-then-sample (lighttracing.cu:159-178, pathtracing.cu:175-217).

    The reference samples the Lambert lobe around the *shading* normal
    (faceforwarded) but the Phong lobe around the *geometric* normal; both
    callers pass the two normals they use.

    Returns (direction, pdf_w, weight, chose_lambert) where weight already
    includes the 1/p_select factor.
    """
    p_l = p_select_lambert(kd, ks)
    chose_l = u_select < p_l

    dir_l, pdf_l, w_l = lambert_sample(u2, inc, n_shading, kd)
    dir_p, pdf_p, w_p = phong_sample(u2, inc, n_geom, ks, ns)

    direction = jnp.where(chose_l[..., None], dir_l, dir_p)
    pdf_w = jnp.where(chose_l, pdf_l, pdf_p)
    inv_prob = jnp.where(
        chose_l,
        1.0 / jnp.maximum(p_l, 1e-8),
        1.0 / jnp.maximum(1.0 - p_l, 1e-8),
    )
    weight = jnp.where(chose_l[..., None], w_l, w_p) * inv_prob[..., None]
    return direction, pdf_w, weight, chose_l


def russian_prob_light(throughput):
    """Light-tracer RR: min(maxColor, 0.98) (lighttracing.cu:93-96)."""
    return jnp.minimum(mu.max_color(throughput), 0.98)


def russian_prob_path(throughput):
    """Path-tracer RR — the reference uses max(max(t.x,0.98),max(t.y,t.z))
    (pathtracing.cu:53-56), i.e. a *floor* of 0.98; keep for parity."""
    return jnp.maximum(jnp.maximum(throughput[..., 0], 0.98),
                       jnp.maximum(throughput[..., 1], throughput[..., 2]))
