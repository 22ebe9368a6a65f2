"""Pallas kernel for the VSL 3-strategy sample loop.

The XLA sample step streams ~20 per-pixel context arrays from HBM for
every MC sample (measured ~10% VPU efficiency, NOTES.md); this kernel
keeps a block of pixels VMEM-resident and runs the whole adaptive sample
loop over a GROUP of records in one grid step:

  for g in group:              # record scalars live in SMEM
      ctx   <- recompute from pixel planes + record scalars (VMEM math)
      s_max <- max over the BLOCK's gated adaptive counts
      while s < s_max: acc += sample_step(...)   # 3-strategy MIS

Block-level sample bounds (default 32x128 = 4096 pixels) subsume the
sorted-chunk bounds of the XLA path at 14x finer granularity — callers
still pass difficulty-sorted pixels so blocks stay homogeneous.

Estimator parity: the math is a plane-form port of vsl._sample_step
(reference lighttracing.cu:382-594 with its documented pdf quirks); the
RNG is the same pcg4d counter hash on (pixel_id^seed0, rec_id, s^seed1,
tag) so kernel and XLA paths draw IDENTICAL numbers — tests assert the
outputs agree elementwise.

Layout:
  pix    (16, NR, 128) f32 — per-pixel planes: pos xyz, normal xyz,
         kd rgb, ks rgb, ns, wi10 xyz (sampling order)
  pid    (NR, 128) int32   — GLOBAL pixel ids (RNG counters)
  gates  (NR, 128) int32   — bit g set = record g's (pre & ~occluded)
  recs   (G, 24) f32 SMEM  — pos3, normal3, flux_dir3, flux3 (premult
         invPiR2), kd3, ks3, ns, black2, refl3 (reflect(-flux_dir, n)),
         p_select
  ints   (3,) int32 SMEM   — seed0, seed1, rec-id base
  flts   (1,) f32 SMEM     — vsl_radius
  out    (3, NR, 128) f32  — sum over the group's gated estimates
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evplp_tpu.core import rng
from evplp_tpu.core.mathutil import EPS_COS, EPS_REFL, INV_PI, TWO_PI

LANES = 128
NPLANE = 16
NREC_F = 24
MAX_VSL_SAMPLES = 101
# Samples per while-loop iteration.  The adaptive loop is OVERHEAD-bound,
# not math-bound: a gutted-step probe (probe_vsl_tax run, NOTES.md; cornell
# protocol frame) measured the 3-strategy math at 515 ms of a 2097 ms
# frame.  But the overhead is NOT per-iteration: batching K masked
# samples per iteration (probe_vsl_unroll run, NOTES.md; same process,
# identical checksums) measured unroll 1/4 = 1541/1709 ms — fatter
# bodies LOSE (instruction footprint), so the residue lives in per-loop
# ENTRY cost (~90k record-block while loops per frame) and the ctx/
# plane traffic, neither of which unrolling touches.  Default 1.
# The masking is estimator-exact at any K (draws are a pure function of
# (pixel, record, s)), so the knob stays for the A/B record.
SAMPLE_UNROLL = 1
# Branch (lax.cond) over the whole sample loop for gate-empty
# (record, block) pairs.  MEASURED FLAT even on the occlusion-heavy
# livingroom (probe_vsl_skip sandwich, NOTES.md: 3052/2999/3115 ms for
# skip 1/0/1, checksum-identical) — the loop-entry residue is not
# runtime-skippable (it lives in the instruction schedule, not in
# executed work), closing the last cheap lever on the sample half.
# Default off; knob kept for the A/B record.
SKIP_EMPTY = False

_INTERPRET = None  # None -> auto: interpret on CPU, compiled on TPU


def set_interpret(interpret: bool | None) -> None:
    global _INTERPRET
    _INTERPRET = interpret


def _interp() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    return jax.default_backend() == "cpu"


# ---- plane-form vec3 helpers (x, y, z are (R, 128) arrays) ----

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _neg(a):
    return (-a[0], -a[1], -a[2])


def _normalize(a, eps=1e-20):
    inv = jax.lax.rsqrt(jnp.maximum(_dot(a, a), eps))
    return _scale(a, inv)


def _reflect(i, n):
    """mathutil.reflect in plane form: i - 2*dot(i,n)*n."""
    d = _dot(i, n)
    return (i[0] - 2.0 * d * n[0], i[1] - 2.0 * d * n[1],
            i[2] - 2.0 * d * n[2])


def _onb(z):
    """Duff et al. branchless ONB (mathutil.orthonormal_basis)."""
    zx, zy, zz = z
    sign = jnp.where(zz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + zz)
    b = zx * zy * a
    x = (1.0 + sign * zx * zx * a, sign * b, -sign * zx)
    y = (b, sign + zy * zy * a, -zy)
    return x, y


def _from_local(local, z_axis):
    x, y = _onb(z_axis)
    return (local[0] * x[0] + local[1] * y[0] + local[2] * z_axis[0],
            local[0] * x[1] + local[1] * y[1] + local[2] * z_axis[1],
            local[0] * x[2] + local[1] * y[2] + local[2] * z_axis[2])


def _phong_f(c, ns):
    """(n+2)/(2pi)*cos^n with the EPS_COS gate (brdf.phong_eval_f)."""
    val = (ns + 2.0) * jnp.power(c, ns) * (0.5 * INV_PI)
    return jnp.where(c > EPS_COS, val, 0.0)


def _phong_pdf(c, ns, ks0):
    """(n+1)/(2pi)*cos^n, zero on black ks.x (brdf.phong_pdf_w)."""
    val = (ns + 1.0) * (0.5 * INV_PI) * jnp.power(c, ns)
    return jnp.where((c > EPS_COS) & (ks0 > EPS_REFL), val, 0.0)


def _max3(a, b, c):
    return jnp.maximum(jnp.maximum(a, b), c)


def _kernel(group: int, rows: int):
    def kernel(pix_ref, pid_ref, gate_ref, cosh_ref, cnt_ref, rec_ref,
               int_ref, flt_ref, out_ref):
        # ---- per-pixel constants (resident for the whole group) ----
        p = (pix_ref[0], pix_ref[1], pix_ref[2])
        n = (pix_ref[3], pix_ref[4], pix_ref[5])
        kd = (pix_ref[6], pix_ref[7], pix_ref[8])
        ks = (pix_ref[9], pix_ref[10], pix_ref[11])
        ns = pix_ref[12]
        wi10 = (pix_ref[13], pix_ref[14], pix_ref[15])
        gates = gate_ref[...]
        pid = pid_ref[...]

        max_l = _max3(*kd)
        max_p = _max3(*ks)
        p_l = max_l / jnp.maximum(max_l + max_p, 1e-20)
        black1 = (max_l + max_p) <= EPS_REFL
        # eye-side phong axis: reflect(-wi10, n) (constant per pixel)
        r1 = _reflect(_neg(wi10), n)
        r1n = _normalize(r1)

        seed0 = int_ref[0]
        seed1 = int_ref[1]
        rec_base = int_ref[2]
        del flt_ref  # radius folded into the precomputed ctx planes

        c0 = pid.astype(jnp.uint32) ^ jnp.uint32(seed0)

        def do_record(g, total):
            rpos = (rec_ref[g, 0], rec_ref[g, 1], rec_ref[g, 2])
            rn = (rec_ref[g, 3], rec_ref[g, 4], rec_ref[g, 5])
            rdir = (rec_ref[g, 6], rec_ref[g, 7], rec_ref[g, 8])
            flux = (rec_ref[g, 9], rec_ref[g, 10], rec_ref[g, 11])
            rkd = (rec_ref[g, 12], rec_ref[g, 13], rec_ref[g, 14])
            rks = (rec_ref[g, 15], rec_ref[g, 16], rec_ref[g, 17])
            rns = rec_ref[g, 18]
            black2 = rec_ref[g, 19] > 0.5
            r2 = (rec_ref[g, 20], rec_ref[g, 21], rec_ref[g, 22])
            p_l2 = rec_ref[g, 23]
            r2n = _normalize(r2)

            # ---- ctx (vsl._record_ctx in plane form); cos_half and the
            # adaptive count come in as planes: Mosaic has no asin
            # lowering, and the count's int cast must match XLA exactly ----
            v12 = _sub(rpos, p)
            d2 = jnp.maximum(_dot(v12, v12), 1e-20)
            dist = jnp.sqrt(d2)
            nv12 = _scale(v12, 1.0 / dist)
            cos_half = cosh_ref[g]
            solid_angle = TWO_PI * (1.0 - cos_half)
            inv_sa = 1.0 / jnp.maximum(solid_angle, 1e-12)
            num = (cnt_ref[g // 4] >> (8 * (g % 4))) & 0xFF
            gate = ((gates >> g) & 1) > 0

            s_needed = jnp.minimum(
                jnp.max(jnp.where(gate, num, 0)), MAX_VSL_SAMPLES)
            c1 = jnp.uint32(rec_base + g)

            # rec-side eval constants
            rec_phong_live = rks[0] > EPS_REFL

            def sample_step(s, acc):
                c2 = jnp.uint32(s) ^ jnp.uint32(seed1)
                u0, u1, u2, u3 = rng.uniform4(c0, c1, c2, jnp.uint32(0))
                u4, u5, u6, u7 = rng.uniform4(c0, c1, c2, jnp.uint32(1))

                # ---- strategy 1: uniform cone ----
                phi = TWO_PI * u0
                z = 1.0 - u1 * (1.0 - cos_half)
                sl = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
                local = (jnp.cos(phi) * sl, jnp.sin(phi) * sl, z)
                w12c = _normalize(_from_local(local, nv12))
                cc = (jnp.maximum(_dot(n, w12c), 0.0)
                      * jnp.maximum(-_dot(rn, w12c), 0.0))
                # f2 = rec-side combined eval at out=-w12c
                cr2 = jnp.maximum(_dot(_neg(w12c), r2), 0.0)
                pf2 = _phong_f(cr2, rns)
                f2 = (rkd[0] * INV_PI + rks[0] * pf2,
                      rkd[1] * INV_PI + rks[1] * pf2,
                      rkd[2] * INV_PI + rks[2] * pf2)
                # f1 = eye-side combined eval: phong around reflect(-w12c, n)
                ra = _reflect(_neg(w12c), n)
                cra = jnp.maximum(_dot(wi10, ra), 0.0)
                pf1 = _phong_f(cra, ns)
                f1 = (kd[0] * INV_PI + ks[0] * pf1,
                      kd[1] * INV_PI + ks[1] * pf1,
                      kd[2] * INV_PI + ks[2] * pf1)
                pdf_b1 = (jnp.maximum(_dot(n, w12c), 0.0) * p_l
                          + _phong_pdf(jnp.maximum(_dot(w12c, r1n), 0.0),
                                       ns, ks[0]) * (1.0 - p_l))
                pdf_b2 = (jnp.maximum(_dot(rn, _neg(w12c)), 0.0) * p_l
                          + _phong_pdf(
                              jnp.maximum(_dot(_neg(w12c), r2n), 0.0),
                              rns, rks[0]))
                w_cone = inv_sa / jnp.maximum(pdf_b1 + pdf_b2 + inv_sa,
                                              1e-20)
                g_cone = (cc > 1e-9) & ~black1
                s_cone = jnp.where(g_cone, w_cone * cc * solid_angle, 0.0)
                cn0 = flux[0] * s_cone * f1[0] * f2[0]
                cn1 = flux[1] * s_cone * f1[1] * f2[1]
                cn2 = flux[2] * s_cone * f1[2] * f2[2]

                # ---- strategy 2: eye-side BRDF sampling ----
                chose_l = jnp.minimum(u2, 0.999999) < p_l
                # lambert sample around n
                rl = jnp.sqrt(jnp.maximum(1.0 - u3, 0.0))
                phil = TWO_PI * u4
                loc_l = (jnp.cos(phil) * rl, jnp.sin(phil) * rl,
                         jnp.sqrt(jnp.maximum(u3, 0.0)))
                dir_l = _from_local(loc_l, n)
                # phong sample around r1 (raw reflect, brdf.phong_sample)
                cos_t = jnp.power(u3, 1.0 / (ns + 1.0))
                sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
                loc_p = (sin_t * jnp.cos(phil), sin_t * jnp.sin(phil),
                         cos_t)
                dir_p = _from_local(loc_p, r1)
                cos_n_u = _dot(dir_p, n)
                w12b = (jnp.where(chose_l, dir_l[0], dir_p[0]),
                        jnp.where(chose_l, dir_l[1], dir_p[1]),
                        jnp.where(chose_l, dir_l[2], dir_p[2]))
                lobe_scale = jnp.where(
                    chose_l, 1.0 / jnp.maximum(p_l, 1e-8),
                    ((ns + 2.0) / (ns + 1.0) * jnp.maximum(cos_n_u, 0.0))
                    / jnp.maximum(1.0 - p_l, 1e-8))
                lw0 = jnp.where(chose_l, kd[0], ks[0]) * lobe_scale
                lw1 = jnp.where(chose_l, kd[1], ks[1]) * lobe_scale
                lw2 = jnp.where(chose_l, kd[2], ks[2]) * lobe_scale
                in_cone1 = _dot(w12b, nv12) > cos_half
                cos1b = jnp.maximum(_dot(n, w12b), 0.0)
                cos2b = jnp.maximum(-_dot(rn, w12b), 0.0)
                crb = jnp.maximum(_dot(_neg(w12b), r2), 0.0)
                pfb = _phong_f(crb, rns)
                f2b = (rkd[0] * INV_PI + rks[0] * pfb,
                       rkd[1] * INV_PI + rks[1] * pfb,
                       rkd[2] * INV_PI + rks[2] * pfb)
                w12b_n = _normalize(w12b)
                pdf_b1b = (jnp.maximum(_dot(n, w12b_n), 0.0) * p_l
                           + _phong_pdf(
                               jnp.maximum(_dot(w12b_n, r1n), 0.0),
                               ns, ks[0]) * (1.0 - p_l))
                pdf_b2b = (jnp.maximum(_dot(rn, _neg(w12b_n)), 0.0) * p_l
                           + _phong_pdf(
                               jnp.maximum(_dot(_neg(w12b_n), r2n), 0.0),
                               rns, rks[0]))
                w_b1 = pdf_b1b / jnp.maximum(pdf_b1b + pdf_b2b + inv_sa,
                                             1e-20)
                g_b1 = in_cone1 & (cos1b > 1e-9) & ~black1
                s_b1 = jnp.where(g_b1, w_b1 * cos2b, 0.0)
                cb0 = flux[0] * s_b1 * lw0 * f2b[0]
                cb1 = flux[1] * s_b1 * lw1 * f2b[1]
                cb2 = flux[2] * s_b1 * lw2 * f2b[2]

                # ---- strategy 3: light-side BRDF sampling ----
                chose_l2 = jnp.minimum(u5, 0.999999) < p_l2
                rl2 = jnp.sqrt(jnp.maximum(1.0 - u6, 0.0))
                phil2 = TWO_PI * u7
                loc_l2 = (jnp.cos(phil2) * rl2, jnp.sin(phil2) * rl2,
                          jnp.sqrt(jnp.maximum(u6, 0.0)))
                dir_l2 = _from_local(loc_l2, rn)
                cos_t2 = jnp.power(u6, 1.0 / (rns + 1.0))
                sin_t2 = jnp.sqrt(jnp.maximum(1.0 - cos_t2 * cos_t2, 0.0))
                loc_p2 = (sin_t2 * jnp.cos(phil2), sin_t2 * jnp.sin(phil2),
                          cos_t2)
                dir_p2 = _from_local(loc_p2, r2)
                cos_n_u2 = _dot(dir_p2, rn)
                w21 = (jnp.where(chose_l2, dir_l2[0], dir_p2[0]),
                       jnp.where(chose_l2, dir_l2[1], dir_p2[1]),
                       jnp.where(chose_l2, dir_l2[2], dir_p2[2]))
                lobe_scale2 = jnp.where(
                    chose_l2, 1.0 / jnp.maximum(p_l2, 1e-8),
                    ((rns + 2.0) / (rns + 1.0)
                     * jnp.maximum(cos_n_u2, 0.0))
                    / jnp.maximum(1.0 - p_l2, 1e-8))
                lv0 = jnp.where(chose_l2, rkd[0], rks[0]) * lobe_scale2
                lv1 = jnp.where(chose_l2, rkd[1], rks[1]) * lobe_scale2
                lv2 = jnp.where(chose_l2, rkd[2], rks[2]) * lobe_scale2
                in_cone2 = -_dot(w21, nv12) > cos_half
                cos2c = jnp.maximum(_dot(rn, w21), 0.0)
                # f1c = eye-side eval at inc=-w21: phong around
                # reflect(w21, n)
                rc = _reflect(w21, n)
                crc = jnp.maximum(_dot(wi10, rc), 0.0)
                pfc = _phong_f(crc, ns)
                f1c = (kd[0] * INV_PI + ks[0] * pfc,
                       kd[1] * INV_PI + ks[1] * pfc,
                       kd[2] * INV_PI + ks[2] * pfc)
                w21n = _normalize(w21)
                pdf_b1c = (jnp.maximum(_dot(n, _neg(w21n)), 0.0) * p_l
                           + _phong_pdf(
                               jnp.maximum(_dot(_neg(w21n), r1n), 0.0),
                               ns, ks[0]) * (1.0 - p_l))
                # quirk: shading-point p_l, unweighted phong
                pdf_b2c = (jnp.maximum(_dot(rn, w21n), 0.0) * p_l
                           + _phong_pdf(
                               jnp.maximum(_dot(w21n, r2n), 0.0),
                               rns, rks[0]))
                w_b2 = pdf_b2c / jnp.maximum(pdf_b1c + pdf_b2c + inv_sa,
                                             1e-20)
                g_b2 = in_cone2 & (cos2c > 1e-8) & ~black1 & ~black2
                s_b2 = jnp.where(g_b2, w_b2 * cos2c, 0.0)
                cv0 = flux[0] * s_b2 * lv0 * f1c[0]
                cv1 = flux[1] * s_b2 * lv1 * f1c[1]
                cv2 = flux[2] * s_b2 * lv2 * f1c[2]

                # the MAX clamp must bind per SAMPLE, not only via the
                # while bound: batched iterations step past s_needed, and
                # a pixel with num > MAX_VSL_SAMPLES would otherwise
                # collect extra draws in the overshoot
                use = (s < num) & (s < MAX_VSL_SAMPLES)
                a0, a1, a2 = acc
                return (a0 + jnp.where(use, cn0 + cb0 + cv0, 0.0),
                        a1 + jnp.where(use, cn1 + cb1 + cv1, 0.0),
                        a2 + jnp.where(use, cn2 + cb2 + cv2, 0.0))

            zero = jnp.zeros_like(p[0])

            def batch_step(c):
                s, acc = c
                for k in range(SAMPLE_UNROLL):
                    acc = sample_step(s + k, acc)
                return (s + SAMPLE_UNROLL, acc)

            def run_loop():
                return jax.lax.while_loop(
                    lambda c: c[0] < s_needed, batch_step,
                    (jnp.int32(0), (zero, zero, zero)))[1]

            if SKIP_EMPTY:
                # branch over the whole sample loop when the block has no
                # gated pixel for this record (occlusion-heavy scenes
                # empty many (record, block) pairs; the residue cost
                # analysis says loop ENTRY is what's worth skipping)
                acc = jax.lax.cond(
                    s_needed > 0, run_loop, lambda: (zero, zero, zero))
            else:
                acc = run_loop()
            inv_n = 1.0 / jnp.maximum(num.astype(jnp.float32), 1.0)
            t0, t1, t2 = total
            return (t0 + jnp.where(gate, acc[0] * inv_n, 0.0),
                    t1 + jnp.where(gate, acc[1] * inv_n, 0.0),
                    t2 + jnp.where(gate, acc[2] * inv_n, 0.0))

        zero = jnp.zeros_like(p[0])
        tot = jax.lax.fori_loop(0, group, do_record, (zero, zero, zero))
        out_ref[0] = tot[0]
        out_ref[1] = tot[1]
        out_ref[2] = tot[2]

    return kernel


def pack_pixels(position, normal, kd, ks, ns, wi10):
    """(N,3)/(N,) pixel arrays -> (16, N/128, 128) plane stack.

    N must be a multiple of 128 (callers pad; VSL gates padding off)."""
    nn = position.shape[0]
    assert nn % LANES == 0, nn
    nr = nn // LANES

    def pl3(v):
        return [v[:, i].reshape(nr, LANES) for i in range(3)]

    planes = (pl3(position) + pl3(normal) + pl3(kd) + pl3(ks)
              + [ns.reshape(nr, LANES)] + pl3(wi10))
    return jnp.stack(planes, axis=0)


def pack_records(recs, vsl_inv_pi_r2):
    """Record dict of (G, ...) fields -> (G, 24) SMEM table.

    Column layout matches the kernel: pos3, normal3, flux_dir3,
    flux3*invPiR2, kd3, ks3, ns, black2, reflect(-flux_dir, normal)3,
    p_select."""
    from evplp_tpu.core import brdf
    from evplp_tpu.core import mathutil as mu
    refl = mu.reflect(-recs["flux_dir"], recs["normal"])
    black2 = brdf.is_black(recs["kd"], recs["ks"]).astype(jnp.float32)
    p_l2 = brdf.p_select_lambert(recs["kd"], recs["ks"])
    return jnp.concatenate([
        recs["pos"], recs["normal"], recs["flux_dir"],
        recs["flux"] * vsl_inv_pi_r2,
        recs["kd"], recs["ks"], recs["ns"][:, None], black2[:, None],
        refl, p_l2[:, None],
    ], axis=1).astype(jnp.float32)


def ctx_planes(position, rec_pos, radius):
    """XLA-side per-(record, pixel) ctx the kernel cannot compute itself:
    cos_half planes (G, NR, 128) f32 and the adaptive counts packed 4
    records per int32 plane (ceil(G/4), NR, 128) — Mosaic has no asin,
    and the count's int cast must match vsl._record_ctx bit-for-bit."""
    g = rec_pos.shape[0]
    n = position.shape[0]
    v12 = rec_pos[:, None, :] - position[None]
    d2 = jnp.maximum(jnp.sum(v12 * v12, -1), 1e-20)
    dist = jnp.sqrt(d2)
    rdratio = radius / dist
    half_cone = jnp.where(rdratio >= 1.0, jnp.pi / 2.0,
                          jnp.arcsin(jnp.minimum(rdratio, 1.0)))
    cos_half = jnp.cos(half_cone)
    num = (half_cone * (200.0 / jnp.pi)).astype(jnp.int32) + 1
    ncnt = -(-g // 4)
    # byte-pack 4 records per int32 plane in one fused op (bytes are
    # disjoint and num <= MAX(101+?) < 256, so sum == bitwise-or)
    pad = ncnt * 4 - g
    if pad:
        num = jnp.concatenate([num, jnp.zeros((pad, n), jnp.int32)])
    shifts = jnp.asarray([0, 8, 16, 24], jnp.int32)[None, :, None]
    cnt = jnp.sum(num.reshape(ncnt, 4, n) << shifts, axis=1,
                  dtype=jnp.int32)
    return (cos_half.reshape(g, n // LANES, LANES),
            cnt.reshape(ncnt, n // LANES, LANES))


@partial(jax.jit, static_argnames=("group", "rows"))
def vsl_sample_group(pix, pid, gates, cosh, cnts, recs, ints, flts,
                     group: int, rows: int = 32):
    """One group of `group` records over all pixels; returns (3, NR, 128).

    pix (16, NR, 128) f32, pid/gates (NR, 128) int32, cosh/cnts from
    ctx_planes, recs (group, 24) f32, ints (3,) int32 [seed0, seed1,
    rec_base], flts (1,) f32 [unused].  NR must be a multiple of
    `rows`."""
    nr = pix.shape[1]
    assert nr % rows == 0, (nr, rows)
    ncnt = cnts.shape[0]
    grid = (nr // rows,)
    return pl.pallas_call(
        _kernel(group, rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((NPLANE, rows, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0)),
            pl.BlockSpec((rows, LANES), lambda i: (i, 0)),
            pl.BlockSpec((group, rows, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec((ncnt, rows, LANES), lambda i: (0, i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((3, rows, LANES), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((3, nr, LANES), jnp.float32),
        interpret=_interp(),
    )(pix, pid, gates, cosh, cnts, recs, ints, flts)
