"""Vector math, orthonormal bases, warps.

Batched-SoA mirror of the reference's device math
(reflectcuts/realtimetechniques/rtmath.cuh, rtmaterial.cuh:13-38,
reflectcuts/math/mapping.h).  Every function is pure jnp, broadcasts over
leading batch dimensions, and treats the last axis (size 3) as xyz.
"""
from __future__ import annotations

import jax.numpy as jnp

PI = jnp.pi
INV_PI = 1.0 / jnp.pi
TWO_PI = 2.0 * jnp.pi

# Tiny epsilons mirroring the reference's branch thresholds so estimator
# decisions (e.g. "is this material black") agree with it.
EPS_REFL = 1e-6          # rtmaterial.cuh:83 reflectance/black-surface cutoff
EPS_COS = 1e-6           # cosine cutoffs in Phong eval
RAY_EPS = 1e-4           # shadow/bounce ray offsets (lighttracing.cu:236,292)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize; zero vectors stay (numerically) zero."""
    return v * jnp.reciprocal(jnp.sqrt(jnp.maximum(dot(v, v), eps)))[..., None]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def reflect(incident: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """GLSL-convention reflect: I - 2*dot(I, N)*N."""
    return incident - 2.0 * dot(incident, n)[..., None] * n


def faceforward(n: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """Flip n so it faces the same hemisphere as wi (dot(n, wi) >= 0)."""
    return jnp.where(dot(n, wi)[..., None] >= 0.0, n, -n)


def max_color(c: jnp.ndarray) -> jnp.ndarray:
    """Max RGB component (rtmaterial.cuh:25)."""
    return jnp.max(c, axis=-1)


def luminance(c: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance (math/color.h)."""
    w = jnp.asarray([0.212671, 0.715160, 0.072169], dtype=c.dtype)
    return jnp.sum(c * w, axis=-1)


def orthonormal_basis(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless ONB from a unit z axis (Duff et al.; rtmaterial.cuh:13).

    Returns (x_basis, y_basis) so that (x, y, z) is right-handed.
    """
    zx, zy, zz = z[..., 0], z[..., 1], z[..., 2]
    sign = jnp.where(zz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + zz)
    b = zx * zy * a
    x = jnp.stack([1.0 + sign * zx * zx * a, sign * b, -sign * zx], axis=-1)
    y = jnp.stack([b, sign + zy * zy * a, -zy], axis=-1)
    return x, y


def from_local(local_dir: jnp.ndarray, z_axis: jnp.ndarray) -> jnp.ndarray:
    """Transform a direction from the ONB frame of z_axis to world space."""
    x, y = orthonormal_basis(z_axis)
    return (
        local_dir[..., 0:1] * x
        + local_dir[..., 1:2] * y
        + local_dir[..., 2:3] * z_axis
    )


def geometry_term(n1: jnp.ndarray, n2: jnp.ndarray, v12: jnp.ndarray) -> jnp.ndarray:
    """Two-cosine geometry term with *unnormalized* v12 (rtmaterial.cuh:30):
    max(n1.v12,0) * max(-n2.v12,0) / |v12|^4  ==  cos1*cos2/|v12|^2.
    """
    cos1_u = jnp.maximum(dot(n1, v12), 0.0)
    cos2_u = jnp.maximum(-dot(n2, v12), 0.0)
    d2 = jnp.maximum(dot(v12, v12), 1e-20)
    return cos1_u * cos2_u / (d2 * d2)


# ---------------------------------------------------------------------------
# Warps (math/mapping.h, rtmath.cuh)
# ---------------------------------------------------------------------------

def square_to_cosine_hemisphere(u: jnp.ndarray) -> jnp.ndarray:
    """u: (..., 2) uniform -> cosine-weighted unit dir around +z
    (rtmath.cuh:13-20; pdfW = cos/pi).
    """
    x, y = u[..., 0], u[..., 1]
    r = jnp.sqrt(jnp.maximum(1.0 - x, 0.0))
    phi = TWO_PI * y
    return jnp.stack(
        [jnp.cos(phi) * r, jnp.sin(phi) * r, jnp.sqrt(jnp.maximum(x, 0.0))],
        axis=-1,
    )


def square_to_power_cosine(u: jnp.ndarray, exponent: jnp.ndarray) -> jnp.ndarray:
    """u -> direction with pdfW = (n+1)/(2pi) cos^n(theta) around +z
    (rtmaterial.cuh:120-134).
    """
    cos_t = jnp.power(u[..., 0], 1.0 / (exponent + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = TWO_PI * u[..., 1]
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


def square_to_barycentric(u: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform triangle warp (rtmath.cuh:22-27): beta=sqrt(x)(1-y), gamma=sqrt(x)y."""
    s = jnp.sqrt(u[..., 0])
    return s * (1.0 - u[..., 1]), s * u[..., 1]


def square_to_solid_angle(u: jnp.ndarray, half_angle: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction in a cone of half_angle around +z
    (lighttracing.cu:382-390; Total Compendium (34)).
    """
    phi = TWO_PI * u[..., 0]
    z = 1.0 - u[..., 1] * (1.0 - jnp.cos(half_angle))
    l = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([jnp.cos(phi) * l, jnp.sin(phi) * l, z], axis=-1)


def balance_heuristic(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """pdfA/(pdfA+pdfB), 0 when both vanish (photonsplatinstanced.frag:101-106)."""
    s = pdf_a + pdf_b
    return jnp.where(s > 1e-8, pdf_a / jnp.maximum(s, 1e-20), 0.0)


def max_heuristic(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """1 if pdfA > pdfB else 0 (lighttracing.cu:259-266)."""
    return jnp.where(pdf_a > pdf_b, 1.0, 0.0)


def power_heuristic2(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Power-2 heuristic (lighttracing.cu:268-273)."""
    return balance_heuristic(pdf_a * pdf_a, pdf_b * pdf_b)


# ---------------------------------------------------------------------------
# TPU-friendly row gather
# ---------------------------------------------------------------------------

# Tables at or below this row count are gathered via a one-hot matmul on the
# MXU; XLA's native gather runs at ~0.2 G elems/s on TPU (measured), which
# made per-bounce material/normal lookups dominate small-scene path tracing.
ONEHOT_GATHER_MAX = 256


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[idx] along axis 0, fast on TPU for small tables.

    Small tables: one-hot (N, T) matmul — pure MXU/VPU work.  Large tables
    fall back to the native gather.  Exact for f32 tables, bools, and ints
    below 2^24 (the one-hot dot accumulates in f32).
    """
    t = table.shape[0]
    if t > ONEHOT_GATHER_MAX or table.ndim > 2:
        return jnp.take(table, idx, axis=0)
    onehot = (idx[:, None] == jnp.arange(t, dtype=idx.dtype)[None, :])
    onehot = onehot.astype(jnp.float32)
    tab = table if table.ndim == 2 else table[:, None]
    out = onehot @ tab.astype(jnp.float32)
    if table.ndim == 1:
        out = out[:, 0]
    if table.dtype == jnp.bool_:
        return out > 0.5
    if jnp.issubdtype(table.dtype, jnp.integer):
        return jnp.round(out).astype(table.dtype)
    return out.astype(table.dtype)
