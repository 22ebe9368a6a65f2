"""Unit tests for warps, ONB, BRDFs, light CDF sampling: closed forms and
furnace-style integrals (the test pyramid the reference lacks, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evplp_tpu.core import brdf
from evplp_tpu.core import mathutil as mu
from evplp_tpu.core import sampling
from evplp_tpu.core.light import build_area_light, light_sample

KEY = jax.random.PRNGKey(7)


def test_orthonormal_basis():
    z = mu.normalize(jax.random.normal(KEY, (1000, 3)))
    x, y = mu.orthonormal_basis(z)
    np.testing.assert_allclose(mu.dot(x, y), 0.0, atol=1e-5)
    np.testing.assert_allclose(mu.dot(x, z), 0.0, atol=1e-5)
    np.testing.assert_allclose(mu.length(x), 1.0, atol=1e-5)
    np.testing.assert_allclose(mu.length(y), 1.0, atol=1e-5)
    # right-handed: cross(x, y) == z
    np.testing.assert_allclose(np.asarray(mu.cross(x, y)), np.asarray(z), atol=1e-5)


def test_cosine_hemisphere_stats():
    u = jax.random.uniform(KEY, (200_000, 2))
    d = mu.square_to_cosine_hemisphere(u)
    np.testing.assert_allclose(mu.length(d), 1.0, atol=1e-4)
    assert float(d[:, 2].min()) >= 0.0
    # E[cos theta] under pdf cos/pi = 2/3
    np.testing.assert_allclose(float(d[:, 2].mean()), 2.0 / 3.0, atol=3e-3)


def test_power_cosine_matches_exponent():
    n = 20.0
    u = jax.random.uniform(KEY, (200_000, 2))
    d = mu.square_to_power_cosine(u, jnp.float32(n))
    # E[cos] for pdf ~ cos^n on hemisphere = (n+1)/(n+2)
    np.testing.assert_allclose(float(d[:, 2].mean()), (n + 1) / (n + 2), atol=2e-3)


def test_barycentric_uniform():
    u = jax.random.uniform(KEY, (100_000, 2))
    b, g = mu.square_to_barycentric(u)
    a = 1.0 - b - g
    assert float(jnp.min(a)) >= -1e-6
    # each coordinate's mean is 1/3 for uniform triangle samples
    np.testing.assert_allclose(float(b.mean()), 1 / 3, atol=3e-3)
    np.testing.assert_allclose(float(g.mean()), 1 / 3, atol=3e-3)


def test_solid_angle_cone():
    half = jnp.float32(0.4)
    u = jax.random.uniform(KEY, (100_000, 2))
    d = mu.square_to_solid_angle(u, half)
    assert float(d[:, 2].min()) >= float(jnp.cos(half)) - 1e-5
    # E[z] for uniform cone = (1 + cos)/2
    np.testing.assert_allclose(float(d[:, 2].mean()),
                               (1 + float(jnp.cos(half))) / 2, atol=2e-3)


def test_lambert_furnace():
    """MC integral of f*cos over hemisphere == kd (white furnace)."""
    kd = jnp.asarray([0.6, 0.4, 0.2])
    n = jnp.asarray([0.0, 0.0, 1.0])
    u = jax.random.uniform(KEY, (100_000, 2))
    # uniform hemisphere sampling: pdf = 1/(2pi)
    z = u[:, 0]
    phi = 2 * jnp.pi * u[:, 1]
    r = jnp.sqrt(1 - z * z)
    w = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    f = kd[None, :] * brdf.lambert_eval_f(w, w, n)
    integral = (f * z[:, None]).mean(axis=0) * 2 * jnp.pi
    np.testing.assert_allclose(np.asarray(integral), np.asarray(kd), atol=5e-3)


def test_phong_sample_weight_is_unbiased():
    """E[sample weight] must equal the integral of f*cos over the hemisphere."""
    ks = jnp.asarray([0.8, 0.5, 0.3])
    ns = jnp.float32(12.0)
    normal = mu.normalize(jnp.asarray([0.3, 0.2, 0.9]))
    inc = mu.normalize(jnp.asarray([0.4, -0.1, 0.8]))

    nsamp = 400_000
    u2 = jax.random.uniform(KEY, (nsamp, 2))
    incb = jnp.broadcast_to(inc, (nsamp, 3))
    nb = jnp.broadcast_to(normal, (nsamp, 3))
    _, _, w_sample = brdf.phong_sample(u2, incb, nb, ks[None, :], ns)
    est_sample = np.asarray(w_sample.mean(axis=0))

    # independent uniform-hemisphere estimate of the same integral
    u = jax.random.uniform(jax.random.PRNGKey(11), (nsamp, 2))
    z = u[:, 0]
    phi = 2 * jnp.pi * u[:, 1]
    r = jnp.sqrt(1 - z * z)
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    w = mu.from_local(local, jnp.broadcast_to(normal, (nsamp, 3)))
    f = brdf.phong_eval(w, incb, nb, ks[None, :], ns)
    cos_t = jnp.maximum(mu.dot(w, nb), 0.0)
    est_uniform = np.asarray((f * cos_t[:, None]).mean(axis=0) * 2 * jnp.pi)

    np.testing.assert_allclose(est_sample, est_uniform, rtol=0.03)


def test_phong_pdf_normalized():
    """MC check: integral of phong_pdf_w over the sphere == ~1 (lobe fully
    above the surface when inc == normal)."""
    ks = jnp.asarray([[1.0, 1.0, 1.0]])
    ns = jnp.float32(8.0)
    n = jnp.asarray([0.0, 0.0, 1.0])
    nsamp = 400_000
    u = jax.random.uniform(KEY, (nsamp, 2))
    z = 1 - 2 * u[:, 0]
    phi = 2 * jnp.pi * u[:, 1]
    r = jnp.sqrt(jnp.maximum(1 - z * z, 0))
    w = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    pdf = brdf.phong_pdf_w(n, w, jnp.broadcast_to(n, (nsamp, 3)), ks, ns)
    integral = float(pdf.mean() * 4 * jnp.pi)
    assert abs(integral - 1.0) < 0.02


def test_cdf_sampling_proportions():
    cdf = jnp.asarray([0.1, 0.15, 0.75, 1.0])
    u = jax.random.uniform(KEY, (200_000,))
    idx = sampling.sample_cdf(cdf, u)
    counts = np.bincount(np.asarray(idx), minlength=4) / 200_000
    np.testing.assert_allclose(counts, [0.1, 0.05, 0.6, 0.25], atol=5e-3)


def test_area_light_sampling():
    verts = np.asarray([[0, 0, 0], [2, 0, 0], [2, 0, 1], [0, 0, 1]], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    light = build_area_light(verts, idx, np.asarray([3.0, 2.0, 1.0, 0.0]))
    np.testing.assert_allclose(float(light.area), 2.0, rtol=1e-6)
    # intensity premultiplied by pi
    np.testing.assert_allclose(np.asarray(light.intensity[:3]),
                               np.asarray([3, 2, 1]) * np.pi, rtol=1e-6)
    u3 = jax.random.uniform(KEY, (50_000, 3))
    pos, nrm, pdf, emitted = light_sample(light, u3)
    assert float(jnp.abs(pos[:, 1]).max()) < 1e-6
    assert float(pos[:, 0].min()) >= 0 and float(pos[:, 0].max()) <= 2
    np.testing.assert_allclose(np.asarray(pdf), 0.5, rtol=1e-5)
    # uniform over rectangle: mean x = 1, mean z = 0.5
    np.testing.assert_allclose(float(pos[:, 0].mean()), 1.0, atol=0.01)
    np.testing.assert_allclose(float(pos[:, 2].mean()), 0.5, atol=0.01)
    np.testing.assert_allclose(np.asarray(emitted[0]),
                               np.asarray([3, 2, 1]) * np.pi * 2.0, rtol=1e-5)


def test_russian_roulette_conventions():
    t = jnp.asarray([[0.5, 0.2, 0.1], [2.0, 0.1, 0.1], [0.1, 0.05, 0.02]])
    np.testing.assert_allclose(np.asarray(brdf.russian_prob_light(t)),
                               [0.5, 0.98, 0.1], rtol=1e-6)
    # path tracer's quirky floor-at-0.98 variant
    np.testing.assert_allclose(np.asarray(brdf.russian_prob_path(t)),
                               [0.98, 2.0, 0.98], rtol=1e-6)
