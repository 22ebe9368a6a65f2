"""Differential test: the Pallas VSL sample-loop kernel vs the XLA path.

Both draw the same pcg4d counter numbers, so per-record outputs must agree
elementwise to float tolerance (the kernel computes the identical formulas
in plane form)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evplp_tpu.core import mathutil as mu
from evplp_tpu.integrators import vsl, vsl_kernel
from evplp_tpu.integrators.gbuffer import GBuffer
from evplp_tpu.integrators.light_trace import FLAG_VPL


def _rand_dirs(key, n):
    v = jax.random.normal(key, (n, 3))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _make_inputs(seed=0, n=1024, g=4):
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    pos = jax.random.uniform(ks[0], (n, 3), minval=-2.0, maxval=2.0)
    nrm = _rand_dirs(ks[1], n)
    kd = jax.random.uniform(ks[2], (n, 3), maxval=0.6)
    ksp = jax.random.uniform(ks[3], (n, 3), maxval=0.3)
    nsv = jax.random.uniform(ks[4], (n,), minval=1.0, maxval=64.0)
    cam = jnp.asarray([0.0, 0.0, 6.0])
    wi10 = mu.normalize(cam[None] - pos)
    # a few pixels black (kd=ks=0) to exercise the black1 gate
    kd = kd.at[:7].set(0.0)
    ksp = ksp.at[:7].set(0.0)
    gbuf = GBuffer(position=pos, normal=nrm, kd=kd, ks=ksp, ns=nsv,
                   stencil=jnp.ones((n,)), hit_light=jnp.zeros((n,), bool))

    recs = {
        "pos": jax.random.uniform(ks[5], (g, 3), minval=-3.0, maxval=3.0),
        "normal": _rand_dirs(ks[6], g),
        "flux_dir": _rand_dirs(ks[7], g),
        "flux": jax.random.uniform(ks[8], (g, 3), maxval=2.0),
        "kd": jax.random.uniform(ks[9], (g, 3), maxval=0.7),
        "ks": jax.random.uniform(ks[10], (g, 3), maxval=0.3),
        "ns": jax.random.uniform(ks[11], (g,), minval=1.0, maxval=32.0),
        "p_select": jnp.zeros((g,)),
        "flags": jnp.full((g,), FLAG_VPL, jnp.int32),
    }
    gates = jax.random.bernoulli(ks[0], 0.8, (g, n))
    return gbuf, wi10, recs, gates


@pytest.mark.parametrize("rows", [2, 4])
def test_kernel_matches_xla_sample_loop(rows):
    vsl_kernel.set_interpret(True)
    gbuf, wi10, recs, gates = _make_inputs(n=1024, g=4)
    n, g = 1024, 4
    radius = 0.4
    inv_pi_r2 = mu.INV_PI / (radius * radius)
    seed0, seed1 = jnp.uint32(0xDEADBEEF), jnp.uint32(17)
    pixel_ids = jnp.arange(n, dtype=jnp.int32) + 1000
    rec_base = 3

    # ---- XLA path: per-record _sample_record, summed ----
    want = jnp.zeros((n, 3))
    for i in range(g):
        rec = {k: v[i] for k, v in recs.items()}
        rng_ctx = (seed0, seed1, pixel_ids, jnp.int32(rec_base + i))
        want = want + vsl._sample_record(
            gbuf, rec, gates[i], rng_ctx, radius, inv_pi_r2, wi10)

    # ---- kernel path ----
    pix = vsl_kernel.pack_pixels(gbuf.position, gbuf.normal, gbuf.kd,
                                 gbuf.ks, gbuf.ns, wi10)
    mask = jnp.zeros((n,), jnp.int32)
    for i in range(g):
        mask = mask | (gates[i].astype(jnp.int32) << i)
    cosh, cnts = vsl_kernel.ctx_planes(gbuf.position, recs["pos"], radius)
    out = vsl_kernel.vsl_sample_group(
        pix, pixel_ids.reshape(-1, 128), mask.reshape(-1, 128),
        cosh, cnts, vsl_kernel.pack_records(recs, inv_pi_r2),
        jnp.asarray([seed0.astype(jnp.int32), seed1.astype(jnp.int32),
                     rec_base], jnp.int32),
        jnp.asarray([radius], jnp.float32), group=g, rows=rows)
    got = jnp.stack([out[i].reshape(-1) for i in range(3)], axis=-1)

    assert bool(jnp.any(want != 0.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_vsl_gather_kernel_path_matches_xla(monkeypatch):
    """Full vsl_gather with the Pallas sample kernel == the XLA scan path
    (res 64 -> 4096 px = one KERNEL_ROWS block; same counters, same
    draws)."""
    from evplp_tpu.core.sampling import iteration_key
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.light_trace import trace_light_paths
    from evplp_tpu.scene.procedural import cornell_box

    vsl_kernel.set_interpret(True)
    scene = cornell_box()
    res = 64
    gbuf = trace_gbuffer(scene, res, res)
    pm = trace_light_paths(scene, iteration_key(7, 0), 16, 3)
    r = jnp.float32(0.08)
    monkeypatch.setenv("EVPLP_VSL_KERNEL", "1")
    a = vsl.vsl_gather(scene, gbuf, pm, iteration_key(8, 0), r, 16)
    monkeypatch.setenv("EVPLP_VSL_KERNEL", "0")
    b = vsl.vsl_gather(scene, gbuf, pm, iteration_key(8, 0), r, 16)
    a, b = np.asarray(a), np.asarray(b)
    assert a.max() > 0
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)

def test_vsl_gather_chunk_invariance(monkeypatch):
    """Kernel-path dispatch chunking is estimator-invariant: explicit
    16-record chunks == the "auto" default (VSL_RECORD_CHUNK_KERNEL) ==
    one fused scan (record_chunk=None, the shard_map variant), bit for
    bit (draws are a pure function of (pixel, record, s))."""
    from evplp_tpu.core.sampling import iteration_key
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.light_trace import trace_light_paths
    from evplp_tpu.scene.procedural import cornell_box

    vsl_kernel.set_interpret(True)
    monkeypatch.setenv("EVPLP_VSL_KERNEL", "1")
    scene = cornell_box()
    gbuf = trace_gbuffer(scene, 64, 64)
    pm = trace_light_paths(scene, iteration_key(7, 0), 16, 3)
    r = jnp.float32(0.08)
    a = vsl.vsl_gather(scene, gbuf, pm, iteration_key(8, 0), r, 16,
                       record_chunk=16)
    b = vsl.vsl_gather(scene, gbuf, pm, iteration_key(8, 0), r, 16)
    c = vsl.vsl_gather(scene, gbuf, pm, iteration_key(8, 0), r, 16,
                       record_chunk=None)
    a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
    assert a.max() > 0
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
