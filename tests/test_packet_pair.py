"""Paired-trace kernel (closest A + any-hit segment B per lane, shared
origin — PT's per-vertex workload) vs oracles, interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evplp_tpu.accel.bvh import build_bvh
from evplp_tpu.trace import packet_pair
from evplp_tpu.trace.intersect import Triangles, intersect_closest_brute


@pytest.fixture(autouse=True)
def _interpret():
    packet_pair.set_interpret(True)
    yield
    packet_pair.set_interpret(False)


def _scene(n=200, seed=0, **bvh_kw):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    v0, v1, v2 = base, base + e1, base + e2
    bvh, perm = build_bvh(v0, v1, v2, pack=True, **bvh_kw)
    v0, v1, v2 = v0[perm], v1[perm], v2[perm]
    e1, e2 = v1 - v0, v2 - v0
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    tris = Triangles(v0=jnp.asarray(v0), e1=jnp.asarray(e1),
                     e2=jnp.asarray(e2), n=jnp.asarray(nrm.astype(np.float32)))
    return tris, bvh


def _pair_rays(r=300, seed=1):
    """Shared origins; ray A directions + segment B endpoints (PT shape:
    A = BRDF extension sample, B = toward one light point)."""
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (r, 3)).astype(np.float32))
    da = jnp.asarray(rng.normal(0, 1, (r, 3)).astype(np.float32))
    seg_to = jnp.asarray(
        (rng.uniform(-0.6, 0.6, (r, 3)) + np.array([0, 1.5, 0]))
        .astype(np.float32))
    return o, da, seg_to


def _check(tris, bvh, o, da, seg_to, tmax_a, tmin_b, tmax_b, rpl=1,
           fused=False, rows=4, npack=2):
    db = seg_to - o
    t, prim, u, v, occ = packet_pair.packet_pair_trace(
        bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
        o, da, jnp.full((o.shape[0],), 1e-4), tmax_a, db, tmin_b, tmax_b,
        rows=rows, npack=npack, rpl=rpl, fused=fused)

    live_a = np.asarray(tmax_a) > 1e-4
    ref_a = intersect_closest_brute(tris, o, da, t_min=1e-4, t_max=3e38)
    np.testing.assert_array_equal(np.asarray(prim >= 0)[live_a],
                                  np.asarray(ref_a.prim >= 0)[live_a])
    m = np.asarray(prim >= 0) & live_a
    np.testing.assert_array_equal(np.asarray(prim)[m],
                                  np.asarray(ref_a.prim)[m])
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref_a.t)[m],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(ref_a.u)[m],
                               atol=1e-4)

    live_b = np.asarray(tmax_b) > np.asarray(tmin_b)
    ref_b = intersect_closest_brute(tris, o, db, t_min=tmin_b, t_max=tmax_b)
    np.testing.assert_array_equal(np.asarray(occ)[live_b],
                                  np.asarray(ref_b.prim >= 0)[live_b])
    assert np.asarray(occ)[~live_b].all()  # pre-culled lanes: fake hit


def test_pair_matches_oracles():
    tris, bvh = _scene(n=311, seed=2)
    o, da, seg_to = _pair_rays(r=300, seed=3)
    r = o.shape[0]
    _check(tris, bvh, o, da, seg_to,
           tmax_a=jnp.full((r,), 3e38), tmin_b=jnp.full((r,), 1e-3),
           tmax_b=jnp.full((r,), 1.0 - 1e-3))


def test_pair_dead_lanes_mixed():
    """Independently dead A lanes (RR-terminated) and dead B lanes
    (pre-culled segments) — each ray's live lanes stay exact."""
    tris, bvh = _scene(n=150, seed=7)
    o, da, seg_to = _pair_rays(r=257, seed=8)
    r = o.shape[0]
    idx = np.arange(r)
    tmax_a = jnp.where(jnp.asarray(idx % 3 == 0), 0.0, 3e38)
    tmax_b = jnp.where(jnp.asarray(idx % 4 == 0), 0.0, 1.0 - 1e-3)
    _check(tris, bvh, o, da, seg_to, tmax_a=tmax_a,
           tmin_b=jnp.full((r,), 1e-3), tmax_b=tmax_b)


def test_pair_fused_nodes_rpl():
    """Fused node layout (meta in bounds lanes, carried words) + rpl=3."""
    tris, bvh = _scene(n=311, seed=2, leaf_size=32, fused_nodes=True)
    assert bvh.fused_nodes and bvh.rpl == 3
    o, da, seg_to = _pair_rays(r=300, seed=9)
    r = o.shape[0]
    _check(tris, bvh, o, da, seg_to,
           tmax_a=jnp.full((r,), 3e38), tmin_b=jnp.full((r,), 1e-3),
           tmax_b=jnp.full((r,), 1.0 - 1e-3), rpl=3, fused=True)


def test_sorted_pair_trace_matches_separate():
    """The shared-sort dispatch path (one permutation, packed row gather)
    returns lane-exact results vs the unsorted kernel call."""
    from evplp_tpu.trace import intersect as isect

    tris, bvh = _scene(n=311, seed=12)
    o, da, seg_to = _pair_rays(r=500, seed=13)
    r = o.shape[0]
    tmin_a = jnp.full((r,), 1e-5)
    tmax_a = jnp.where(jnp.asarray(np.arange(r) % 5 == 0), 0.0, 3e38)
    db = seg_to - o
    tmin_b = jnp.full((r,), 1e-4)
    tmax_b = jnp.where(jnp.asarray(np.arange(r) % 7 == 0), 0.0, 1.0 - 1e-4)

    t_s, prim_s, u_s, v_s, occ_s = isect._sorted_pair_trace(
        bvh, o, da, tmin_a, tmax_a, db, tmin_b, tmax_b)
    t_r, prim_r, u_r, v_r, occ_r = packet_pair.packet_pair_trace(
        bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
        o, da, tmin_a, tmax_a, db, tmin_b, tmax_b, rows=4, npack=2)

    live_a = np.asarray(tmax_a) > 0
    live_b = np.asarray(tmax_b) > np.asarray(tmin_b)
    np.testing.assert_array_equal(np.asarray(prim_s)[live_a],
                                  np.asarray(prim_r)[live_a])
    np.testing.assert_allclose(np.asarray(t_s)[live_a],
                               np.asarray(t_r)[live_a], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(occ_s)[live_b],
                                  np.asarray(occ_r)[live_b])


def test_sorted_shared_trace_matches_oracles():
    """The shared-permutation TWO-dispatch path (the PT bounce-vertex
    default: one argsort serves the extension closest trace AND the NEE
    any-hit trace) matches the brute oracles on every live lane, with
    independently dead A/B lanes mixed in."""
    from evplp_tpu.trace import intersect as isect
    from evplp_tpu.trace import packet3

    packet3.set_interpret(True)
    try:
        tris, bvh = _scene(n=311, seed=31)
        o, da, seg_to = _pair_rays(r=500, seed=32)
        r = o.shape[0]
        idx = np.arange(r)
        tmin_a = jnp.full((r,), 1e-5)
        tmax_a = jnp.where(jnp.asarray(idx % 5 == 0), 0.0, 3e38)
        db = seg_to - o
        tmin_b = jnp.full((r,), 1e-4)
        tmax_b = jnp.where(jnp.asarray(idx % 7 == 0), 0.0, 1.0 - 1e-4)

        t, prim, u, v, occ = isect._sorted_shared_trace(
            bvh, o, da, tmin_a, tmax_a, db, tmin_b, tmax_b)

        live_a = np.asarray(tmax_a) > 0
        ref_a = intersect_closest_brute(tris, o, da, t_min=1e-5, t_max=3e38)
        np.testing.assert_array_equal(np.asarray(prim)[live_a],
                                      np.asarray(ref_a.prim)[live_a])
        m = (np.asarray(prim) >= 0) & live_a
        np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref_a.t)[m],
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(u)[m], np.asarray(ref_a.u)[m],
                                   atol=1e-4)

        live_b = np.asarray(tmax_b) > np.asarray(tmin_b)
        ref_b = intersect_closest_brute(tris, o, db, t_min=tmin_b,
                                        t_max=tmax_b)
        np.testing.assert_array_equal(np.asarray(occ)[live_b],
                                      np.asarray(ref_b.prim >= 0)[live_b])
    finally:
        packet3.set_interpret(False)


def test_closest_and_segment_fallback_matches_separate():
    """Off the packet path (CPU/brute), the paired entry must equal the
    separate intersect_closest + occluded_segment calls exactly."""
    from evplp_tpu.trace.intersect import (closest_and_segment,
                                           intersect_closest,
                                           occluded_segment)

    tris, _bvh = _scene(n=120, seed=21)  # brute-force regime
    from evplp_tpu.accel.bvh import build_bvh
    v0 = np.asarray(tris.v0)
    v1 = v0 + np.asarray(tris.e1)
    v2 = v0 + np.asarray(tris.e2)
    bvh, _ = build_bvh(v0, v1, v2, pack=False)
    o, da, seg_to = _pair_rays(r=200, seed=22)
    live = jnp.asarray(np.arange(200) % 3 != 0)

    hit, occ = closest_and_segment(tris, bvh, o, da, t_min=1e-5,
                                   t_max=3e38, seg_to=seg_to,
                                   seg_eps=1e-4, seg_live=live)
    ref = intersect_closest(tris, bvh, o, da, t_min=1e-5)
    occ_ref = occluded_segment(tris, bvh, o, seg_to, eps=1e-4, live=live,
                               sort_rays=True)
    np.testing.assert_array_equal(np.asarray(hit.prim), np.asarray(ref.prim))
    m = np.asarray(hit.prim) >= 0  # miss lanes report their t_max arg
    np.testing.assert_array_equal(np.asarray(hit.t)[m], np.asarray(ref.t)[m])
    lv = np.asarray(live)
    np.testing.assert_array_equal(np.asarray(occ)[lv], np.asarray(occ_ref)[lv])


def test_pair_dual_segment_mode():
    """a_any_hit: both rays are occlusion segments (the VPL dual-record
    shape) — each side matches the brute any-hit oracle, incl. mixed
    pre-culled lanes and the all-resolved early exit."""
    tris, bvh = _scene(n=200, seed=30)
    rng = np.random.default_rng(31)
    r = 300
    o = jnp.asarray(rng.uniform(-2, 2, (r, 3)).astype(np.float32))
    to_a = jnp.asarray(rng.uniform(-1, 1, (r, 3)).astype(np.float32))
    to_b = to_a + jnp.asarray(
        rng.normal(0, 0.3, (r, 3)).astype(np.float32))  # adjacent targets
    da, db = to_a - o, to_b - o
    idx = np.arange(r)
    eps = 1e-3
    tmax_a = jnp.where(jnp.asarray(idx % 5 == 0), 0.0, 1.0 - eps)
    tmax_b = jnp.where(jnp.asarray(idx % 7 == 0), 0.0, 1.0 - eps)
    tmin = jnp.full((r,), eps)

    _, pa, _, _, occ_b = packet_pair.packet_pair_trace(
        bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
        o, da, tmin, tmax_a, db, tmin, tmax_b, rows=4, npack=2,
        a_any_hit=True)
    occ_a = np.asarray(pa) >= 0

    ref_a = intersect_closest_brute(tris, o, da, t_min=eps, t_max=tmax_a)
    ref_b = intersect_closest_brute(tris, o, db, t_min=eps, t_max=tmax_b)
    la = np.asarray(tmax_a) > eps
    lb = np.asarray(tmax_b) > eps
    np.testing.assert_array_equal(occ_a[la], np.asarray(ref_a.prim >= 0)[la])
    np.testing.assert_array_equal(np.asarray(occ_b)[lb],
                                  np.asarray(ref_b.prim >= 0)[lb])
    assert occ_a[~la].all() and np.asarray(occ_b)[~lb].all()


def test_vpl_gather_pairing_matches_unpaired(monkeypatch):
    """VPL_PAIR (Morton-sorted records, two per lane) must leave the gather
    numerically identical up to summation order."""
    import jax as _jax

    from evplp_tpu.integrators import vpl as vplmod
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.light_trace import trace_light_paths
    from evplp_tpu.core.sampling import iteration_key
    from evplp_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    gbuf = trace_gbuffer(scene, 24, 24)
    pm = trace_light_paths(scene, iteration_key(0, 3), 64, 4)
    args = dict(mis_mode=1, pdf_mc=jnp.float32(0.3),
                clamping_value=jnp.float32(0.1), num_vpl_paths=64)

    def run(pair):
        monkeypatch.setattr(vplmod, "VPL_PAIR", pair)
        _jax.clear_caches()  # the flag is read at trace time
        return np.asarray(vplmod.vpl_gather(scene, gbuf, pm, **args))

    base = run(False)
    paired = run(True)
    np.testing.assert_allclose(paired, base, rtol=2e-5, atol=1e-7)
    assert base.any()


def test_vsl_group_occlusion_pairing_matches(monkeypatch):
    """VSL's dual-record group occlusion equals the single-segment path."""
    import jax as _jax

    from evplp_tpu.integrators import vsl as vslmod
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.light_trace import trace_light_paths
    from evplp_tpu.core.sampling import iteration_key
    from evplp_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    gbuf = trace_gbuffer(scene, 16, 16)
    pm = trace_light_paths(scene, iteration_key(0, 5), 8, 4)
    flat = pm.flat()
    recs = {"pos": flat.pos[:8], "normal": flat.normal[:8],
            "flags": flat.flags[:8]}

    def run(pair):
        monkeypatch.setattr(vslmod, "SEG_PAIR", pair)
        _jax.clear_caches()
        return np.asarray(_jax.jit(vslmod._group_occlusion,
                                   static_argnames=("tile_shape",))(
            scene, gbuf.position, gbuf.normal, gbuf.stencil, recs,
            tile_shape=None))

    np.testing.assert_array_equal(run(True), run(False))


def test_occluded_segment_pair_swizzle_branch(monkeypatch):
    """Force the packet+tile-swizzle branch (TPU-only in production) in
    interpret mode: results must equal the separate-dispatch fallback."""
    from evplp_tpu.trace import intersect as isect

    tris, bvh = _scene(n=2500, seed=40)  # above the brute threshold
    rng = np.random.default_rng(41)
    ht, w = 64, 128                      # one swizzle tile
    r = ht * w
    o = jnp.asarray(rng.uniform(-1.5, 1.5, (r, 3)).astype(np.float32))
    to_a = jnp.asarray(rng.uniform(-1, 1, (r, 3)).astype(np.float32))
    to_b = to_a + jnp.asarray(rng.normal(0, 0.2, (r, 3)).astype(np.float32))
    live_a = jnp.asarray(np.arange(r) % 5 != 0)
    live_b = jnp.asarray(np.arange(r) % 7 != 0)

    ref_a = isect.occluded_segment(tris, bvh, o, to_a, eps=1e-4, live=live_a)
    ref_b = isect.occluded_segment(tris, bvh, o, to_b, eps=1e-4, live=live_b)

    monkeypatch.setattr(isect, "_use_packet", lambda t, b: True)
    occ_a, occ_b = isect.occluded_segment_pair(
        tris, bvh, o, to_a, to_b, eps=1e-4, live_a=live_a, live_b=live_b,
        tile_shape=(ht, w))

    la, lb = np.asarray(live_a), np.asarray(live_b)
    np.testing.assert_array_equal(np.asarray(occ_a)[la],
                                  np.asarray(ref_a)[la])
    np.testing.assert_array_equal(np.asarray(occ_b)[lb],
                                  np.asarray(ref_b)[lb])


def test_pair_stream_tris_matches_unstreamed():
    """Streamed pair kernel (HBM tri rows + staging DMA) equals the
    resident-scene kernel, both pair modes."""
    tris, bvh = _scene(n=311, seed=2, leaf_size=42, fused_nodes=True)
    o, da, seg_to = _pair_rays(r=300, seed=9)
    r = o.shape[0]
    db = seg_to - o
    tmin = jnp.full((r,), 1e-4)
    tmax_a = jnp.full((r,), 3e38)
    tmax_b = jnp.full((r,), 1.0 - 1e-4)

    for a_any in (False, True):
        ta = jnp.full((r,), 1.0 - 1e-4) if a_any else tmax_a
        base = packet_pair.packet_pair_trace(
            bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
            o, da, tmin, ta, db, tmin, tmax_b, rows=4, npack=2,
            rpl=bvh.rpl, fused=True, a_any_hit=a_any)
        strm = packet_pair.packet_pair_trace(
            bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
            o, da, tmin, ta, db, tmin, tmax_b, rows=4, npack=2,
            rpl=bvh.rpl, fused=True, a_any_hit=a_any, stream_tris=True)
        np.testing.assert_array_equal(np.asarray(base[1]),
                                      np.asarray(strm[1]))
        np.testing.assert_array_equal(np.asarray(base[4]),
                                      np.asarray(strm[4]))
        if not a_any:
            np.testing.assert_array_equal(np.asarray(base[0]),
                                          np.asarray(strm[0]))


def test_lvc_gather_pairing_matches(monkeypatch):
    """LVC's dual-record scan (two adjacent light-path vertices per step)
    equals the single-record scan up to summation order."""
    import jax as _jax

    from evplp_tpu.integrators import lvc as lvcmod
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.light_trace import trace_light_paths
    from evplp_tpu.core.sampling import iteration_key
    from evplp_tpu.scene.procedural import cornell_box

    scene = cornell_box()
    gbuf = trace_gbuffer(scene, 16, 16)
    pm = trace_light_paths(scene, iteration_key(0, 7), 16, 4)
    args = dict(mis_mode=2, pdf_mc=jnp.float32(0.2),
                clamping_value=jnp.float32(0.1), num_vpl_paths=8)

    def run(pair):
        monkeypatch.setattr(lvcmod, "SEG_PAIR", pair)
        _jax.clear_caches()
        return np.asarray(lvcmod.lvc_gather(scene, gbuf, pm,
                                            iteration_key(9, 0), **args))

    base = run(False)
    paired = run(True)
    np.testing.assert_allclose(paired, base, rtol=2e-5, atol=1e-7)
    assert base.any()


def test_pair_packed16_matches():
    """packed16 node rows through the pair kernel (both ray modes,
    streamed) vs the plain fused layout."""
    tris, bvh = _scene(n=311, seed=2, leaf_size=42, fused_nodes=True)
    v0 = np.asarray(tris.v0)
    v1 = v0 + np.asarray(tris.e1)
    v2 = v0 + np.asarray(tris.e2)
    bvhp, _ = build_bvh(v0, v1, v2, leaf_size=42, pack=True,
                        fused_nodes=True, packed_nodes=True)
    o, da, seg_to = _pair_rays(r=300, seed=9)
    r = o.shape[0]
    db = seg_to - o
    tmin = jnp.full((r,), 1e-4)
    tmax_b = jnp.full((r,), 1.0 - 1e-4)

    for a_any in (False, True):
        ta = jnp.full((r,), 1.0 - 1e-4) if a_any else jnp.full((r,), 3e38)
        base = packet_pair.packet_pair_trace(
            bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
            o, da, tmin, ta, db, tmin, tmax_b, rows=4, npack=2,
            rpl=bvh.rpl, fused=True, a_any_hit=a_any)
        p16 = packet_pair.packet_pair_trace(
            bvhp.pk_tri_rows, bvhp.pk_meta, bvhp.pk_bounds,
            bvhp.pk_prim_map, o, da, tmin, ta, db, tmin, tmax_b,
            rows=4, npack=2, rpl=bvhp.rpl, fused=True, a_any_hit=a_any,
            stream_tris=True, packed16=True)
        np.testing.assert_array_equal(np.asarray(base[1] >= 0),
                                      np.asarray(p16[1] >= 0))
        np.testing.assert_array_equal(np.asarray(base[4]),
                                      np.asarray(p16[4]))
