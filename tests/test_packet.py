"""Pallas packet traversal (interpret mode on CPU) vs oracles — both the
v1 SoA kernel and the v2 VMEM-packed kernel (the dispatch default on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evplp_tpu.accel.bvh import build_bvh
from evplp_tpu.trace import packet, packet3
from evplp_tpu.trace.intersect import Triangles, intersect_closest_brute


@pytest.fixture(autouse=True)
def _interpret():
    packet.set_interpret(True)
    packet3.set_interpret(True)
    yield
    packet.set_interpret(False)
    packet3.set_interpret(False)


def _scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    v0, v1, v2 = base, base + e1, base + e2
    bvh, perm = build_bvh(v0, v1, v2, pack=True)
    v0, v1, v2 = v0[perm], v1[perm], v2[perm]
    e1, e2 = v1 - v0, v2 - v0
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    tris = Triangles(v0=jnp.asarray(v0), e1=jnp.asarray(e1),
                     e2=jnp.asarray(e2), n=jnp.asarray(nrm.astype(np.float32)))
    return tris, bvh


def _rays(r=300, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (r, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (r, 3)).astype(np.float32))
    return o, d


def test_packet_closest_matches_oracle():
    tris, bvh = _scene()
    o, d = _rays()
    t, prim, u, v = packet.packet_trace(tris, bvh, o, d, 1e-4, 3e38,
                                        any_hit=False)
    ref = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=3e38)
    np.testing.assert_array_equal(np.asarray(prim >= 0),
                                  np.asarray(ref.prim >= 0))
    m = np.asarray(prim >= 0)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(prim)[m], np.asarray(ref.prim)[m])


def test_packet_any_matches_oracle():
    tris, bvh = _scene(n=150, seed=5)
    o, d = _rays(r=257, seed=6)
    _, prim, _, _ = packet.packet_trace(tris, bvh, o, d, 1e-3, 2.0,
                                        any_hit=True)
    ref = intersect_closest_brute(tris, o, d, t_min=1e-3, t_max=2.0)
    np.testing.assert_array_equal(np.asarray(prim >= 0),
                                  np.asarray(ref.prim >= 0))


def test_packet3_closest_matches_oracle():
    tris, bvh = _scene(n=311, seed=2)
    o, d = _rays(r=300, seed=3)
    t, prim, u, v = packet3.packet3_trace(
        bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
        o, d, 1e-4, 3e38, rows=4, npack=2)
    ref = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=3e38)
    np.testing.assert_array_equal(np.asarray(prim >= 0),
                                  np.asarray(ref.prim >= 0))
    m = np.asarray(prim >= 0)
    np.testing.assert_array_equal(np.asarray(prim)[m], np.asarray(ref.prim)[m])
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(ref.u)[m],
                               atol=1e-4)


def test_packet3_any_matches_oracle_with_dead_lanes():
    tris, bvh = _scene(n=150, seed=7)
    o, d = _rays(r=257, seed=8)
    # pre-culled lanes (empty interval) report a fake hit; live lanes exact
    tmax = jnp.where(jnp.arange(257) % 3 == 0, 0.0, 2.0)
    _, prim, _, _ = packet3.packet3_trace(
        bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
        o, d, jnp.full((257,), 1e-3), tmax, any_hit=True, rows=4, npack=2)
    ref = intersect_closest_brute(tris, o, d, t_min=1e-3, t_max=2.0)
    live = np.arange(257) % 3 != 0
    np.testing.assert_array_equal(np.asarray(prim >= 0)[live],
                                  np.asarray(ref.prim >= 0)[live])
    assert (np.asarray(prim >= 0)[~live]).all()  # dead lanes: fake hit


def test_intersect_tile_swizzle_roundtrip():
    """tile_shape must not change results (pure reorder, incl. row pad)."""
    from evplp_tpu.trace import intersect as isect
    tris, bvh = _scene(n=311, seed=2)
    rng = np.random.default_rng(0)
    ht, w = 96, isect.SWIZZLE_TW   # 96 % 64 != 0 -> exercises row padding
    o = jnp.asarray(rng.uniform(-2, 2, (ht * w, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (ht * w, 3)).astype(np.float32))
    tmin = jnp.full((ht * w,), 1e-4)
    tmax = jnp.full((ht * w,), 3.4e38)
    t0, p0, u0, v0 = isect._packet_trace(bvh, o, d, tmin, tmax, False, None)
    t1, p1, u1, v1 = isect._packet_trace(bvh, o, d, tmin, tmax, False,
                                         (ht, w))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1), rtol=1e-6)


def test_coincident_centroids_no_fat_leaves():
    """Identical triangles (coincident centroids) must still split to
    leaf_size (the packed layout cannot represent fat leaves)."""
    v0 = np.zeros((50, 3), np.float32)
    v1 = np.tile(np.asarray([[1, 0, 0]], np.float32), (50, 1))
    v2 = np.tile(np.asarray([[0, 1, 0]], np.float32), (50, 1))
    bvh, perm = build_bvh(v0, v1, v2, pack=True)
    assert int(jnp.max(bvh.node_count)) <= 8


@pytest.mark.parametrize("leaf_size", [16, 32, 112])
def test_packet3_multirow_leaves_match_oracle(leaf_size):
    """rpl>1 packing (16/32/112-triangle leaves; 2/4/8 rows per leaf) must
    give identical hits — traversal shrinks node count, drains expand rows.
    leaf 112 (rpl 8) exercises the ROLLED drain row loop (rpl > 4)."""
    rng = np.random.default_rng(11)
    n = 170
    base = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    v0 = base
    v1 = base + rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    v2 = base + rng.normal(0, 0.25, (n, 3)).astype(np.float32)
    bvh, perm = build_bvh(v0, v1, v2, leaf_size=leaf_size, pack=True)
    assert bvh.rpl == -(-leaf_size // 14)
    v0, v1, v2 = v0[perm], v1[perm], v2[perm]
    e1, e2 = v1 - v0, v2 - v0
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    tris = Triangles(v0=jnp.asarray(v0), e1=jnp.asarray(e1),
                     e2=jnp.asarray(e2), n=jnp.asarray(nrm.astype(np.float32)))

    o, d = _rays(r=160, seed=12)
    t, prim, u, v = packet3.packet3_trace(
        bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
        o, d, 1e-4, 3e38, rows=4, npack=2, rpl=bvh.rpl)
    ref = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=3e38)
    np.testing.assert_array_equal(np.asarray(prim >= 0),
                                  np.asarray(ref.prim >= 0))
    m = np.asarray(prim >= 0)
    np.testing.assert_array_equal(np.asarray(prim)[m], np.asarray(ref.prim)[m])
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)

    # any-hit with the same packing
    occ, _prim, _, _ = packet3.packet3_trace(
        bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
        o, d, jnp.full((160,), 1e-4), jnp.full((160,), 2.0),
        any_hit=True, rows=4, npack=2, rpl=bvh.rpl)
    ref2 = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=2.0)
    np.testing.assert_array_equal(np.asarray(_prim >= 0),
                                  np.asarray(ref2.prim >= 0))


def test_sorted_trace_equals_unsorted():
    """_sorted_packet_trace is a pure permutation wrapper: results must be
    lane-for-lane identical to the direct packet trace."""
    from evplp_tpu.trace import intersect as isect
    tris, bvh = _scene(n=200, seed=9)
    o, d = _rays(r=300, seed=10)
    tmin = jnp.full((300,), 1e-4)
    tmax = jnp.full((300,), 3e38)
    t0, p0, u0, v0 = isect._packet_trace(bvh, o, d, tmin, tmax, False, None)
    t1, p1, u1, v1 = isect._sorted_packet_trace(bvh, o, d, tmin, tmax, False)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))


def test_packet7_two_level_matches_oracle():
    """packet7 (two-level loop: tiny traversal body + burst drains) vs
    oracle: closest incl. prim/t/u and any-hit with dead lanes; also a
    multi-row-leaf (rpl=2) build."""
    from evplp_tpu.trace import packet7
    packet7.set_interpret(True)
    try:
        tris, bvh = _scene(n=311, seed=2)
        o, d = _rays(r=300, seed=3)
        t, prim, u, v = packet7.packet7_trace(
            bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
            o, d, 1e-4, 3e38, rows=4, npack=2)
        ref = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=3e38)
        np.testing.assert_array_equal(np.asarray(prim >= 0),
                                      np.asarray(ref.prim >= 0))
        m = np.asarray(prim >= 0)
        np.testing.assert_array_equal(np.asarray(prim)[m],
                                      np.asarray(ref.prim)[m])
        np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(u)[m], np.asarray(ref.u)[m],
                                   atol=1e-4)

        tmax = jnp.where(jnp.arange(300) % 3 == 0, 0.0, 2.0)
        _, p2, _, _ = packet7.packet7_trace(
            bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
            o, d, jnp.full((300,), 1e-3), tmax, any_hit=True,
            rows=4, npack=2)
        ref2 = intersect_closest_brute(tris, o, d, t_min=1e-3, t_max=2.0)
        live = np.arange(300) % 3 != 0
        np.testing.assert_array_equal(np.asarray(p2 >= 0)[live],
                                      np.asarray(ref2.prim >= 0)[live])
        assert (np.asarray(p2 >= 0)[~live]).all()

        # rpl=2 (16-triangle leaves)
        v0 = np.asarray(tris.v0)
        v1 = v0 + np.asarray(tris.e1)
        v2 = v0 + np.asarray(tris.e2)
        from evplp_tpu.accel.bvh import build_bvh
        bvh16, perm = build_bvh(v0, v1, v2, leaf_size=16, pack=True)
        t3, p3_, _, _ = packet7.packet7_trace(
            bvh16.pk_tri_rows, bvh16.pk_meta, bvh16.pk_bounds,
            bvh16.pk_prim_map, o, d, 1e-4, 3e38, rows=4, npack=2, rpl=2)
        m3 = np.asarray(p3_ >= 0)
        np.testing.assert_array_equal(m3, np.asarray(ref.prim >= 0))
        np.testing.assert_allclose(np.asarray(t3)[m3],
                                   np.asarray(ref.t)[m3], rtol=1e-4)
    finally:
        packet7.set_interpret(False)


def test_packet3_fused_nodes_matches_oracle():
    """Fused node rows (meta in bounds lanes 6/7, carried meta words,
    triple-wide stack) vs oracle, closest + any-hit, leaf 32 (rpl=4)."""
    tris, bvh = _scene(n=311, seed=2)
    v0 = np.asarray(tris.v0)
    v1 = v0 + np.asarray(tris.e1)
    v2 = v0 + np.asarray(tris.e2)
    from evplp_tpu.accel.bvh import build_bvh
    bvh32, perm = build_bvh(v0, v1, v2, leaf_size=32, pack=True,
                            fused_nodes=True)
    assert bvh32.fused_nodes and bvh32.rpl == 3
    o, d = _rays(r=300, seed=3)
    t, prim, u, v = packet3.packet3_trace(
        bvh32.pk_tri_rows, bvh32.pk_meta, bvh32.pk_bounds,
        bvh32.pk_prim_map, o, d, 1e-4, 3e38, rows=4, npack=2, rpl=3,
        fused=True)
    ref = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=3e38)
    np.testing.assert_array_equal(np.asarray(prim >= 0),
                                  np.asarray(ref.prim >= 0))
    m = np.asarray(prim >= 0)
    np.testing.assert_array_equal(np.asarray(prim)[m],
                                  np.asarray(ref.prim)[m])
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)

    tmax = jnp.where(jnp.arange(300) % 3 == 0, 0.0, 2.0)
    _, p2, _, _ = packet3.packet3_trace(
        bvh32.pk_tri_rows, bvh32.pk_meta, bvh32.pk_bounds,
        bvh32.pk_prim_map, o, d, jnp.full((300,), 1e-3), tmax,
        any_hit=True, rows=4, npack=2, rpl=3, fused=True)
    ref2 = intersect_closest_brute(tris, o, d, t_min=1e-3, t_max=2.0)
    live = np.arange(300) % 3 != 0
    np.testing.assert_array_equal(np.asarray(p2 >= 0)[live],
                                  np.asarray(ref2.prim >= 0)[live])


def test_packet3_stream_tris_matches_oracle():
    """HBM-streamed triangle rows (enqueue-time per-slot DMA into VMEM
    staging) vs oracle — the >1.6M-triangle path's kernel mechanics on a
    small fused-layout scene."""
    tris, bvh = _scene(n=311, seed=2)
    v0 = np.asarray(tris.v0)
    v1 = v0 + np.asarray(tris.e1)
    v2 = v0 + np.asarray(tris.e2)
    from evplp_tpu.accel.bvh import build_bvh
    bvhf, perm = build_bvh(v0, v1, v2, leaf_size=42, pack=True,
                           fused_nodes=True)
    o, d = _rays(r=300, seed=3)
    t, prim, u, v = packet3.packet3_trace(
        bvhf.pk_tri_rows, bvhf.pk_meta, bvhf.pk_bounds, bvhf.pk_prim_map,
        o, d, 1e-4, 3e38, rows=4, npack=2, rpl=bvhf.rpl, fused=True,
        stream_tris=True)
    ref = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=3e38)
    np.testing.assert_array_equal(np.asarray(prim >= 0),
                                  np.asarray(ref.prim >= 0))
    m = np.asarray(prim >= 0)
    np.testing.assert_array_equal(np.asarray(prim)[m],
                                  np.asarray(ref.prim)[m])
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)

    # any-hit with pre-culled lanes through the same streamed drain
    tmax = jnp.where(jnp.arange(300) % 3 == 0, 0.0, 2.0)
    _, p2, _, _ = packet3.packet3_trace(
        bvhf.pk_tri_rows, bvhf.pk_meta, bvhf.pk_bounds, bvhf.pk_prim_map,
        o, d, jnp.full((300,), 1e-3), tmax, any_hit=True, rows=4, npack=2,
        rpl=bvhf.rpl, fused=True, stream_tris=True)
    ref2 = intersect_closest_brute(tris, o, d, t_min=1e-3, t_max=2.0)
    live = np.arange(300) % 3 != 0
    np.testing.assert_array_equal(np.asarray(p2 >= 0)[live],
                                  np.asarray(ref2.prim >= 0)[live])


def test_packet3_packed16_nodes_matches_oracle():
    """16-nodes-per-row bounds layout (pltpu.roll node fetch) + streamed
    tri rows vs oracle — the >3.2M-triangle path's mechanics at test
    scale."""
    tris, bvh = _scene(n=311, seed=2)
    v0 = np.asarray(tris.v0)
    v1 = v0 + np.asarray(tris.e1)
    v2 = v0 + np.asarray(tris.e2)
    from evplp_tpu.accel.bvh import build_bvh
    bvhp, perm = build_bvh(v0, v1, v2, leaf_size=42, pack=True,
                           fused_nodes=True, packed_nodes=True)
    assert bvhp.packed16 and bvhp.pk_bounds.shape[1] == 128
    o, d = _rays(r=300, seed=3)
    for stream in (False, True):
        t, prim, u, v = packet3.packet3_trace(
            bvhp.pk_tri_rows, bvhp.pk_meta, bvhp.pk_bounds,
            bvhp.pk_prim_map, o, d, 1e-4, 3e38, rows=4, npack=2,
            rpl=bvhp.rpl, fused=True, stream_tris=stream, packed16=True)
        ref = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=3e38)
        np.testing.assert_array_equal(np.asarray(prim >= 0),
                                      np.asarray(ref.prim >= 0))
        m = np.asarray(prim >= 0)
        np.testing.assert_array_equal(np.asarray(prim)[m],
                                      np.asarray(ref.prim)[m])
        np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                                   rtol=1e-4)


def test_packed16_auto_selection_uses_padded_slot_count(monkeypatch):
    """Regression: the packed16 auto-choice must key on the PADDED slot
    count (what intersect's caps compare against), not the raw triangle
    count — a raw-count threshold left a padding-inflation band with no
    usable packet path, and the vmapped fallback's materialized
    broadcasts OOM'd HBM at gather scale (killed the TPU worker)."""
    from evplp_tpu.trace import intersect as it
    tris, _ = _scene(n=311, seed=2)
    v0 = np.asarray(tris.v0)
    v1 = v0 + np.asarray(tris.e1)
    v2 = v0 + np.asarray(tris.e2)

    # raw count below the (patched) cap, padded slot count above it
    bvh_ref, _ = build_bvh(v0, v1, v2, leaf_size=42, pack=True,
                           fused_nodes=True, packed_nodes=False)
    padded = int(bvh_ref.pk_prim_map.shape[0])
    assert padded > v0.shape[0]
    monkeypatch.setattr("evplp_tpu.trace.intersect.STREAM_CAP",
                        (v0.shape[0] + padded) // 2)

    bvh_auto, _ = build_bvh(v0, v1, v2, leaf_size=42, pack=True,
                            fused_nodes=True, packed_nodes=None)
    assert bvh_auto.packed16, \
        "auto packed16 must trigger when the padded slot count exceeds " \
        "the streamed cap even though the raw triangle count does not"
    # and the dispatch accepts the scene on the packet path
    monkeypatch.setattr("evplp_tpu.trace.intersect.STREAM_TRIS", "1")
    tris_pad = Triangles(
        v0=jnp.zeros((padded, 3)), e1=jnp.zeros((padded, 3)),
        e2=jnp.zeros((padded, 3)), n=jnp.zeros((padded, 3)))
    assert it._stream_tris(tris_pad, bvh_auto)
    cap = it.PACKED16_CAP if bvh_auto.packed16 else it.STREAM_CAP
    assert padded <= cap


@pytest.mark.parametrize("smem,gather", [(False, False), (False, True),
                                         (True, False), (True, True)])
def test_packet3_meta_mode_matrix(smem, gather):
    """SMEM meta words and vector-domain drain gathers are pure layout /
    scheduling variants: every (smem_meta, drain_gather) combination must
    agree with the dense oracle exactly (smem is the auto default below
    SMEM_META_NODE_CAP; extract meta stays the big-scene path;
    drain_gather is the measured-rejected alternate)."""
    tris, bvh = _scene(n=700, seed=9)
    o, d = _rays(r=400, seed=13)
    t, prim, u, v = packet3.packet3_trace(
        bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
        o, d, 1e-4, 3e38, rows=4, npack=2,
        smem_meta=smem, drain_gather=gather)
    ref = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=3e38)
    np.testing.assert_array_equal(np.asarray(prim >= 0),
                                  np.asarray(ref.prim >= 0))
    m = np.asarray(prim >= 0)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)
