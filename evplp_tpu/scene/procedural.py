"""Built-in procedural test scenes.

The reference ships three OBJ scenes (conference, livingroom, buddha) as
git-LFS stubs, so tests and benchmarks use procedural geometry with the same
material model: Cornell-style boxes with Lambert walls, a Phong-glossy block,
and a rectangular ceiling area light.

Each scene is defined once as a *spec* (named material groups + light quad +
camera); `_build` turns a spec into a SceneData and scene/export.py writes
the identical spec as reference-format OBJ/MTL + JSON configs (configs/).
"""
from __future__ import annotations

import numpy as np

from evplp_tpu.scene.camera import Camera
from evplp_tpu.scene.scene import SceneData, build_scene


def _quad(p0, p1, p2, p3):
    """Two triangles for quad p0 p1 p2 p3 (ccw)."""
    pos = np.asarray([p0, p1, p2, p3], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    return pos, idx


def _box(lo, hi):
    """Axis-aligned box as 12 triangles, geometric normals outward."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    quads = [
        ([x0, y0, z0], [x1, y0, z0], [x1, y0, z1], [x0, y0, z1]),  # bottom -y
        ([x0, y1, z0], [x0, y1, z1], [x1, y1, z1], [x1, y1, z0]),  # top +y
        ([x0, y0, z0], [x0, y1, z0], [x1, y1, z0], [x1, y0, z0]),  # -z
        ([x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1]),  # +z
        ([x0, y0, z0], [x0, y0, z1], [x0, y1, z1], [x0, y1, z0]),  # -x
        ([x1, y0, z0], [x1, y1, z0], [x1, y1, z1], [x1, y0, z1]),  # +x
    ]
    pos_list, idx_list = [], []
    off = 0
    for q in quads:
        pos, idx = _quad(*q)
        pos_list.append(pos)
        idx_list.append(idx + off)
        off += 4
    return np.concatenate(pos_list), np.concatenate(idx_list)


def _build(spec, aspect: float = 1.0) -> SceneData:
    """SceneData from a spec dict (groups, light, intensity, camera)."""
    cam = spec["camera"]
    camera = Camera(
        origin=tuple(cam["origin"]), look_at=tuple(cam["direction"]),
        up=tuple(cam["up"]), fovy=np.radians(cam["fovy"]), aspect=aspect,
    )
    groups = spec["groups"]
    lpos, lidx = spec["light"]
    return build_scene(
        positions_list=[g[1] for g in groups],
        indices_list=[g[2] for g in groups],
        kd_list=[np.asarray(g[3], np.float32) for g in groups],
        ks_list=[np.asarray(g[4], np.float32) for g in groups],
        ns_list=[g[5] for g in groups],
        light_positions=lpos, light_indices=lidx,
        light_intensity=np.asarray(spec["intensity"], np.float32),
        camera=camera,
    )


def cornell_spec(light_intensity=(12.0, 12.0, 12.0, 0.0),
                 glossy_exponent: float = 30.0) -> dict:
    """Cornell-style box in [0,1]^3, camera on +z looking in.

    Walls Lambert (white/red/green); tall block glossy Phong; short block
    Lambert; area light slightly below the ceiling.
    """
    groups = []

    # room: floor, ceiling, back, left(red), right(green) — inward normals
    room_quads = [
        ("floor", ([0, 0, 0], [0, 0, 1], [1, 0, 1], [1, 0, 0]), (0.73, 0.73, 0.73)),
        ("ceiling", ([0, 1, 0], [1, 1, 0], [1, 1, 1], [0, 1, 1]), (0.73, 0.73, 0.73)),
        ("back", ([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]), (0.73, 0.73, 0.73)),
        ("left", ([0, 0, 0], [0, 1, 0], [0, 1, 1], [0, 0, 1]), (0.65, 0.05, 0.05)),
        ("right", ([1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0]), (0.12, 0.45, 0.15)),
    ]
    for name, quad, kd in room_quads:
        pos, idx = _quad(*quad)
        groups.append((name, pos, idx, kd, (0.0, 0.0, 0.0), 0.0))

    pos, idx = _box([0.10, 0.0, 0.10], [0.40, 0.60, 0.40])
    groups.append(("tallblock", pos, idx, (0.05, 0.05, 0.05),
                   (0.45, 0.45, 0.45), glossy_exponent))
    pos, idx = _box([0.55, 0.0, 0.45], [0.85, 0.30, 0.75])
    groups.append(("shortblock", pos, idx, (0.73, 0.73, 0.73),
                   (0.0, 0.0, 0.0), 0.0))

    ly = 0.995
    light = _quad([0.35, ly, 0.35], [0.65, ly, 0.35],
                  [0.65, ly, 0.65], [0.35, ly, 0.65])  # faces -y (down)
    camera = dict(origin=[0.5, 0.5, 2.6], direction=[0.5, 0.5, 0.0],
                  up=[0.0, 1.0, 0.0], fovy=28.0)
    return dict(groups=groups, light=light,
                intensity=tuple(light_intensity), camera=camera)


def cornell_box(light_intensity=(12.0, 12.0, 12.0, 0.0),
                glossy_exponent: float = 30.0) -> SceneData:
    return _build(cornell_spec(light_intensity, glossy_exponent))


def glossy_spec(light_intensity=(200.0, 190.0, 160.0, 0.0),
                floor_exponent: float = 80.0) -> dict:
    """EVPLP stress scene: glossy floor + blocker + a SMALL bright light.

    Unclamped VPL fireflies hard here (near-singular G terms under the
    blocker and on the glossy floor); clamped VPL alone loses energy; the
    photon-splat compensation restores it — the paper's core trade
    (rtcomphoton.h misModes 4/5 + photonsplatinstanced.frag residuals).
    """
    groups = []
    room_quads = [
        ("floor", ([0, 0, 0], [0, 0, 1], [1, 0, 1], [1, 0, 0]),
         (0.05, 0.05, 0.05), (0.5, 0.5, 0.5), floor_exponent),
        ("ceiling", ([0, 1, 0], [1, 1, 0], [1, 1, 1], [0, 1, 1]),
         (0.73, 0.73, 0.73), (0, 0, 0), 0.0),
        ("back", ([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]),
         (0.73, 0.73, 0.73), (0, 0, 0), 0.0),
        ("left", ([0, 0, 0], [0, 1, 0], [0, 1, 1], [0, 0, 1]),
         (0.65, 0.05, 0.05), (0, 0, 0), 0.0),
        ("right", ([1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0]),
         (0.12, 0.45, 0.15), (0, 0, 0), 0.0),
    ]
    for name, quad, kd, ks, ns in room_quads:
        pos, idx = _quad(*quad)
        groups.append((name, pos, idx, kd, ks, ns))

    # low shelf close under the light: creates near-singular VPL geometry
    pos, idx = _box([0.30, 0.0, 0.30], [0.70, 0.08, 0.70])
    groups.append(("shelf", pos, idx, (0.6, 0.6, 0.6), (0.0, 0.0, 0.0), 0.0))

    ly = 0.12  # light close above the shelf
    light = _quad([0.46, ly, 0.46], [0.54, ly, 0.46],
                  [0.54, ly, 0.54], [0.46, ly, 0.54])  # faces -y
    camera = dict(origin=[0.5, 0.55, 2.6], direction=[0.5, 0.35, 0.0],
                  up=[0.0, 1.0, 0.0], fovy=28.0)
    return dict(groups=groups, light=light,
                intensity=tuple(light_intensity), camera=camera)


def glossy_box(light_intensity=(200.0, 190.0, 160.0, 0.0),
               floor_exponent: float = 80.0) -> SceneData:
    return _build(glossy_spec(light_intensity, floor_exponent))


def box_field_spec(num_boxes: int = 2000, seed: int = 0,
                   light_intensity=(40.0, 38.0, 30.0, 0.0),
                   room_scale: float = 1.0) -> dict:
    """Large scene for BVH-path benchmarking: a field of random boxes
    (~12*num_boxes triangles) in a Cornell-style room with a ceiling light.

    room_scale stretches the room floor plan (x/z) so triangle count can
    grow at CONSTANT box density: with room_scale = sqrt(n/8500) an
    n-box field has the same boxes-per-area as the 102k-triangle
    headline scene (a fixed room at high counts degenerates into box
    fog, which measures scene hardness rather than tracer scaling)."""
    rng = np.random.default_rng(seed)
    groups = []
    w = 4.0 * room_scale

    room_quads = [
        ("floor", ([0, 0, 0], [0, 0, w], [w, 0, w], [w, 0, 0])),
        ("ceiling", ([0, 2, 0], [w, 2, 0], [w, 2, w], [0, 2, w])),
        ("back", ([0, 0, 0], [w, 0, 0], [w, 2, 0], [0, 2, 0])),
        ("left", ([0, 0, 0], [0, 2, 0], [0, 2, w], [0, 0, w])),
        ("right", ([w, 0, 0], [w, 0, w], [w, 2, w], [w, 2, 0])),
    ]
    for name, quad in room_quads:
        pos, idx = _quad(*quad)
        groups.append((name, pos, idx, (0.7, 0.7, 0.7), (0.0, 0.0, 0.0), 0.0))

    centers = rng.uniform([0.2, 0.0, 0.2], [w - 0.2, 1.0, w - 0.2],
                          (num_boxes, 3))
    sizes = rng.uniform(0.02, 0.08, (num_boxes, 3))
    pos_list, idx_list = [], []
    off = 0
    for c, s in zip(centers, sizes):
        pos, idx = _box(c - s, c + s)
        pos_list.append(pos)
        idx_list.append(idx + off)
        off += pos.shape[0]
    groups.append(("boxes", np.concatenate(pos_list),
                   np.concatenate(idx_list),
                   (0.4, 0.45, 0.6), (0.2, 0.2, 0.2), 15.0))

    ly = 1.99
    cx = w / 2.0
    light = _quad([cx - 0.4, ly, cx - 0.4], [cx + 0.4, ly, cx - 0.4],
                  [cx + 0.4, ly, cx + 0.4], [cx - 0.4, ly, cx + 0.4])
    camera = dict(origin=[cx, 1.2, w + 3.0], direction=[cx, 0.8, 0.0],
                  up=[0.0, 1.0, 0.0], fovy=35.0)
    return dict(groups=groups, light=light,
                intensity=tuple(light_intensity), camera=camera)


def box_field(num_boxes: int = 2000, seed: int = 0,
              light_intensity=(40.0, 38.0, 30.0, 0.0),
              room_scale: float = 1.0) -> SceneData:
    return _build(box_field_spec(num_boxes, seed, light_intensity,
                                 room_scale))


def plane_light_scene(light_intensity=(5.0, 5.0, 5.0, 0.0)) -> SceneData:
    """Minimal scene: one diffuse floor + one overhead light quad.

    Has a closed-form direct-lighting answer at the floor center for
    analytic tests.
    """
    fpos, fidx = _quad([-5, 0, -5], [-5, 0, 5], [5, 0, 5], [5, 0, -5])  # +y
    lpos, lidx = _quad([-0.5, 2.0, -0.5], [0.5, 2.0, -0.5],
                       [0.5, 2.0, 0.5], [-0.5, 2.0, 0.5])  # faces -y
    camera = Camera(
        origin=(0.0, 1.0, 4.0), look_at=(0.0, 0.5, 0.0), up=(0.0, 1.0, 0.0),
        fovy=np.radians(45.0), aspect=1.0,
    )
    return build_scene(
        positions_list=[fpos], indices_list=[fidx],
        kd_list=[np.asarray([0.5, 0.5, 0.5], np.float32)],
        ks_list=[np.zeros(3, np.float32)], ns_list=[0.0],
        light_positions=lpos, light_indices=lidx,
        light_intensity=np.asarray(light_intensity, np.float32),
        camera=camera,
    )
