"""OBJ/MTL loader edge cases + camera fov conversions."""
import math
import os

import numpy as np

from evplp_tpu.scene.camera import Camera
from evplp_tpu.scene.objloader import compute_smooth_normals, load_obj, parse_mtl


def test_quads_and_negative_indices(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"            # quad -> fan triangulation
        "f -4 -3 -2\n"           # negative (relative) indices
    )
    meshes, mats = load_obj(str(obj))
    assert len(meshes) == 1
    m = meshes[0]
    assert m.indices.shape == (3, 3)  # 2 from the quad + 1 triangle
    assert m.positions.shape[0] == 4  # deduplicated vertices
    assert len(mats) == 1 and mats[0].name == "__default__"


def test_texcoords_and_materials(tmp_path):
    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKd 0.9 0.1 0.1\nKs 0.2 0.2 0.2\nNs 40\n"
        "newmtl tex\nKd 1 1 1\nmap_Kd wood.png\n")
    obj = tmp_path / "m.obj"
    obj.write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "usemtl red\nf 1/1 2/2 3/3\n"
        "usemtl tex\nf 1/1 2/2 3/3\n")
    meshes, mats = load_obj(str(obj))
    assert len(meshes) == 2
    np.testing.assert_allclose(mats[meshes[0].material].kd, [0.9, 0.1, 0.1])
    # Ns divided by 4 (Assimp fixup, rtcommon.h:55-64)
    assert mats[meshes[0].material].ns == 10.0
    assert mats[meshes[1].material].map_kd == "wood.png"
    np.testing.assert_allclose(meshes[0].texcoords,
                               [[0, 0], [1, 0], [0, 1]])


def test_missing_texcoords_default_zero(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    meshes, _ = load_obj(str(obj))
    np.testing.assert_array_equal(meshes[0].texcoords, np.zeros((3, 2)))


def test_smooth_normals():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 0, 1], [1, 0, 1]], np.float32)
    idx = np.asarray([[0, 2, 1], [1, 2, 3]], np.int64)
    n = compute_smooth_normals(pos, idx)
    np.testing.assert_allclose(n, np.tile([[0, 1, 0]], (4, 1)), atol=1e-6)


def test_camera_fovx_conversion():
    # square aspect: fovy == fovx
    c = Camera.from_json({"origin": [0, 0, 0], "direction": [0, 0, -1],
                          "up": [0, 1, 0], "fovx": 70.0}, aspect=1.0)
    assert abs(c.fovy - math.radians(70.0)) < 1e-6
    # wide aspect shrinks fovy: fovy = 2*atan(tan(fovx/2)/aspect)
    c2 = Camera.from_json({"origin": [0, 0, 0], "direction": [0, 0, -1],
                           "up": [0, 1, 0], "fovx": 70.0}, aspect=16 / 9)
    expect = 2.0 * math.atan(math.tan(math.radians(35.0)) / (16 / 9))
    assert abs(c2.fovy - expect) < 1e-6
