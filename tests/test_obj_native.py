"""Native (C++) OBJ loader parity vs the pure-Python reference loader.

The native loader must reproduce objloader.load_obj exactly: same meshes in
the same order, identical de-indexed vertex order, fan triangulation,
material-run splitting, Ns/4 fixup, map path extraction, negative indices.
"""
import numpy as np
import pytest

from evplp_tpu.scene.objloader import load_obj

GNARLY_MTL_A = """
# comment
newmtl red
Kd 0.9 0.1 0.1
Ks 0.2 0.2 0.2
Ns 40
newmtl tex
Kd 1 1 1
map_Kd -bm 0.5 wood diffuse.png
map_Ks spec.png
newmtl red
Kd 0.5 0.5 0.5
"""

GNARLY_MTL_B = """
newmtl red
Kd 0 0 1
newmtl blue
Kd 0.1 0.2 0.8
Ns 12
map_Ns rough.png
"""


def _write_gnarly(tmp_path):
    (tmp_path / "a.mtl").write_text(GNARLY_MTL_A)
    (tmp_path / "b two.mtl").write_text(GNARLY_MTL_B)
    big_face = "f " + " ".join(str(i + 1) for i in range(120)) + "\n"
    obj = tmp_path / "m.obj"
    obj.write_text(
        "# header comment\n"
        "mtllib a.mtl\n"
        + "".join(f"v {np.cos(i*0.1):.6f} {np.sin(i*0.1):.6f} {i*0.01:.6f}\n"
                  for i in range(120))
        + "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1 2 3 4\n"                    # quad before any usemtl
        "usemtl red\n"
        "f -4/-4 -3/-3 -2/-2\n"          # negative v and vt indices
        "f 1/1 2/2 3/3 4/4 5/1\n"        # pentagon fan
        "usemtl nosuch\n"                # unknown -> material 0
        "f 2 3 4\n"
        "mtllib b two.mtl\n"             # spaces in mtllib path; red remapped
        "usemtl red\n"
        "f 1//1 2//2 3//3\n"             # v//n: empty texcoord slot
        "usemtl blue\n"
        + big_face +                     # 120-gon (past the token cap)
        "usemtl tex\n"
        "f 1/1 2/2 3/3\n"
        "f 3/3 2/2 1/1\n"                # shared dedup keys, reversed
    )
    return obj


def _assert_same(py, nat):
    py_meshes, py_mats = py
    nat_meshes, nat_mats = nat
    assert len(py_meshes) == len(nat_meshes)
    assert len(py_mats) == len(nat_mats)
    for a, b in zip(py_mats, nat_mats):
        assert a.name == b.name
        np.testing.assert_array_equal(a.kd, b.kd)
        np.testing.assert_array_equal(a.ks, b.ks)
        assert a.ns == b.ns
        assert a.map_kd == b.map_kd
        assert a.map_ks == b.map_ks
        assert a.map_ns == b.map_ns
    for a, b in zip(py_meshes, nat_meshes):
        assert a.material == b.material
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.texcoords, b.texcoords)
        np.testing.assert_array_equal(a.indices, b.indices)


def _native_available():
    try:
        from evplp_tpu.native import obj_native
        obj_native._get_lib()
        return True
    except Exception:
        return False


needs_native = pytest.mark.skipif(not _native_available(),
                                  reason="g++ unavailable")


@needs_native
def test_native_matches_python_gnarly(tmp_path):
    obj = _write_gnarly(tmp_path)
    _assert_same(load_obj(str(obj), native="0"),
                 load_obj(str(obj), native="1"))


@needs_native
def test_native_matches_python_medium(tmp_path):
    # a grid mesh with per-row material runs and texcoords
    rng = np.random.default_rng(3)
    n = 40
    lines = ["mtllib a.mtl"]
    (tmp_path / "a.mtl").write_text(GNARLY_MTL_A)
    for i in range(n + 1):
        for j in range(n + 1):
            lines.append(f"v {i} {rng.standard_normal():.6f} {j}")
            lines.append(f"vt {i/n:.6f} {j/n:.6f}")
    for i in range(n):
        lines.append("usemtl " + ("red" if i % 2 else "tex"))
        for j in range(n):
            a = i * (n + 1) + j + 1
            b = a + 1
            c = a + n + 1
            d = c + 1
            lines.append(f"f {a}/{a} {b}/{b} {d}/{d} {c}/{c}")
    obj = tmp_path / "grid.obj"
    obj.write_text("\n".join(lines) + "\n")
    py = load_obj(str(obj), native="0")
    nat = load_obj(str(obj), native="1")
    _assert_same(py, nat)
    assert sum(m.indices.shape[0] for m in py[0]) == 2 * n * n


@needs_native
def test_native_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_obj(str(tmp_path / "nope.obj"), native="1")
