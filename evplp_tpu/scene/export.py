"""Scene export helpers: write procedural scenes as OBJ/MTL + JSON configs
in the reference's exact on-disk format, so the full
config -> OBJ loader -> renderer pipeline is exercisable without the
reference's git-LFS assets."""
from __future__ import annotations

import json
import os

import numpy as np


def _write_obj(path: str, groups, mtl_name: str):
    """groups: list of (material_name, positions (V,3), indices (T,3))."""
    with open(path, "w") as f:
        f.write(f"mtllib {mtl_name}\n")
        offset = 1
        for name, pos, idx in groups:
            f.write(f"o {name}\n")
            for v in pos:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
            f.write(f"usemtl {name}\n")
            for t in idx:
                f.write(f"f {t[0]+offset} {t[1]+offset} {t[2]+offset}\n")
            offset += len(pos)


def _write_mtl(path: str, mats):
    """mats: list of (name, kd, ks, ns_file) — ns written PRE-division
    (the loader divides by 4 like Assimp)."""
    with open(path, "w") as f:
        for name, kd, ks, ns in mats:
            f.write(f"newmtl {name}\n")
            f.write(f"Kd {kd[0]} {kd[1]} {kd[2]}\n")
            f.write(f"Ks {ks[0]} {ks[1]} {ks[2]}\n")
            f.write(f"Ns {ns * 4.0}\n\n")


def write_cornell_obj(out_dir: str, glossy_exponent: float = 30.0):
    """Write the procedural Cornell box as cornell.obj/.mtl +
    cornell_lights.obj/.mtl; returns the two OBJ paths."""
    from evplp_tpu.scene.procedural import _box, _quad

    os.makedirs(out_dir, exist_ok=True)
    room = [
        ("floor", ([0, 0, 0], [0, 0, 1], [1, 0, 1], [1, 0, 0]), (0.73, 0.73, 0.73)),
        ("ceiling", ([0, 1, 0], [1, 1, 0], [1, 1, 1], [0, 1, 1]), (0.73, 0.73, 0.73)),
        ("back", ([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]), (0.73, 0.73, 0.73)),
        ("left", ([0, 0, 0], [0, 1, 0], [0, 1, 1], [0, 0, 1]), (0.65, 0.05, 0.05)),
        ("right", ([1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0]), (0.12, 0.45, 0.15)),
    ]
    groups, mats = [], []
    for name, quad, kd in room:
        pos, idx = _quad(*quad)
        groups.append((name, pos, idx))
        mats.append((name, kd, (0, 0, 0), 0.0))

    pos, idx = _box([0.10, 0.0, 0.10], [0.40, 0.60, 0.40])
    groups.append(("tallblock", pos, idx))
    mats.append(("tallblock", (0.05, 0.05, 0.05), (0.45, 0.45, 0.45),
                 glossy_exponent))
    pos, idx = _box([0.55, 0.0, 0.45], [0.85, 0.30, 0.75])
    groups.append(("shortblock", pos, idx))
    mats.append(("shortblock", (0.73, 0.73, 0.73), (0, 0, 0), 0.0))

    obj = os.path.join(out_dir, "cornell.obj")
    _write_obj(obj, groups, "cornell.mtl")
    _write_mtl(os.path.join(out_dir, "cornell.mtl"), mats)

    ly = 0.995
    lpos, lidx = _quad([0.35, ly, 0.35], [0.65, ly, 0.35],
                       [0.65, ly, 0.65], [0.35, ly, 0.65])
    lobj = os.path.join(out_dir, "cornell_lights.obj")
    _write_obj(lobj, [("light", np.asarray(lpos), np.asarray(lidx))],
               "cornell_lights.mtl")
    _write_mtl(os.path.join(out_dir, "cornell_lights.mtl"),
               [("light", (0, 0, 0), (0, 0, 0), 0.0)])
    return obj, lobj


def write_cornell_config(out_dir: str, technique_block: dict, technique: str,
                         res: int = 64, intensity=(12.0, 12.0, 12.0, 0.0),
                         name: str = "cornell") -> str:
    """Write a reference-format JSON config next to the cornell OBJs."""
    write_cornell_obj(out_dir)
    cfg = {
        "resX": res,
        "resY": res,
        "scene": ["cornell.obj"],
        "arealight": {"obj": "cornell_lights.obj",
                      "intensity": list(intensity)},
        "camera": {
            "origin": [0.5, 0.5, 2.6],
            "direction": [0.5, 0.5, 0.0],
            "up": [0.0, 1.0, 0.0],
            "fovy": 28.0,
        },
        technique: technique_block,
    }
    path = os.path.join(out_dir, f"{name}.json")
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2)
    return path
