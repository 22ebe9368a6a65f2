"""ctypes bindings for the native (C++) OBJ/MTL loader.

Same pattern as bvh_native: compiled on first use with g++ (no pybind11 in
the image), .so cached next to the source and rebuilt when the source is
newer.  `load()` returns the same (meshes, materials) structures as the
pure-Python `scene.objloader.load_obj`, which remains the fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "obj_loader.cpp")
_SO = os.path.join(_DIR, "libevplp_obj.so")
_lock = threading.Lock()
_lib = None

_MAP_CAP = 4096


def _ensure_compiled() -> str:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-o", _SO + ".tmp", _SRC]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
    return _SO


def _get_lib():
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_ensure_compiled())
            lib.evplp_obj_parse.restype = ctypes.c_void_p
            lib.evplp_obj_parse.argtypes = [ctypes.c_char_p]
            lib.evplp_obj_free.argtypes = [ctypes.c_void_p]
            lib.evplp_obj_num_meshes.restype = ctypes.c_int
            lib.evplp_obj_num_meshes.argtypes = [ctypes.c_void_p]
            lib.evplp_obj_num_materials.restype = ctypes.c_int
            lib.evplp_obj_num_materials.argtypes = [ctypes.c_void_p]
            lib.evplp_obj_mesh_info.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32)]
            lib.evplp_obj_mesh_fill.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32)]
            lib.evplp_obj_material.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_char_p, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_int]
            _lib = lib
    return _lib


def load(path: str):
    """-> (meshes: list[ObjMesh], materials: list[ObjMaterial]) — identical
    structures to scene.objloader.load_obj."""
    from evplp_tpu.scene.objloader import ObjMaterial, ObjMesh

    lib = _get_lib()
    h = lib.evplp_obj_parse(os.fsencode(path))
    if not h:
        raise FileNotFoundError(path)
    try:
        materials = []
        scal = (ctypes.c_float * 7)()
        name = ctypes.create_string_buffer(_MAP_CAP)
        mk = ctypes.create_string_buffer(_MAP_CAP)
        ms = ctypes.create_string_buffer(_MAP_CAP)
        mn = ctypes.create_string_buffer(_MAP_CAP)
        for i in range(lib.evplp_obj_num_materials(h)):
            lib.evplp_obj_material(h, i, scal, name, _MAP_CAP, mk, ms, mn,
                                   _MAP_CAP)
            materials.append(ObjMaterial(
                name=name.value.decode("utf-8", errors="replace"),
                kd=np.asarray(scal[0:3], np.float32),
                ks=np.asarray(scal[3:6], np.float32),
                ns=float(scal[6]),
                map_kd=mk.value.decode() or None,
                map_ks=ms.value.decode() or None,
                map_ns=mn.value.decode() or None,
            ))

        meshes = []
        info = (ctypes.c_int32 * 3)()
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int32)
        for i in range(lib.evplp_obj_num_meshes(h)):
            lib.evplp_obj_mesh_info(h, i, info)
            mat, nv, nt = int(info[0]), int(info[1]), int(info[2])
            pos = np.empty((nv, 3), np.float32)
            tex = np.empty((nv, 2), np.float32)
            idx = np.empty((nt, 3), np.int32)
            lib.evplp_obj_mesh_fill(
                h, i, pos.ctypes.data_as(fp), tex.ctypes.data_as(fp),
                idx.ctypes.data_as(ip))
            meshes.append(ObjMesh(material=mat, positions=pos,
                                  texcoords=tex, indices=idx))
        return meshes, materials
    finally:
        lib.evplp_obj_free(h)
