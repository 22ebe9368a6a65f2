"""Device scene representation (reference: RtScene, rtcommon.h:631-820).

Everything the integrators touch is a flat SoA pytree: leaf-ordered
triangles + per-triangle shading data + flattened BVH + the single area
light.  Static scene facts (camera, bounding radius, total area) ride along
as aux data so one jit specializes per scene.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from evplp_tpu.accel.bvh import BVH, build_bvh
from evplp_tpu.core.light import AreaLight, build_area_light
from evplp_tpu.scene.camera import Camera
from evplp_tpu.trace.intersect import Triangles


@dataclass(frozen=True)
class SceneData:
    tris: Triangles
    bvh: BVH
    tri_kd: jnp.ndarray       # (T, 3) lambert reflectance
    tri_ks: jnp.ndarray       # (T, 3) phong reflectance
    tri_ns: jnp.ndarray       # (T,)  phong exponent (already /4 fixed)
    tri_is_light: jnp.ndarray  # (T,) bool — belongs to the emitter mesh
    tri_uv0: jnp.ndarray      # (T, 2) texcoords (textures: see scene.textures)
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_kd_layer: jnp.ndarray  # (T,) int32 texture layer for map_Kd, -1 = const
    tri_ks_layer: jnp.ndarray  # (T,) int32 layer for map_Ks
    tri_ns_layer: jnp.ndarray  # (T,) int32 layer for map_Ns (red channel)
    # packed per-hit shading row [kd3, ks3, ns, is_light, n3, kd_l, ks_l,
    # ns_l, 0, 0]: ONE row gather per hit batch instead of ~10 elementwise
    # gathers (XLA's TPU gather is row-oriented; measured 6x)
    tri_shade: jnp.ndarray     # (T, 16) f32
    tex_data: jnp.ndarray     # (L, TH, TW, 3) texture pool
    tex_size: jnp.ndarray     # (L, 2) per-layer (h, w)
    light: AreaLight
    # --- static (hashable aux) ---
    camera: Camera
    bounding_radius: float    # half bbox diagonal (rtcommon.h:805-813)
    total_area: float         # sum of all mesh areas (rtcommon.h:759-768)

    @property
    def num_triangles(self) -> int:
        return self.tris.v0.shape[0]

    def tree_flatten(self):  # pragma: no cover
        leaves = (self.tris, self.bvh, self.tri_kd, self.tri_ks, self.tri_ns,
                  self.tri_is_light, self.tri_uv0, self.tri_uv1, self.tri_uv2,
                  self.tri_kd_layer, self.tri_ks_layer, self.tri_ns_layer,
                  self.tri_shade,
                  self.tex_data, self.tex_size,
                  self.light)
        aux = (self.camera, self.bounding_radius, self.total_area)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves, *aux)


jtu.register_pytree_node(SceneData, SceneData.tree_flatten, SceneData.tree_unflatten)


def build_scene(
    positions_list: list[np.ndarray],
    indices_list: list[np.ndarray],
    kd_list: list[np.ndarray],
    ks_list: list[np.ndarray],
    ns_list: list[float],
    light_positions: np.ndarray,
    light_indices: np.ndarray,
    light_intensity: np.ndarray,
    camera: Camera,
    uv_list: list[np.ndarray] | None = None,
    kd_layer_list: list[int] | None = None,
    ks_layer_list: list[int] | None = None,
    ns_layer_list: list[int] | None = None,
    tex_data: np.ndarray | None = None,
    tex_size: np.ndarray | None = None,
) -> SceneData:
    """Assemble a SceneData from per-mesh host arrays.

    Each mesh i contributes triangles with constant material (kd, ks, ns).
    The light mesh is appended with black material and is_light=True — it
    participates in visibility exactly like the reference (the emitter mesh
    sits in the same OptiX geometry group, rtcomphoton.h:686-693) and its
    area is included in totalArea/bounding radius (light mesh lives in
    RtScene::mMeshes, rtcommon.h:772-801).
    """
    v0s, v1s, v2s, kds, kss, nss, lights = [], [], [], [], [], [], []
    uv0s, uv1s, uv2s, layers = [], [], [], []
    ks_layers, ns_layers = [], []

    def add_mesh(pos, idx, kd, ks, ns, is_light, uv=None, kd_layer=-1,
                 ks_layer=-1, ns_layer=-1):
        pos = np.asarray(pos, np.float32).reshape(-1, 3)
        idx = np.asarray(idx, np.int64).reshape(-1, 3)
        t = idx.shape[0]
        v0s.append(pos[idx[:, 0]])
        v1s.append(pos[idx[:, 1]])
        v2s.append(pos[idx[:, 2]])
        kds.append(np.broadcast_to(np.asarray(kd, np.float32), (t, 3)))
        kss.append(np.broadcast_to(np.asarray(ks, np.float32), (t, 3)))
        nss.append(np.full((t,), ns, np.float32))
        lights.append(np.full((t,), is_light, bool))
        if uv is None:
            uv = np.zeros((pos.shape[0], 2), np.float32)
        uv = np.asarray(uv, np.float32).reshape(-1, 2)
        uv0s.append(uv[idx[:, 0]])
        uv1s.append(uv[idx[:, 1]])
        uv2s.append(uv[idx[:, 2]])
        layers.append(np.full((t,), kd_layer, np.int32))
        ks_layers.append(np.full((t,), ks_layer, np.int32))
        ns_layers.append(np.full((t,), ns_layer, np.int32))

    for i, (pos, idx) in enumerate(zip(positions_list, indices_list)):
        uv = uv_list[i] if uv_list is not None else None
        layer = kd_layer_list[i] if kd_layer_list is not None else -1
        ksl = ks_layer_list[i] if ks_layer_list is not None else -1
        nsl = ns_layer_list[i] if ns_layer_list is not None else -1
        add_mesh(pos, idx, kd_list[i], ks_list[i], ns_list[i], False, uv,
                 kd_layer=layer, ks_layer=ksl, ns_layer=nsl)
    add_mesh(light_positions, light_indices, np.zeros(3), np.zeros(3), 0.0, True)

    v0 = np.concatenate(v0s)
    v1 = np.concatenate(v1s)
    v2 = np.concatenate(v2s)
    kd = np.concatenate(kds)
    ks = np.concatenate(kss)
    ns = np.concatenate(nss)
    is_light = np.concatenate(lights)
    uv0 = np.concatenate(uv0s)
    uv1 = np.concatenate(uv1s)
    uv2 = np.concatenate(uv2s)
    kd_layer = np.concatenate(layers)
    ks_layer = np.concatenate(ks_layers)
    ns_layer = np.concatenate(ns_layers)

    # scene statistics (reference semantics)
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    total_area = float(areas.sum())
    bb_min = np.minimum(np.minimum(v0, v1), v2).min(axis=0)
    bb_max = np.maximum(np.maximum(v0, v1), v2).max(axis=0)
    bounding_radius = float(np.linalg.norm(bb_max - bb_min) * 0.5)

    # slot order: per-triangle arrays live in the packet layout's padded
    # slot space (leaf_row*8 + j), so the Pallas kernels' slot ids ARE the
    # triangle ids — no slot->prim gather per traced ray.  For small
    # (unpacked) scenes `order` degenerates to the classic permutation.
    # Scenes past the classic 300k VMEM ceiling switch to 32-triangle
    # leaves + fused node rows (meta folded into bounds lanes, BVH.
    # fused_nodes): half the per-node VMEM, ceiling ~1.6M triangles,
    # throughput parity (leaf-size sweep measured flat on v5e).
    big = v0.shape[0] > 280_000
    # packed_nodes=None: build_bvh auto-selects the packed16 node layout
    # from the PADDED slot count vs the streamed node-bound ceiling (the
    # same number the trace dispatch checks — a raw-count threshold here
    # left a padding-inflation band with no usable packet path)
    bvh, order = build_bvh(v0, v1, v2, slot_order=True,
                           leaf_size=42 if big else 14, fused_nodes=big,
                           packed_nodes=None)
    valid = order >= 0
    oi = np.maximum(order, 0)

    def take(x, pad=0.0):
        y = np.array(x[oi])
        y[~valid] = pad
        return y

    v0, v1, v2 = take(v0), take(v1), take(v2)
    kd, ks, ns = take(kd), take(ks), take(ns)
    is_light = take(is_light, False)
    uv0, uv1, uv2 = take(uv0), take(uv1), take(uv2)
    kd_layer = take(kd_layer, -1)
    ks_layer, ns_layer = take(ks_layer, -1), take(ns_layer, -1)

    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)

    tris = Triangles(
        v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        n=jnp.asarray(n.astype(np.float32)),
    )
    light = build_area_light(
        np.asarray(light_positions, np.float32),
        np.asarray(light_indices, np.int64),
        np.asarray(light_intensity, np.float32),
    )
    if tex_data is None:
        tex_data = np.zeros((1, 1, 1, 3), np.float32)
        tex_size = np.ones((1, 2), np.int32)
    shade = np.zeros((v0.shape[0], 16), np.float32)
    shade[:, 0:3] = kd
    shade[:, 3:6] = ks
    shade[:, 6] = ns
    shade[:, 7] = is_light.astype(np.float32)
    shade[:, 8:11] = n
    shade[:, 11] = kd_layer
    shade[:, 12] = ks_layer
    shade[:, 13] = ns_layer

    return SceneData(
        tris=tris, bvh=bvh,
        tri_kd=jnp.asarray(kd), tri_ks=jnp.asarray(ks), tri_ns=jnp.asarray(ns),
        tri_is_light=jnp.asarray(is_light),
        tri_uv0=jnp.asarray(uv0), tri_uv1=jnp.asarray(uv1), tri_uv2=jnp.asarray(uv2),
        tri_kd_layer=jnp.asarray(kd_layer),
        tri_ks_layer=jnp.asarray(ks_layer), tri_ns_layer=jnp.asarray(ns_layer),
        tri_shade=jnp.asarray(shade),
        tex_data=jnp.asarray(tex_data), tex_size=jnp.asarray(tex_size),
        light=light,
        camera=camera,
        bounding_radius=bounding_radius,
        total_area=total_area,
    )
