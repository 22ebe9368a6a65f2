"""Texture pipeline: bilinear/REPEAT sampling semantics + textured scene
through the full OBJ/MTL/PNG -> render path."""
import os

import jax.numpy as jnp
import numpy as np

from evplp_tpu.scene.textures import (
    TexturePoolBuilder, fetch_kd, sample_bilinear)


def test_bilinear_texel_centers():
    # 2x2 texture: corners exact at texel centers
    img = np.asarray([[[1, 0, 0], [0, 1, 0]],
                      [[0, 0, 1], [1, 1, 0]]], np.float32)
    b = TexturePoolBuilder()
    b.add_image(img)
    data, size = b.build()
    data, size = jnp.asarray(data), jnp.asarray(size)
    layer = jnp.zeros((4,), jnp.int32)
    uv = jnp.asarray([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    out = np.asarray(sample_bilinear(data, size, layer, uv))
    np.testing.assert_allclose(out, [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]],
                               atol=1e-6)
    # center of the texture = average of all four texels
    mid = np.asarray(sample_bilinear(data, size, layer[:1],
                                     jnp.asarray([[0.5, 0.5]])))
    np.testing.assert_allclose(mid[0], [0.5, 0.5, 0.25], atol=1e-6)


def test_repeat_wrap():
    img = np.asarray([[[1, 0, 0], [0, 1, 0]],
                      [[0, 0, 1], [1, 1, 0]]], np.float32)
    b = TexturePoolBuilder()
    b.add_image(img)
    data, size = b.build()
    data, size = jnp.asarray(data), jnp.asarray(size)
    layer = jnp.zeros((2,), jnp.int32)
    uv = jnp.asarray([[0.25, 0.25], [2.25, -0.75]])  # wraps to the same texel
    out = np.asarray(sample_bilinear(data, size, layer, uv))
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)


def test_pool_dedup_and_padding(tmp_path):
    from PIL import Image
    p1 = str(tmp_path / "a.png")
    p2 = str(tmp_path / "b.png")
    Image.fromarray(np.full((4, 4, 3), 128, np.uint8)).save(p1)
    Image.fromarray(np.full((8, 2, 3), 255, np.uint8)).save(p2)
    b = TexturePoolBuilder()
    assert b.add_file(p1) == 0
    assert b.add_file(p2) == 1
    assert b.add_file(p1) == 0  # cached (rtcommon.h:33)
    data, size = b.build()
    assert data.shape == (2, 8, 4, 3)
    np.testing.assert_array_equal(size, [[4, 4], [8, 2]])


def test_textured_scene_end_to_end(tmp_path):
    """Checkerboard-textured floor renders with per-pixel varying kd."""
    from PIL import Image

    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.scene.camera import Camera
    from evplp_tpu.scene.scene import build_scene

    checker = np.zeros((8, 8, 3), np.uint8)
    checker[::2, ::2] = 255
    checker[1::2, 1::2] = 255
    tex_path = str(tmp_path / "checker.png")
    Image.fromarray(checker).save(tex_path)

    pool = TexturePoolBuilder()
    layer = pool.add_file(tex_path)
    tex_data, tex_size = pool.build()

    fpos = np.asarray([[-1, 0, -1], [-1, 0, 1], [1, 0, 1], [1, 0, -1]], np.float32)
    fuv = np.asarray([[0, 0], [0, 1], [1, 1], [1, 0]], np.float32)
    fidx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    lpos = np.asarray([[-0.2, 2, -0.2], [0.2, 2, -0.2],
                       [0.2, 2, 0.2], [-0.2, 2, 0.2]], np.float32)
    lidx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    cam = Camera(origin=(0, 3, 0.001), look_at=(0, 0, 0), up=(0, 1, 0),
                 fovy=np.radians(40.0), aspect=1.0)
    scene = build_scene(
        positions_list=[fpos], indices_list=[fidx],
        kd_list=[np.asarray([0.5, 0.5, 0.5])], ks_list=[np.zeros(3)],
        ns_list=[0.0], light_positions=lpos, light_indices=lidx,
        light_intensity=np.asarray([5, 5, 5, 0], np.float32), camera=cam,
        uv_list=[fuv], kd_layer_list=[layer],
        tex_data=tex_data, tex_size=tex_size,
    )
    gbuf = trace_gbuffer(scene, 32, 32)
    kd = np.asarray(gbuf.kd).reshape(32, 32, 3)
    st = np.asarray(gbuf.stencil).reshape(32, 32)
    floor = (st > 0) & (np.asarray(gbuf.hit_light).reshape(32, 32) == 0)
    vals = kd[floor][:, 0]
    # checkerboard: both near-black and near-white kd present
    assert (vals > 0.85).any() and (vals < 0.15).any()


def test_fetch_material_all_channels(tmp_path):
    """map_Kd + map_Ks + map_Ns routed through the pool (rtcommon.h:751-753)."""
    import jax.numpy as jnp

    from evplp_tpu.scene.camera import Camera
    from evplp_tpu.scene.scene import build_scene
    from evplp_tpu.scene.textures import fetch_material

    pool = TexturePoolBuilder()
    kd_l = pool.add_image(np.full((2, 2, 3), 0.25, np.float32))
    ks_l = pool.add_image(np.full((2, 2, 3), 0.75, np.float32))
    ns_l = pool.add_image(np.full((2, 2, 3), 0.125, np.float32))
    tex_data, tex_size = pool.build()

    fpos = np.asarray([[-1, 0, -1], [-1, 0, 1], [1, 0, 1], [1, 0, -1]], np.float32)
    fuv = np.asarray([[0, 0], [0, 1], [1, 1], [1, 0]], np.float32)
    fidx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    lpos = np.asarray([[-0.2, 2, -0.2], [0.2, 2, -0.2],
                       [0.2, 2, 0.2], [-0.2, 2, 0.2]], np.float32)
    lidx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    cam = Camera(origin=(0, 3, 0.001), look_at=(0, 0, 0), up=(0, 1, 0),
                 fovy=np.radians(40.0), aspect=1.0)
    scene = build_scene(
        positions_list=[fpos], indices_list=[fidx],
        kd_list=[np.ones(3)], ks_list=[np.ones(3)], ns_list=[99.0],
        light_positions=lpos, light_indices=lidx,
        light_intensity=np.asarray([5, 5, 5, 0], np.float32), camera=cam,
        uv_list=[fuv], kd_layer_list=[kd_l], ks_layer_list=[ks_l],
        ns_layer_list=[ns_l], tex_data=tex_data, tex_size=tex_size,
    )
    prim = jnp.zeros((3,), jnp.int32)  # some floor triangle (leaf-reordered)
    floor_ids = np.nonzero(~np.asarray(scene.tri_is_light))[0]
    prim = jnp.full((3,), int(floor_ids[0]), jnp.int32)
    u = jnp.asarray([0.2, 0.3, 0.1])
    v = jnp.asarray([0.1, 0.2, 0.4])
    kd, ks, ns = fetch_material(scene, prim, u, v)
    np.testing.assert_allclose(np.asarray(kd), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ks), 0.75, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ns), 0.125, atol=1e-6)
