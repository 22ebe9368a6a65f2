"""Light/photon tracing (reference: lighttracing.cu:192-250 `tracePhotons`
plus its closest hit :113-182).

One call traces `num_paths` light subpaths for `num_records` vertices each
(num_records = numMaxBounces + 1, rtcomphoton.h:117) and returns the photon
map as a (P, B) SoA — the TPU replacement for the GL/OptiX interop SSBO of
RtPhotonRecord structs (rtcomphoton/rtphotonrecord.h):

  vertex 0        = sample on the emitter (usable as VPL only),
  vertices 1..B-2 = surface hits (usable as VPL and photon),
  vertex  B-1     = last surface hit (usable as photon only),
  flags == 0      = path terminated before this vertex (record unusable).

Flux stored at vertex k is the flux *arriving* there (before RR division and
before the local BRDF interaction), exactly like the reference.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from evplp_tpu.core import brdf
from evplp_tpu.core import mathutil as mu
from evplp_tpu.core.light import light_sample
from evplp_tpu.core.sampling import uniform_not_one
from evplp_tpu.scene.scene import SceneData
from evplp_tpu.scene.textures import fetch_hit_shading
from evplp_tpu.trace.intersect import intersect_closest

FLAG_VPL = 1
FLAG_PHOTON = 2
FLAG_LAMBERT_ONLY = 4
FLAG_PHONG_ONLY = 8


@dataclass(frozen=True)
class PhotonMap:
    """(P, B) SoA of light-path vertex records."""
    pos: jnp.ndarray        # (P, B, 3)
    normal: jnp.ndarray     # (P, B, 3)
    flux: jnp.ndarray       # (P, B, 3) arriving flux
    flux_dir: jnp.ndarray   # (P, B, 3) direction the flux arrived FROM
    kd: jnp.ndarray         # (P, B, 3)
    ks: jnp.ndarray         # (P, B, 3)
    ns: jnp.ndarray         # (P, B)
    p_select: jnp.ndarray   # (P, B) lambert-lobe selection probability
    flags: jnp.ndarray      # (P, B) int32

    @property
    def num_paths(self):
        return self.pos.shape[0]

    @property
    def num_records(self):
        return self.pos.shape[1]

    def slice_paths(self, count: int) -> "PhotonMap":
        return PhotonMap(*(leaf[:count] for leaf in self.tree_flatten()[0]))

    def flat(self) -> "PhotonMap":
        """Collapse to (P*B, ...) record-major order (path-major like the
        reference's pmIndex = pathId*B + bounce)."""
        def c(x):
            return x.reshape((-1,) + x.shape[2:])
        return PhotonMap(*(c(leaf) for leaf in self.tree_flatten()[0]))

    def tree_flatten(self):  # pragma: no cover
        return (self.pos, self.normal, self.flux, self.flux_dir,
                self.kd, self.ks, self.ns, self.p_select, self.flags), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves)


jtu.register_pytree_node(PhotonMap, PhotonMap.tree_flatten, PhotonMap.tree_unflatten)


def zero_photon_map(num_paths: int, num_records: int) -> PhotonMap:
    """All-flags-zero map: the never-written photon buffer the reference has
    when run.lightTracing is disabled (the SSBO stays uninitialized;
    flags == 0 makes every record unusable, rtcomphoton.h:188-197)."""
    p, b = num_paths, num_records
    z3 = jnp.zeros((p, b, 3), jnp.float32)
    z1 = jnp.zeros((p, b), jnp.float32)
    return PhotonMap(pos=z3, normal=z3, flux=z3, flux_dir=z3, kd=z3, ks=z3,
                     ns=z1, p_select=z1,
                     flags=jnp.zeros((p, b), jnp.int32))


def trace_light_paths(scene: SceneData, key, num_paths: int,
                      num_records: int, path_offset: int = 0) -> PhotonMap:
    """Trace the light subpaths. num_records >= 2.

    RNG is counter-based per GLOBAL path id (path_offset + lane), mirroring
    the reference's curand_init(pathId, rngSeed) (lighttracing.cu:202-203):
    any partition of the path-id range — e.g. one block per device in the
    sharded frame — traces the identical path set.
    """
    p = num_paths
    exp = scene.light.intensity[3]

    ids = path_offset + jnp.arange(p, dtype=jnp.int32)
    pkeys = jax.vmap(jax.random.fold_in, (None, 0))(key, ids)

    def pdraw(tag, width=None):
        """Per-path uniform draw; `tag` distinguishes the draw site (may be
        a traced scalar, e.g. the bounce index)."""
        if width is None:
            f = lambda k, t: jax.random.uniform(jax.random.fold_in(k, t))
        else:
            f = lambda k, t: jax.random.uniform(jax.random.fold_in(k, t),
                                                (width,))
        return jax.vmap(f, (0, None))(pkeys, tag)

    # ---- vertex 0: emitter sample + power-cosine emission direction ----
    u3 = pdraw(0, 3)
    pos0, n0, _, flux0 = light_sample(scene.light, u3)

    u_emit = pdraw(1, 2)
    # the reference emits through PhongSample(in=normal, n=normal, ks=1,
    # exp=intensity.w): a power-cosine lobe around the normal with weight
    # (exp+2)/(exp+1)*cos (lighttracing.cu:213)
    direction, _, att = brdf.phong_sample(
        u_emit, n0, n0, jnp.ones((p, 3)), exp)

    flux = flux0 * att
    position = pos0
    active = jnp.ones((p,), bool)

    # ---- bounces as a lax.scan over the vertex index ----
    # (the body compiles once; an unrolled loop multiplied compile time)
    def bounce_body(carry, b):
        position, direction, flux, active = carry
        last = b == num_records - 1

        # dead paths get an empty interval: the tracer skips them entirely;
        # bounce rays are incoherent -> octant/cell-sorted packets
        hit = intersect_closest(scene.tris, scene.bvh, position, direction,
                                t_min=1e-4,
                                t_max=jnp.where(active, 3.0e38, 0.0),
                                sort_rays=True)
        prim = jnp.maximum(hit.prim, 0)
        next_pos = position + hit.t[:, None] * direction
        kd, ks, ns, geom_n, is_light = fetch_hit_shading(
            scene, prim, hit.u, hit.v)

        # rejections (lighttracing.cu:124,143): backface, emitter, black
        ok = active & hit.valid
        ok = ok & (mu.dot(geom_n, direction) <= 0.0)
        ok = ok & ~is_light
        ok = ok & ~brdf.is_black(kd, ks)

        p_l = brdf.p_select_lambert(kd, ks)
        u_sel = uniform_not_one(pdraw(3 * b))
        chose_l = u_sel < p_l

        base_flag = jnp.where(last, FLAG_PHOTON, FLAG_VPL | FLAG_PHOTON)

        # RR on the arriving flux (lighttracing.cu:164-167)
        russian = brdf.russian_prob_light(flux)
        survive = pdraw(3 * b + 2) < russian
        lobe_flag = jnp.where(chose_l, FLAG_LAMBERT_ONLY, FLAG_PHONG_ONLY)
        # the lobe bit is set whenever RR survives — also on the last vertex,
        # where the sampled direction is simply never traced (the reference's
        # closest hit runs the same code for every vertex)
        flags = jnp.where(
            ok,
            jnp.where(survive, base_flag | lobe_flag, base_flag),
            0,
        ).astype(jnp.int32)

        okc = ok[:, None]
        record = dict(
            pos=jnp.where(okc, next_pos, 0.0),
            normal=jnp.where(okc, geom_n, 0.0),
            flux=jnp.where(okc, flux, 0.0),
            flux_dir=jnp.where(okc, -direction, 0.0),
            kd=jnp.where(okc, kd, 0.0),
            ks=jnp.where(okc, ks, 0.0),
            ns=jnp.where(ok, ns, 0.0),
            p_select=jnp.where(ok, p_l, 0.0),
            flags=flags,
        )

        flux_rr = flux / jnp.maximum(russian, 1e-8)[:, None]
        u_lobe = pdraw(3 * b + 1, 2)
        new_dir, _, lobe_w, _ = brdf.sample_combined(
            u_sel, u_lobe, -direction, geom_n, geom_n, kd, ks, ns)

        new_active = ok & survive & ~last
        flux = jnp.where(new_active[:, None], flux_rr * lobe_w, flux)
        direction = jnp.where(new_active[:, None], new_dir, direction)
        position = jnp.where(new_active[:, None], next_pos, position)
        return (position, direction, flux, new_active), record

    _, recs = jax.lax.scan(
        bounce_body, (position, direction, flux, active),
        jnp.arange(1, num_records, dtype=jnp.int32))

    def with_v0(first, rest):
        # recs fields are (B-1, P, ...) -> (P, B, ...)
        return jnp.concatenate([first[:, None], jnp.moveaxis(rest, 0, 1)],
                               axis=1)

    return PhotonMap(
        pos=with_v0(pos0, recs["pos"]),
        normal=with_v0(n0, recs["normal"]),
        flux=with_v0(flux0, recs["flux"]),
        flux_dir=with_v0(n0, recs["flux_dir"]),
        kd=with_v0(jnp.zeros((p, 3)), recs["kd"]),
        ks=with_v0(jnp.ones((p, 3)), recs["ks"]),
        ns=with_v0(jnp.full((p,), exp), recs["ns"]),
        p_select=with_v0(jnp.zeros((p,)), recs["p_select"]),
        flags=with_v0(jnp.full((p,), FLAG_VPL, jnp.int32), recs["flags"]),
    )
