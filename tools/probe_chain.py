"""Decompose the packet-traversal while-body's per-iteration cost.

Round-2/3 measured a flat ~3-6 us per traversal iteration across every
structural variant (packet3/4/5/6/7, npack, rows, fused layouts) — the
working theory is a serial mixed scalar/vector dependency chain.  This
probe isolates the chain's components in a minimal Pallas kernel with
the same shape as the production body (packet3.py):

  scalar   pure scalar steering chain (LCG walk), no memory
  fetch    + dynamic VMEM row fetch -> vector bitcast -> lane extract ->
           steer (the node-row pointer chase)
  vector   fetch + a slab's worth of (rows,128) vector work, steering
           NOT data-dependent on the vector result
  readout  fetch + slab + vector reduction -> scalar readout steers the
           next index (the want-mask readout dependency)
  full     two fetches + two slabs + one packed readout + SMEM
           queue/stack writes — the production body's skeleton
  vpu      N independent (ROWS,128) f32 ops per iteration, no chain —
           pure VPU throughput ceiling inside a pallas loop
  pslab    production-VOLUME body: 4 full slab tests (6-ref ray block,
           ~20 ops each) + packed readout + steering — the real
           per-iteration vector work at npack=2
  pwhile   pslab under lax.while_loop with a data-dependent exit
           (the production loop construct)
  pdrain   pwhile + a pl.when drain every ~16 iters running 14
           Moller tests x 3 rows (production leaf volume)

Per-iteration cost of each mode (minus the scalar baseline) attributes
the floor.  Measurement per NOTES rules: fresh inputs per rep, fetch
fences, medians over reps; the two-point slope removes the per-call
dispatch constant.

Usage: python tools/probe_chain.py [grid] [iters] [reps] [modes]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ROWS = 64
LANES = 128
NN = int(__import__("os").environ.get("PROBE_NN", "4096"))


PBASE = 129
PMODES = ("vpu", "pslab", "pwhile", "pdrain")


def _production_volume(mode, iters, seed, nodes_ref, rays_ref, out_ref,
                       q_ref, tb_ref):
    """Bodies that carry the PRODUCTION kernel's vector volume, so the
    measured slope is comparable with the real packet3 per-iteration cost
    (~production: 4 slab tests/iter at npack=2, 14-tri Moller drains)."""
    rb = rays_ref[...]

    if mode == "vpu":
        # 16 independent (ROWS, LANES) ops per iteration, 4 ILP chains:
        # the VPU throughput ceiling inside a pallas fori loop
        def vbody(i, carry):
            a0, a1, a2, a3 = carry
            for _ in range(4):
                a0 = a0 * 1.0001 + rb
                a1 = a1 * 0.9999 - rb
                a2 = jnp.maximum(a2 * 1.0002, rb)
                a3 = jnp.minimum(a3 + rb, 3e38)
            return a0, a1, a2, a3
        z = jnp.zeros((ROWS, LANES), jnp.float32)
        a0, a1, a2, a3 = jax.lax.fori_loop(
            0, iters, vbody, (z, z, z + 1.0, z))
        s = a0[0, 0] + a1[0, 1] + a2[0, 2] + a3[0, 3]
        out_ref[0, 0] = s.astype(jnp.int32) + q_ref[0]
        return

    tb_ref[...] = rb * 1e4 + 1.0  # "best t so far" (large)
    ob = rb * 1.5 + 0.25          # a second ray operand (origin-like)

    def pslab_test(row):
        # production slab volume (packet3.slab): 6 sub+mul pairs, the
        # min/max tree, 3 compares, one VMEM best-t read, sublane reduce
        t0x = (row[0] - ob) * rb
        t1x = (row[3] - ob) * rb
        t0y = (row[1] - ob) * rb
        t1y = (row[4] - ob) * rb
        t0z = (row[2] - ob) * rb
        t1z = (row[5] - ob) * rb
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        want = (tn <= tf) & (tf >= 0.0) & (tn <= tb_ref[...])
        return jnp.any(want, axis=0, keepdims=True).astype(jnp.int32)

    def moller(blk, j, best):
        # production triangle test volume (packet3.row_tests)
        b = j * 9
        v0x, v0y, v0z = blk[b], blk[b + 1], blk[b + 2]
        e1x, e1y, e1z = blk[b + 3], blk[b + 4], blk[b + 5]
        e2x, e2y, e2z = blk[b + 6], blk[b + 7], blk[b + 8]
        px = rb * e2z - ob * e2y
        py = ob * e2x - rb * e2z
        pz = rb * e2y - ob * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tx, ty, tz = ob - v0x, rb - v0y, ob - v0z
        uu = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        vv = (rb * qx + ob * qy + rb * qz) * inv
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv
        ok = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
              & (tt > 0.0) & (tt < best))
        return jnp.where(ok, tt, best)

    def pbody(state):
        i, cur, acc, qn = state
        # phase 1: 4 child tests (npack=2 x 2 children), base-129 packed
        # into ONE scalar readout (sync_pack), dependent pointer chase
        parts = None
        metas = []
        c = cur
        for k in range(4):
            row = nodes_ref[c]
            w = jax.lax.bitcast_convert_type(row, jnp.int32)
            meta = w[0]
            metas.append(meta)
            wk = pslab_test(row)
            part = wk * (PBASE ** k)
            parts = part if parts is None else parts + part
            c = (meta + k) & (NN - 1)
        s_all = jnp.sum(parts)
        # phase 2: scalar steering, dummy-slot SMEM writes (packet3 shape)
        nxt = cur
        for k in range(2):
            wl = ((s_all // (PBASE ** (2 * k))) % PBASE) > 0
            wr = ((s_all // (PBASE ** (2 * k + 1))) % PBASE) > 0
            ml, mr = metas[2 * k], metas[2 * k + 1]
            enq_l = wl & ((ml & 63) > 32)
            q_ref[jnp.where(enq_l, 2 + (qn & 7), 17)] = ml >> 6
            qn = qn + enq_l.astype(jnp.int32)
            enq_r = wr & ((mr & 63) > 32)
            q_ref[jnp.where(enq_r, 2 + (qn & 7), 17)] = mr >> 6
            qn = qn + enq_r.astype(jnp.int32)
            pos = (ml & 1) > 0
            first = jnp.where(pos, ml, mr)
            second = jnp.where(pos, mr, ml)
            wf = jnp.where(pos, wl, wr)
            ws = jnp.where(pos, wr, wl)
            sel = jnp.where(wf, first, jnp.where(ws, second, -1))
            push = wf & ws
            q_ref[jnp.where(push, 10 + k, 17)] = second
            nxt = jnp.where(sel >= 0, (nxt + sel) & (NN - 1),
                            (nxt * 1103515245 + 12345) & (NN - 1))
        if mode == "pdrain":
            do_drain = qn >= 6

            @pl.when(do_drain)
            def _():
                def entry(q, _):
                    row = nodes_ref[q_ref[2 + (q & 7)] & (NN - 1)]
                    best = tb_ref[...]
                    for j in range(14):
                        best = moller(row, j, best)
                    tb_ref[...] = best
                    return 0
                jax.lax.fori_loop(0, qn, entry, 0)

            qn = jnp.where(do_drain, 0, qn)
        return i + 1, nxt, acc + s_all.astype(jnp.int32), qn

    init = (jnp.int32(0), seed & (NN - 1), jnp.int32(0), jnp.int32(0))
    if mode == "pslab":
        _, cur, acc, qn = jax.lax.fori_loop(
            0, iters, lambda i, st: pbody(st), init)
    else:
        # the production loop construct: data-dependent exit
        _, cur, acc, qn = jax.lax.while_loop(
            lambda st: (st[0] < iters) & (st[2] != -123457), pbody, init)
    tb = tb_ref[0, 0].astype(jnp.int32)
    out_ref[0, 0] = acc + cur + qn + q_ref[0] + q_ref[1] + tb


def make_fn(mode: str, iters: int, grid: int):
    def kernel(seed_ref, nodes_ref, rays_ref, out_ref, q_ref, tb_ref):
        pid = pl.program_id(0)
        seed = seed_ref[0] + pid
        q_ref[0] = seed
        q_ref[1] = seed

        if mode in PMODES:
            _production_volume(mode, iters, seed, nodes_ref, rays_ref,
                               out_ref, q_ref, tb_ref)
            return

        def slab(row):
            # a slab test's worth of vector work against the ray block:
            # ~6 mul + 6 add/sub + min/max tree + compare, (ROWS, LANES)
            rb = rays_ref[...]
            t0 = (row[None, :] - rb) * rb
            t1 = (row[None, :] + rb) * rb
            near = jnp.minimum(t0, t1)
            far = jnp.maximum(t0, t1)
            return (near <= far + 1.0)

        def body(i, carry):
            if mode == "vector":
                cur, acc, vacc = carry
            else:
                cur, acc = carry
            if mode == "empty":
                # pure loop mechanics: one dependent add
                return (cur + 1) & (NN - 1), acc
            if mode == "add8":
                # 8 dependent adds (serial scalar chain, no multiply)
                for _ in range(8):
                    cur = (cur + acc + 1) & (NN - 1)
                return cur, acc + 1
            if mode == "mul8":
                # 8 dependent LCG steps per iteration
                for _ in range(8):
                    cur = (cur * 1103515245 + 12345) & (NN - 1)
                return cur, acc + cur
            if mode == "scalar":
                nxt = (cur * 1103515245 + 12345 + i) & (NN - 1)
                return nxt, acc + cur
            row = nodes_ref[cur]                      # dynamic row fetch
            w = jax.lax.bitcast_convert_type(row, jnp.int32)
            meta = w[0]                               # lane extract
            if mode == "fetch":
                nxt = (meta + i) & (NN - 1)
                return nxt, acc + meta
            want = slab(row)
            if mode == "vector":
                # vector work retires into vacc; steering is scalar-only
                nxt = (meta + i) & (NN - 1)
                return nxt, acc + meta, vacc + want.astype(jnp.float32)
            s = jnp.sum(want.astype(jnp.float32))     # vector -> scalar
            if mode == "readout":
                nxt = (meta + s.astype(jnp.int32) + i) & (NN - 1)
                return nxt, acc + meta
            # full: second fetch + slab, packed readout, SMEM writes
            row2 = nodes_ref[(cur + 1) & (NN - 1)]
            w2 = jax.lax.bitcast_convert_type(row2, jnp.int32)
            want2 = slab(row2)
            s2 = jnp.sum(want.astype(jnp.float32)
                         + 129.0 * want2.astype(jnp.float32))
            sl = s2.astype(jnp.int32)
            wl = (sl % 129) > 0
            wr = (sl // 129) > 0
            q_ref[jnp.where(wl, jnp.int32(0), 8)] = meta
            q_ref[jnp.where(wr, jnp.int32(1), 8)] = w2[0]
            nxt = jnp.where(wl, meta, w2[0])
            nxt = (nxt + i) & (NN - 1)
            return nxt, acc + sl

        init = (seed & (NN - 1), jnp.int32(0))
        if mode == "vector":
            init = init + (jnp.zeros((ROWS, LANES), jnp.float32),)
            cur, acc, vacc = jax.lax.fori_loop(0, iters, body, init)
            acc = acc + jnp.sum(vacc[0, :1]).astype(jnp.int32)
        else:
            cur, acc = jax.lax.fori_loop(0, iters, body, init)
        out_ref[0, 0] = acc + cur + q_ref[0] + q_ref[1]

    pc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  # constant index maps: blocks are fetched into VMEM once
                  pl.BlockSpec((NN, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ROWS, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((18,), jnp.int32),
                        pltpu.VMEM((ROWS, LANES), jnp.float32)],
        interpret=jax.default_backend() == "cpu",
    )

    @jax.jit
    def run(seed):
        # inputs generated ON DEVICE: a fresh-input upload over the
        # tunnel costs ~100 ms/2 MB and swamps the kernel (first version
        # of this probe measured exactly that constant in every mode)
        key = jax.random.PRNGKey(seed[0])
        nodes = jax.random.uniform(key, (NN, LANES), jnp.float32, 0.1, 1.0)
        idx = jax.random.randint(jax.random.fold_in(key, 1), (NN,), 0, NN)
        nodes = nodes.at[:, 0].set(
            jax.lax.bitcast_convert_type(idx.astype(jnp.int32), jnp.float32))
        rays = jax.random.uniform(jax.random.fold_in(key, 2),
                                  (ROWS, LANES), jnp.float32, 0.1, 1.0)
        return pc(seed, nodes, rays)

    return run


def main():
    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    base = {}
    modes = sys.argv[4].split(",") if len(sys.argv) > 4 else (
        "empty", "scalar", "fetch", "vector", "readout", "full",
        "vpu", "pslab", "pwhile", "pdrain")
    for mode in modes:
        # two iteration counts: the SLOPE separates per-iteration cost
        # from the fixed per-call cost (dispatch + tunnel RTT)
        res = {}
        for it in (iters, iters * 4):
            fn = make_fn(mode, it, grid)
            times = []
            for rep in range(reps):
                seed = jnp.asarray([rep * 7919 + it], jnp.int32)
                out = fn(seed)   # warm the compile / distinct seed
                np.asarray(jax.device_get(out))
                t0 = time.perf_counter()
                out = fn(seed + 1)
                np.asarray(jax.device_get(out))
                times.append(time.perf_counter() - t0)
            res[it] = float(np.median(times))
        slope = (res[iters * 4] - res[iters]) / (grid * iters * 3) * 1e9
        fixed = res[iters] - slope * grid * iters * 1e-9
        base[mode] = slope
        extra = slope - base.get("empty", 0.0)
        print(f"{mode:8s} {res[iters]*1e3:8.2f} / {res[iters*4]*1e3:8.2f} ms"
              f"  slope {slope:7.1f} ns/iter  (+{extra:6.1f} vs empty)  "
              f"fixed~{fixed*1e3:.1f} ms")


if __name__ == "__main__":
    main()
