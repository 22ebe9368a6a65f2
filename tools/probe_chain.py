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

Per-iteration cost of each mode (minus the scalar baseline) attributes
the floor.  Measurement per NOTES rules: fresh inputs per rep, fetch
fences, medians over reps; grid x iters large enough that dispatch
overhead (~ms on the tunnel) is <5%.

Usage: python tools/probe_chain.py [grid] [iters] [reps]
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
NN = 4096  # node rows in VMEM (4096*128*4 = 2 MB)


def make_fn(mode: str, iters: int, grid: int):
    def kernel(seed_ref, nodes_ref, rays_ref, out_ref, q_ref):
        pid = pl.program_id(0)
        seed = seed_ref[0] + pid
        q_ref[0] = seed
        q_ref[1] = seed

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
        scratch_shapes=[pltpu.SMEM((9,), jnp.int32)],
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
        "empty", "add8", "mul8", "scalar", "fetch", "vector", "readout",
        "full")
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
