"""Dump the Mosaic (tpu-dialect) MLIR module of the production packet
kernel for inspection (VERDICT r3 #1 prong (a): name the while-body stall).

The axon tunnel compiles Mosaic server-side, so post-layout vector IR and
machine code are unreachable from this client; the pre-layout tpu-dialect
module (what `pl.pallas_call(debug=True)` prints) is the deepest
obtainable artifact.  This tool captures it to a file and prints a
while-body op census (scalar loads/stores, vector ops, reductions,
dynamic fetches) so the serialization structure is quantified rather than
eyeballed.

Usage: python tools/mosaic_dump.py [out.mlir]
"""
from __future__ import annotations

import contextlib
import io
import re
import sys
from functools import partial

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/packet3_mosaic.mlir"

    # capture debug output from lowering: monkeypatch pallas_call
    orig = pl.pallas_call
    buf = io.StringIO()

    def patched(*a, **kw):
        kw["debug"] = True
        return orig(*a, **kw)

    pl.pallas_call = patched
    try:
        from evplp_tpu.scene.procedural import box_field
        from evplp_tpu.trace import packet3

        scene = box_field(num_boxes=512)  # small: fast build, same kernel
        bvh = scene.bvh
        r = 8192
        key = jax.random.PRNGKey(0)
        o = jax.random.uniform(key, (r, 3))
        d = jax.random.normal(jax.random.fold_in(key, 1), (r, 3))
        t_min = jnp.full((r,), 1e-5)
        t_max = jnp.full((r,), 3e38)

        f = partial(packet3.packet3_trace, bvh.pk_tri_rows, bvh.pk_meta,
                    bvh.pk_bounds, None, rpl=bvh.rpl, fused=bvh.fused_nodes,
                    rows=32, npack=2)
        with contextlib.redirect_stdout(buf):
            jax.jit(lambda *args: f(*args)).lower(o, d, t_min, t_max)
    finally:
        pl.pallas_call = orig

    text = buf.getvalue()
    with open(out_path, "w") as fh:
        fh.write(text)
    print(f"wrote {len(text)} bytes to {out_path}")

    # ---- census of the while body ----
    i = text.find("scf.while")
    if i < 0:
        print("no scf.while found (module below)")
        print(text[:4000])
        return
    # crude: take everything from the while to the end of its closing yield
    body = text[i:]
    ops = re.findall(r"= \"?([a-z_]+\.[a-z_0-9]+)", body)
    from collections import Counter
    census = Counter(ops)
    print("\nop census inside/after the while (top 40):")
    for op, c in census.most_common(40):
        print(f"  {c:5d}  {op}")


if __name__ == "__main__":
    main()
