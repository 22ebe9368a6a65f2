"""Multi-PROCESS dryrun: 2 jax.distributed processes x 4 CPU devices each,
one global 8-device mesh, one sharded EVPLP frame (SURVEY.md §2.4/§5's
multi-host transport — the path the single-process dryrun cannot exercise:
jax.distributed.initialize, cross-process global mesh, collectives over
the distributed runtime).

Launcher (default): spawns the two workers and reports ok/fail.
Worker:  python tools/dryrun_multiprocess.py --worker <i> --port <p>
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
N_LOCAL = 4


def worker(proc_id: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={N_LOCAL}").strip()
    sys.path.insert(0, REPO)
    import jax
    # the axon plugin pins jax_platforms at import; the config update (not
    # the env var) is what actually forces CPU (same as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=N_PROC, process_id=proc_id)
    import jax.numpy as jnp
    assert len(jax.devices()) == N_PROC * N_LOCAL, jax.devices()

    from evplp_tpu.integrators.photon_fam import PhotonFamConfig, init_state
    from evplp_tpu.parallel.shard import (
        make_mesh, shard_state, sharded_photon_fam_frame, sharded_pt_frame)
    from evplp_tpu.scene.procedural import cornell_box

    n = N_PROC * N_LOCAL
    scene = cornell_box()
    cfg = PhotonFamConfig(
        width=16, height=8 * n, num_light_paths=8 * n,
        num_vpl_light_paths=n, num_records=3, mis_mode=1, accumulate=True,
        use_jitter=True, splat_tile=4, splat_cap=32, splat_span=4)
    mesh = make_mesh(n)
    state = shard_state(init_state(cfg), mesh)
    radius = scene.bounding_radius * 0.05
    pdf_mc = (cfg.num_vpl_light_paths / cfg.num_light_paths) / \
        float(jnp.pi) / (radius * radius)
    out = sharded_photon_fam_frame(
        scene, cfg, mesh, state, jax.random.PRNGKey(0),
        radius, 1.0 / scene.total_area, pdf_mc)
    jax.block_until_ready(out.vpl_acc)
    # every process asserts ITS addressable shards finite
    for s in out.vpl_acc.addressable_shards:
        assert bool(jnp.isfinite(s.data).all())

    pt_img, _ = sharded_pt_frame(scene, mesh, cfg.width, cfg.height,
                                 jax.random.PRNGKey(3), 2)
    jax.block_until_ready(pt_img)
    for s in pt_img.addressable_shards:
        assert bool(jnp.isfinite(s.data).all())

    print(f"worker {proc_id}: ok ({len(jax.devices())} global devices, "
          f"{len(jax.local_devices())} local)", flush=True)
    jax.distributed.shutdown()


def launch(timeout_s: float = 420.0) -> bool:
    port = 29000 + (os.getpid() % 1000)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--worker", str(i), "--port", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(N_PROC)]
    deadline = time.time() + timeout_s
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=max(1.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        if p.returncode != 0:
            ok = False
        tail = "\n".join(out.strip().splitlines()[-6:])
        print(f"--- worker {i} (rc={p.returncode}) ---\n{tail}", flush=True)
    print(f"dryrun_multiprocess: {'ok' if ok else 'FAILED'} "
          f"({N_PROC} processes x {N_LOCAL} devices, global mesh 8)",
          flush=True)
    return ok


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = int(sys.argv[sys.argv.index("--worker") + 1])
        p = int(sys.argv[sys.argv.index("--port") + 1])
        worker(i, p)
    else:
        sys.exit(0 if launch() else 1)
