"""CLI entry (reference: reflectcuts/main.cpp — argv[1] = JSON config).

    python -m evplp_tpu scene.json [options]

Keeps the reference's config schema verbatim; adds headless niceties the
windowed reference could not have (output redirection, checkpointing,
profiling).
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="evplp_tpu",
        description="TPU-native EVPLP renderer (pt / photonfam / lvcphotonfam)")
    ap.add_argument("config", help="reference-format JSON scene config")
    ap.add_argument("--output-dir", default=None,
                    help="redirect configured output files into this dir "
                         "(the reference configs use absolute C:// paths)")
    ap.add_argument("--max-wall-s", type=float, default=None,
                    help="hard wall-clock cap regardless of timeLimitMs")
    ap.add_argument("--profile", action="store_true",
                    help="per-pass device timing (printed + in stats)")
    ap.add_argument("--gamma", action="store_true",
                    help="apply the display gamma (pow 1/2.2, final.frag:"
                         "27-30) to saved outputs; reference dumps are linear")
    ap.add_argument("--checkpoint", default=None,
                    help="write progressive-state checkpoints here")
    ap.add_argument("--checkpoint-every", type=int, default=50)
    ap.add_argument("--resume", default=None,
                    help="resume from a checkpoint file")
    ap.add_argument("--mesh", type=int, default=None, metavar="N",
                    help="run pixel-row-sharded over the first N devices "
                         "(jax.sharding.Mesh; light blocks ring-rotate — "
                         "parallel/shard.py).  Requires N visible devices "
                         "and resY %% N == 0")
    args = ap.parse_args(argv)

    import os

    import jax
    platform = os.environ.get("EVPLP_PLATFORM")
    if platform:  # e.g. EVPLP_PLATFORM=cpu (the axon plugin pins jax to TPU)
        jax.config.update("jax_platforms", platform)
    # persistent compile cache: the reference's timeLimitMs clock excludes
    # its setup-time PTX compile (rtpt2.h / rtcomphoton.h); ours excludes
    # the warm-up frame too (loop.py), and the cache makes repeat CLI runs
    # skip the multi-minute tunnel compile entirely
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/evplp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from evplp_tpu.runtime.render import render_config

    kwargs = {"max_wall_s": args.max_wall_s,
              "display_gamma": args.gamma}
    if args.profile:
        kwargs["profile"] = True
    if args.checkpoint:
        kwargs["checkpoint_path"] = args.checkpoint
        kwargs["checkpoint_every"] = args.checkpoint_every
    if args.resume:
        kwargs["resume_from"] = args.resume

    # pt runs accept only a subset of kwargs
    with open(args.config) as f:
        cfg = json.load(f)
    if "pt" in cfg:
        kwargs = {"max_wall_s": args.max_wall_s,
                  "display_gamma": args.gamma}
    if args.mesh:
        from evplp_tpu.parallel.shard import make_mesh
        kwargs["mesh"] = make_mesh(args.mesh)

    result = render_config(args.config, output_dir=args.output_dir, **kwargs)
    print(json.dumps({
        "numIterations": result.num_iterations,
        "timeMs": round(result.time_ms, 1),
        **result.stats,
    }, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
