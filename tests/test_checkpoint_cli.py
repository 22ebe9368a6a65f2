"""Checkpoint/resume semantics + CLI entry + profiling stats."""
import json
import os
import subprocess
import sys

import numpy as np

from evplp_tpu.runtime.loop import run_photon_fam
from evplp_tpu.scene.config import load_config
from evplp_tpu.scene.export import write_cornell_config

RES = 16


def _job(tmp, n_iter, **extra):
    block = dict(
        rngOffset=0, numMaxIteration=n_iter, timeLimitMs=-1.0,
        frameMode="accumulate", useJitter=True, useStat=False,
        statFilename="", numLightPaths=64, numVplLightPaths=8,
        numMaxBounces=2, radiusPercentage=0.05, DoProgressive=True,
        combinedFilename="", weightedPhotonFilename="", weightedVplFilename="",
        **extra,
    )
    path = write_cornell_config(str(tmp), block, "photonfam", res=RES,
                                name=f"ckpt{n_iter}")
    return load_config(path)


def test_checkpoint_resume_bit_equal(tmp_path):
    """4 straight iterations == 2 iterations + checkpoint + 2 resumed."""
    ckpt = str(tmp_path / "state.npz")

    full = run_photon_fam(_job(tmp_path, 4))
    _ = run_photon_fam(_job(tmp_path, 2), checkpoint_path=ckpt,
                       checkpoint_every=2)
    resumed = run_photon_fam(_job(tmp_path, 4), resume_from=ckpt)

    assert resumed.num_iterations == 4
    np.testing.assert_allclose(resumed.images["combined"],
                               full.images["combined"], rtol=1e-5, atol=1e-7)


def test_profiling_stats(tmp_path):
    res = run_photon_fam(_job(tmp_path, 2), profile=True)
    passes = res.stats["passes"]
    for name in ("gbuffer", "light_trace", "vpl_gather", "photon_splat"):
        assert name in passes and passes[name]["calls"] == 2


def test_cli(tmp_path):
    block = dict(
        rngOffset=0, numMaxIteration=1, timeLimitMs=-1.0,
        frameMode="accumulate", useJitter=False, useStat=False,
        statFilename="", numSamplePerPixel=1, numMaxBounces=1,
        outputFilename=os.path.join(str(tmp_path), "o.pfm"),
    )
    cfg = write_cornell_config(str(tmp_path), block, "pt", res=8, name="cli")
    env = dict(os.environ, EVPLP_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "evplp_tpu", cfg],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout[out.stdout.rfind("{"):])
    assert stats["numIterations"] == 1
    assert os.path.exists(os.path.join(str(tmp_path), "o.pfm"))


def test_cli_mesh(tmp_path):
    """--mesh N runs the sharded frame from the CLI (VERDICT r3 #6)."""
    block = dict(
        rngOffset=0, numMaxIteration=1, timeLimitMs=-1.0,
        frameMode="accumulate", useJitter=False, useStat=False,
        statFilename="", numLightPaths=64, numVplLightPaths=8,
        numMaxBounces=2, radiusPercentage=0.05, DoProgressive=False,
        combinedFilename=os.path.join(str(tmp_path), "m.pfm"),
        weightedPhotonFilename="", weightedVplFilename="",
    )
    cfg = write_cornell_config(str(tmp_path), block, "photonfam", res=16,
                               name="climesh")
    env = dict(os.environ, EVPLP_PLATFORM="cpu",
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + " --xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, "-m", "evplp_tpu", cfg, "--mesh", "8"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout[out.stdout.rfind("{"):])
    assert stats["numIterations"] == 1
    assert os.path.exists(os.path.join(str(tmp_path), "m.pfm"))
