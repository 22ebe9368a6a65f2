"""Top-level dispatch (reference: main.cpp:87-124).

render_config(path) loads a reference-format JSON and runs the technique its
block selects: "pt" -> path tracer, "photonfam" -> EVPLP family,
"lvcphotonfam" -> LVC variant.
"""
from __future__ import annotations

from evplp_tpu.runtime.loop import RunResult, run_photon_fam, run_pt
from evplp_tpu.scene.config import RenderJob, load_config


def render_job(job: RenderJob, output_dir: str | None = None,
               **kwargs) -> RunResult:
    if job.params.technique == "pt":
        return run_pt(job, output_dir=output_dir,
                      max_wall_s=kwargs.get("max_wall_s"),
                      display_gamma=kwargs.get("display_gamma", False),
                      mesh=kwargs.get("mesh"))
    return run_photon_fam(job, output_dir=output_dir, **kwargs)


def render_config(path: str, output_dir: str | None = None,
                  **kwargs) -> RunResult:
    return render_job(load_config(path), output_dir=output_dir, **kwargs)
