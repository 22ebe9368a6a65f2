from evplp_tpu.core import mathutil, sampling, brdf, light  # noqa: F401
