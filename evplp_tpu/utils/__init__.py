from evplp_tpu.utils import image  # noqa: F401
