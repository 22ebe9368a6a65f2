from evplp_tpu.accel.bvh import BVH, build_bvh  # noqa: F401
