from evplp_tpu.trace.intersect import (  # noqa: F401
    Triangles,
    Hit,
    intersect_closest,
    intersect_any,
    occluded_segment,
    intersect_closest_brute,
)
