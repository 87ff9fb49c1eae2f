from truetrace_tpu.kernels.traverse_ref import (  # noqa: F401
    closest_hit_bvh2, any_hit_bvh2, Hit)
