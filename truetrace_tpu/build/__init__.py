from truetrace_tpu.build.bvh2 import build_bvh2, BVH2  # noqa: F401
