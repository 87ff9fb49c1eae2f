from truetrace_tpu.post.pipeline import (  # noqa: F401
    Accumulator, PostConfig, postprocess, tonemap_aces, tonemap_reinhard,
    tonemap_agx, bloom, auto_exposure, sharpen_cas, taa)
