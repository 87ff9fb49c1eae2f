from truetrace_tpu.dist.sharding import (  # noqa: F401
    make_mesh, render_tiled, train_step_sharded)
