from truetrace_tpu.utils.checkpoint import (  # noqa: F401
    save_render_state, restore_render_state)
from truetrace_tpu.utils.profiling import (  # noqa: F401
    PassTimer, RenderMetrics, trace_annotation)
