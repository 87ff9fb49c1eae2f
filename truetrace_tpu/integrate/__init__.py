from truetrace_tpu.integrate.pathtrace import render, RenderConfig  # noqa: F401
