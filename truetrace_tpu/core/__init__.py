from truetrace_tpu.core import math as ttmath  # noqa: F401
from truetrace_tpu.core import rng  # noqa: F401
from truetrace_tpu.core import aabb  # noqa: F401
