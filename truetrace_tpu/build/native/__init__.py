"""Native (C++) build fast paths, loaded via ctypes.

Compiled on demand into this directory (`make_native()`); every entry point
has a pure-numpy fallback so the framework works without a toolchain."""
from truetrace_tpu.build.native.loader import (  # noqa: F401
    build_bvh2_native, build_cwbvh_native, native_available, make_native)
