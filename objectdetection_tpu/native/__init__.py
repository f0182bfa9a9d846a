"""Native (C++) runtime components, loaded via ctypes.

Build is on-demand (g++ at first import, cached as a .so next to the
source); every native entry point has a pure-Python fallback so the
framework works without a toolchain.
"""

from objectdetection_tpu.native.loader import (  # noqa: F401
    native_available,
    rasterize_shapes_batch,
)
