"""First-party native (C++) host components and their ctypes bindings."""

from stroke_derenderer_tpu.native import cc_native  # noqa: F401
