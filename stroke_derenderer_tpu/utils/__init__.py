from stroke_derenderer_tpu.utils.profiling import StageTimer, device_trace  # noqa: F401
from stroke_derenderer_tpu.utils.logging import get_logger  # noqa: F401
from stroke_derenderer_tpu.utils.backend import honor_platform_env  # noqa: F401
from stroke_derenderer_tpu.utils.backend import enable_compile_cache  # noqa: F401,E501
