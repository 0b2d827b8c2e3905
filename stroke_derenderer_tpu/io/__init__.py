from stroke_derenderer_tpu.io.images import load_image, save_image  # noqa: F401
from stroke_derenderer_tpu.io.serial import (  # noqa: F401
    load_json, save_json, load_yaml, save_metrics, load_metrics,
)
from stroke_derenderer_tpu.io.svg import (  # noqa: F401
    json_strokes_to_svg, save_svg, strokes_to_svg,
)
