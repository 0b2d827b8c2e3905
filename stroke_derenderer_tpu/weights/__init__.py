from stroke_derenderer_tpu.weights.store import (  # noqa: F401
    save_variables, load_variables, init_binarizer_variables,
    init_strokes_variables, materialize_model_dir,
)
