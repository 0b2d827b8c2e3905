from stroke_derenderer_tpu.train.losses import (  # noqa: F401
    binarize_loss, caption_loss, dice_loss,
)
from stroke_derenderer_tpu.train.steps import (  # noqa: F401
    TrainState, make_binarizer_train_step, make_captioner_train_step,
    make_sharded_train_step,
)
