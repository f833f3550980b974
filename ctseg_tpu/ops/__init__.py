from ctseg_tpu.ops.masks import (  # noqa: F401
    one_hot,
    squash_masks,
    squash_predictions,
)
