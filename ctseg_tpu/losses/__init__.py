from ctseg_tpu.losses.segmentation import (  # noqa: F401
    LOSSES,
    MultiLoss,
    apply_missing_mask,
    boundary_loss,
    cross_entropy_loss,
    dice_loss,
    focal_loss,
    generalized_dice_loss,
    weighted_cross_entropy_loss,
)
