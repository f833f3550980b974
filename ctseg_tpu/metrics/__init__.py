from ctseg_tpu.metrics.dice import (  # noqa: F401
    DiceMetric,
    dice_per_sample_class,
    masked_mean_batch,
)
