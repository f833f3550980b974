from ctseg_tpu.inference.sliding_window import (  # noqa: F401
    gaussian_importance,
    sliding_window_inference,
)
