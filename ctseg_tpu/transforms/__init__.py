from ctseg_tpu.transforms.windowing import (  # noqa: F401
    apply_window,
    normalize,
    soft_tissue_window,
    windowed_channels,
)
