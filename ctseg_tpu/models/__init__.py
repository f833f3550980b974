from ctseg_tpu.models.unet import SegmentationModel, UNet  # noqa: F401
