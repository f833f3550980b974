from ctseg_tpu.volumetric.pipeline3d import DevicePipeline3D  # noqa: F401
from ctseg_tpu.volumetric.trainer3d import make_trainer_3d  # noqa: F401
