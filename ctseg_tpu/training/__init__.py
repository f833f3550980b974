from ctseg_tpu.training.schedule import PlateauState, reduce_on_plateau  # noqa: F401
from ctseg_tpu.training.trainer import (  # noqa: F401
    TrainConfig,
    Trainer,
    TrainState,
)
