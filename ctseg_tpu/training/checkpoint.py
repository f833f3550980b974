"""Checkpointing with embedded hyperparameters.

Parity property with the reference (capstone/training/base_trainer.py:43-52 +
interpretability.py:28-31): hparams travel with the checkpoint so a model can
be rebuilt from the file alone. Format: a directory holding a flax-msgpack
state pytree plus an hparams JSON — host-portable, dependency-free.
"""

import json
from pathlib import Path
from typing import Any, Dict, Union

import flax.serialization
import jax


def save_checkpoint(
    path: Union[str, Path], state: Any, hparams: Dict[str, Any]
) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_state = jax.device_get(state)
    (path / "state.msgpack").write_bytes(flax.serialization.to_bytes(host_state))
    (path / "hparams.json").write_text(json.dumps(hparams, indent=2, default=str))


def load_hparams(path: Union[str, Path]) -> Dict[str, Any]:
    return json.loads((Path(path) / "hparams.json").read_text())


def load_checkpoint(path: Union[str, Path], template_state: Any) -> Any:
    """Restore a state pytree using `template_state` for structure/shapes."""
    data = (Path(path) / "state.msgpack").read_bytes()
    return flax.serialization.from_bytes(template_state, data)
