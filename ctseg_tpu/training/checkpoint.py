"""Checkpointing with embedded hyperparameters.

Parity property with the reference (capstone/training/base_trainer.py:43-52 +
interpretability.py:28-31): hparams travel with the checkpoint so a model can
be rebuilt from the file alone. Format: a directory holding a flax-msgpack
state pytree plus an hparams JSON — host-portable, dependency-free.

Production hardening beyond the reference:
  - each file write is ATOMIC (tmp file + rename), and the hparams record a
    digest of the state bytes, so a kill landing between the two renames
    (possible only when re-targeting a directory with different content)
    is DETECTED at load instead of deserializing a mixed-generation pair;
  - `AsyncCheckpointer` overlaps periodic saves with training: the state is
    snapshotted on device (cheap HBM copies, safe against the train step's
    buffer donation) and a worker thread does the device->host fetch and
    serialization while the train loop keeps dispatching steps. On a remote
    TPU the fetch is the expensive part, so this hides almost all of it.
"""

import hashlib
import json
import os
import threading
from pathlib import Path
from typing import Any, Dict, Union

import flax.serialization
import jax
import jax.numpy as jnp


def _atomic_write_bytes(path: Path, data: bytes) -> None:
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)


def save_checkpoint(
    path: Union[str, Path], state: Any, hparams: Dict[str, Any]
) -> None:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_state = jax.device_get(state)
    data = flax.serialization.to_bytes(host_state)
    # hparams carries the state digest: written FIRST so a kill between the
    # renames leaves (new hparams, old state), which load_checkpoint rejects.
    meta = dict(hparams, _state_sha256=hashlib.sha256(data).hexdigest())
    _atomic_write_bytes(
        path / "hparams.json", json.dumps(meta, indent=2, default=str).encode()
    )
    _atomic_write_bytes(path / "state.msgpack", data)


def load_hparams(path: Union[str, Path]) -> Dict[str, Any]:
    d = json.loads((Path(path) / "hparams.json").read_text())
    d.pop("_state_sha256", None)
    return d


def load_checkpoint(path: Union[str, Path], template_state: Any) -> Any:
    """Restore a state pytree using `template_state` for structure/shapes.

    Rejects mixed-generation directories: if the hparams carry a state
    digest (every checkpoint written since the digest was introduced) it
    must match the state bytes on disk."""
    path = Path(path)
    data = (path / "state.msgpack").read_bytes()
    recorded = json.loads((path / "hparams.json").read_text()).get(
        "_state_sha256"
    )
    if recorded is not None:
        actual = hashlib.sha256(data).hexdigest()
        if actual != recorded:
            raise ValueError(
                f"torn checkpoint at {path}: state.msgpack does not match the "
                "digest in hparams.json (a save was interrupted between the "
                "two file writes, or the files come from different runs)"
            )
    return flax.serialization.from_bytes(template_state, data)


class AsyncCheckpointer:
    """Non-blocking checkpoint saves for the training loop.

    `save()` snapshots the state with on-device copies (dispatch returns
    immediately; the copies also decouple the snapshot from buffers the next
    train step will donate) and hands serialization to a worker thread. At
    most one save is in flight: a new `save()` first joins the previous one.
    Call `wait()` before reading the checkpoint or exiting.
    """

    def __init__(self):
        self._thread = None
        self._error = None

    def save(
        self, path: Union[str, Path], state: Any, hparams: Dict[str, Any]
    ) -> None:
        self.wait()
        snapshot = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state
        )

        def work():
            try:
                save_checkpoint(path, snapshot, hparams)
            except Exception as e:  # surfaced by the next wait()/save()
                self._error = e

        self._thread = threading.Thread(
            target=work, name="ctseg-async-ckpt", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from err
