"""Checkpointing with embedded hyperparameters.

Parity property with the reference (capstone/training/base_trainer.py:43-52 +
interpretability.py:28-31): hparams travel with the checkpoint so a model can
be rebuilt from the file alone. Format: a directory holding a flax-msgpack
state pytree plus an hparams JSON — host-portable, dependency-free.

Production hardening beyond the reference:
  - each file write is ATOMIC (tmp file + rename), the hparams record a
    digest of the state bytes, and re-saves rotate the previous state to
    state.msgpack.bak before writing — so a kill at ANY point leaves a
    loadable generation: a mixed-generation main pair is detected by the
    digest and load_checkpoint RECOVERS the previous generation from the
    backup instead of deserializing garbage or bricking the run;
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
import warnings
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
    """Write (state.msgpack, hparams.json) so that EVERY kill point leaves a
    loadable generation.

    Two files cannot be replaced in one atomic step, so re-saving into the
    same directory rotates the previous state to state.msgpack.bak first;
    the write order is then bak-rotate -> state -> hparams (each rename
    atomic). A kill between the renames leaves either a consistent main
    pair or a (state.msgpack.bak, hparams.json) pair whose digests match —
    load_checkpoint recovers the previous generation from the backup
    instead of bricking the run."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_state = jax.device_get(state)
    data = flax.serialization.to_bytes(host_state)
    meta = dict(hparams, _state_sha256=hashlib.sha256(data).hexdigest())
    state_path = path / "state.msgpack"
    if state_path.exists():
        # Rotate only a state that matches the on-disk hparams digest: a
        # leftover from a torn save must not clobber the good backup.
        hp = path / "hparams.json"
        rec = (
            json.loads(hp.read_text()).get("_state_sha256")
            if hp.exists()
            else None
        )
        old = state_path.read_bytes()
        if rec is None or hashlib.sha256(old).hexdigest() == rec:
            os.replace(state_path, path / "state.msgpack.bak")
    _atomic_write_bytes(state_path, data)
    _atomic_write_bytes(
        path / "hparams.json", json.dumps(meta, indent=2, default=str).encode()
    )


def load_hparams(path: Union[str, Path]) -> Dict[str, Any]:
    d = json.loads((Path(path) / "hparams.json").read_text())
    d.pop("_state_sha256", None)
    return d


def load_checkpoint(path: Union[str, Path], template_state: Any) -> Any:
    """Restore a state pytree using `template_state` for structure/shapes.

    Verifies the digest the hparams carry (every checkpoint written since
    the digest was introduced) against the state bytes; on mismatch — a
    save was killed between the two file renames — it falls back to the
    previous generation in state.msgpack.bak when that one matches, and
    only errors when no consistent pair exists (files from different runs,
    or corruption)."""
    path = Path(path)
    recorded = json.loads((path / "hparams.json").read_text()).get(
        "_state_sha256"
    )
    state_path = path / "state.msgpack"
    data = state_path.read_bytes() if state_path.exists() else None
    if recorded is None:  # pre-digest checkpoint
        if data is None:
            raise FileNotFoundError(state_path)
        return flax.serialization.from_bytes(template_state, data)
    if data is not None and hashlib.sha256(data).hexdigest() == recorded:
        return flax.serialization.from_bytes(template_state, data)
    bak = path / "state.msgpack.bak"
    if bak.exists():
        bak_data = bak.read_bytes()
        if hashlib.sha256(bak_data).hexdigest() == recorded:
            warnings.warn(
                f"checkpoint at {path}: a save was interrupted mid-write; "
                "recovered the previous generation from state.msgpack.bak"
            )
            return flax.serialization.from_bytes(template_state, bak_data)
    raise ValueError(
        f"torn checkpoint at {path}: state.msgpack does not match the "
        "digest in hparams.json and no matching state.msgpack.bak exists "
        "(files from different runs, or corruption)"
    )


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
