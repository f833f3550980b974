"""Async checkpointing + preemption-safe training.

The reference has neither: Lightning blocks on every save and an interrupted
run loses everything since the last epoch boundary. Here periodic saves are
device-snapshotted and serialized off-thread (safe against the train step's
donated buffers), writes are atomic (tmp+rename), and SIGTERM — what TPU
maintenance events and cluster schedulers send — finishes the epoch, saves,
and returns a resumable state.
"""

import os
import signal

import jax
import numpy as np

from ctseg_tpu.data.pipeline import DevicePipeline2D
from ctseg_tpu.training import checkpoint as ckpt
from ctseg_tpu.training.trainer import Trainer

from tests.test_e2e_train import _small_config, _synthetic_packed_2d


def _tiny(n=16):
    return _synthetic_packed_2d(np.random.default_rng(11), n=n)


def test_async_checkpointer_round_trip(tmp_path):
    cfg = _small_config()
    tr = Trainer(cfg)
    state = tr.init_state()
    ac = ckpt.AsyncCheckpointer()
    ac.save(tmp_path / "c", state, cfg.as_dict())
    ac.wait()
    tr2, state2 = Trainer.restore(tmp_path / "c")
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # atomic write leaves no temp files behind
    assert not list((tmp_path / "c").glob("*.tmp"))


def test_async_save_survives_donated_buffers(tmp_path):
    """The snapshot must capture the state AS OF the save call even though
    the next train step donates (invalidates) the live state's buffers."""
    cfg = _small_config()
    tr = Trainer(cfg)
    state = tr.init_state()
    pipe = DevicePipeline2D(_tiny(), cfg.batch_size)
    batch = next(pipe.epoch(jax.random.key(0)))
    state, _ = tr._train_step(state, batch, jax.random.key(1))
    saved_params = jax.device_get(state.params)

    ac = ckpt.AsyncCheckpointer()
    ac.save(tmp_path / "c", state, cfg.as_dict())
    # immediately invalidate `state`'s buffers via donation
    state2, _ = tr._train_step(state, batch, jax.random.key(2))
    ac.wait()
    _, restored = Trainer.restore(tmp_path / "c")
    for a, b in zip(jax.tree.leaves(saved_params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the checkpoint is NOT the post-donation state
    assert int(restored.step) == int(jax.device_get(state2.step)) - 1


def test_sigterm_preempts_and_saves_resumable(tmp_path):
    """SIGTERM mid-fit: the current epoch finishes, a checkpoint lands in
    checkpoint_dir, fit raises Preempted (callers must not run their
    'training finished' tails), and --resume semantics restore it."""
    import pytest

    from ctseg_tpu.training.trainer import Preempted

    cfg = _small_config(epochs=50)
    tr = Trainer(cfg)
    state = tr.init_state()
    pipe = DevicePipeline2D(_tiny(), cfg.batch_size)
    fired = {"n": 0}

    def marker_handler(signum, frame):  # pragma: no cover - never invoked
        raise AssertionError("marker handler must not fire")

    prev = signal.signal(signal.SIGTERM, marker_handler)

    def send_sigterm(trainer, state, epoch):
        if epoch == 1 and fired["n"] == 0:
            fired["n"] = 1
            os.kill(os.getpid(), signal.SIGTERM)

    with pytest.raises(Preempted) as excinfo:
        tr.fit(
            state,
            pipe,
            None,
            epochs=50,
            checkpoint_dir=str(tmp_path / "run"),
            checkpoint_every=100,  # periodic saves never fire; only preemption
            callbacks=[send_sigterm],
        )
    final = excinfo.value.state
    steps_per_epoch = len(_tiny()) // cfg.batch_size
    epochs_run = int(final.step) // steps_per_epoch
    assert 2 <= epochs_run <= 3, f"expected early stop, ran {epochs_run} epochs"
    tr2, restored = Trainer.restore(tmp_path / "run")
    assert int(restored.step) == int(final.step)
    # fit restored the handler that was installed before it ran
    assert signal.getsignal(signal.SIGTERM) is marker_handler
    signal.signal(signal.SIGTERM, prev)


def test_torn_checkpoint_detected(tmp_path):
    """A state.msgpack that does not match the hparams digest (interrupted
    between the two file writes, or files from different runs) is rejected
    with a clear error instead of deserializing garbage."""
    import pytest

    cfg = _small_config()
    tr = Trainer(cfg)
    state = tr.init_state()
    tr.save(tmp_path / "c", state)
    blob = (tmp_path / "c" / "state.msgpack").read_bytes()
    (tmp_path / "c" / "state.msgpack").write_bytes(blob + b"x")
    with pytest.raises(ValueError, match="torn checkpoint"):
        Trainer.restore(tmp_path / "c")


def test_torn_resave_recovers_previous_generation(tmp_path):
    """A save killed between the state and hparams renames must NOT brick
    the checkpoint: load falls back to state.msgpack.bak (the previous
    generation), which the bak-rotation in save_checkpoint guarantees
    matches the on-disk hparams digest."""
    import pytest

    cfg = _small_config()
    tr = Trainer(cfg)
    state = tr.init_state()
    d = tmp_path / "c"
    tr.save(d, state)  # gen 1
    bumped = state._replace(step=state.step + 7)
    tr.save(d, bumped)  # gen 2: rotates gen-1 state to .bak
    assert (d / "state.msgpack.bak").exists()

    # Simulate a gen-3 save killed after the state rename, before hparams:
    # rotate gen-2 state to .bak and drop unmatched bytes into the slot.
    os.replace(d / "state.msgpack", d / "state.msgpack.bak")
    (d / "state.msgpack").write_bytes(b"half-written garbage")
    with pytest.warns(UserWarning, match="recovered the previous"):
        _, restored = Trainer.restore(d)
    assert int(restored.step) == int(bumped.step)

    # A fresh save into the recovered directory must not rotate the torn
    # leftover over the good backup; the next kill window stays recoverable.
    tr.save(d, bumped._replace(step=bumped.step + 1))
    _, restored2 = Trainer.restore(d)  # consistent main pair, no warning
    assert int(restored2.step) == int(bumped.step) + 1


def test_torn_resave_save_after_recovery_keeps_backup(tmp_path):
    """save_checkpoint over a torn directory leaves the matching .bak in
    place (the torn state must not become the backup)."""
    cfg = _small_config()
    tr = Trainer(cfg)
    state = tr.init_state()
    d = tmp_path / "c"
    tr.save(d, state)  # gen 1; hparams digest matches gen-1 state
    good = (d / "state.msgpack").read_bytes()
    os.replace(d / "state.msgpack", d / "state.msgpack.bak")
    (d / "state.msgpack").write_bytes(b"torn")  # killed mid-save leftover

    tr.save(d, state._replace(step=state.step + 3))
    # The torn bytes were discarded, not rotated into .bak.
    assert (d / "state.msgpack.bak").read_bytes() == good
    _, restored = Trainer.restore(d)
    assert int(restored.step) == int(state.step) + 3


def test_periodic_async_saves_in_fit(tmp_path):
    cfg = _small_config(epochs=4)
    tr = Trainer(cfg)
    state = tr.init_state()
    pipe = DevicePipeline2D(_tiny(), cfg.batch_size)
    final = tr.fit(
        state,
        pipe,
        None,
        epochs=4,
        checkpoint_dir=str(tmp_path / "run"),
        checkpoint_every=2,
    )
    _, restored = Trainer.restore(tmp_path / "run")
    # last periodic save happened at epoch 4 (the final epoch)
    assert int(restored.step) == int(final.step)


def test_resume_trajectory_bit_exact(tmp_path):
    """Resume == uninterrupted, bit-exact (f64 CPU): N epochs straight vs
    (run k epochs, SIGTERM grace-period save, Trainer.restore, run to N)
    produce IDENTICAL final params, opt state, plateau state, and step —
    the resumed run continues the fold_in(base_key, epoch) augmentation
    key sequence instead of replaying it, and every piece of state
    round-trips through the checkpoint (SURVEY §5.3-5.4 failure-recovery
    parity; reference analogue: Lightning's resume_from_checkpoint)."""
    import pytest

    from ctseg_tpu.training.trainer import Preempted

    N = 4
    train_ds = _tiny(n=24)
    val_ds = _synthetic_packed_2d(np.random.default_rng(12), n=8)

    def pipes(cfg):
        return (
            DevicePipeline2D(train_ds, cfg.batch_size),
            DevicePipeline2D(val_ds, cfg.batch_size),
        )

    # Straight run: N epochs, no interruption.
    cfg_a = _small_config(epochs=N)
    tr_a = Trainer(cfg_a)
    pipe_a, vpipe_a = pipes(cfg_a)
    final_a = tr_a.fit(tr_a.init_state(), pipe_a, vpipe_a, epochs=N)

    # Interrupted run: SIGTERM after an early epoch -> grace-period save ->
    # restore -> fit to the same TOTAL N (wherever the preemption landed).
    cfg_b = _small_config(epochs=N)
    tr_b = Trainer(cfg_b)
    pipe_b, vpipe_b = pipes(cfg_b)
    ckpt_dir = str(tmp_path / "run")

    def send_sigterm(trainer, state, epoch):
        if epoch == 0:
            os.kill(os.getpid(), signal.SIGTERM)

    with pytest.raises(Preempted):
        tr_b.fit(
            tr_b.init_state(), pipe_b, vpipe_b, epochs=N,
            checkpoint_dir=ckpt_dir, callbacks=[send_sigterm],
        )
    tr_b2, restored = Trainer.restore(ckpt_dir)
    steps_per_epoch = len(train_ds) // cfg_b.batch_size
    assert 0 < int(restored.step) < N * steps_per_epoch, "must stop mid-run"
    pipe_b2, vpipe_b2 = pipes(tr_b2.config)
    final_b = tr_b2.fit(restored, pipe_b2, vpipe_b2, epochs=N)

    assert int(final_a.step) == int(final_b.step) == N * steps_per_epoch
    for a, b in zip(
        jax.tree.leaves(final_a.params), jax.tree.leaves(final_b.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(final_a.opt_state), jax.tree.leaves(final_b.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(final_a.plateau), jax.tree.leaves(final_b.plateau)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
