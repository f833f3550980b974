"""Deterministic synthetic batches shared by the two-process distributed
train test and its single-process oracle (pure numpy — safe to import from
both the pytest process and the gloo worker subprocesses)."""

import numpy as np

GLOBAL_BATCH = 8
HW = 32
N_STEPS = 3


def train_config_kwargs():
    """One source of truth for the tiny Trainer both sides build."""
    return dict(
        filters=(2, 4, 8, 16),
        num_res_units=1,
        batch_size=GLOBAL_BATCH,
        transform_degree=0,
        input_size=HW,
        loss_fx=("CrossEntropy",),
        seed=3,
        # f64 end to end: reduction-order noise between the gloo all-reduce
        # and the single-process XLA reduction sits near 1e-16 relative,
        # so the equivalence assertion has teeth at rtol 1e-9.
        compute_dtype="float64",
    )


def global_batches():
    """The full global batch sequence, identical on every process; workers
    slice out their local rows before host_local_batch_to_global."""
    rng = np.random.default_rng(11)
    out = []
    for _ in range(N_STEPS):
        images = rng.normal(40, 300, size=(GLOBAL_BATCH, HW, HW))
        labels = rng.integers(0, 10, size=(GLOBAL_BATCH, HW, HW))
        inds = np.ones((GLOBAL_BATCH, 9))
        out.append(
            (
                images.astype(np.float32),
                labels.astype(np.uint8),
                inds.astype(np.float32),
            )
        )
    return out
