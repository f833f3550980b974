"""Small modules: paths, constants, logging."""

import json

import numpy as np

from ctseg_tpu import constants
from ctseg_tpu.training.logging import MetricLogger


def test_constants_consistency():
    assert len(constants.STRUCTURES) == 9
    assert constants.NUM_CLASSES == 10
    assert list(constants.CLASS_WEIGHT)[0] == "Background"
    assert list(constants.CLASS_WEIGHT)[1:] == constants.STRUCTURES
    assert len(constants.ANNOTATION_COUNT) == 9
    assert set(constants.WINDOWING_CONFIG) == {"brain", "soft_tissue", "bone"}
    assert len(constants.STACKED_WINDOW_MEAN) == 3


def test_paths_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("CTSEG_DATA_STORAGE", str(tmp_path / "store"))
    import importlib

    import ctseg_tpu.paths as paths

    importlib.reload(paths)
    assert str(paths.DEFAULT_DATA_STORAGE) == str(tmp_path / "store")
    monkeypatch.delenv("CTSEG_DATA_STORAGE")
    importlib.reload(paths)  # restore for other tests


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(log_dir=tmp_path, stdout=False)
    logger.log({"a": 1.5, "b": 2}, step=3)
    logger.log({"a": 1.0}, step=4)
    logger.close()
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 3 and rec["a"] == 1.5 and "time" in rec
