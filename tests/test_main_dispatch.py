"""`python -m ctseg_tpu` front door: catalog, dispatch table, forwarding.

The reference's entry points are path-run scripts
(/root/reference/capstone/data/download.py:96,
training/base_trainer.py:249); here every CLI is a module and the
dispatcher in ctseg_tpu/__main__.py routes one command namespace to them.
"""

import importlib

import pytest

from ctseg_tpu.__main__ import COMMANDS, main


def test_usage_on_no_args(capsys):
    assert main([]) == 2
    out = capsys.readouterr().out
    for name in COMMANDS:
        assert name in out


def test_help_exits_zero(capsys):
    assert main(["--help"]) == 0
    assert "commands:" in capsys.readouterr().out


def test_unknown_command(capsys):
    assert main(["definitely_not_a_command"]) == 2
    assert "unknown command" in capsys.readouterr().err


def test_every_command_targets_an_importable_module_with_main():
    for name, (module, prefix, desc) in COMMANDS.items():
        mod = importlib.import_module(module)
        assert hasattr(mod, "main"), f"{name}: {module} has no main()"
        assert desc
        # The train commands ride the shared training parser's subcommands.
        if module == "ctseg_tpu.training.cli":
            assert prefix == (name,)


def test_forwards_argv_to_target_parser(capsys):
    # argparse --help raises SystemExit(0) from the *target* module's parser,
    # proving argv forwarding (stats is the lightest real CLI).
    with pytest.raises(SystemExit) as e:
        main(["stats", "--help"])
    assert e.value.code == 0
    assert "--data_dir" in capsys.readouterr().out


def test_parity_command_dispatches(capsys):
    # parity_report.py lives at the repo root; the dispatcher reaches it and
    # forwards --help to ITS parser.
    with pytest.raises(SystemExit) as e:
        main(["parity", "--help"])
    assert e.value.code == 0
    assert "--from_released" in capsys.readouterr().out


def test_main_restores_sys_argv():
    import sys

    before = list(sys.argv)
    with pytest.raises(SystemExit):
        main(["stats", "--help"])
    assert sys.argv == before


def test_return_code_propagates(monkeypatch):
    # The dispatcher calls the target's main() directly and returns its int
    # exit code (non-int/None becomes 0).
    import sys
    import types
    from importlib.machinery import ModuleSpec

    from ctseg_tpu import __main__ as front

    mod = types.ModuleType("_ctseg_fake_cmd")
    mod.__spec__ = ModuleSpec("_ctseg_fake_cmd", loader=None)
    mod.main = lambda: 7
    monkeypatch.setitem(sys.modules, "_ctseg_fake_cmd", mod)
    monkeypatch.setitem(front.COMMANDS, "fake", ("_ctseg_fake_cmd", (), "x"))
    assert main(["fake"]) == 7
    mod.main = lambda: None
    assert main(["fake"]) == 0


def test_no_reexecution_warning():
    # Dispatching to an already-imported module must not re-execute it (the
    # runpy-era 'found in sys.modules' RuntimeWarning).
    import warnings

    importlib.import_module("ctseg_tpu.data.stats")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        with pytest.raises(SystemExit) as e:
            main(["stats", "--help"])
    assert e.value.code == 0
