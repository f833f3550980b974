"""`python -m ctseg_tpu <command> ...` — one front door to every CLI.

The reference exposes its entry points as separate scripts run by path
(`python download.py miccai`, `python base_trainer.py ...`,
`python interpretability.py`; /root/reference/capstone/data/download.py:96,
training/base_trainer.py:249, interpretability.py:109). This framework's
CLIs are importable modules; this dispatcher makes them discoverable from
one place without importing any of them (and therefore without touching
JAX) until a command is actually chosen.

Each command forwards the remaining argv verbatim to the target module's
own argparse, so `python -m ctseg_tpu evaluate --help` is exactly
`python -m ctseg_tpu.inference.evaluate --help`.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys

# command -> (module run as __main__, argv prefix injected before the
# user's args, one-line description for the catalog).
COMMANDS: dict[str, tuple[str, tuple[str, ...], str]] = {
    "download": (
        "ctseg_tpu.data.download",
        (),
        "download + seed-42 split of the PDDCA dataset",
    ),
    "process": (
        "ctseg_tpu.data.process_miccai",
        (),
        "convert NRRD patients to 2D/3D npz and packed arrays",
    ),
    "stats": (
        "ctseg_tpu.data.stats",
        (),
        "re-derive the published dataset constants (crop box, norm stats, weights)",
    ),
    "train": (
        "ctseg_tpu.training.cli",
        ("train",),
        "train the 2D slice UNet (Model L recipe)",
    ),
    "train_mixup": (
        "ctseg_tpu.training.cli",
        ("train_mixup",),
        "train with weighted mixup (Model M recipe)",
    ),
    "train_3d": (
        "ctseg_tpu.training.cli",
        ("train_3d",),
        "train the volumetric UNet (resize parity or patch mode)",
    ),
    "evaluate": (
        "ctseg_tpu.inference.evaluate",
        (),
        "Dice(+HD95) over a split; 2D slice or 3D sliding-window from hparams",
    ),
    "predict": (
        "ctseg_tpu.inference.predict",
        (),
        "scan NRRD -> segmentation label map + per-structure NRRDs",
    ),
    "serve": (
        "ctseg_tpu.inference.serve",
        (),
        "warm HTTP segmentation server",
    ),
    "export": (
        "ctseg_tpu.inference.export",
        (),
        "checkpoint -> self-contained StableHLO inference artifact",
    ),
    "gradcam": (
        "ctseg_tpu.interpret.run",
        (),
        "GradCAM maps for all 9 structures over the test split",
    ),
    "parity": (
        "parity_report",
        (),
        "per-organ Dice parity report vs the reference's published table",
    ),
}


def _usage() -> str:
    width = max(map(len, COMMANDS))
    lines = [f"  {name:<{width}}  {desc}" for name, (_, _, desc) in COMMANDS.items()]
    return "usage: python -m ctseg_tpu <command> [args...]\n\ncommands:\n" + "\n".join(
        lines
    ) + "\n\n`python -m ctseg_tpu <command> --help` shows that command's options."


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else list(argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage())
        return 0 if argv else 2
    name, rest = argv[0], argv[1:]
    if name not in COMMANDS:
        print(f"unknown command: {name!r}\n\n{_usage()}", file=sys.stderr)
        return 2
    module, prefix, _ = COMMANDS[name]
    # Check resolvability up front (find_spec, no execution): an
    # ImportError raised WHILE the command runs (e.g. a missing optional
    # dependency deep in its work) must propagate as itself, not be
    # misreported as a cwd problem.
    if module == "parity_report" and importlib.util.find_spec(module) is None:
        raise SystemExit(
            "parity_report.py lives at the repo root — run "
            "`python -m ctseg_tpu parity` from the repository checkout"
        )
    # Import the module and call its main() directly (every command target
    # defines one, pinned by tests/test_main_dispatch.py) instead of
    # runpy-re-executing it as __main__: re-execution creates a second copy
    # of an already-imported module (the 'found in sys.modules'
    # RuntimeWarning) with its own globals. The target parses the argv we
    # install here; save/restore the global so programmatic callers (tests,
    # embedders) never see a clobbered sys.argv after main() returns.
    saved_argv = sys.argv
    sys.argv = [f"python -m ctseg_tpu {name}", *prefix, *rest]
    try:
        ret = importlib.import_module(module).main()
    finally:
        sys.argv = saved_argv
    return int(ret) if isinstance(ret, int) else 0


if __name__ == "__main__":
    sys.exit(main())
