"""Dispatcher: `python -m fdm_tpu <command> [args...]`."""

import importlib
import sys

from fdm_tpu.cli import COMMANDS


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        names = ", ".join(c.replace("_", "-") for c in COMMANDS)
        print(f"usage: python -m fdm_tpu <command> [args...]\ncommands: {names}")
        return 0 if argv else 2
    name = argv[0].replace("-", "_")
    if name not in COMMANDS:
        print(f"unknown command {argv[0]!r}; expected one of {COMMANDS}")
        return 2
    module = importlib.import_module(f"fdm_tpu.cli.{name}")
    return module.main(argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
