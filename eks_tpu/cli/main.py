"""Entry point for the eks-tpu CLI.

Subcommands are auto-discovered: every ``cmd_*.py`` module in this package is
imported and its ``register(subparsers)`` called (reference pattern:
eks/cli/main.py:11-37), so adding a smoother family needs no registry edit.
"""

from __future__ import annotations

import argparse
import importlib
import logging
from pathlib import Path

import eks_tpu


def main() -> None:
    parser = argparse.ArgumentParser(
        prog="eks-tpu",
        description="TPU-native Ensemble Kalman Smoother for pose estimation.",
    )
    parser.add_argument(
        "--version", action="version", version=f"eks-tpu {eks_tpu.__version__}"
    )
    subparsers = parser.add_subparsers(title="subcommands", dest="subcommand")
    subparsers.required = True

    cli_dir = Path(__file__).parent
    for module_path in sorted(cli_dir.glob("cmd_*.py")):
        module = importlib.import_module(f"eks_tpu.cli.{module_path.stem}")
        module.register(subparsers)

    args = parser.parse_args()
    if getattr(args, "verbose", False):
        logging.basicConfig(format="%(levelname)s:%(name)s: %(message)s")
        logging.getLogger("eks_tpu").setLevel(logging.DEBUG)
    else:
        logging.basicConfig(format="%(message)s")
        logging.getLogger("eks_tpu").setLevel(logging.INFO)
    args.handler(args)


if __name__ == "__main__":
    main()
