"""CLI argument parsing: the full reference flag surface, generated from the
config defaults (every key in ``config.defaults()`` becomes ``--key`` with
hyphens; bools get the reference's paired ``--x`` / ``--no-x`` form,
setup_training.py:17-27)."""

from __future__ import annotations

import argparse
from typing import Any

from ..training.config import Args, ArgsError, defaults, process_args


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="mpgan_tpu training")
    for key, default in defaults().items():
        flag = "--" + key.replace("_", "-")
        if isinstance(default, bool):
            group = parser.add_mutually_exclusive_group(required=False)
            group.add_argument(flag, dest=key, action="store_true")
            group.add_argument(
                "--no-" + key.replace("_", "-"), dest=key, action="store_false"
            )
            if key == "sum":
                # the reference names sum's negation --mean, not --no-sum
                # (setup_training.py:503); accept both spellings
                group.add_argument("--mean", dest=key, action="store_false")
            parser.set_defaults(**{key: default})
        elif isinstance(default, list):
            elem_type = type(default[0]) if default else int
            parser.add_argument(flag, dest=key, type=elem_type, nargs="*", default=default)
        elif default is None:
            parser.add_argument(flag, dest=key, default=None)
        else:
            parser.add_argument(flag, dest=key, type=type(default), default=default)
    return parser


def parse_cli(argv: list[str] | None = None) -> Args:
    parser = build_parser()
    ns = parser.parse_args(argv)
    args = Args(vars(ns))
    try:
        process_args(args)
    except ArgsError as e:
        # the reference logging.error + sys.exit()s on these configs
        # (setup_training.py:717-744); exit loudly rather than traceback
        parser.error(f"{e} - exiting")
    return args
