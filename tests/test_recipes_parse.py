"""RECIPES.md doc-drift guard: every documented CLI command line must parse
against the real arg parsers (flags renamed or removed would silently rot
the recipes otherwise). Commands are extracted from the bash code blocks;
`...` ellipses and line continuations are handled."""

import re
import shlex
from pathlib import Path

import pytest

RECIPES = Path(__file__).resolve().parent.parent / "RECIPES.md"


def _commands():
    text = RECIPES.read_text()
    # join continuation lines, then pick python -m vitlens_tpu.cli.* commands
    joined = re.sub(r"\\\n\s*", " ", text)
    cmds = []
    for line in joined.splitlines():
        line = line.strip()
        if line.startswith("python -m vitlens_tpu.cli."):
            cmds.append(line)
    assert len(cmds) >= 10, "RECIPES.md lost its command examples?"
    return cmds


@pytest.mark.parametrize("cmd", _commands(), ids=lambda c: c[:60])
def test_recipe_command_parses(cmd):
    module = cmd.split()[2]  # vitlens_tpu.cli.<name>
    argv = [a for a in shlex.split(cmd, comments=True)[3:] if a != "..."]
    name = module.rsplit(".", 1)[1]
    if name in ("infer", "serve"):
        import importlib

        cli = importlib.import_module(f"vitlens_tpu.cli.{name}")
        args = cli.build_parser().parse_args(argv)
        assert args is not None
    elif name == "train":
        from vitlens_tpu.cli.args import parse_args

        args = parse_args(argv)
        assert args.modality
    elif name == "train_linprobe":
        from vitlens_tpu.cli.train_linprobe import build_args

        build_args(argv)
    elif name == "train_openshape":
        from vitlens_tpu.cli.train_openshape import build_args

        build_args(argv)
    else:  # a recipe references a CLI that doesn't exist
        raise AssertionError(f"unknown CLI module in RECIPES.md: {module}")
