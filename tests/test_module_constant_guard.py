"""No module-level constant in ``queries/`` may be assigned twice.

The round-8 incident: ``multimodal_queries.py`` defined ``_N_VID = 100``
for mm2, then a later commit added a second ``_N_VID = 10`` fixture for
mm9. Oracle SQL f-strings bind module constants at *decoration* time
(mm2's oracle kept 100), but query bodies read the global at *call*
time (mm2's fixture silently shrank to 10 rows) — a deterministic
spark-vs-oracle divergence that only the graded compare catches.

This guard makes the class structurally impossible: walk every module
under ``queries/`` with ``ast`` and assert no top-level name is bound
by more than one plain assignment. Scoped to simple ``NAME = ...`` /
``NAME: T = ...`` statements at module body level — function/class
defs, imports, and ``__dunder__`` names are exempt (re-exports and
``__all__`` manipulation are legitimate).
"""

from __future__ import annotations

import ast
from pathlib import Path

import pytest

QUERIES_DIR = (
    Path(__file__).resolve().parent.parent
    / "big_data_analytics_spark" / "queries"
)
MODULES = sorted(QUERIES_DIR.glob("*.py"))


def _toplevel_assigned_names(tree: ast.Module) -> list[str]:
    names: list[str] = []
    for node in tree.body:
        targets: list[ast.expr] = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]
        for t in targets:
            for sub in ast.walk(t):
                if isinstance(sub, ast.Name) and not sub.id.startswith("__"):
                    names.append(sub.id)
    return names


def test_query_modules_exist():
    assert MODULES, f"no modules found under {QUERIES_DIR}"


@pytest.mark.parametrize("path", MODULES, ids=lambda p: p.stem)
def test_no_duplicate_module_level_constant(path):
    tree = ast.parse(path.read_text(), filename=str(path))
    names = _toplevel_assigned_names(tree)
    dupes = sorted({n for n in names if names.count(n) > 1})
    assert not dupes, (
        f"{path.name} assigns module-level name(s) {dupes} more than "
        "once; oracle f-strings bind constants at decoration time while "
        "query bodies read them at call time, so a rebind silently "
        "diverges spark from oracle (the mm2/_N_VID incident) — rename "
        "the later constant"
    )
