"""Static lint: decimal-literal division in Spark-executed SQL texts.

Spark parses every exact-numeric literal (``100.0``) as DECIMAL, so a
SQL text with ``big_int_col / 100.0`` returns DECIMAL on the Spark side
while DuckDB's division returns DOUBLE — the q_sql_api r05 hash-FAIL
class. This lint walks the AST of every ``engine/*.py`` module, finds
each ``spark.sql(<text>)`` call site (literal arg, or a Name bound to a
module-level string constant), and flags any ``/ <d>.<d>`` whose left
context is not an explicit ``CAST(... AS DOUBLE)``.

The lint is the authoring-time complement of two runtime gates that are
the actual authority: the DecimalType schema guard
(tests/test_registry.py::test_no_decimal_output_on_oracle_keys) and the
decimal_cols cell gate (tools/check.py). It deliberately covers ONLY
``spark.sql`` texts — in DataFrame-side ``F.expr`` fragments the left
operand's type is not statically known and the schema guard catches the
dangerous cases anyway.

Usage: python tools/lint_sql.py            # lint engine/*.py, exit 1 on hit
       python tools/lint_sql.py --selftest # seeded counterexample must fire
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

ENGINE = Path(__file__).resolve().parent.parent / "engine"

_DIV = re.compile(r"/\s*\d+\.\d")
_SAFE_LEFT = re.compile(r"AS\s+DOUBLE\s*\)\s*$", re.IGNORECASE)


def flag_text(text: str) -> list[str]:
    """Return one snippet per unsafe decimal-literal division in a SQL text."""
    hits = []
    for m in _DIV.finditer(text):
        left = text[max(0, m.start() - 60) : m.start()].rstrip()
        if not _SAFE_LEFT.search(left):
            snippet = text[max(0, m.start() - 30) : m.end() + 6]
            hits.append(" ".join(snippet.split()))
    return hits


def _module_str_consts(tree: ast.Module) -> dict[str, str]:
    out: dict[str, str] = {}
    for node in tree.body:
        if (
            isinstance(node, ast.Assign)
            and isinstance(node.value, ast.Constant)
            and isinstance(node.value.value, str)
        ):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    out[t.id] = node.value.value
    return out


def lint_file(path: Path) -> list[str]:
    tree = ast.parse(path.read_text(), filename=str(path))
    consts = _module_str_consts(tree)
    problems = []
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "sql"
            and node.args
        ):
            continue
        arg = node.args[0]
        if isinstance(arg, ast.Constant) and isinstance(arg.value, str):
            text = arg.value
        elif isinstance(arg, ast.Name) and arg.id in consts:
            text = consts[arg.id]
        else:
            continue
        for hit in flag_text(text):
            problems.append(
                f"{path.name}:{node.lineno}: decimal-literal division in "
                f"spark.sql text (Spark parses it as DECIMAL): ...{hit}..."
            )
    return problems


def main() -> int:
    if "--selftest" in sys.argv:
        bad = "SELECT cents / 100.0 AS revenue FROM t"
        good = "SELECT CAST(cents AS DOUBLE) / 100.0 AS revenue FROM t"
        assert flag_text(bad), "lint failed to fire on seeded counterexample"
        assert not flag_text(good), "lint false-positive on CAST(... AS DOUBLE)"
        print("lint_sql selftest: PASS (fires on bare division, quiet on CAST)")
        return 0
    problems = []
    for path in sorted(ENGINE.glob("*.py")):
        problems.extend(lint_file(path))
    for p in problems:
        print(p)
    print(f"lint_sql: {len(problems)} problem(s) across engine/*.py")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
