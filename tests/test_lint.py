"""Static hygiene gates (round-4 verdict item 8): no bare ``except:``
anywhere in the package — every handler names the exception class it
expects. Walks the AST so string literals and comments can't trip it.
"""

from __future__ import annotations

import ast
import pathlib

PKG = (
    pathlib.Path(__file__).resolve().parents[1]
    / "news_clustering_and_summarization_spark"
)


def test_no_bare_except():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if isinstance(node, ast.ExceptHandler) and node.type is None:
                offenders.append(f"{path}:{node.lineno}")
    assert not offenders, f"bare except found: {offenders}"


def test_no_row_at_a_time_python_udf():
    """F.udf / @udf row-at-a-time UDFs are banned in the package —
    Arrow-batched pandas_udf / applyInPandas / mapInPandas only."""
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        # names bound by `from pyspark.sql.functions import udf [as x]`
        pyspark_udf_aliases = {
            (a.asname or a.name)
            for node in ast.walk(tree)
            if isinstance(node, ast.ImportFrom)
            and node.module == "pyspark.sql.functions"
            for a in node.names
            if a.name == "udf"
        }
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            fn = node.func
            hit = (
                isinstance(fn, ast.Attribute)
                and fn.attr == "udf"
                and isinstance(fn.value, ast.Name)
                and fn.value.id in ("F", "functions", "fn", "sf")
            ) or (
                isinstance(fn, ast.Name) and fn.id in pyspark_udf_aliases
            )
            if hit:
                offenders.append(f"{path}:{node.lineno}")
    assert not offenders, f"row-at-a-time udf found: {offenders}"


ROOT = PKG.parent


def _operator_orphans(
    scan_dir: pathlib.Path, repo_root: pathlib.Path
) -> list[str]:
    """Public top-level functions/classes under ``scan_dir`` that no
    other code references — not the catalog, not a test, not another
    module, not even code elsewhere in their own file. This is the
    exact failure mode of r06's ``bfs_levels`` (written in a snapshot
    commit, wired to nothing): code with zero evidence behind it.
    Word-boundary text match is deliberately loose — any mention
    outside the definition's own block counts, so the rule only
    fires on genuinely dead surface."""
    import re

    texts = {
        p: p.read_text()
        for p in sorted(repo_root.rglob("*.py"))
        if ".git" not in p.parts and "spark-warehouse" not in p.parts
    }
    orphans = []
    for path in sorted(scan_dir.rglob("*.py")):
        tree = ast.parse(texts[path], filename=str(path))
        lines = texts[path].splitlines()
        for node in tree.body:
            if not isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ) or node.name.startswith("_"):
                continue
            pat = re.compile(r"\b" + re.escape(node.name) + r"\b")
            if any(pat.search(t) for p, t in texts.items() if p != path):
                continue
            outside_def = "\n".join(
                lines[: node.lineno - 1] + lines[node.end_lineno :]
            )
            if not pat.search(outside_def):
                orphans.append(f"{path.name}:{node.lineno} {node.name}")
    return orphans


def test_no_orphan_operator_functions():
    """Round-7 verdict item 1b, widened package-wide in the same
    round: every public function OR class anywhere in the package
    must be referenced by the catalog, a test, or other live code —
    an unwired operator fails the suite immediately instead of
    surviving to a snapshot commit."""
    orphans = _operator_orphans(PKG, ROOT)
    assert not orphans, (
        "unreferenced public functions/classes (wire a catalog query "
        f"or a test, or delete them): {orphans}"
    )


def test_orphan_rule_catches_planted_orphan(tmp_path):
    """The rule itself is verified: a planted dead function in a fake
    repo tree is flagged; its referenced sibling is not."""
    ops = tmp_path / "operators"
    ops.mkdir()
    (ops / "mod.py").write_text(
        "def used_fn(df):\n    return df\n\n"
        "def dead_fn(df):\n    return df\n"
    )
    (tmp_path / "test_x.py").write_text("from mod import used_fn\n")
    got = _operator_orphans(ops, tmp_path)
    assert got == ["mod.py:4 dead_fn"]
