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
