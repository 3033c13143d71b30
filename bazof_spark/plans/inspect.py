"""Physical-plan inspection helpers.

The reference delegates planning to DataFusion and never inspects it;
we delegate to Catalyst but DO inspect it, because the whole point of
the Spark-first design is that the optimized plan — not the Python
code — is what runs at 100 TB. These helpers turn `.explain()` output
into assertable facts (filters pushed to parquet, columns pruned,
dimensions broadcast, shuffle counts bounded) so tests can pin down
the plan shape, not just the result values.

Used by tests/test_plans.py as plan-regression gates: a future edit
that silently turns a broadcast join into a shuffled join, or widens a
pruned scan back to SELECT *, fails CI even though results stay
correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text of df's optimized physical plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every parquet-scan PushedFilters entry in the plan (flattened).

    Non-empty entries prove predicates reached the reader (row-group
    stats pruning); an unexpected empty list means a filter is being
    evaluated post-scan only.
    """
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema struct strings of every file scan in the plan."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan sets of column names actually read from parquet —
    the ground truth for column-pruning assertions."""
    cols: list[set[str]] = []
    for schema in read_schemas(df):
        body = schema[len("struct<"):].rsplit(">", 1)[0]
        names = set()
        depth = 0
        field = []
        for ch in body + ",":
            if ch == "," and depth == 0:
                part = "".join(field).strip()
                if part:
                    names.add(part.split(":", 1)[0])
                field = []
            else:
                depth += ch in "<("
                depth -= ch in ">)"
                field.append(ch)
        cols.append(names)
    return cols


def _plan_nodes(df: DataFrame) -> list[str]:
    """Unique physical operator names, one per numbered plan node (the
    details section of EXPLAIN FORMATTED lists each node exactly once
    as ``(N) OpName``)."""
    plan = formatted_plan(df)
    seen: dict[int, str] = {}
    for m in re.finditer(r"^\((\d+)\) (\w+)", plan, re.MULTILINE):
        seen[int(m.group(1))] = m.group(2)
    return list(seen.values())


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan. Every one is a
    full network redistribution at scale — the tests pin an upper
    bound per query."""
    return sum(n == "Exchange" for n in _plan_nodes(df))


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins (hash or nested-loop) in the plan."""
    return sum(
        n in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
        for n in _plan_nodes(df)
    )
