"""Central query registry.

Every operator the engine claims (SURVEY.md §2 inventory) registers a
named query here: a PySpark callable ``(spark, sf_dir) -> DataFrame``
plus, when SQL-expressible, a DuckDB-compatible ANSI-SQL oracle string
computing the identical result (same column names — the driver's
compare hashes values after sorting columns by name).

The registry is what ``__spark_entry__.queries()`` / ``oracle_sql()``
expose to the correctness driver, and what ``bench.py`` samples.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    category: str = "misc"
    bench: bool = False  # include in bench.py headline set
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    category: str = "misc",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle.strip() if oracle else None,
            category=category,
            bench=bench,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
        )
        return fn

    return deco


# The correctness driver consumes queries() in dict order and has a
# per-round budget (50/round; every CORRECTNESS_r0N file is exactly the
# first 50 names of that round's ordering). Order the exposed dict so
# the budget lands where it buys the most new information:
#   0. queries whose LATEST driver check failed (must be re-verified
#      THIS round — their most recent green rows predate the break),
#   1. never-driver-checked queries (SQL-oracle first — the stronger
#      check — then rows-only),
#   2. already-green queries, least-recently-driver-checked FIRST, so
#      the window rotates through the whole registry across rounds
#      instead of pinning to one prefix (r03 and r04 re-checked an
#      identical 50-query set while two queries regressed outside it —
#      that must not repeat). Streaming queries drain last within a
#      vintage (slowest per verified row).
#
# Both inputs are derived from the committed CORRECTNESS_r0N.json
# artifacts at the repo root — no per-round manual bookkeeping: when the
# driver drops CORRECTNESS_r0N.json, the next round's ordering picks it
# up automatically.


def _load_driver_checks(
    root: Path | None = None,
) -> tuple[dict[str, int], frozenset[str]]:
    """Parse driver CORRECTNESS_r*.json artifacts at the repo root.

    Returns ``(last_green, refront)`` where ``last_green`` maps query
    name -> most recent round with a green row (no err, and hash or
    rows matched), and ``refront`` is the set of queries whose LATEST
    driver check failed — those must head the next window.  Missing or
    unparseable artifacts degrade to "never checked" (group 1), which
    is the safe direction.
    """
    if root is None:
        root = Path(__file__).resolve().parent.parent
    last_green: dict[str, int] = {}
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)", path.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # hash_match is the gate when the driver computed one;
            # rows-only (no-oracle) checks report hash_match as None.
            hm = row.get("hash_match")
            green = not row.get("err") and (
                bool(hm) if hm is not None else bool(row.get("rows_match"))
            )
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
            if rnd >= latest.get(name, (0, True))[0]:
                latest[name] = (rnd, green)
    refront = frozenset(n for n, (_, green) in latest.items() if not green)
    return last_green, refront


_LAST_GREEN, _REFRONT = _load_driver_checks()


def _driver_group(q: Query) -> tuple[int, int]:
    if q.name in _REFRONT:
        return (0, 0)
    last = _LAST_GREEN.get(q.name, 0)
    if last == 0:  # never driver-checked: oracle first (stronger check)
        # "defer-window": still never-checked, but queued BEHIND the
        # other never-checked queries (used when the next 50-query
        # window is already exactly full of earlier-round additions —
        # adding mid-round must not push any of them past the budget).
        # Once any CORRECTNESS round stamps them the tag is inert.
        if "defer-window" in q.tags:
            return (1, 2)
        return (1, 0 if q.oracle else 1)
    return (2, last)  # oldest vintage first → window rotates


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    order = list(_REGISTRY)
    keyed = sorted(
        _REGISTRY.values(),
        key=lambda q: (
            *_driver_group(q),
            q.category == "streaming",
            order.index(q.name),
        ),
    )
    return {q.name: q for q in keyed}


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}


def bench_queries() -> dict[str, Query]:
    return {name: q for name, q in all_queries().items() if q.bench}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports happen here (not module top) to avoid import cycles:
    # operator modules import `register` from this module.
    from spark_lever_spark.operators import (  # noqa: F401
        tpch,
        tpch2,
        tpch3,
        relational,
        joins,
        bloom,
        cdc,
        setops,
        rollups,
        windows,
        expressions,
        events,
        layout,
        lever_demo,
        temporal,
    )
    from spark_lever_spark.llm import (  # noqa: F401
        curation,
        dedup,
        embeddings,
        graph,
        multimodal,
        packing,
        pipeline,
        similarity,
        textstats,
    )
    from spark_lever_spark.functions import udfs  # noqa: F401
    from spark_lever_spark.streaming import queries as streaming_queries  # noqa: F401

    # round-7 additions import LAST: never-driver-checked queries sort
    # by registration order within their group, and the 47 round-6
    # queries must keep the head of the 50-query driver window
    from spark_lever_spark.llm import selection  # noqa: F401
    from spark_lever_spark.operators import bars  # noqa: F401

    # round-8 additions (all defer-window tagged, so they queue behind
    # the fronted round-7 stamps; total never-checked stays < 50)
    from spark_lever_spark.operators import alloc  # noqa: F401

    _LOADED = True
