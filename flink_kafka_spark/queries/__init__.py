"""Named-query registry: the engine's public correctness surface.

Each :class:`Query` pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with (where SQL-expressible) an ANSI-SQL oracle string that
DuckDB runs on the same parquet tables. The driver's harness compares
both at sf=0.01 (row-count + schema + order-insensitive value hash), so
column names/aliases MUST match between the two sides.

Conventions that keep the comparison stable:
- window bounds, event times → epoch-second **longs**, never raw
  timestamps (timezone/precision-proof);
- every computed column explicitly aliased identically on both sides;
- floating-point outputs rounded (4-6 dp) on both sides;
- deterministic tie-breaks on every rank.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One registered query/operator exposed to the driver harness."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    survey: str = ""  # SURVEY.md §2 operator ids this covers
    tags: tuple[str, ...] = field(default_factory=tuple)


def all_queries() -> dict[str, Query]:
    """Collect every registered query, keyed by name."""
    from . import (
        analytics,
        dedup,
        joins,
        multimodal,
        patterns,
        similarity,
        streamlike,
        textops,
        tpch,
    )

    out: dict[str, Query] = {}
    for mod in (streamlike, patterns, joins, tpch, analytics, dedup, similarity, textops, multimodal):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name}")
            out[q.name] = q
    return out
