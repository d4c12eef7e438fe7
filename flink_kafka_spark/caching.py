"""Lifecycle tracking for operator-internal persists.

Several operators persist a multi-consumer subtree (MinHash signature
table, shingle sets, the export-shard range pin): the persist is
load-bearing — without it each downstream branch recomputes the full
subtree — but the operator returns a LAZY DataFrame that still
references the cached plan, so the operator itself can never unpersist.
Left alone, cached blocks accumulate across a long-lived session (the
driver's 50-query correctness sweep, bench.py, a query service) and the
JVM degrades as the suite progresses (round-2 verdict, "What's wrong"
item 2).

Contract:
- operators register every internal persist via :func:`track` (which
  returns the DataFrame unchanged);
- each registered query releases the PREVIOUS query's tracked persists
  when it starts (see ``queries/__init__.all_queries`` — by then the
  previous result has been materialized by its consumer), so sequential
  sweeps hold at most one query's working set;
- batch harnesses (bench.py, tools/rehearsal.py) additionally call
  :func:`release_all` after materializing each result, so nothing
  lingers between timed queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an operator-internal persisted DataFrame for deferred
    release. Call on the persisted frame itself; returns it unchanged."""
    _LIVE.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame (non-blocking). Returns the
    number released. Safe to call at any query boundary — tracked
    frames' consumers have materialized by then."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
