"""Driver dress rehearsal: replicate the grading driver's correctness
sweep before it runs.

For every query in ``__spark_entry__.queries()``:

- with an oracle: strict compare (pandas dtypes + serialized cells —
  ``tests.oracle_util.compare_spark_duckdb``) at sf0.01, the driver's
  correctness SF;
- without an oracle: run + count (the driver's weaker rows-only check).

Then an optional runs-only sweep at sf0.1 (the bench SF) catches
scale-only failures the sf0.001 pytest misses.

Usage: python tools/rehearsal.py [--skip-sf01] [name ...]
(positional names restrict the sweep to those queries)
Exit code 1 if anything fails; per-query lines on stdout.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from flink_kafka_spark.caching import release_all  # noqa: E402
from flink_kafka_spark.session import get_spark  # noqa: E402
from tests.oracle_util import compare_spark_duckdb  # noqa: E402

SF_ORACLE = "/root/testdata/sf0.01"
SF_SCALE = "/root/testdata/sf0.1"


def main() -> int:
    skip_scale = "--skip-sf01" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = entry.queries(), entry.oracle_sql()
    if only:
        unknown = sorted(set(only) - set(queries))
        if unknown:
            print(f"unknown queries: {unknown}")
            return 1
        queries = {k: v for k, v in queries.items() if k in only}
    failures = []

    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            df = fn(spark, SF_ORACLE)
            if name in oracles:
                compare_spark_duckdb(df, oracles[name], SF_ORACLE)
                status = "oracle-ok"
            else:
                status = f"rows-only-ok ({df.count()} rows)"
        except Exception as ex:  # noqa: BLE001 — report and continue
            status = f"FAIL: {str(ex)[:200]}"
            failures.append(name)
        release_all()  # drop this query's tracked persists before the next
        spark.catalog.clearCache()
        print(f"[sf0.01] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)

    if not skip_scale:
        for name, fn in sorted(queries.items()):
            t0 = time.time()
            try:
                n = fn(spark, SF_SCALE).count()
                status = f"ok ({n} rows)"
            except Exception as ex:  # noqa: BLE001
                status = f"FAIL: {str(ex)[:200]}"
                failures.append(f"{name}@sf0.1")
            release_all()
            spark.catalog.clearCache()
            print(f"[sf0.1 ] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL CLEAN")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
