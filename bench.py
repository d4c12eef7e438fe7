#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the `noop` sink (no driver-side collect,
no result materialization cost in the timing).

Regression guardrail: per-query medians are compared against the
committed baseline (BENCH_BASELINE.json, same sf only). Absolute
seconds on a shared box swing several-x with ambient load (round-2
verdict: the same suite measured 13.8 s, 27.1 s and 65.7 s under
different machine states with no code change), so the comparison is
NORMALIZED: every bench session times a fixed calibration workload
(pure Spark, independent of this repo's code) and queries are compared
by their ratio to it — machine slowness cancels, code slowness does
not. Any query whose normalized time exceeds REGRESSION_FACTOR x its
baseline ratio is listed in the JSON line's "regressions" field and on
stderr. Exit code stays 0 so the driver's bench recording never breaks
on single-JVM variance; run ``python bench.py --check`` to exit 1 on
regressions instead (pre-commit usage). Sub-0.5 s baselines are exempt
(run-to-run noise is ~±0.2 s at that scale). If the committed baseline
predates calibration (no "calibration_sec"), the guardrail falls back
to absolute seconds."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as _F  # noqa: E402

from flink_kafka_spark.caching import release_all  # noqa: E402
from flink_kafka_spark.queries import all_queries  # noqa: E402
from flink_kafka_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    # reference-surface (streaming semantics on batch path)
    "hot_items_topn",
    "hot_items_sql",
    "page_views",
    "unique_visitors",
    "channel_stats",
    "login_fail_detect",
    "order_timeout",
    "sessionize",
    "order_ship_interval_join",
    # batch-relational headline
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
    # training-data pipeline extensions
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_stats",
    "corpus_prep",
    "media_decode_meta",
    "media_frame_sample",
    "sequence_packing",
    "mixture_resample",
    "funnel_conversions",
    # round-2 additions (no round-1 baseline; guardrail skips them)
    "decontaminate",
    "uv_bloom",
    "inverted_index",
    "bm25_search",
    "embedding_quantize",
    # round-5 addition (baselined at next re-record). The PQ ANN path
    # stays out: its 8 KMeans fits per invocation are training cost,
    # not query cost, and would dominate the bench's time budget.
    "dedup_canonicalize",
]


def _calibrate(spark) -> float:
    """Median-of-3 timing of a fixed synthetic workload — scan + hash +
    shuffle + aggregate over spark.range, touching none of this repo's
    code — used to normalize query timings against ambient machine
    load. The workload is pinned; never change it without re-baselining
    (the guardrail compares ratios to it across sessions)."""
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        (
            spark.range(30_000_000)
            .selectExpr("xxhash64(id) AS h")
            .groupBy((_F.col("h") % 64).alias("b"))
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        runs.append(time.perf_counter() - t0)
    return round(sorted(runs)[1], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    registry = all_queries()

    # Warm the JVM once per query shape at the smallest SF (codegen
    # compilation, parquet reader init, broadcast machinery) so the
    # timed runs measure steady-state throughput, not first-call
    # compilation. Not counted.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in BENCH_QUERIES:
            try:
                registry[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass
    else:
        spark.range(1).count()

    # calibration AFTER warm-up, in the same machine state as the
    # timed runs — this anchors the cross-session ratio comparison.
    # Taken again after the sweep and averaged: ambient load drifts
    # WITHIN the ~2-minute sweep, and a single-point calibration that
    # happens to catch a fast (or slow) moment skews every normalized
    # ratio the same direction (observed: cal 0.25 s with the very
    # next queries running 25% slower than the same-session baseline).
    calibration_pre = _calibrate(spark)

    # median of 3 runs per query: single-JVM local mode has noticeable
    # run-to-run GC/JIT variance; the median is the steady-state number.
    # The repetitions are ROUND-ROBIN (all queries once, then again)
    # rather than back-to-back: ambient slow phases on a shared box
    # last seconds, so three consecutive runs of one query all land in
    # the phase and its median absorbs the full slowdown — spread out,
    # the phase taxes one rep of many queries and the median discards
    # it (observed: consecutive-rep benches flagged a different
    # untouched query as regressed on every invocation).
    # Cache hygiene between queries: the _released query wrappers drop
    # the previous invocation's tracked persists, and clearCache() +
    # the persistent-RDD probe below guarantee nothing leaks from one
    # timed query into the next (round-2 verdict item 2).
    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    leaked: list[str] = []
    for rep in range(3):
        for name in BENCH_QUERIES:
            q = registry[name]
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            release_all()
            spark.catalog.clearCache()
            if rep == 0 and spark.sparkContext._jsc.getPersistentRDDs().size() > 0:
                leaked.append(name)
    timings = {name: round(sorted(runs)[1], 3) for name, runs in samples.items()}

    calibration = round((calibration_pre + _calibrate(spark)) / 2, 3)

    regressions = _regressions(timings, calibration, sf)
    out = {
        "metric": "headline queries wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "calibration_sec": calibration,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if leaked:
        out["leaked_persists"] = leaked
        print(f"PERSISTENT RDDs leaked after: {leaked}", file=sys.stderr)
    if regressions:
        out["regressions"] = regressions
        print(f"REGRESSION vs BENCH_BASELINE.json: {regressions}", file=sys.stderr)
    print(json.dumps(out))
    if regressions and "--check" in sys.argv:
        sys.exit(1)


REGRESSION_FACTOR = 1.5
# Below this, medians are dominated by JVM noise: observed run-to-run
# amplitude on this harness is ~±0.2 s, so a 0.3 s query flaps the
# 1.5x threshold without any code change.
MIN_BASELINE_S = 0.5


def _regressions(timings: dict[str, float], calibration: float, sf: str) -> dict[str, str]:
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    if not os.path.isfile(base_path):
        return {}
    try:
        with open(base_path) as f:
            doc = json.load(f)
        parsed = doc.get("parsed", doc)
        if str(parsed.get("sf")) != sf:
            return {}
        baseline = parsed.get("queries", {})
        base_cal = parsed.get("calibration_sec")
    except (json.JSONDecodeError, AttributeError):
        return {}
    out = {}
    for name, t in timings.items():
        b = baseline.get(name)
        if not b or b < MIN_BASELINE_S:
            continue
        if base_cal and calibration > 0:
            # A query is a regression only if it regressed under BOTH
            # accountings: raw seconds AND seconds-per-calibration-
            # second. A genuine code regression inflates both; a
            # slower box inflates only raw, a calibration that caught
            # an unrepresentative moment inflates only normalized —
            # either alone flaps on sub-second queries whose noise
            # amplitude is ~±0.2 s. The raw condition only applies
            # when this box is comparable to the baseline's
            # (calibrations within 1.5x): on a much FASTER box raw
            # seconds can never exceed 1.5x the baseline even for a
            # real slowdown, which would mask exactly the cross-
            # machine case the normalization exists for — there, the
            # normalized ratio alone decides.
            # Known blind spot of the 1.5x cliff, accepted: on a box
            # up to 1.5x faster, a real regression up to ~2.25x
            # normalized can hide under the raw bar. Scaling the raw
            # threshold by the calibration ratio would close it — but
            # also reduce to norm-only on ANY faster box, which is
            # the false-positive storm a non-representative baseline
            # calibration produced this round (57 flags on unchanged
            # code). With a representative baseline the ratio stays
            # near 1 and the dual gate does its job.
            ratio_now, ratio_base = t / calibration, b / base_cal
            comparable_box = max(calibration, base_cal) / min(calibration, base_cal) <= 1.5
            raw_ok = t > REGRESSION_FACTOR * b or not comparable_box
            if ratio_now > REGRESSION_FACTOR * ratio_base and raw_ok:
                out[name] = (
                    f"{ratio_now:.2f} vs baseline {ratio_base:.2f} cal-units "
                    f"({ratio_now / ratio_base:.2f}x; raw {t:.3f}s vs {b:.3f}s)"
                )
        elif t > REGRESSION_FACTOR * b:
            out[name] = f"{t:.3f}s vs baseline {b:.3f}s ({t / b:.2f}x)"
    return out


if __name__ == "__main__":
    main()
