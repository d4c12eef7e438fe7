"""Operator-internal persists must be released at the next query
boundary (round-2 verdict item 2): a long-lived session sweeping many
queries — the driver's correctness pass, bench.py — must not
accumulate cached blocks."""

from flink_kafka_spark import caching
from flink_kafka_spark.queries import all_queries


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {k for k in jmap.keySet().toArray()}


def test_internal_persists_released_at_query_boundary(spark, sf_dir):
    qs = all_queries()
    caching.release_all()
    before = _persistent_ids(spark)

    # dedup_minhash_lsh persists its candidate pairs and the
    # candidates-only shingle sets internally (two tracked frames)
    qs["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    during = _persistent_ids(spark)
    added = during - before
    assert added, "expected the minhash internal persists to be live"
    assert len(caching._LIVE) == 2

    # invoking the NEXT registered query releases the previous persists
    qs["dedup_exact"].fn(spark, sf_dir).collect()
    after = _persistent_ids(spark)
    assert not (added & after), "previous query's persist leaked across the boundary"
    assert len(caching._LIVE) == 0


def test_release_all_idempotent(spark):
    assert caching.release_all() == 0
    assert caching.release_all() == 0


def test_release_scope_releases_only_inner_persists(spark):
    """Micro-batch lifecycle: persists tracked inside the scope are
    released at exit; the enclosing session's tracked frames stay."""
    caching.release_all()
    outer = caching.track(spark.range(10).persist())
    outer.count()
    with caching.release_scope():
        inner = caching.track(spark.range(20).persist())
        inner.count()
        assert len(caching._LIVE) == 2
    assert caching._LIVE == [outer]
    assert outer.storageLevel.useMemory  # outer still cached
    assert not inner.storageLevel.useMemory  # inner released
    caching.release_all()
