"""Property-based semantics checks (hypothesis): the pattern/join
operators must agree with straight-line pure-Python reference
implementations on arbitrary event sequences — catching edge cases the
fixed fixtures can't (ties, duplicates, boundary gaps, empty keys).

Examples are kept small and few (each runs a Spark job); the Python
oracles are deliberately naive O(n²) code."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from flink_kafka_spark.operators.dedup import ngram_jaccard_pairs, shingle_prune_stats
from flink_kafka_spark.operators.joins import interval_join, interval_join_binned
from flink_kafka_spark.operators.patterns import consecutive_event_alert, create_pay_timeout

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(1, 3),            # user
        st.integers(0, 30),           # ts offset (collisions likely)
        st.sampled_from(["fail", "success"]),
    ),
    min_size=0,
    max_size=25,
)


@given(events=events_strategy)
@settings(**SETTINGS)
def test_consecutive_alert_matches_python(spark, events):
    base = 1_700_000_000
    rows = [
        (user, f"seq{i}", state, base + off) for i, (user, off, state) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "user_id long, ip string, login_state string, ts_l long")
    df = df.withColumn("ts", F.timestamp_seconds("ts_l")).drop("ts_l")
    got = sorted(
        (r.user_id, r.first_fail_ts_s, r.second_fail_ts_s)
        for r in consecutive_event_alert(df, "user_id", "ts", "login_state", "fail", 2, "ip").collect()
    )
    # python oracle: per user, sort by (ts, ip); adjacent fail pairs within 2s
    want = []
    for user in {r[0] for r in rows}:
        seq = sorted((ts, ip, state) for (u, ip, state, ts) in rows if u == user)
        for (t1, _, s1), (t2, _, s2) in zip(seq, seq[1:]):
            if s1 == s2 == "fail" and t2 - t1 <= 2:
                want.append((user, t1, t2))
    assert got == sorted(want)


order_strategy = st.lists(
    st.tuples(
        st.integers(1, 4),                      # order id
        st.integers(0, 40),                     # ts offset
        st.sampled_from(["create", "pay"]),
    ),
    min_size=0,
    max_size=25,
)


@given(events=order_strategy)
@settings(**SETTINGS)
def test_create_pay_timeout_matches_python(spark, events):
    base = 1_700_000_000
    rows = [
        (oid, typ, f"tx{i}", base + off) for i, (oid, off, typ) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "order_id long, event_type string, tx_id string, ts_l long")
    df = df.withColumn("ts", F.timestamp_seconds("ts_l")).drop("ts_l")
    got = sorted(
        tuple(r)
        for r in create_pay_timeout(
            df, "order_id", "ts", "event_type", "create", "pay", 10, "tx_id"
        ).collect()
    )
    # python oracle: per create (in (ts, tx) order), earliest pay at-or-
    # after it in the key's sequence; 'payed' iff within 10s
    want = []
    for oid in {r[0] for r in rows}:
        seq = sorted((ts, tx, typ) for (o, typ, tx, ts) in rows if o == oid)
        for i, (t, _, typ) in enumerate(seq):
            if typ != "create":
                continue
            pays = [pt for (pt, _, pty) in seq[i:] if pty == "pay"]
            nxt = min(pays) if pays else None
            state = "payed" if nxt is not None and nxt - t <= 10 else "timeout"
            want.append((oid, t, nxt, state))
    assert got == sorted(want)


pair_strategy = st.tuples(
    st.lists(st.tuples(st.integers(1, 3), st.integers(0, 20)), max_size=12),
    st.lists(st.tuples(st.integers(1, 3), st.integers(0, 20)), max_size=12),
)


@given(data=pair_strategy)
@settings(**SETTINGS)
def test_interval_join_matches_python(spark, data):
    lefts, rights = data
    base = 1_700_000_000
    lrows = [(k, i, base + off) for i, (k, off) in enumerate(lefts)]
    rrows = [(k, i, base + off) for i, (k, off) in enumerate(rights)]
    ldf = spark.createDataFrame(lrows, "lk long, lid long, lts_l long").withColumn(
        "lts", F.timestamp_seconds("lts_l")
    )
    rdf = spark.createDataFrame(rrows, "rk long, rid long, rts_l long").withColumn(
        "rts", F.timestamp_seconds("rts_l")
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_join(
            ldf, rdf, F.col("lk") == F.col("rk"), F.col("lts"), F.col("rts"), -3, 5
        ).collect()
    )
    want = sorted(
        (lid, rid)
        for (lk, lid, lt) in lrows
        for (rk, rid, rt) in rrows
        if lk == rk and lt - 3 <= rt <= lt + 5
    )
    assert got == want
    # the big-big scale path (time-bin equi-join + residual) must be
    # row-identical to the broadcast/residual formulation — bin
    # boundaries are the bug surface, so the hypothesis sweep matters
    binned = sorted(
        (r.lid, r.rid)
        for r in interval_join_binned(
            ldf, rdf, ("lk", "rk"), ("lts", "rts"), -3, 5
        ).collect()
    )
    assert binned == want


def test_ngram_jaccard_stop_shingle_miss_is_documented(spark):
    """The known recall gap of stop-shingle pruning, pinned as a test:
    a duplicate pair witnessed ONLY by frequent shingles (df > stop_df)
    is silently missed at the default pruning, found when stop_df is
    raised, and visible in shingle_prune_stats. The reported jaccard is
    a lower bound — emitted pairs are never false positives."""
    # 5 docs sharing one identical text → every shingle has df = 5
    text = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id long, text string"
    )
    missed = ngram_jaccard_pairs(docs, threshold=0.5, stop_df=2)
    assert missed.count() == 0  # true jaccard of every pair is 1.0
    found = ngram_jaccard_pairs(docs, threshold=0.5, stop_df=10)
    rows = {(r.id_a, r.id_b): r.jaccard for r in found.collect()}
    assert len(rows) == 10 and all(j == 1.0 for j in rows.values())
    stats = shingle_prune_stats(docs, stop_df=2).collect()[0]
    assert stats.n_stop_shingles == stats.n_shingles  # everything pruned
    assert stats.occurrence_pruned_frac == 1.0


def test_canonicalize_keeps_best_quality_not_min_id(spark):
    """The KEEP policy: within a near-dup cluster the highest-quality
    member wins even when it has the highest id (keep-min-id would pick
    doc 0 here); singletons keep themselves; exactly one keeper per
    cluster."""
    from flink_kafka_spark.operators.dedup import (
        canonicalize_clusters,
        ngram_jaccard_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, base),                       # cluster {0,1,2}: near-identical
            (1, base),
            (2, base + " lambda mu nu xi"),  # longer + more distinct -> best
            (3, "totally different words entirely here"),  # singleton
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    out = {r.doc_id: r for r in canonicalize_clusters(docs, pairs).collect()}
    assert {i: out[i].cluster_id for i in range(4)} == {0: 0, 1: 0, 2: 0, 3: 3}
    assert [out[i].keep for i in range(4)] == [0, 0, 1, 1]  # 2 beats 0/1
    assert out[2].quality_score > out[0].quality_score
    per_cluster = {}
    for r in out.values():
        per_cluster[r.cluster_id] = per_cluster.get(r.cluster_id, 0) + r.keep
    assert all(v == 1 for v in per_cluster.values())


def test_canonicalize_skew_safe_path_is_row_identical(spark):
    """The skew_safe=True plan (min_by partial aggregation + broadcast
    winner join, for boilerplate mega-clusters that would skew the rank
    window's cluster_id partition) must emit EXACTLY the rows of the
    default window plan — including a planted 300-member mega-cluster
    where the winner has the highest id (so a wrong tie-break or a
    dropped partial shows up as a different keeper), a small cluster
    with quality ties (lowest id must win), and singletons."""
    from pyspark.sql import functions as F

    from flink_kafka_spark.operators.dedup import canonicalize_clusters

    # synthetic graph, synthetic quality: mega-cluster = ids 0..299
    # (chain edges), winner planted at id 299; cluster {1000, 1001}
    # tied on quality -> 1000 wins; 2000/2001 singletons.
    n_mega = 300
    rows = [(i,) for i in range(n_mega)] + [(1000,), (1001,), (2000,), (2001,)]
    docs = spark.createDataFrame(rows, "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n_mega - 1)] + [(1000, 1001)],
        "id_a long, id_b long",
    )
    quality = (
        F.when(F.col("doc_id") == 299, F.lit(9.0))
        .when(F.col("doc_id") < n_mega, F.lit(1.0))
        .otherwise(F.lit(5.0))
    )
    kw = dict(id_col="doc_id", quality=quality)
    default = sorted(
        tuple(r) for r in canonicalize_clusters(docs, edges, **kw).collect()
    )
    skew_safe = sorted(
        tuple(r)
        for r in canonicalize_clusters(docs, edges, skew_safe=True, **kw).collect()
    )
    assert default == skew_safe
    keepers = {r[0] for r in default if r[3] == 1}
    assert keepers == {299, 1000, 2000, 2001}

    # undefined quality (NULL / NaN) ranks WORST in BOTH arms: a
    # cluster of {real, NULL, NaN} must keep the real-quality doc on
    # each path (pre-fix the rank window's DESC put NaN first while
    # min_by's struct put the NULL field smallest — different keepers)
    nd = spark.createDataFrame(
        [(1, 0.5), (2, None), (3, float("nan"))], "doc_id long, q double"
    )
    ne = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    for arm in (False, True):
        out = canonicalize_clusters(
            nd, ne, id_col="doc_id", quality=F.col("q"), skew_safe=arm
        )
        assert [r["doc_id"] for r in out.filter("keep = 1").collect()] == [1]


def test_corpus_shuffle_is_a_partitioning_invariant_permutation(spark):
    """The training-order shuffle must be a function of (seed, id)
    only: identical output no matter how the input is partitioned
    (1 vs 8 partitions — range-boundary sampling must not leak into
    results), positions an exact 0..n-1 permutation, shards fixed-size
    except the last, and a different seed a different permutation."""
    from flink_kafka_spark.operators.sampling import shuffle_corpus

    ids = [i * 7 for i in range(257)]  # non-contiguous, not a power of 2
    rows = [(i,) for i in ids]
    out = {}
    for parts in (1, 8):
        df = spark.createDataFrame(rows, "doc_id long").repartition(parts)
        out[parts] = sorted(
            tuple(r) for r in shuffle_corpus(df, "doc_id", seed=7, shard_size=50).collect()
        )
    assert out[1] == out[8]
    positions = sorted(r[1] for r in out[1])
    assert positions == list(range(len(ids)))
    from collections import Counter

    shard_sizes = Counter(r[2] for r in out[1])
    assert all(n == 50 for s, n in shard_sizes.items() if s < max(shard_sizes))
    assert shard_sizes[max(shard_sizes)] == len(ids) % 50
    df = spark.createDataFrame(rows, "doc_id long")
    other = sorted(
        tuple(r) for r in shuffle_corpus(df, "doc_id", seed=8, shard_size=50).collect()
    )
    assert other != out[1]  # seed changes the permutation


def test_cc_checkpoints_release_at_query_boundary(spark):
    """Round-5 verdict item 1 as a mechanical guard: the CC loop's
    localCheckpoint persists are invisible to DataFrame
    unpersist/clearCache, so the loop must hold at most the FINAL
    labels checkpoint after it returns (earlier rounds unpersisted as
    each new round materializes), and release_all() must drop that
    too — a refactor that re-strands round checkpoints fails here, not
    in the next bench's leak probe."""
    from pyspark.sql import functions as F

    from flink_kafka_spark.caching import release_all
    from flink_kafka_spark.operators.dedup import connected_components

    release_all()
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    n = 1000  # diameter-9 chains: several loop rounds
    edges = (
        spark.range(n)
        .filter("pmod(id, 10) < 9")
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    assert connected_components(edges, nodes, id_col="doc_id").count() == n
    resident = jsc.getPersistentRDDs().size() - base
    assert resident <= 1, f"{resident} persistent RDDs after CC (want <=1: final labels)"
    release_all()
    spark.catalog.clearCache()
    assert jsc.getPersistentRDDs().size() <= base


def test_short_and_empty_docs_survive_every_shingle_path(spark):
    """Docs with fewer than n tokens (incl. empty and NULL text) have
    no shingles; they must yield empty shingle sets — not abort the job
    (unguarded `slice(tokens, 0, n)` raises INVALID_PARAMETER_VALUE) —
    and must never appear in any near-dup pair."""
    from flink_kafka_spark.operators.dedup import minhash_lsh_pairs, shingle_sets

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, dup),
            (2, dup),
            (3, "one"),          # 1 token < n=3
            (4, "two tokens"),   # 2 tokens < n=3
            (5, ""),             # empty text
            (6, None),           # null text
            (7, "an unrelated document with plenty of distinct words here"),
        ],
        "doc_id long, text string",
    )
    sets = {r.doc_id: r.shingle_arr for r in shingle_sets(docs, "doc_id").collect()}
    assert sets[3] == [] and sets[4] == [] and sets[5] == [] and sets[6] == []
    assert len(sets[1]) == 6  # 8 tokens → 6 trigrams
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert pairs == {(1, 2)}
    exact = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert exact == {(1, 2)}
