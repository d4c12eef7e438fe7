"""Multimodal plumbing: synthesized media table, mapInPandas decode /
frame-sample / feature-extract, and the gated real-codec entry points.
Oracle equivalence for decode/frame-sample runs via test_oracle.py; here
we pin the non-SQL pieces against pure-Python references."""

import hashlib

import numpy as np
import pytest

from flink_kafka_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    resize_image_batch,
    synthesize_media,
)
from flink_kafka_spark.tables import load


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synthesize_media(load(spark, sf_dir, "documents")).cache()


def test_media_schema_and_payload(media, spark, sf_dir):
    row = media.orderBy("doc_id").first()
    doc = load(spark, sf_dir, "documents").orderBy("doc_id").first()
    assert bytes(row.payload) == doc.text.encode("utf-8")
    assert row.kind in ("image", "audio", "video")
    assert row.meta.byte_len == len(doc.text.encode("utf-8"))


def test_extract_features_matches_numpy_reference(media, spark, sf_dir):
    dim = 8
    got = {r.doc_id: list(r.features) for r in extract_features(media, dim).collect()}
    docs = {r.doc_id: r.text.encode() for r in load(spark, sf_dir, "documents").collect()}
    assert set(got) == set(docs)
    for doc_id, payload in list(docs.items())[:25]:
        arr = np.frombuffer(payload, dtype=np.uint8)
        want = [round(float(arr[j::dim].mean()) if arr[j::dim].size else 0.0, 4) for j in range(dim)]
        assert got[doc_id] == pytest.approx(want, abs=1e-4), doc_id


def test_frame_sample_reassembles(media, spark, sf_dir):
    frames = frame_sample(media, 64).collect()
    docs = {r.doc_id: r.text.encode() for r in load(spark, sf_dir, "documents").collect()}
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f.doc_id, []).append(f)
    assert set(by_doc) == set(docs)
    for doc_id, fs in list(by_doc.items())[:25]:
        fs.sort(key=lambda f: f.frame_idx)
        payload = docs[doc_id]
        assert [f.frame_idx for f in fs] == list(range(len(fs)))
        assert sum(f.frame_len for f in fs) == len(payload)
        for f in fs:
            chunk = payload[f.frame_idx * 64 : f.frame_idx * 64 + 64]
            assert f.frame_md5 == hashlib.md5(chunk).hexdigest()


def test_resize_truncates_and_pads(media):
    out = resize_image_batch(media, 8, 4).collect()
    assert all(len(bytes(r.payload)) == 32 for r in out)
    assert all(r.meta.byte_len == 32 for r in out)


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\x89PNG")


def test_documents_fixture_is_ascii_everywhere(spark):
    """MEDIA_FEATURES_ORACLE (queries/multimodal.py) compares a
    character-based DuckDB recompute (ascii/substring/length) against
    ``extract_features`` operating on UTF-8 payload BYTES; the parity
    holds only while every fixture text is single-byte (r8 ADVICE). If
    a future fixture plants non-ASCII (e.g. mojibake for
    encoding_audit), fail HERE with the real cause rather than as an
    opaque driver hash mismatch."""
    import os

    from pyspark.sql import functions as F

    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = os.path.join("/root/testdata", sf)
        if not os.path.isdir(path):
            continue
        checked += 1
        bad = (
            load(spark, path, "documents")
            .filter(F.length("text") != F.octet_length("text"))
            .count()
        )
        assert bad == 0, (
            f"{sf}: {bad} non-ASCII documents — the char-based "
            "media-features oracle no longer matches the byte-based "
            "operator; rewrite MEDIA_FEATURES_ORACLE byte-wise first"
        )
    # the guard must have guarded something (the timeseries fixture
    # test's rule): a moved fixture path silently passing would leave
    # the ASCII invariant unverified until a driver hash mismatch
    assert checked, "no testdata fixture found — ASCII guard ran on nothing"


def test_media_features_check_survives_short_docs(spark, monkeypatch, tmp_path):
    """Docs shorter than 8 bytes must not abort the JVM recompute:
    sequence(lo, hi, step) throws under ANSI when lo > hi, so the
    per-dim stride is CASE-guarded and an absent stride compares as
    the numpy path's 0.0 fill — violations stays 0 for a corpus of
    1-, 3- and 7-char docs beside a normal one."""
    from pyspark.sql import functions as F

    from flink_kafka_spark.queries import multimodal as M

    rows = [(1, "a"), (2, "abc"), (3, "1234567"), (4, "a longer document body")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.select(
        "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").alias("n_chars"),
    )
    pq = str(tmp_path / "documents.parquet")
    df.write.parquet(pq)

    import flink_kafka_spark.tables as T

    real_load = T.load

    def fake_load(spark_, sf_dir_, name):
        if name == "documents":
            return spark_.read.parquet(pq)
        return real_load(spark_, sf_dir_, name)

    monkeypatch.setattr(M, "load", fake_load)
    (row,) = M.media_features_check(spark, "ignored").collect()
    assert row["violations"] == 0
