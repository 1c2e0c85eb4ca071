"""Golden reference-parity tests (SURVEY.md §5.2.3): replay the
reference's own transaction fixtures through the engine's ingest path and
assert the observed CRUD semantics — insertion order, duplicate handling,
first-match lookup, dropped-field ingest, and the absence of the
reference's 1 KB request-size cliff."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from financialtransactionmonitoringsystem_spark.sources import json_ingest as J

REF_FIXTURE = "/root/reference/mock_transactions.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_FIXTURE), reason="reference fixtures not present")


@pytest.fixture(scope="module")
def tx(spark):
    return J.read_transactions_json(spark, REF_FIXTURE).cache()


def test_ingest_all_rows_in_insertion_order(tx):
    rows = J.list_all(tx).collect()
    raw = json.load(open(REF_FIXTURE))
    assert len(rows) == len(raw) == 20
    assert [r.transaction_id for r in rows] == [r["transaction_id"] for r in raw]
    assert [r.ingest_seq for r in rows] == sorted(r.ingest_seq for r in rows)


def test_schema_round_trip(tx):
    row = J.list_all(tx).first()
    assert isinstance(row.metadata, dict) and "merchant" in row.metadata
    assert json.loads(row.metadata_json)["merchant"] == row.metadata["merchant"]
    assert row.ts is not None  # ISO-8601 micros parsed
    assert row.type in ("credit", "debit")


def test_point_lookup_first_match_under_duplicates(spark, tx):
    """Duplicates allowed; lookup returns FIRST by ingest order
    (user-service/main.go:67-71, monitoring-service/src/main.rs:95)."""
    first = J.list_all(tx).first()
    dup = dict(
        transaction_id=first.transaction_id, user_id=9999, amount=1.0,
        currency="USD", type="debit", metadata={"merchant": "DUP"},
        timestamp="2025-09-28T00:00:00.000000Z")
    base = tx.drop("metadata_json", "ts", "ingest_seq")
    appended = J.with_derived(
        base.unionByName(J.ingest_rows(spark, [dup]).select(base.columns)).coalesce(1))
    got = J.point_lookup(appended, first.transaction_id).collect()
    assert len(got) == 1
    assert got[0].user_id == first.user_id  # the original, not the duplicate
    assert J.dedup_first(appended).count() == appended.count() - 1


def test_missing_id_returns_empty(tx):
    assert J.point_lookup(tx, "no-such-id").count() == 0  # 404 path


def test_rust_shape_drops_type(tx):
    """monitoring-service's struct has no `type` field; serde drops it
    silently on ingest (main.rs:7-15)."""
    rust = J.rust_shape(tx)
    assert rust.filter(F.col("type").isNotNull()).count() == 0


def test_unknown_fields_dropped(spark):
    """serde/Gin unknown-field tolerance (main.rs:49-52, main.go:79)."""
    row = dict(transaction_id="t-1", user_id=1, amount=2.0, currency="USD",
               type="credit", metadata={"merchant": "X"},
               timestamp="2025-09-27T12:00:00.000000Z",
               evil_extra_field="ignored", another=123)
    got = J.ingest_rows(spark, [row]).collect()[0]
    assert got.transaction_id == "t-1"
    assert "evil_extra_field" not in got.asDict()


def test_malformed_json_becomes_null_row(spark):
    """Rust path: parse failure -> None -> 500 (main.rs:87).  The engine
    quarantines instead: from_json yields a NULL struct."""
    raw = spark.createDataFrame([("{not valid json",)], "body STRING")
    from financialtransactionmonitoringsystem_spark.schemas import TRANSACTION_JSON_SCHEMA

    parsed = raw.select(F.from_json("body", TRANSACTION_JSON_SCHEMA).alias("t"))
    bad = parsed.filter(F.col("t.transaction_id").isNull()
                        & F.col("t.amount").isNull()).count()
    assert bad == 1  # quarantined as an all-NULL record, batch survives


def test_no_1kb_request_cliff(spark):
    """The reference truncates bodies >1024 bytes (main.rs:55-60) and
    fails them; the engine must NOT replicate that."""
    big = dict(transaction_id="big-1", user_id=1, amount=2.0, currency="USD",
               type="credit", metadata={"merchant": "M" * 5000},
               timestamp="2025-09-27T12:00:00.000000Z")
    got = J.ingest_rows(spark, [big]).collect()[0]
    assert len(got.metadata["merchant"]) == 5000


def test_streaming_ingest_matches_batch(spark, tmp_path, tx):
    """O1 as a stream: line-delimited replay through the streaming source
    equals the batch ingest."""
    from financialtransactionmonitoringsystem_spark.streaming.pipeline import run_to_memory

    rows = json.load(open(REF_FIXTURE))
    stream_dir = tmp_path / "txstream"
    stream_dir.mkdir()
    with open(stream_dir / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = J.stream_transactions_json(spark, str(stream_dir))
    run_to_memory(stream, "t_txingest")
    got = spark.sql("SELECT * FROM t_txingest")
    assert got.count() == 20
    assert {r.transaction_id for r in got.collect()} == {r.transaction_id for r in tx.collect()}
