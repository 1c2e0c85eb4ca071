"""TransactionStore facade: the reference's three verbs (append /
list-all / point-lookup) with its observable semantics, plus the
durability the reference lacks."""

from __future__ import annotations

import json

import pytest

from financialtransactionmonitoringsystem_spark.api import TransactionStore

FIXTURE = "/root/reference/mock_transactions.json"


@pytest.fixture()
def store(spark, tmp_path):
    return TransactionStore(spark, str(tmp_path / "txstore"))


def _fixture_rows():
    with open(FIXTURE) as fh:
        return json.load(fh)


def test_replay_reference_fixture_preserves_order(spark, store):
    rows = _fixture_rows()
    for r in rows:                      # one POST per row, like the reference
        echoed = store.append([r])
        assert echoed.count() == 1
    assert store.count() == len(rows)
    got_ids = [r.transaction_id for r in store.list_all().collect()]
    assert got_ids == [r["transaction_id"] for r in rows]


def test_lookup_first_match_and_missing(spark, store):
    rows = _fixture_rows()
    store.append(rows)
    dup = dict(rows[0], amount=999.99)  # duplicate id, different amount
    store.append([dup])
    hit = store.lookup(rows[0]["transaction_id"]).collect()
    assert len(hit) == 1 and hit[0].amount == rows[0]["amount"]  # first wins
    assert store.lookup("no-such-id").count() == 0


def test_store_survives_restart(spark, store):
    store.append(_fixture_rows()[:5])
    reopened = TransactionStore(spark, store.path)  # "process restart"
    assert reopened.count() == 5
