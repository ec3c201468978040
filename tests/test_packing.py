"""Sequence-packing invariants (concatenate-and-split semantics)."""

from __future__ import annotations

import pytest

from pytrousse_spark import read_parquet_df
from pytrousse_spark.operators import packing as pk
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return read_parquet_df(spark, f"{SF_DIR}/documents.parquet")


def test_pack_documents_token_conservation(docs):
    """Within every shard, docs tile the token stream with no gaps: each
    doc's start equals the previous doc's start + length, starting at 0."""
    out = pk.pack_documents(docs, "text", "doc_id", budget=100, num_shards=4)
    rows = sorted(
        ((r["shard"], r["doc_id"]), (r["seq_id"], r["offset"], r["n_tokens"]))
        for r in out.collect()
    )
    pos = {}
    for (shard, _doc), (seq_id, offset, n) in rows:
        expected_start = pos.get(shard, 0)
        assert seq_id == expected_start // 100
        assert offset == expected_start % 100
        pos[shard] = expected_start + n


def test_pack_documents_stable_under_repartition(docs):
    a = sorted(map(tuple, pk.pack_documents(docs, "text", "doc_id").collect()))
    b = sorted(
        map(tuple, pk.pack_documents(docs.repartition(13), "text", "doc_id").collect())
    )
    assert a == b


def test_pack_documents_budget_validated(docs):
    with pytest.raises(ValueError):
        pk.pack_documents(docs, "text", "doc_id", budget=0)
