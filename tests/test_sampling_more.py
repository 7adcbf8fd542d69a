"""q305 negative sampling: no sampled negative may be a positive, the
per-user quota and rank sequence hold, and the proposal stream is the
pure md5 function of (user, j) it claims to be."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.sampling import (
    _Q305_K,
    _Q305_PROPOSALS,
    QUERIES,
)


def _positives(sf_dir: str):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pydict()
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    cust = dict(zip(o["o_orderkey"], o["o_custkey"]))
    pos = set()
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        pos.add((cust[ok], pk))
    return pos


def test_q305_negatives_are_never_positives_and_quota_holds(spark, sf_dir):
    pos = _positives(sf_dir)
    users = {u for (u, _i) in pos}
    n_items = max(
        pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        .to_pydict()["p_partkey"]
    )
    rows = QUERIES["q305_negative_sampling"](spark, sf_dir).collect()
    per = defaultdict(list)
    for r in rows:
        assert (r["user_id"], r["neg_item"]) not in pos, r
        assert 1 <= r["neg_item"] <= n_items
        per[r["user_id"]].append((r["neg_rank"], r["proposal_idx"],
                                  r["neg_item"]))
    assert set(per) <= users
    for u, entries in per.items():
        entries.sort()
        assert [e[0] for e in entries] == list(range(1, len(entries) + 1))
        assert len(entries) <= _Q305_K
        # ranks follow the proposal order
        assert [e[1] for e in entries] == sorted(e[1] for e in entries)
        # every surviving proposal index reproduces the md5 stream
        for _rnk, j, item in entries:
            h = hashlib.md5(f"{u}:{j}neg".encode()).hexdigest()
            assert int(h[:15], 16) % n_items + 1 == item
        assert all(e[1] <= _Q305_PROPOSALS for e in entries)
