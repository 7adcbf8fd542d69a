"""q340 boilerplate removal: pure-Python re-based recompute of the
extraction chain, plus the round-trip law."""

from __future__ import annotations

import hashlib
import re

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.text import _Q340_CONTAINER, QUERIES


def _recompute(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    census: dict[str, list[int]] = {}
    for source, text in zip(
        tbl.column("source").to_pylist(), tbl.column("text").to_pylist()
    ):
        html = (
            f"<html><head><title>{source}</title><script>var k=\""
            f"{hashlib.md5(text.encode()).hexdigest()}\";</script></head>"
            f"<body><nav>home | about | contact</nav><p>{text}</p>"
            f"<footer>(c) corp</footer></body></html>"
        )
        ex = re.sub(_Q340_CONTAINER, " ", html)
        ex = re.sub(_Q340_CONTAINER, " ", ex)
        ex = re.sub(r"<[^>]+>", " ", ex)
        ex = re.sub(r"\s+", " ", ex).strip()
        norm = re.sub(r"\s+", " ", text).strip()
        cur = census.setdefault(source, [0, 0, 0, 0])
        cur[0] += 1
        cur[1] += len(html)
        cur[2] += len(ex)
        cur[3] += int(ex == norm)
    return census


def test_q340_matches_pure_python(spark, sf_dir):
    expected = _recompute(sf_dir)
    rows = QUERIES["q340_markup_extraction"](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n, hl, el, rt = expected[r["source"]]
        assert (r["n_docs"], r["html_chars"], r["extracted_chars"],
                r["n_roundtrip_exact"]) == (n, hl, el, rt)
        assert r["content_permil"] == el * 1000 // hl
        # Round-trip law: extraction recovers the normalized original
        # for EVERY document — the chain removes boilerplate, not
        # content.
        assert r["n_roundtrip_exact"] == r["n_docs"]
        assert 0 < r["content_permil"] < 1000
