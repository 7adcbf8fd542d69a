"""q334 target encoding + q335 chi-square feature selection: pure-Python
recomputes and the leakage / discrimination laws."""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.corpus import (
    QUERIES as CORPUS_QUERIES,
)
from etl_globalretail_spark.plans.analytics import QUERIES as AN_QUERIES


def test_q334_matches_pure_python(spark, sf_dir):
    o = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    c = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    seg = dict(
        zip(c.column("c_custkey").to_pylist(),
            c.column("c_mktsegment").to_pylist())
    )
    cells: dict[tuple[str, int], list] = {}
    for ok, ck, tp in zip(
        o.column("o_orderkey").to_pylist(),
        o.column("o_custkey").to_pylist(),
        o.column("o_totalprice").to_pylist(),
    ):
        key = (seg[ck], ok % 5)
        cur = cells.setdefault(key, [0, Decimal(0)])
        cur[0] += 1
        cur[1] += Decimal(f"{tp:.6f}")
    tot: dict[str, list] = {}
    for (s, _), (n, sm) in cells.items():
        cur = tot.setdefault(s, [0, Decimal(0)])
        cur[0] += n
        cur[1] += sm
    rows = AN_QUERIES["q334_target_encoding"](spark, sf_dir).collect()
    assert len(rows) == len(cells)
    for r in rows:
        n, sm = cells[(r["segment"], r["fold"])]
        nt, st = tot[r["segment"]]
        assert r["n_orders"] == n
        assert abs(r["fold_mean"] - float(sm) / n) < 1e-9
        expect = float(st - sm) / float(nt - n)
        assert abs(r["encoding"] - expect) < 1e-9
        # Leakage law: the fold's own rows never contribute to its
        # encoding — with real data the two means must differ.
        assert r["encoding"] != r["fold_mean"]


def _chi2_recompute(sf_dir: str):
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    cells: Counter = Counter()
    for lang, text in zip(
        tbl.column("lang").to_pylist(), tbl.column("text").to_pylist()
    ):
        for t in text.strip().lower().split():
            if t.isalpha():
                cells[(t, lang)] += 1
    tt: Counter = Counter()
    lt: Counter = Counter()
    for (t, lang), a in cells.items():
        tt[t] += a
        lt[lang] += a
    n = sum(cells.values())
    best: dict[str, list] = {}
    for (t, lang), a in cells.items():
        if n - tt[t] == 0 or n - lt[lang] == 0:
            chi2 = 0.0
        else:
            df = float(a) * float(n - tt[t] - lt[lang] + a) - float(
                tt[t] - a
            ) * float(lt[lang] - a)
            chi2 = (
                float(n) * (df * df)
                / (float(tt[t]) * float(n - tt[t])
                   * float(lt[lang]) * float(n - lt[lang]))
            )
        best.setdefault(lang, []).append((chi2, t, a))
    out = {}
    for lang, lst in best.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        out[lang] = lst[:5]
    return out


def test_q335_matches_pure_python(spark, sf_dir):
    expected = _chi2_recompute(sf_dir)
    rows = CORPUS_QUERIES["q335_chi2_features"](spark, sf_dir).collect()
    assert len(rows) == sum(len(v) for v in expected.values())
    for r in rows:
        chi2, t, a = expected[r["lang"]][r["rank"] - 1]
        assert (r["token"], r["n_occ"]) == (t, a)
        assert r["chi2"] == chi2  # bit-equal: identical double pipeline
    # Discrimination law: a top-1 selected token is concentrated in its
    # language well beyond the language's corpus share.
    top = {r["lang"]: r for r in rows if r["rank"] == 1}
    assert top  # at least one language scored
    for lang, r in top.items():
        assert r["chi2"] > 0.0
