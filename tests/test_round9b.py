"""Round-9 second-session laws: q372 weighted WOR sampling (and the
queries that follow it this session)."""

from __future__ import annotations

import hashlib

import duckdb

from etl_globalretail_spark.plans.registry import ALL_QUERIES

SF = "/root/testdata/sf0.001"


def _md52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _aes_key(doc_id: int, w: int) -> int:
    return max(_md52(f"wsr9:{doc_id}:{j}") for j in range(1, w + 1))


def test_q372_pure_python_recompute(spark):
    """The full top-100 (ids, weights, keys, ranks) matches a from-scratch
    Python recompute of the A-ES integer device."""
    got = {
        r["rnk"]: (r["doc_id"], r["w"], r["skey"])
        for r in ALL_QUERIES["q372_weighted_sample_wor"](spark, SF).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, coalesce(n_chars,0) AS n FROM '{SF}/documents.parquet'"
    ).fetchall()
    keyed = []
    for doc_id, n in docs:
        w = min(8, 1 + n // 300)
        keyed.append((-_aes_key(doc_id, w), doc_id, w))
    keyed.sort()
    want = {
        i + 1: (doc_id, w, -negkey)
        for i, (negkey, doc_id, w) in enumerate(keyed[:100])
    }
    assert got == want


def test_q372_keys_are_mergeable(spark):
    """Top-k of the union equals top-k of the per-shard top-k unions —
    the property that makes the sample distributable (per-partition
    bounded heaps, tiny driver merge)."""
    docs = duckdb.sql(
        f"SELECT doc_id, coalesce(n_chars,0) AS n FROM '{SF}/documents.parquet'"
    ).fetchall()
    keyed = sorted(
        (-_aes_key(d, min(8, 1 + n // 300)), d) for d, n in docs
    )
    full = keyed[:20]
    shard_a = sorted(k for k in keyed if k[1] % 2 == 0)[:20]
    shard_b = sorted(k for k in keyed if k[1] % 2 == 1)[:20]
    merged = sorted(shard_a + shard_b)[:20]
    assert merged == full


def test_q372_weight_bounds(spark):
    rows = ALL_QUERIES["q372_weighted_sample_wor"](spark, SF).collect()
    assert len(rows) == min(
        100,
        duckdb.sql(f"SELECT count(*) FROM '{SF}/documents.parquet'").fetchone()[0],
    )
    assert all(1 <= r["w"] <= 8 for r in rows)
    assert all(0 <= r["skey"] < 2**52 for r in rows)


def _py_quotas(sf: str, k: int = 200) -> dict[str, tuple[int, int, int]]:
    import math

    cnt = dict(
        duckdb.sql(
            f"SELECT source, count(*) FROM '{sf}/documents.parquet' GROUP BY 1"
        ).fetchall()
    )
    s = {d: int(math.floor(math.sqrt(n) * 1_000_000)) for d, n in cnt.items()}
    tot = sum(s.values())
    return {
        d: (cnt[d], (k * s[d]) // tot, min(cnt[d], (k * s[d]) // tot))
        for d in cnt
    }


def test_q373_quota_arithmetic_recompute(spark):
    """Domain quotas match the integer-quantized sqrt-share recompute,
    and every domain's selection is exactly its n_sel smallest
    md5('mix9:'||doc_id) keys."""
    rows = ALL_QUERIES["q373_temperature_mixture"](spark, SF).collect()
    want = _py_quotas(SF)
    by_dom: dict[str, list] = {}
    for r in rows:
        assert (r["n_docs"], r["quota"], r["n_sel"]) == want[r["source"]]
        by_dom.setdefault(r["source"], []).append(r)
    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    keys: dict[str, list] = {}
    for doc_id, src in docs:
        keys.setdefault(src, []).append((_md52(f"mix9:{doc_id}"), doc_id))
    for dom, sel in by_dom.items():
        keys[dom].sort()
        n_sel = want[dom][2]
        assert sorted(r["doc_id"] for r in sel) == sorted(
            d for _, d in keys[dom][:n_sel]
        )
        assert len(sel) == n_sel


def test_q373_temperature_flattens_the_head(spark):
    """alpha=0.5 up-weights tail domains: sampled FRACTION (n_sel/n_docs)
    is non-increasing in domain size across uncapped domains — compared
    exactly via cross-multiplied integers."""
    q = _py_quotas(SF)
    doms = sorted(q.values())  # by n_docs asc
    total_sel = sum(v[2] for v in doms)
    assert total_sel <= 200
    for (n_a, quota_a, _), (n_b, quota_b, _) in zip(doms, doms[1:]):
        if quota_a == 0 or quota_b == 0:
            continue
        # fraction_a >= fraction_b  <=>  quota_a * n_b >= quota_b * n_a,
        # with 1-ulp floor slack on each quota
        assert (quota_a + 1) * n_b >= quota_b * n_a


def test_q374_zorder_prunes_linear_does_not(spark):
    """The Morton layout must skip strictly more files than the
    time-linear layout for the user-band predicate, both layouts see
    the same true rows, and file accounting conserves the corpus."""
    rows = {
        r["layout"]: r
        for r in ALL_QUERIES["q374_zorder_layout"](spark, SF).collect()
    }
    z, lin = rows["zorder"], rows["time_linear"]
    assert z["n_files"] == lin["n_files"] == 32
    assert z["true_rows"] == lin["true_rows"] > 0
    assert z["files_hit"] < lin["files_hit"]
    assert z["skip_permil"] > lin["skip_permil"]
    assert z["rows_scanned"] <= lin["rows_scanned"]
    # min-max pruning is sound: every true row lives in a hit file
    assert z["rows_scanned"] >= z["true_rows"]
    assert lin["rows_scanned"] >= lin["true_rows"]


def test_q374_morton_interleave_recompute():
    from etl_globalretail_spark.sources.formats import _morton32_sql

    def py_morton(x: int, y: int) -> int:
        out = 0
        for i in range(16):
            out |= ((x >> i) & 1) << (2 * i + 1)
            out |= ((y >> i) & 1) << (2 * i)
        return out

    sql = _morton32_sql("x", "y")
    for x, y in [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321)]:
        got = duckdb.sql(
            f"SELECT {sql} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()[0]
        assert got == py_morton(x, y)
    # locality: adjacent morton values share a small bounding box
    assert py_morton(65535, 0) == sum(2 << (2 * i) for i in range(16))


def test_q378_pure_python_recompute(spark):
    """Full DSIR top-50 (ids, scores, token counts, ranks) matches a
    from-scratch Python recompute of the hashed bit-length log-ratio."""
    got = [
        (r["rnk"], r["doc_id"], r["score"], r["n_tok"])
        for r in sorted(
            ALL_QUERIES["q378_dsir_selection"](spark, SF).collect(),
            key=lambda r: r["rnk"],
        )
    ]
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    tcnt: dict[int, int] = {}
    scnt: dict[int, int] = {}
    toks = {}
    for doc_id, lang, text in docs:
        bs = [_md52(f"dsir9:{t}") % 512 for t in text.strip().split()]
        toks[doc_id] = (lang, bs)
        tgt = tcnt if lang == "en" else scnt
        for b in bs:
            tgt[b] = tgt.get(b, 0) + 1
    w = {
        b: (tcnt.get(b, 0) + 1).bit_length() - (scnt.get(b, 0) + 1).bit_length()
        for b in set(tcnt) | set(scnt)
    }
    scored = sorted(
        (-sum(w[b] for b in bs), doc_id, len(bs))
        for doc_id, (lang, bs) in toks.items()
        if lang != "en"
    )
    want = [
        (i + 1, doc_id, -neg, n) for i, (neg, doc_id, n) in enumerate(scored[:50])
    ]
    assert got == want
    # selection never includes the target cohort and every doc has tokens
    en = {d for d, (lang, _) in toks.items() if lang == "en"}
    assert not en & {d for _, d, _, _ in got}
    assert all(n > 0 for *_, n in got)


def test_q379_confusion_table_laws(spark):
    """Decile accounting conserves the sample pair grid, rates are
    consistent, and identical shingle sets (decile 10) are ALWAYS
    caught — identical signatures share every band."""
    rows = ALL_QUERIES["q379_lsh_recall_audit"](spark, SF).collect()
    n_nonempty = duckdb.sql(
        f"""SELECT count(*) FROM (
            SELECT doc_id FROM '{SF}/documents.parquet'
            WHERE len(regexp_split_to_array(trim(lower(
                regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g'))),
                '\\s+')) >= 2)"""
    ).fetchone()[0]
    k = min(80, n_nonempty)
    total = sum(r["n_pairs"] for r in rows)
    # the grid is every unordered pair of the bounded sample (or a
    # subset if short docs shrank it — conservation against k)
    assert total <= k * (k - 1) // 2
    assert total > 0
    for r in rows:
        assert 0 <= r["decile"] <= 10
        assert 0 <= r["n_caught"] <= r["n_pairs"]
        assert r["catch_permil"] == r["n_caught"] * 1000 // r["n_pairs"]
        if r["decile"] == 10:
            assert r["n_caught"] == r["n_pairs"]


def test_q380_sweep_is_monotone(spark):
    """Raising the threshold can only shrink the edge set, the touched
    cohort, and the removal volume; every present threshold's removal
    rule is consistent (removed <= touched, edges >= removed)."""
    rows = sorted(
        ALL_QUERIES["q380_dedup_threshold_sweep"](spark, SF).collect(),
        key=lambda r: r["threshold_permil"],
    )
    assert rows, "sf0.001 corpus must have at least one near-dup pair"
    for r in rows:
        assert r["n_removed"] <= r["n_docs_touched"] <= 2 * r["n_edges"]
        assert r["n_edges"] >= r["n_removed"]
    for lo, hi in zip(rows, rows[1:]):
        assert hi["n_edges"] <= lo["n_edges"]
        assert hi["n_docs_touched"] <= lo["n_docs_touched"]
        assert hi["n_removed"] <= lo["n_removed"]


def test_q381_g3_laws(spark):
    """g3 is zero exactly for key-certified FDs, rows_to_fix is the
    Kivinen-Mannila minimum (recomputed in Python for one failing FD),
    and every row's accounting is internally consistent."""
    rows = {r["fd"]: r for r in ALL_QUERIES["q381_fd_audit"](spark, SF).collect()}
    assert rows["nation.n_nationkey->n_regionkey"]["rows_to_fix"] == 0
    assert rows["orders.o_orderkey->o_orderstatus"]["rows_to_fix"] == 0
    for r in rows.values():
        assert 0 <= r["rows_to_fix"] < r["n_rows"]
        assert r["g3_permil"] == r["rows_to_fix"] * 1000 // r["n_rows"]
        assert (r["rows_to_fix"] == 0) == (r["n_violating_groups"] == 0)
    pairs = duckdb.sql(
        f"SELECT c_nationkey, c_mktsegment, count(*) FROM "
        f"'{SF}/customer.parquet' GROUP BY 1, 2"
    ).fetchall()
    per: dict[int, list[int]] = {}
    for k, _, c in pairs:
        per.setdefault(k, []).append(c)
    want = sum(sum(cs) - max(cs) for cs in per.values())
    assert rows["customer.c_nationkey->c_mktsegment"]["rows_to_fix"] == want


def test_q382_pass_at_k_laws(spark):
    """pass@k is monotone non-decreasing in k, pass@n equals the
    any-success rate exactly, pass@1 equals the naive rate (unbiased =
    biased at k=1), and the whole table matches a Python recompute."""
    from math import comb

    rows = {
        r["k"]: r for r in ALL_QUERIES["q382_pass_at_k"](spark, SF).collect()
    }
    cs = [
        r[0]
        for r in duckdb.sql(
            f"""WITH ranked AS (
                SELECT user_id, event_type,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) rn
                FROM '{SF}/events.parquet')
            SELECT SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            FROM ranked WHERE rn <= 8 GROUP BY user_id
            HAVING COUNT(*) = 8"""
        ).fetchall()
    ]
    n_tasks = len(cs)
    assert n_tasks > 0
    for k, r in rows.items():
        cnk = comb(8, k)
        want = sum(cnk - comb(8 - c, k) for c in cs) * 1000 // (n_tasks * cnk)
        assert r["pass_at_k_permil"] == want
        assert r["n_tasks"] == n_tasks
        assert r["naive_rate_permil"] == sum(cs) * 1000 // (n_tasks * 8)
    ks = sorted(rows)
    for a, b in zip(ks, ks[1:]):
        assert rows[a]["pass_at_k_permil"] <= rows[b]["pass_at_k_permil"]
    assert rows[1]["pass_at_k_permil"] == sum(
        c * 1000 for c in cs
    ) // (n_tasks * 8) == rows[1]["naive_rate_permil"]
    any_success = sum(1 for c in cs if c > 0)
    assert rows[8]["pass_at_k_permil"] == any_success * 1000 // n_tasks


def test_q383_gini_recompute_and_bounds(spark):
    """Gini matches a from-scratch Python recompute on every source and
    all panel shares sit in their lawful ranges."""
    rows = ALL_QUERIES["q383_corpus_diversity"](spark, SF).collect()
    assert rows
    import re

    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    cnt: dict[str, dict[str, int]] = {}
    for src, text in docs:
        d = cnt.setdefault(src, {})
        for t in text.strip().lower().split():
            if re.fullmatch(r"[a-z]+", t):
                d[t] = d.get(t, 0) + 1
    for r in rows:
        d = cnt[r["source"]]
        n, total = len(d), sum(d.values())
        assert (r["n_types"], r["n_tokens"]) == (n, total)
        assert r["n_hapax"] == sum(1 for c in d.values() if c == 1)
        cs = sorted(d.values())
        gsum = sum((i + 1) * c for i, c in enumerate(cs))
        assert r["gini_permil"] == (2 * gsum - (n + 1) * total) * 1000 // (
            n * total
        )
        assert r["top10_mass_permil"] == sum(
            sorted(d.values(), reverse=True)[:10]
        ) * 1000 // total
        assert 0 <= r["gini_permil"] < 1000
        assert 0 < r["ttr_permil"] <= 1000
        assert 0 <= r["hapax_permil"] <= 1000


def test_q384_mase_laws(spark):
    """naive1's MASE is exactly 1000 permil by construction; every
    model shares the same eval set; mae accounting is consistent; and
    the naive1 error sum matches a Python recompute."""
    rows = {
        r["model"]: r
        for r in ALL_QUERIES["q384_forecast_baselines"](spark, SF).collect()
    }
    assert set(rows) == {"naive1", "seasonal7", "ma7"}
    assert rows["naive1"]["mase_permil"] == 1000
    nd = {r["n_days"] for r in rows.values()}
    assert len(nd) == 1 and nd.pop() > 0
    for r in rows.values():
        assert r["mae_milli"] == r["sum_abs_err"] * 1000 // r["n_days"]
    daily = dict(
        duckdb.sql(
            f"SELECT CAST(o_orderdate AS DATE), count(*) FROM "
            f"'{SF}/orders.parquet' GROUP BY 1"
        ).fetchall()
    )
    from datetime import timedelta

    e1 = n_days = 0
    for d, n in daily.items():
        lags = [daily.get(d - timedelta(days=i)) for i in range(1, 8)]
        if all(v is not None for v in lags):
            n_days += 1
            e1 += abs(n - lags[0])
    assert rows["naive1"]["n_days"] == n_days
    assert rows["naive1"]["sum_abs_err"] == e1
