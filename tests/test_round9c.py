"""Round-9 third-session laws: q385 Kaplan–Meier (and the queries that
follow it this session)."""

from __future__ import annotations

import duckdb

from etl_globalretail_spark.plans.registry import ALL_QUERIES

SF = "/root/testdata/sf0.001"


def _km_from_scratch():
    """Pure-Python life table + truncating-ppm KM fold from the raw
    events parquet — independent of both engines' SQL."""
    rows = duckdb.sql(
        f"""
        SELECT user_id,
               min(ts) AS t0,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
               max(ts) AS tend
        FROM '{SF}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    buckets: dict[int, list[int]] = {}
    for _uid, t0, tp, tend in rows:
        if tp is not None:
            day = int((tp - t0).total_seconds() * 1_000_000) // 86_400_000_000
            buckets.setdefault(day, [0, 0])[0] += 1
        else:
            day = int((tend - t0).total_seconds() * 1_000_000) // 86_400_000_000
            buckets.setdefault(day, [0, 0])[1] += 1
    days = sorted(buckets)
    n_risk = sum(e + c for e, c in buckets.values())
    s = 1_000_000
    out = []
    for day in days:
        d_ev, d_ce = buckets[day]
        s = s * (n_risk - d_ev) // n_risk
        out.append((day, n_risk, d_ev, d_ce, s))
        n_risk -= d_ev + d_ce
    return out


def test_q385_pure_python_recompute(spark):
    got = [
        (r["day"], r["n_risk"], r["d_events"], r["d_censored"],
         r["survival_ppm"])
        for r in ALL_QUERIES["q385_kaplan_meier"](spark, SF).collect()
    ]
    got.sort()
    assert got == _km_from_scratch()


def test_q385_km_laws(spark):
    rows = sorted(
        (r["day"], r["n_risk"], r["d_events"], r["d_censored"],
         r["survival_ppm"])
        for r in ALL_QUERIES["q385_kaplan_meier"](spark, SF).collect()
    )
    assert rows, "curve must be non-empty"
    # survival starts ≤ 1e6 and is monotone non-increasing
    prev = 1_000_000
    for _d, _nr, _de, _dc, s in rows:
        assert 0 <= s <= prev
        prev = s
    # risk-set conservation: first n_risk is the full user census and
    # each step removes exactly that day's events + censored
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert rows[0][1] == n_users
    for (_, nr, de, dc, _), (_, nr2, _, _, _) in zip(rows, rows[1:]):
        assert nr2 == nr - de - dc
    # a day with zero events leaves survival unchanged
    for (_, _, de, _, s_prev), (_, _, de2, _, s) in zip(rows, rows[1:]):
        if de2 == 0:
            assert s == s_prev


def _wilson_lb(pos: int, n: int) -> float:
    import math

    return (pos + 1.9208 - 1.96 * math.sqrt(pos * (n - pos) / n + 0.9604)) / (
        n + 3.8416
    )


def test_q386_bit_equal_python_recompute(spark):
    """Top-20 panel (ranks, counts, and the DOUBLE bound itself) matches
    a pure-Python math.sqrt recompute bit-for-bit."""
    got = [
        (r["rnk"], r["suppkey"], r["n"], r["pos"], r["naive_ppm"],
         r["wilson_lb"])
        for r in ALL_QUERIES["q386_wilson_ranking"](spark, SF).collect()
    ]
    agg = duckdb.sql(
        f"""
        SELECT l_suppkey, count(*) AS n,
               sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS pos
        FROM '{SF}/lineitem.parquet' GROUP BY l_suppkey
        """
    ).fetchall()
    scored = sorted(
        (-_wilson_lb(int(pos), int(n)), int(sk), int(n), int(pos))
        for sk, n, pos in agg
    )
    want = [
        (i + 1, sk, n, pos, pos * 1_000_000 // n, -neglb)
        for i, (neglb, sk, n, pos) in enumerate(scored[:20])
    ]
    assert got == want


def test_q386_wilson_laws(spark):
    """0 ≤ lb ≤ p̂ always, and the bound shrinks with n at fixed rate —
    the reason the metric exists (a tiny-n perfect score must not win)."""
    rows = ALL_QUERIES["q386_wilson_ranking"](spark, SF).collect()
    for r in rows:
        lb, n, pos = r["wilson_lb"], r["n"], r["pos"]
        assert 0.0 <= lb <= pos / n
    assert _wilson_lb(3, 3) < _wilson_lb(970, 1000)
    assert _wilson_lb(5, 10) < _wilson_lb(50, 100) < _wilson_lb(500, 1000)


def _bigram_sets():
    rows = duckdb.sql(
        f"""
        SELECT doc_id, list(DISTINCT t[i] || ' ' || t[i+1]) FROM (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t,
                   unnest(generate_series(1, len(regexp_split_to_array(
                       trim(text), '\\s+')) - 1)) AS i
            FROM '{SF}/documents.parquet'
        ) GROUP BY doc_id
        """
    ).fetchall()
    return {int(d): set(l) for d, l in rows}


def test_q387_pure_python_greedy_recompute(spark):
    got = sorted(
        (r["rnk"], r["doc_id"], r["gain"], r["covered_total"])
        for r in ALL_QUERIES["q387_greedy_max_coverage"](spark, SF).collect()
    )
    sets = _bigram_sets()
    cov: set[str] = set()
    want = []
    for i in range(1, 7):
        doc, gain = min(
            ((d, len(s - cov)) for d, s in sets.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )
        cov |= sets[doc]
        want.append((i, doc, gain, len(cov)))
    assert got == want


def test_q387_submodular_laws(spark):
    """Marginal gains are non-increasing (greedy on a submodular set
    objective) and coverage is the exact running sum of gains."""
    rows = sorted(
        (r["rnk"], r["doc_id"], r["gain"], r["covered_total"])
        for r in ALL_QUERIES["q387_greedy_max_coverage"](spark, SF).collect()
    )
    gains = [g for _, _, g, _ in rows]
    assert gains == sorted(gains, reverse=True)
    assert all(g > 0 for g in gains), "degenerate universe — see block comment"
    total = 0
    for _, _, g, cum in rows:
        total += g
        assert cum == total
    # picks never repeat
    assert len({d for _, d, _, _ in rows}) == len(rows)


def _md5mod(s: str, mod: int) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod


def _alpha_panel_from_scratch():
    """Rebuild the 3-annotator panel (gold, stopword-argmax model,
    md5 human2 with missingness) in pure Python from the raw parquet."""
    from etl_globalretail_spark.operators.text import LANG_STOPWORDS, _LANGS

    rows = duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    panel = []
    for doc_id, lang, text in rows:
        toks = text.strip().split()
        hits = {
            lg: sum(1 for t in toks if t in ws)
            for lg, ws in LANG_STOPWORDS.items()
        }
        if sum(hits.values()) == 0:
            pred = "und"
        else:
            pred = next(
                (
                    lg
                    for lg in _LANGS
                    if all(hits[lg] >= hits[o] for o in _LANGS if o != lg)
                ),
                "und",
            )
        anns = [lang, pred]
        if _md5mod(f"{doc_id}kra", 3) != 0:
            anns.append(
                lang if _md5mod(f"{doc_id}krb", 10) < 8 else "und"
            )
        panel.append(anns)
    return panel


def _alpha_ppm(panel):
    o2: dict[tuple[str, str], int] = {}
    for anns in panel:
        m = len(anns)
        w = 2 // (m - 1)
        for i, c in enumerate(anns):
            for j, k in enumerate(anns):
                if i != j:
                    o2[(c, k)] = o2.get((c, k), 0) + w
    nc2: dict[str, int] = {}
    for (c, _k), v in o2.items():
        nc2[c] = nc2.get(c, 0) + v
    n_ann = sum(nc2.values()) // 2
    d_o2 = sum(v for (c, k), v in o2.items() if c != k)
    s = max(
        1,
        sum(
            va * vb
            for ca, va in nc2.items()
            for cb, vb in nc2.items()
            if ca != cb
        ),
    )
    num = (s - 2 * (n_ann - 1) * d_o2) * 1_000_000
    return len(panel), n_ann, d_o2, abs(num) // s * (1 if num >= 0 else -1)


def test_q388_pure_python_recompute(spark):
    got = ALL_QUERIES["q388_krippendorff_alpha"](spark, SF).collect()[0]
    n_units, n_ann, d_o2, alpha = _alpha_ppm(_alpha_panel_from_scratch())
    assert (
        got["n_units"], got["n_ann"], got["d_o2"], got["alpha_ppm"]
    ) == (n_units, n_ann, d_o2, alpha)


def test_q388_alpha_laws(spark):
    """Perfect agreement → α = 1e6; one lone disagreement pulls it
    below; α ≤ 1e6 always; and the real panel sits strictly between
    chance and perfection (the panel has real disagreement + real
    agreement by construction)."""
    perfect = [["en", "en", "en"], ["de", "de"], ["fr", "fr", "fr"]]
    assert _alpha_ppm(perfect)[3] == 1_000_000
    one_bad = [["en", "en", "en"], ["de", "de"], ["fr", "fr", "und"]]
    assert _alpha_ppm(one_bad)[3] < 1_000_000
    got = ALL_QUERIES["q388_krippendorff_alpha"](spark, SF).collect()[0]
    assert 0 < got["alpha_ppm"] < 1_000_000
    # missingness is real: annotations strictly between 2n and 3n units
    assert 2 * got["n_units"] < got["n_ann"] < 3 * got["n_units"]


def test_q389_pinball_recompute_and_proper_scoring(spark):
    """Pure-Python recompute of all six (tau, model) sums; each
    forecaster wins at its own tau; and the doubled tau=.5 naive-1
    pinball equals q384's naive-1 sum of absolute errors (cross-query
    law)."""
    daily = dict(
        duckdb.sql(
            f"SELECT CAST(o_orderdate AS DATE), count(*) "
            f"FROM '{SF}/orders.parquet' GROUP BY 1"
        ).fetchall()
    )
    import datetime

    sums = {k: 0 for k in ("med50", "max50", "lag150",
                           "med90", "max90", "lag190")}
    nd = 0
    for d, n in daily.items():
        lags = [
            daily.get(d - datetime.timedelta(days=i)) for i in range(1, 8)
        ]
        if any(v is None for v in lags):
            continue
        nd += 1
        ls = sorted(lags)
        fc = {"med": ls[3], "max": ls[6], "lag1": lags[0]}
        for m, f in fc.items():
            sums[f"{m}50"] += 5 * abs(n - f)
            sums[f"{m}90"] += 9 * max(n - f, 0) + max(f - n, 0)
    got = {
        (r["tau_pct"], r["model"]): (r["n_days"], r["pinball10_sum"],
                                     r["mean_milli"])
        for r in ALL_QUERIES["q389_pinball_quantile_eval"](spark, SF)
        .collect()
    }
    for tau, suf in ((50, "50"), (90, "90")):
        for model, m in (("trail_median", "med"), ("trail_max", "max"),
                         ("naive1", "lag1")):
            s = sums[f"{m}{suf}"]
            assert got[(tau, model)] == (nd, s, s * 1000 // nd)
    # proper-scoring: each order-statistic forecaster wins at its own
    # tau. Needs a non-degenerate series — sf0.001 has only 5 eval days
    # (one lucky window flips it), so pin it at sf0.01 (2350 days).
    got01 = {
        (r["tau_pct"], r["model"]): r["pinball10_sum"]
        for r in ALL_QUERIES["q389_pinball_quantile_eval"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert got01[(50, "trail_median")] < got01[(50, "trail_max")]
    assert got01[(90, "trail_max")] < got01[(90, "trail_median")]
    # cross-query law: 2 x (tau=.5 naive1 pinball10) == 10 x q384 naive1 sum|e|
    q384 = {
        r["model"]: r["sum_abs_err"]
        for r in ALL_QUERIES["q384_forecast_baselines"](spark, SF).collect()
    }
    assert 2 * got[(50, "naive1")][1] == 10 * q384["naive1"]


def _simpson_flag(strata_signs, pooled_sign):
    return int(
        pooled_sign != 0
        and all(s != pooled_sign for s in strata_signs)
        and any(s == -pooled_sign for s in strata_signs)
    )


def test_q390_pure_python_recompute(spark):
    rows = duckdb.sql(
        f"""
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT),
               c.c_mktsegment,
               CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        """
    ).fetchall()
    cells: dict[int, list[int]] = {}
    for yr, seg, hot in rows:
        cell = cells.setdefault(yr, [0, 0, 0, 0])
        if seg == "BUILDING":
            cell[0] += 1
            cell[1] += hot
        else:
            cell[2] += 1
            cell[3] += hot

    def sgn(pa, na, pb, nb):
        x = pa * nb - pb * na
        return 1 if x > 0 else (-1 if x < 0 else 0)

    want = {}
    s_signs = []
    for yr, (na, pa, nb, pb) in cells.items():
        if na > 0 and nb > 0:
            s = sgn(pa, na, pb, nb)
            s_signs.append(s)
            want[str(yr)] = (na, pa, nb, pb, s)
    tna = sum(v[0] for v in cells.values())
    tpa = sum(v[1] for v in cells.values())
    tnb = sum(v[2] for v in cells.values())
    tpb = sum(v[3] for v in cells.values())
    p_sign = sgn(tpa, tna, tpb, tnb)
    want["ALL"] = (tna, tpa, tnb, tpb, p_sign)
    flag = _simpson_flag(s_signs, p_sign)
    got = {
        r["stratum"]: (r["n_a"], r["pos_a"], r["n_b"], r["pos_b"],
                       r["diff_sign"])
        for r in ALL_QUERIES["q390_simpson_audit"](spark, SF).collect()
    }
    flags = {
        r["paradox_flag"]
        for r in ALL_QUERIES["q390_simpson_audit"](spark, SF).collect()
    }
    assert got == want
    assert flags == {flag}


def test_q390_flag_fires_on_the_textbook_case():
    """The kidney-stone numbers (Charig et al. 1986): treatment A wins
    within BOTH strata yet loses pooled — the flag must fire; and it
    must NOT fire when pooled agrees with any stratum."""
    def sgn(pa, na, pb, nb):
        x = pa * nb - pb * na
        return 1 if x > 0 else (-1 if x < 0 else 0)

    # (pos_a, n_a, pos_b, n_b) per stratum: small stones, large stones
    strata = [(81, 87, 234, 270), (192, 263, 55, 80)]
    s_signs = [sgn(*s) for s in strata]
    pooled = tuple(sum(x) for x in zip(*strata))
    p_sign = sgn(*pooled)
    assert s_signs == [1, 1] and p_sign == -1
    assert _simpson_flag(s_signs, p_sign) == 1
    assert _simpson_flag([1, -1], 1) == 0
    assert _simpson_flag([0, 0], 1) == 0  # ties don't oppose: strict form
    assert _simpson_flag([-1, 0], 1) == 1


def test_q391_pure_python_recompute_and_mass_conservation(spark):
    from collections import Counter

    docs = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall()
    counts: Counter = Counter()
    for (text,) in docs:
        toks = text.strip().split()
        for a, b in zip(toks, toks[1:]):
            counts[(a, b)] += 1
    spec = Counter(counts.values())
    want = sorted(
        (r, n_r, spec.get(r + 1, 0),
         (r + 1) * spec.get(r + 1, 0) * 1000 // n_r)
        for r, n_r in spec.items()
    )
    got = sorted(
        (r["r"], r["n_r"], r["n_next"], r["rstar_permil"])
        for r in ALL_QUERIES["q391_good_turing"](spark, SF).collect()
    )
    assert got == want
    # mass conservation, hole-aware: the reallocated mass reachable
    # through n_next is the full N - N_1 MINUS the mass sitting just
    # above spectrum holes (r present, r-1 absent) — equality iff the
    # spectrum is contiguous; both faces asserted exactly.
    n_tokens = sum(counts.values())
    n1 = spec.get(1, 0)
    present = {r for r, _, _, _ in got}
    hole_mass = sum(
        r * n_r for r, n_r, _, _ in got if r >= 2 and (r - 1) not in present
    )
    assert (
        sum((r + 1) * nx for r, _, nx, _ in got)
        == n_tokens - n1 - hole_mass
    )
    assert sum(r * n_r for r, n_r, _, _ in got if r >= 2) == n_tokens - n1
    # the spectrum's weighted sum IS the bigram total (self-check)
    assert sum(r * n_r for r, n_r, _, _ in got) == n_tokens
    # unseen-mass estimate is readable and sane: 0 <= N_1/N < 1
    assert 0 <= n1 < n_tokens


def _minimax_iso_ppm(bins):
    """Brute-force O(B³) minimax form of PAVA over (n, pos) bins —
    the independent face of the theorem the query's gate re-proves."""
    B = len(bins)
    v = {}
    for k in range(B):
        s = c = 0
        for j in range(k, B):
            s += bins[j][1]
            c += bins[j][0]
            v[(k, j)] = 1_000_000 * s // c
    return [
        max(min(v[(k, j)] for j in range(i, B)) for k in range(i + 1))
        for i in range(B)
    ]


def test_q392_minimax_recompute(spark):
    got = sorted(
        (r["bucket"], r["n"], r["pos"], r["raw_ppm"], r["iso_ppm"])
        for r in ALL_QUERIES["q392_isotonic_calibration"](spark, SF)
        .collect()
    )
    bins = duckdb.sql(
        f"""
        SELECT length(bin(CAST(FLOOR(o_totalprice * 100) AS BIGINT))) AS b,
               count(*) AS n,
               sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS pos
        FROM '{SF}/orders.parquet' GROUP BY b ORDER BY b
        """
    ).fetchall()
    iso = _minimax_iso_ppm([(int(n), int(p)) for _, n, p in bins])
    want = sorted(
        (int(b), int(n), int(p), 1_000_000 * int(p) // int(n), iso_v)
        for (b, n, p), iso_v in zip(bins, iso)
    )
    assert got == want


def test_q392_isotonic_laws(spark):
    rows = sorted(
        (r["bucket"], r["raw_ppm"], r["iso_ppm"])
        for r in ALL_QUERIES["q392_isotonic_calibration"](spark, SF)
        .collect()
    )
    iso = [i for _, _, i in rows]
    assert iso == sorted(iso), "fit must be monotone non-decreasing"
    # the projection genuinely fires on this data (raw is non-monotone)
    raw = [r for _, r, _ in rows]
    assert raw != sorted(raw)
    assert any(r != i for r, i in zip(raw, iso))
    # closed-form unit checks: monotone input is a fixpoint; a single
    # violation pools to the exact fraction mean
    assert _minimax_iso_ppm([(10, 1), (10, 5), (10, 9)]) == [
        100_000, 500_000, 900_000,
    ]
    assert _minimax_iso_ppm([(10, 9), (10, 1)]) == [500_000, 500_000]
    assert _minimax_iso_ppm([(30, 9), (10, 1)]) == [250_000, 250_000]


def test_q393_pure_python_recompute(spark):
    """Pairs, observed statistic, all 64 flip statistics, and the
    add-one p-value match a from-scratch Python replay of the md5
    sign-flip device."""
    rows = duckdb.sql(
        f"""
        SELECT o_custkey,
               CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                        THEN FLOOR(o_totalprice * 100) ELSE 0 END)
                    - SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                          THEN FLOOR(o_totalprice * 100) ELSE 0 END)
                    AS BIGINT),
               SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                   THEN 1 ELSE 0 END),
               SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                   THEN 1 ELSE 0 END)
        FROM '{SF}/orders.parquet'
        WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
        GROUP BY o_custkey
        """
    ).fetchall()
    pairs = [(int(c), int(d)) for c, d, n96, n95 in rows
             if n96 > 0 and n95 > 0]
    t_obs = abs(sum(d for _, d in pairs))
    n_ge = 0
    for b in range(1, 65):
        t_b = abs(
            sum(
                (1 - 2 * _md5mod(f"{c}perm{b}", 2)) * d for c, d in pairs
            )
        )
        if t_b >= t_obs:
            n_ge += 1
    got = ALL_QUERIES["q393_permutation_test"](spark, SF).collect()[0]
    assert (got["n_pairs"], got["t_obs"], got["n_ge"], got["p_permil"]) == (
        len(pairs), t_obs, n_ge, (1 + n_ge) * 1000 // 65,
    )
    # sanity: the p-value is a valid add-one permutation p in (0, 1]
    assert 1000 // 65 <= got["p_permil"] <= 1000


def test_q394_pure_python_recompute(spark):
    import datetime

    daily = dict(
        duckdb.sql(
            f"SELECT CAST(o_orderdate AS DATE), count(*) "
            f"FROM '{SF}/orders.parquet' GROUP BY 1"
        ).fetchall()
    )
    n, s = len(daily), sum(daily.values())
    dev = {d: n * x - s for d, x in daily.items()}
    den = sum(v * v for v in dev.values())

    def trunc_div(a: int, b: int) -> int:
        return abs(a) // b * (1 if a >= 0 else -1)

    want = {}
    for lag in range(1, 15):
        num, np_ = 0, 0
        for d, v in dev.items():
            prev = dev.get(d - datetime.timedelta(days=lag))
            if prev is not None:
                num += v * prev
                np_ += 1
        want[lag] = (np_, trunc_div(num * 1000, den))
    got = {
        r["lag"]: (r["n_pairs"], r["acf_permil"])
        for r in ALL_QUERIES["q394_acf_panel"](spark, SF).collect()
    }
    assert got == want
    # range law: |r_l| <= 1 by Cauchy-Schwarz (quantized: <= 1000)
    assert all(abs(a) <= 1000 for _, a in got.values())
    # lag-0 identity on the same device: num == den exactly
    assert trunc_div(sum(v * v for v in dev.values()) * 1000, den) == 1000


def test_q395_pure_python_recompute(spark):
    rows = duckdb.sql(
        f"""
        SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)), COUNT(*),
               CAST(SUM(FLOOR(o_totalprice * 100)) AS BIGINT)
        FROM '{SF}/orders.parquet' GROUP BY o_custkey
        """
    ).fetchall()
    ref = max(r[1] for r in rows)
    per = [
        (int(c), (ref - mx).days, int(fq), int(mon))
        for c, mx, fq, mon in rows
    ]
    n = len(per)

    def quint(order_key):
        ranked = sorted(per, key=order_key)
        return {
            row[0]: 5 * i // n + 1 for i, row in enumerate(ranked)
        }

    r_q = quint(lambda r: (r[1], r[0]))
    f_q = quint(lambda r: (-r[2], r[0]))
    m_q = quint(lambda r: (-r[3], r[0]))
    want: dict[tuple[int, int, int], list[int]] = {}
    for c, _rec, _fq, mon in per:
        cell = want.setdefault((r_q[c], f_q[c], m_q[c]), [0, 0])
        cell[0] += 1
        cell[1] += mon
    got = {
        (r["r_q"], r["f_q"], r["m_q"]): [r["n_customers"],
                                         r["monetary_cents"]]
        for r in ALL_QUERIES["q395_rfm_segmentation"](spark, SF).collect()
    }
    assert got == {k: v for k, v in want.items()}
    # conservation + balance laws: every customer lands in exactly one
    # cell, and each axis's quintiles split n as evenly as possible
    assert sum(v[0] for v in got.values()) == n
    for axis in range(3):
        sizes: dict[int, int] = {}
        for k, v in got.items():
            sizes[k[axis]] = sizes.get(k[axis], 0) + v[0]
        assert set(sizes) == {1, 2, 3, 4, 5}
        assert max(sizes.values()) - min(sizes.values()) <= 1


def _fs_panel_from_scratch(sf=SF):
    rows = duckdb.sql(
        f"""
        SELECT c_custkey, c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT), c_name
        FROM '{sf}/customer.parquet'
        """
    ).fetchall()
    sfx = max(0, len(str(len(rows))) - 4)  # the adaptive block suffix
    segs = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY")
    a = [
        (int(c), (int(n), nm[-sfx:] if sfx else ""), s, int(v))
        for c, n, s, v, nm in rows
    ]
    b = []
    for c, blk, s, v in a:
        s2 = segs[_md5mod(f"{c}fssv", 5)] if _md5mod(f"{c}fss", 5) == 0 else s
        v2 = v + _md5mod(f"{c}fsbv", 2000) - 1000 \
            if _md5mod(f"{c}fsb", 4) == 0 else v
        b.append((c, blk, s2, v2))
    by_nat: dict[tuple, list] = {}
    for rec in b:
        by_nat.setdefault(rec[1], []).append(rec)
    census: dict[tuple[int, int, int], list[int]] = {}
    for c, blk, s, v in a:
        for c2, _n2, s2, v2 in by_nat.get(blk, ()):
            key = (
                int(s == s2),
                int((abs(v) + 1).bit_length() == (abs(v2) + 1).bit_length()),
                int(((v % 100) + 100) % 100 == ((v2 % 100) + 100) % 100),
            )
            cell = census.setdefault(key, [0, 0])
            cell[0] += 1
            cell[1] += int(c == c2)
    return census


def test_q396_pure_python_recompute(spark):
    census = _fs_panel_from_scratch()
    md = sum(v[1] for v in census.values())
    ud = sum(v[0] - v[1] for v in census.values())
    weights = []
    for fi in range(3):
        mn = sum(v[1] for k, v in census.items() if k[fi] == 1)
        un = sum(v[0] - v[1] for k, v in census.items() if k[fi] == 1)
        weights.append(
            ((mn * ud + 1).bit_length() - (md * un + 1).bit_length(),
             ((md - mn) * ud + 1).bit_length()
             - (md * (ud - un) + 1).bit_length())
        )
    want = {}
    for k, (np_, nt) in census.items():
        score = sum(weights[i][0] if k[i] else weights[i][1]
                    for i in range(3))
        cls = ("match" if score >= 8
               else "possible" if score >= 0 else "non-match")
        want[k] = (np_, nt, score, cls)
    got = {
        (r["seg_agree"], r["band_agree"], r["cents_agree"]):
        (r["n_pairs"], r["n_true"], r["score"], r["fs_class"])
        for r in ALL_QUERIES["q396_fellegi_sunter"](spark, SF).collect()
    }
    assert got == want


def test_q396_fs_discrimination_laws(spark):
    """Weights separate: agreement weight > disagreement weight per
    field; true pairs concentrate in match+possible; the all-agree
    pattern is classified 'match' and carries the highest score."""
    rows = ALL_QUERIES["q396_fellegi_sunter"](spark, SF).collect()
    by_pat = {
        (r["seg_agree"], r["band_agree"], r["cents_agree"]): r
        for r in rows
    }
    top = by_pat[(1, 1, 1)]
    assert top["fs_class"] == "match"
    assert top["score"] == max(r["score"] for r in rows)
    # every true pair agrees on the coarse band (jitter ±1000 cents
    # rarely crosses a power-of-two boundary at this balance scale is
    # NOT guaranteed — so assert the weaker, structural law instead:
    # true-pair mass in non-match patterns is a tiny fraction
    n_true = sum(r["n_true"] for r in rows)
    stray = sum(
        r["n_true"] for r in rows if r["fs_class"] == "non-match"
    )
    assert stray * 10 <= n_true
    # monotone in agreement: adding an agreement never lowers the score
    for k, r in by_pat.items():
        for i in range(3):
            if k[i] == 0:
                up = (*k[:i], 1, *k[i + 1:])
                if up in by_pat:
                    assert by_pat[up]["score"] >= r["score"]


def _bh_kstar(n_ges, m, alpha_permil=200, b=32):
    kstar = 0
    for k, n_ge in enumerate(sorted(n_ges), start=1):
        if (1 + n_ge) * m * 1000 <= k * alpha_permil * (b + 1):
            kstar = k
    return kstar


def test_q397_pure_python_recompute(spark):
    rows = duckdb.sql(
        f"""
        SELECT c.c_nationkey, o.o_custkey,
               CAST(SUM(CASE WHEN EXTRACT(year FROM o.o_orderdate) = 1996
                        THEN FLOOR(o.o_totalprice * 100) ELSE 0 END)
                    - SUM(CASE WHEN EXTRACT(year FROM o.o_orderdate) = 1995
                          THEN FLOOR(o.o_totalprice * 100) ELSE 0 END)
                    AS BIGINT),
               SUM(CASE WHEN EXTRACT(year FROM o.o_orderdate) = 1996
                   THEN 1 ELSE 0 END),
               SUM(CASE WHEN EXTRACT(year FROM o.o_orderdate) = 1995
                   THEN 1 ELSE 0 END)
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        WHERE EXTRACT(year FROM o.o_orderdate) IN (1995, 1996)
        GROUP BY 1, 2
        """
    ).fetchall()
    by_nat: dict[int, list[tuple[int, int]]] = {}
    for nat, cust, d, n96, n95 in rows:
        if n96 > 0 and n95 > 0:
            by_nat.setdefault(int(nat), []).append((int(cust), int(d)))
    per = []
    for nat, pairs in by_nat.items():
        t_obs = abs(sum(d for _, d in pairs))
        n_ge = sum(
            1
            for b in range(1, 33)
            if abs(sum((1 - 2 * _md5mod(f"{c}bh{b}", 2)) * d
                       for c, d in pairs)) >= t_obs
        )
        per.append((n_ge, nat, len(pairs), t_obs))
    per.sort()
    m = len(per)
    kstar = _bh_kstar([p[0] for p in per], m)
    want = {
        nat: (np_, t_obs, n_ge, (1 + n_ge) * 1000 // 33, k,
              int(k <= kstar))
        for k, (n_ge, nat, np_, t_obs) in enumerate(per, start=1)
    }
    got = {
        r["nation"]: (r["n_pairs"], r["t_obs"], r["n_ge"], r["p_permil"],
                      r["bh_rank"], r["rejected"])
        for r in ALL_QUERIES["q397_bh_fdr"](spark, SF).collect()
    }
    assert got == want


def test_q397_bh_step_up_laws(spark):
    """Step-up semantics on constructed cases: the rejection set is
    ALWAYS a rank prefix; a straggler below threshold inside the
    prefix is still rejected (the step-up, not step-down, rule); and
    on the null corpus BH rejects nothing (FDR control working)."""
    # 4 nations at the minimum possible p (n_ge=0) out of m=25: BH at
    # alpha=.2, B=32 accepts exactly when k*alpha*(B+1) >= m*1000/(1+0)
    # -> k >= 3.78 -> the 4-strong prefix is rejected WHOLE, including
    # ranks 1-3 whose individual thresholds are below their p.
    assert _bh_kstar([0, 0, 0, 0] + [30] * 21, 25) == 4
    # step-down would have stopped at k=1; step-up must take the max k
    assert _bh_kstar([0, 0, 0] + [30] * 22, 25) == 0  # 3 is not enough
    rows = ALL_QUERIES["q397_bh_fdr"](spark, SF).collect()
    rejected_ranks = sorted(r["bh_rank"] for r in rows if r["rejected"])
    assert rejected_ranks == list(range(1, len(rejected_ranks) + 1))
    ps = [r["p_permil"] for r in sorted(rows, key=lambda r: r["bh_rank"])]
    assert ps == sorted(ps)


def test_q398_pure_python_recompute_and_permutation_laws(spark):
    import hashlib

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    keyed = sorted(
        (
            len(t.strip().split()).bit_length(),
            hashlib.md5(f"cur9:{d}".encode()).hexdigest(),
            int(d),
        )
        for d, t in docs
    )
    band_n: dict[int, int] = {}
    for b, _k, _d in keyed:
        band_n[b] = band_n.get(b, 0) + 1
    want = {
        d: (b, i + 1, band_n[b]) for i, (b, _k, d) in enumerate(keyed)
    }
    got = {
        r["doc_id"]: (r["band"], r["curriculum_pos"], r["band_n"])
        for r in ALL_QUERIES["q398_curriculum_order"](spark, SF).collect()
    }
    assert got == want
    # permutation: positions are exactly 1..n
    assert sorted(p for _, p, _ in got.values()) == list(
        range(1, len(docs) + 1)
    )
    # bands occupy contiguous position ranges, easy-first
    spans: dict[int, list[int]] = {}
    for b, p, _n in got.values():
        spans.setdefault(b, []).append(p)
    ordered = sorted(spans)
    hi = 0
    for b in ordered:
        ps = sorted(spans[b])
        assert ps[0] == hi + 1 and ps[-1] == hi + len(ps)
        hi = ps[-1]


def _chain_heads(rows):
    """rows: (orderkey, custkey, cents, date_str, priority) — returns
    ({shard: (n, head)}, root)."""
    import hashlib

    shards: dict[int, list] = {}
    for k, c, cents, ds, pri in rows:
        d = hashlib.md5(
            f"{k}|{c}|{cents}|{ds}|{pri}".encode()
        ).hexdigest()
        shards.setdefault(k % 16, []).append((k, d))
    heads = {}
    for s, lst in shards.items():
        h = "genesis"
        for _k, d in sorted(lst):
            h = hashlib.md5((h + d).encode()).hexdigest()
        heads[s] = (len(lst), h)
    root = hashlib.md5(
        "".join(heads[s][1] for s in sorted(heads)).encode()
    ).hexdigest()
    return heads, root


def _q399_rows(sf=SF):
    return [
        (int(k), int(c), int(v), ds, p)
        for k, c, v, ds, p in duckdb.sql(
            f"""
            SELECT o_orderkey, o_custkey,
                   CAST(FLOOR(o_totalprice * 100) AS BIGINT),
                   strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d'),
                   o_orderpriority
            FROM '{sf}/orders.parquet'
            """
        ).fetchall()
    ]


def test_q399_pure_python_recompute(spark):
    heads, root = _chain_heads(_q399_rows())
    got = {
        r["shard"]: (r["n_rows"], r["chain_head"], r["root"])
        for r in ALL_QUERIES["q399_hash_chain_audit"](spark, SF).collect()
    }
    assert got == {s: (n, h, root) for s, (n, h) in heads.items()}


def test_q399_tamper_evidence():
    """Mutating one row's cents, or swapping two rows' chain order,
    flips that shard's head AND the global root — the property that
    makes the audit tamper-evident."""
    rows = _q399_rows()
    heads0, root0 = _chain_heads(rows)
    tampered = list(rows)
    k, c, cents, ds, p = tampered[7]
    tampered[7] = (k, c, cents + 1, ds, p)
    heads1, root1 = _chain_heads(tampered)
    assert root1 != root0
    assert heads1[k % 16][1] != heads0[k % 16][1]
    diff = {s for s in heads0 if heads0[s] != heads1[s]}
    assert diff == {k % 16}, "tamper is localized to one shard"
    # reorder within a shard (swap two orderkeys' payloads): head flips
    same_shard = [r for r in rows if r[0] % 16 == 3][:2]
    a, b = same_shard
    swapped = [
        (a[0], *b[1:]) if r == a else ((b[0], *a[1:]) if r == b else r)
        for r in rows
    ]
    _, root2 = _chain_heads(swapped)
    assert root2 != root0


def test_q400_pure_python_recompute(spark):
    import math

    rows = duckdb.sql(
        f"""
        SELECT o_orderkey, o_orderpriority,
               CAST(FLOOR(o_totalprice) AS BIGINT)
        FROM '{SF}/orders.parquet'
        """
    ).fetchall()
    strata: dict[str, list[tuple[int, int]]] = {}
    for k, p, x in rows:
        strata.setdefault(p, []).append((int(k), int(x)))
    agg = {}
    for st, lst in strata.items():
        n = len(lst)
        s1 = sum(x for _, x in lst)
        s2 = sum(x * x for _, x in lst)
        agg[st] = (n, int(math.floor(math.sqrt(float(n * s2 - s1 * s1)))))
    tw = sum(w for _, w in agg.values())
    seats = {st: (500 * w // tw, 500 * w % tw) for st, (_, w) in agg.items()}
    leftover = 500 - sum(b for b, _ in seats.values())
    extra = {
        st for st, _ in sorted(
            seats.items(), key=lambda kv: (-kv[1][1], kv[0])
        )[:leftover]
    }
    want = {}
    for st, lst in strata.items():
        quota = seats[st][0] + (1 if st in extra else 0)
        keyed = sorted(
            (_md5mod(f"{k}ney", 1 << 60), k) for k, _ in lst
        )
        drawn = keyed[:quota]
        want[st] = (
            agg[st][0], agg[st][1], quota, len(drawn),
            sum(h % 1000000007 for h, _ in drawn) % 1000000007,
        )
    got = {
        r["stratum"]: (r["n_h"], r["w"], r["quota"], r["n_drawn"],
                       r["drawn_key_hashsum"])
        for r in ALL_QUERIES["q400_neyman_stratified_sample"](spark, SF)
        .collect()
    }
    assert got == want
    # apportionment laws: quotas sum EXACTLY to the budget, every
    # stratum draws its full quota, and allocation follows w order
    assert sum(q for _, _, q, _, _ in got.values()) == 500
    assert all(nd == q for _, _, q, nd, _ in got.values())
    by_w = sorted(got.values(), key=lambda v: v[1])
    qs = [v[2] for v in by_w]
    assert qs == sorted(qs), "bigger N·sigma never gets fewer seats"


def _shapley_sixths(cells):
    def v(s):
        return sum(n for m, n in cells.items() if m & s)

    out = {}
    for g in range(3):
        me, o1, o2 = 1 << g, 1 << ((g + 1) % 3), 1 << ((g + 2) % 3)
        out[g] = (
            2 * (v(me) - v(0)) + (v(me | o1) - v(o1))
            + (v(me | o2) - v(o2)) + 2 * (v(7) - v(7 ^ me))
        )
    return out, v(7)


def test_q401_pure_python_recompute_and_axioms(spark):
    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    masks: dict[str, int] = {}
    for src, text in docs:
        g = int(src[3:]) % 3
        toks = text.strip().split()
        for a, b in zip(toks, toks[1:]):
            masks[f"{a} {b}"] = masks.get(f"{a} {b}", 0) | (1 << g)
    cells: dict[int, int] = {}
    for m in masks.values():
        cells[m] = cells.get(m, 0) + 1
    phi, vfull = _shapley_sixths(cells)
    got = {
        r["tier"]: (r["own_coverage"], r["six_phi"], r["share_permil"])
        for r in ALL_QUERIES["q401_shapley_source_value"](spark, SF)
        .collect()
    }
    want = {
        g: (
            sum(n for m, n in cells.items() if m & (1 << g)),
            phi[g],
            phi[g] * 1000 // (6 * vfull),
        )
        for g in range(3)
    }
    assert got == want
    # efficiency axiom: the sixths sum EXACTLY to 6·v(full)
    assert sum(p for _, p, _ in got.values()) == 6 * vfull
    # monotone coverage game: every value non-negative
    assert all(p >= 0 for _, p, _ in got.values())
    # null player axiom on a constructed game: a tier covering nothing
    # new gets exactly zero
    phi0, _ = _shapley_sixths({0b011: 10, 0b010: 5})  # tier 2 covers none
    assert phi0[2] == 0
    # symmetry axiom: interchangeable tiers split equally
    phi1, _ = _shapley_sixths({0b001: 7, 0b010: 7, 0b011: 3})
    assert phi1[0] == phi1[1]


def _burst_dp(xs):
    t, s = len(xs), sum(xs)
    mu0 = s // t
    mu1 = 3 * mu0 // 2 + 1
    gam = mu0 // 2
    c0, c1 = abs(xs[0] - mu0), abs(xs[0] - mu1) + gam
    back = []
    for x in xs[1:]:
        p0 = 0 if c0 <= c1 else 1
        n0 = abs(x - mu0) + min(c0, c1)
        p1 = 1 if c1 <= c0 + gam else 0
        n1 = abs(x - mu1) + min(c1, c0 + gam)
        back.append((p0, p1))
        c0, c1 = n0, n1
    st = 0 if c0 <= c1 else 1
    path = [st]
    for b in reversed(back):
        st = b[st]
        path.append(st)
    path.reverse()
    return path, (mu0, mu1, gam), min(c0, c1)


def _path_cost(xs, path, mu0, mu1, gam):
    cost = 0
    prev = 0
    for x, st in zip(xs, path):
        cost += abs(x - (mu1 if st else mu0))
        if st == 1 and prev == 0:
            cost += gam
        prev = st
    return cost


def test_q402_pure_python_recompute_and_optimality(spark):
    weekly = sorted(
        duckdb.sql(
            f"""
            SELECT date_diff('day', DATE '1970-01-05',
                             CAST(o_orderdate AS DATE)) // 7,
                   count(*)
            FROM '{SF}/orders.parquet' GROUP BY 1
            """
        ).fetchall()
    )
    xs = [int(x) for _, x in weekly]
    path, (mu0, mu1, gam), best_cost = _burst_dp(xs)
    want = []
    seg_start = 0
    for i in range(1, len(xs) + 1):
        if i == len(xs) or path[i] != path[i - 1]:
            want.append(
                (len(want) + 1, path[seg_start], int(weekly[seg_start][0]),
                 int(weekly[i - 1][0]), i - seg_start,
                 sum(xs[seg_start:i]))
            )
            seg_start = i
    got = sorted(
        (r["seg_id"], r["state"], r["w_start"], r["w_end"], r["n_weeks"],
         r["total_x"])
        for r in ALL_QUERIES["q402_burst_segmentation"](spark, SF)
        .collect()
    )
    assert got == want
    # Viterbi optimality: the DP cost beats the two constant paths and
    # equals the forward-computed cost of the emitted path
    n = len(xs)
    assert best_cost == _path_cost(xs, path, mu0, mu1, gam)
    assert best_cost <= _path_cost(xs, [0] * n, mu0, mu1, gam)
    assert best_cost <= _path_cost(xs, [1] * n, mu0, mu1, gam)
    # segments alternate and tile the week range contiguously
    for (s1, st1, _ws1, we1, _n1, _t1), (s2, st2, ws2, _we2, _n2, _t2) in zip(
        got, got[1:]
    ):
        assert s2 == s1 + 1 and st2 != st1 and ws2 > we1
    assert sum(n for _, _, _, _, n, _ in got) == n


def test_q403_pure_python_recompute_and_equal_multiset_law(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, source, COALESCE(n_chars, 0) "
        f"FROM '{SF}/documents.parquet'"
    ).fetchall()
    by_src: dict[str, list[tuple[int, int]]] = {}
    for d, s, v in docs:
        by_src.setdefault(s, []).append((int(v), int(d)))
    ranked = {}
    rank_vals: dict[int, list[int]] = {}
    for s, lst in by_src.items():
        for i, (v, d) in enumerate(sorted(lst), start=1):
            ranked[d] = (s, i, v)
            rank_vals.setdefault(i, []).append(v)
    ref = {r: sum(vs) // len(vs) for r, vs in rank_vals.items()}
    want = {
        d: (s, r, v, ref[r]) for d, (s, r, v) in ranked.items()
    }
    got = {
        r["doc_id"]: (r["source"], r["rnk"], r["v_before"], r["v_after"])
        for r in ALL_QUERIES["q403_quantile_normalization"](spark, SF)
        .collect()
    }
    assert got == want
    # the law the operator exists for: after normalization every
    # equal-sized source carries the IDENTICAL value multiset
    sizes = {s: len(lst) for s, lst in by_src.items()}
    full = max(sizes.values())
    after: dict[str, list[int]] = {}
    for s, _r, _v, va in got.values():
        after.setdefault(s, []).append(va)
    ref_multiset = None
    for s, vs in after.items():
        if sizes[s] == full:
            vs = sorted(vs)
            if ref_multiset is None:
                ref_multiset = vs
            assert vs == ref_multiset
    # rank-monotone: v_after non-decreasing in rank within any source
    per_src: dict[str, list[tuple[int, int]]] = {}
    for _d, (s, r, _v, va) in got.items():
        per_src.setdefault(s, []).append((r, va))
    for s, lst in per_src.items():
        vals = [va for _r, va in sorted(lst)]
        assert vals == sorted(vals)


def test_q404_pure_python_recompute(spark):
    import datetime

    daily = dict(
        duckdb.sql(
            f"SELECT CAST(o_orderdate AS DATE),"
            f" CAST(SUM(FLOOR(o_totalprice * 100)) AS BIGINT)"
            f" FROM '{SF}/orders.parquet' GROUP BY 1"
        ).fetchall()
    )
    losses = []
    for d, rev in daily.items():
        prev = daily.get(d - datetime.timedelta(days=1))
        if prev is not None:
            losses.append((int(prev) - int(rev), d))
    losses.sort(key=lambda t: (-t[0], t[1]))
    vals = [v for v, _ in losses]
    n = len(vals)
    want = {}
    for lvl, k in ((95, (n + 19) // 20), (99, (n + 99) // 100)):
        want[lvl] = (n, k, vals[k - 1], sum(vals[:k]) // k)
    got = {
        r["level_pct"]: (r["n_days"], r["tail_k"], r["var_cents"],
                         r["es_cents"])
        for r in ALL_QUERIES["q404_var_expected_shortfall"](spark, SF)
        .collect()
    }
    assert got == want
    # coherence-flavored laws: ES dominates VaR at the same level, and
    # the deeper tail is at least as bad on both measures
    for lvl in (95, 99):
        assert got[lvl][3] >= got[lvl][2]
    assert got[99][2] >= got[95][2] and got[99][3] >= got[95][3]


def test_q405_pure_python_rake_recompute(spark):
    from etl_globalretail_spark.operators.text import LANG_STOPWORDS

    stop = set(LANG_STOPWORDS["en"])
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    phrases: list[list[str]] = []
    for _d, text in docs:
        run: list[str] = []
        for t in text.strip().split():
            if t in stop:
                if run:
                    phrases.append(run)
                run = []
            else:
                run.append(t)
        if run:
            phrases.append(run)
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph)
    ws = {w: deg[w] * 1000 // freq[w] for w in freq}
    agg: dict[str, list[int]] = {}
    for ph in phrases:
        key = " ".join(ph)
        cell = agg.setdefault(key, [0, 0])
        cell[0] += 1
        cell[1] += sum(ws[w] for w in ph)
    scored = sorted(
        (-(tot // n), p, n) for p, (n, tot) in agg.items()
    )
    want = [
        (p, n, -negs, i + 1) for i, (negs, p, n) in enumerate(scored[:10])
    ]
    got = sorted(
        (r["phrase"], r["n_occ"], r["score_permil"], r["rnk"])
        for r in ALL_QUERIES["q405_rake_keyphrases"](spark, SF).collect()
    )
    assert got == sorted(want)
    # RAKE's defining behaviors: no phrase contains a stopword, and a
    # word appearing only in long phrases outscores the same-frequency
    # word living in short ones (degree dominates)
    for p, _n, _s, _r in got:
        assert not (set(p.split()) & stop)
    assert ws == {w: deg[w] * 1000 // freq[w] for w in freq}


def test_q406_pure_python_recompute_and_smoothing_laws(spark):
    weekly = sorted(
        duckdb.sql(
            f"""
            SELECT date_diff('day', DATE '1970-01-05',
                             CAST(o_orderdate AS DATE)) // 7, count(*)
            FROM '{SF}/orders.parquet' GROUP BY 1
            """
        ).fetchall()
    )
    xs = [int(x) for _, x in weekly]
    lvl, ses_err, naive_err = xs[0], 0, 0
    levels = [lvl]
    for prev, x in zip(xs, xs[1:]):
        ses_err += abs(x - lvl)
        naive_err += abs(x - prev)
        lvl = (x + 3 * lvl) // 4
        levels.append(lvl)
    n = len(xs) - 1
    got = {
        r["model"]: (r["n_eval"], r["sum_abs_err"], r["mae_milli"])
        for r in ALL_QUERIES["q406_exponential_smoothing"](spark, SF)
        .collect()
    }
    assert got == {
        "ses_q4": (n, ses_err, ses_err * 1000 // n),
        "naive1": (n, naive_err, naive_err * 1000 // n),
    }
    # smoothing law: the level always sits inside the running data
    # envelope (a convex-combination fold, up to truncation dust)
    lo, hi = min(xs), max(xs)
    assert all(lo - 1 <= lv <= hi for lv in levels)
    # constant-series fixpoint of the cleared-rational fold
    c = 17
    lv = c
    for _ in range(10):
        lv = (c + 3 * lv) // 4
    assert lv == c


def test_q407_streaming_ledger_recompute(spark):
    """Boundary heads match a from-scratch Python chain over the
    (wave, event_id) order; every shard's chain EXTENDS across batches
    (the carried-head seeding is load-bearing); row counts conserve."""
    import hashlib

    rows = duckdb.sql(
        f"""
        SELECT event_id, user_id, event_type,
               CAST(FLOOR(value * 100) AS BIGINT), ts
        FROM '{SF}/events.parquet' WHERE event_type = 'purchase'
        """
    ).fetchall()
    max_ts = duckdb.sql(
        f"SELECT MAX(ts) FROM '{SF}/events.parquet'"
    ).fetchone()[0]

    def wave(eid, ts):
        if eid % 8 == 4 and ts != max_ts:
            return 1
        if eid % 8 == 0 and ts != max_ts:
            return 2
        return 0

    per_shard: dict[int, list] = {}
    for eid, uid, et, cents, ts in rows:
        d = hashlib.md5(
            f"led|{eid}|{uid}|{et}|{cents}".encode()
        ).hexdigest()
        per_shard.setdefault(int(uid) % 8, []).append(
            (wave(int(eid), ts), int(eid), d)
        )
    want = {}
    for s, lst in per_shard.items():
        h = "genesis"
        lst.sort()
        counts: dict[int, int] = {}
        for w, _eid, d in lst:
            h = hashlib.md5((h + d).encode()).hexdigest()
            counts[w] = counts.get(w, 0) + 1
            want[(w, s)] = (counts[w], h)
    got = {
        (r["batch_id"], r["shard"]): (r["n_rows"], r["head"])
        for r in ALL_QUERIES["q407_streaming_ledger"](spark, SF).collect()
    }
    assert got == want
    # every shard appears in all 3 batches, heads all distinct
    shards = {s for _b, s in got}
    for s in shards:
        bs = [b for b, s2 in got if s2 == s]
        assert sorted(bs) == [0, 1, 2]
    assert len({h for _n, h in got.values()}) == len(got)
    assert sum(n for n, _h in got.values()) == len(rows)


def test_q408_pure_python_recompute(spark):
    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    per: dict[str, set] = {}
    for src, text in docs:
        toks = text.strip().split()
        s = per.setdefault(src, set())
        for i in range(len(toks) - 4):
            s.add(" ".join(toks[i:i + 5]))
    want = {}
    srcs = sorted(per, key=lambda x: int(x[3:]))  # numeric source order
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(per[a] & per[b])
            if inter:
                na, nb = len(per[a]), len(per[b])
                want[(a, b)] = (
                    inter, na, nb, inter * 1000 // (na + nb - inter)
                )
    got = {
        (r["src_a"], r["src_b"]): (r["n_shared"], r["n_a"], r["n_b"],
                                   r["jaccard_permil"])
        for r in ALL_QUERIES["q408_source_contamination_matrix"](
            spark, SF
        ).collect()
    }
    assert got == want
    # the audit's useful shape: strictly fewer than all pairs overlap
    # (clean pairs exist), and jaccard is a valid similarity
    n_src = len(srcs)
    assert 0 < len(got) < n_src * (n_src - 1) // 2
    for inter, na, nb, j in got.values():
        assert 0 < inter <= min(na, nb)
        assert 0 <= j <= 1000  # permil truncation can floor tiny overlaps


def test_q409_pure_python_recompute(spark):
    daily = duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE), count(*) "
        f"FROM '{SF}/orders.parquet' GROUP BY 1"
    ).fetchall()
    s = sum(int(x) for _, x in daily)
    nd = len(daily)
    per: dict[int, list[int]] = {}
    for d, x in daily:
        # Python isoweekday: Mon=1..Sun=7; Spark dayofweek: Sun=1..Sat=7
        dow = d.isoweekday() % 7 + 1
        cell = per.setdefault(dow, [0, 0])
        cell[0] += 1
        cell[1] += int(x)
    want = {
        dow: (n_days, n_orders, n_orders * nd * 1000 // (n_days * s))
        for dow, (n_days, n_orders) in per.items()
    }
    got = {
        r["dow"]: (r["n_days"], r["n_orders"], r["index_permil"])
        for r in ALL_QUERIES["q409_dow_seasonal_index"](spark, SF)
        .collect()
    }
    assert got == want
    # conservation: day counts and order counts tile the series, and
    # the order-weighted index mass reconstructs ~1000 exactly in the
    # unquantized fraction (checked via cross-multiplication)
    assert sum(v[0] for v in got.values()) == nd
    assert sum(v[1] for v in got.values()) == s
    assert set(got) <= set(range(1, 8))


def test_q410_pure_python_recompute_and_did_laws(spark):
    from fractions import Fraction

    rows = duckdb.sql(
        f"""
        SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 'treat'
                    ELSE 'ctrl' END,
               CASE WHEN EXTRACT(year FROM o.o_orderdate) = 1996
                    THEN 'post' ELSE 'pre' END,
               count(*), CAST(SUM(FLOOR(o.o_totalprice * 100)) AS BIGINT)
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
          AND EXTRACT(year FROM o.o_orderdate) IN (1995, 1996)
        GROUP BY 1, 2
        """
    ).fetchall()
    cells = {(g, p): (int(n), int(s)) for g, p, n, s in rows}
    m = {k: Fraction(s, n) for k, (n, s) in cells.items()}
    did_exact = (
        m[("treat", "post")] - m[("treat", "pre")]
        - (m[("ctrl", "post")] - m[("ctrl", "pre")])
    ) * 1_000_000
    # truncate toward zero
    did = int(did_exact) if did_exact >= 0 else -int(-did_exact)
    got = ALL_QUERIES["q410_difference_in_differences"](
        spark, SF
    ).collect()[0]
    assert (got["n_tp"], got["n_tr"], got["n_cp"], got["n_cr"]) == (
        cells[("treat", "post")][0], cells[("treat", "pre")][0],
        cells[("ctrl", "post")][0], cells[("ctrl", "pre")][0],
    )
    for col, key in (
        ("m_tp_milli", ("treat", "post")), ("m_tr_milli", ("treat", "pre")),
        ("m_cp_milli", ("ctrl", "post")), ("m_cr_milli", ("ctrl", "pre")),
    ):
        n, s = cells[key]
        assert got[col] == s * 1000 // n
    assert got["did_micro_cents"] == did
    # DiD identities: swapping treat/ctrl flips the sign; equal trends
    # on a constructed grid give exactly zero
    def did_of(mm):
        v = (mm["tp"] - mm["tr"] - (mm["cp"] - mm["cr"])) * 1_000_000
        return int(v) if v >= 0 else -int(-v)

    base = {"tp": Fraction(12), "tr": Fraction(10),
            "cp": Fraction(8), "cr": Fraction(7)}
    flipped = {"tp": base["cp"], "tr": base["cr"],
               "cp": base["tp"], "cr": base["tr"]}
    assert did_of(base) == -did_of(flipped)
    parallel = {"tp": Fraction(15), "tr": Fraction(10),
                "cp": Fraction(9), "cr": Fraction(4)}
    assert did_of(parallel) == 0


def test_q411_pure_python_recompute_and_hhi_laws(spark):
    rows = duckdb.sql(
        f"""
        SELECT c.c_nationkey, o.o_custkey,
               CAST(SUM(FLOOR(o.o_totalprice * 100)) AS BIGINT)
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
        """
    ).fetchall()
    per: dict[int, list[int]] = {}
    for nat, _cust, s in rows:
        per.setdefault(int(nat), []).append(int(s))
    want = {}
    for nat, ss in per.items():
        tot = sum(ss)
        hhi = sum(x * x for x in ss) * 10000 // (tot * tot)
        cls = ("high" if hhi >= 2500
               else "moderate" if hhi >= 1500 else "unconcentrated")
        want[nat] = (len(ss), tot, hhi, 10000 // len(ss), cls)
    got = {
        r["nation"]: (r["n_cust"], r["revenue_cents"], r["hhi_bp"],
                      r["floor_bp"], r["doj_class"])
        for r in ALL_QUERIES["q411_hhi_concentration"](spark, SF)
        .collect()
    }
    assert got == want
    # HHI bounds: equal-share floor <= hhi <= 10000 (monopoly); the
    # floor is truncation-tight so allow the -1 quantization slack
    for n_cust, _tot, hhi, floor_bp, _cls in got.values():
        assert floor_bp - 1 <= hhi <= 10_000
    # hand cases: monopoly = 10000; two equal firms = 5000
    assert sum(x * x for x in [7]) * 10000 // 49 == 10_000
    assert sum(x * x for x in [5, 5]) * 10000 // 100 == 5_000
