"""q296 t-closeness: pure-Python recompute of the integer EMD audit from
the parquet, plus the bound law 0 <= t_permil <= 1000 (EMD of two
distributions on an ordered domain, normalized by m-1, is in [0, 1])."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from etl_globalretail_spark.operators.quality import QUERIES


def _recompute(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    ).to_pydict()
    cells = Counter()
    for nk, seg, bal in zip(
        t["c_nationkey"], t["c_mktsegment"], t["c_acctbal"]
    ):
        sens = int(math.floor(float(bal) * 100 + 1000000)) // 100000
        cells[(nk, seg, sens)] += 1
    dom = sorted({s for (_, _, s) in cells})
    g = {s: sum(c for (nk, sg, sv), c in cells.items() if sv == s)
         for s in dom}
    n_total, m = sum(g.values()), len(dom)
    classes = defaultdict(int)
    for (nk, seg, s), c in cells.items():
        classes[(nk, seg)] += c
    out = {}
    for (nk, seg), n_c in classes.items():
        cc = gg = emd = 0
        for s in dom:
            cc += cells.get((nk, seg, s), 0)
            gg += g[s]
            emd += abs(n_total * cc - n_c * gg)
        out[(nk, seg)] = (
            n_c, emd, (emd * 1000) // (n_c * n_total * (m - 1))
        )
    return out


def test_q296_matches_python_recompute(spark, sf_dir):
    got = {
        (r["nationkey"], r["segment"]): (
            r["class_size"], r["emd_num"], r["t_permil"]
        )
        for r in QUERIES["q296_t_closeness"](spark, sf_dir).collect()
    }
    assert got == _recompute(sf_dir)


def test_q296_t_is_a_normalized_distance(spark, sf_dir):
    rows = QUERIES["q296_t_closeness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["t_permil"] <= 1000, r
        assert r["emd_num"] >= 0


def test_q296_degenerate_single_band_is_zero_not_div0(spark, sf_dir, tmp_path):
    """A corpus whose every balance lands in ONE $1000 band (m = 1) must
    yield t_permil = 0 on both engines, not a division by zero — the
    GREATEST(m-1, 1) guard (ADVICE r6). EMD of identical single-point
    distributions is identically 0, so any positive divisor is exact."""
    import duckdb
    import pyarrow as pa

    t = pq.read_table(f"{sf_dir}/customer.parquet")
    const = pa.array([100.0] * len(t), type=t.schema.field("c_acctbal").type)
    t = t.set_column(
        t.schema.get_field_index("c_acctbal"), "c_acctbal", const
    )
    pq.write_table(t, str(tmp_path / "customer.parquet"))

    rows = QUERIES["q296_t_closeness"](spark, str(tmp_path)).collect()
    assert rows and all(r["t_permil"] == 0 and r["emd_num"] == 0
                        for r in rows)

    from etl_globalretail_spark.operators.quality import ORACLE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{tmp_path}/customer.parquet')"
    )
    orows = con.execute(ORACLE["q296_t_closeness"]).fetchall()
    assert orows and all(r[-1] == 0 for r in orows)
