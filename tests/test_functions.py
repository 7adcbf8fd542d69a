"""Scalar function library (F1-F16) against hand-computed expectations.

The reference semantics are etl_completo.py:940-1054 (see each builder's
docstring); the divergence policy for Python ``.title()`` vs ``initcap`` is
SURVEY.md §7.4 — these tests pin OUR contract, including the documented
divergences.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_globalretail_spark.functions import (
    classify_promotion_type,
    classify_store_type,
    clean_text,
    composite_id,
    is_capital,
    parse_multiformat_date,
    standardize_customer_category,
    standardize_name,
    standardize_product_category,
    standardize_region,
)
from etl_globalretail_spark.functions.cleansing import clean_text_exact
from etl_globalretail_spark.functions.dates import calendar_attributes
from etl_globalretail_spark.functions.numeric import (
    extract_discount_pct,
    margin_pct,
    sales_measures,
)


def apply_one(spark, builder, values, colname="x"):
    df = spark.createDataFrame([(v,) for v in values], f"{colname} string")
    return [r.out for r in df.select(builder(F.col(colname)).alias("out")).collect()]


def test_clean_text(spark):
    out = apply_one(
        spark,
        clean_text,
        [None, "", "  joão   da  silva  ", "ABC", "a\t\nb"],
    )
    assert out == ["N/A", "N/A", "João Da Silva", "Abc", "A B"]


def test_clean_text_exact_matches_python_title(spark):
    vals = [None, "", "o'neil store", "abc1abc", "  x  y "]
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    out = [r.out for r in df.select(clean_text_exact("x").alias("out")).collect()]
    import re

    def ref(v):
        if not v:
            return "N/A"
        return re.sub(r"\s+", " ", str(v).strip()).title()

    assert out == [ref(v) for v in vals]
    # the documented divergence: initcap keeps o'neil lowercase after '
    fast = apply_one(spark, clean_text, ["o'neil store"])
    assert fast == ["O'neil Store"]  # .title() would give "O'Neil Store"


def test_standardize_name_connectors(spark):
    out = apply_one(
        spark,
        standardize_name,
        [None, "N/A", "maria de souza", "de souza", "JOSE DOS SANTOS E SILVA"],
    )
    assert out == [
        None,
        "N/A",
        "Maria de Souza",
        "De Souza",  # first word always capitalized
        "Jose dos Santos e Silva",
    ]


def test_standardize_region_map_and_fallback(spark):
    out = apply_one(
        spark,
        standardize_region,
        [None, "", "  são paulo ", "SÃO PAULO", "bahia", "mato grosso do sul"],
    )
    assert out == [
        "Não Definido",
        "Não Definido",
        "São Paulo",
        "São Paulo",
        "Bahia",
        "Mato Grosso do Sul",
    ]


def test_is_capital_replicates_reference_bug(spark):
    df = spark.createDataFrame(
        [
            ("São Paulo", "SP"),  # matches only with UF code
            ("São Paulo", "São Paulo"),  # full state name: always False (bug)
            ("Campinas", "SP"),
            (None, None),
        ],
        "city string, state string",
    )
    out = [
        r.out
        for r in df.select(
            is_capital(F.col("city"), F.col("state")).alias("out")
        ).collect()
    ]
    assert out == [True, False, False, False]


def test_category_and_classifiers(spark):
    assert apply_one(
        spark,
        standardize_customer_category,
        [None, "cliente VIP", "Premium x", "gold", "PRATA", "outro"],
    ) == ["Não Definido", "Premium", "Premium", "Gold", "Silver", "Padrão"]
    assert apply_one(
        spark, standardize_product_category, [None, "eletrônicos de casa"]
    ) == ["Não Definido", "Eletrônicos De Casa"]
    assert apply_one(
        spark,
        classify_store_type,
        [None, "Shopping Norte", "MALL sul", "Loja do Centro", "Outlet X", "Y"],
    ) == ["Loja Padrão", "Shopping", "Shopping", "Centro", "Outlet", "Loja Padrão"]
    assert apply_one(
        spark,
        classify_promotion_type,
        [None, "BLACK week", "Natal 2024", "liquidação total", "promo"],
    ) == ["Desconto Geral", "Black Friday", "Natal", "Liquidação", "Desconto Geral"]


def test_parse_multiformat_date(spark):
    out = apply_one(
        spark,
        parse_multiformat_date,
        ["2024-02-03", "03/02/2024", "Data Inválida", "N/A", "NULL", "", "junk",
         " 2024-02-03 "],
    )
    d = datetime.date(2024, 2, 3)
    assert out == [d, d, None, None, None, None, None, d]


def test_calendar_attributes(spark):
    df = spark.createDataFrame(
        [(datetime.date(2024, 1, 1),), (datetime.date(2024, 7, 6),)], "d date"
    )
    attrs = calendar_attributes(F.col("d"))
    rows = df.withColumns(attrs).collect()
    mon = rows[0]  # 2024-01-01 is a Monday
    assert (mon.ano, mon.mes, mon.dia, mon.trimestre, mon.semestre) == (
        2024, 1, 1, 1, 1,
    )
    assert (mon.dia_semana, mon.nome_dia_semana, mon.nome_mes, mon.eh_fim_semana) == (
        1, "Segunda-feira", "Janeiro", False,
    )
    sat = rows[1]  # 2024-07-06 is a Saturday
    assert (sat.dia_semana, sat.nome_dia_semana, sat.semestre, sat.eh_fim_semana) == (
        6, "Sábado", 2, True,
    )


def test_extract_discount_pct(spark):
    out = apply_one(
        spark,
        extract_discount_pct,
        [None, "10% off", "desconto 12.5 pontos", "sem numero", "3"],
    )
    assert out == [0.0, 10.0, 12.5, 0.0, 3.0]


def test_sales_measures_identities(spark):
    df = spark.createDataFrame(
        [(5.0, 10.0, 7.0, 20.0), (-1.0, 10.0, 7.0, 0.0), (3.0, -2.0, 1.0, 50.0)],
        "qty double, price double, cost double, pct double",
    )
    m = sales_measures(
        F.col("qty"), F.col("price"), F.col("cost"), discount_pct=F.col("pct")
    )
    rows = df.withColumns(m).collect()
    for r in rows:
        assert r.valor_total_item == r.quantidade_vendida * r.preco_unitario_venda
        assert r.valor_desconto == pytest.approx(
            r.valor_total_item * r.percentual_desconto / 100.0
        )
        assert r.valor_final == pytest.approx(r.valor_total_item - r.valor_desconto)
        assert r.lucro_bruto == pytest.approx(r.valor_final - r.custo_total_item)
    # P7 guards
    assert rows[1].quantidade_vendida == 0.0
    assert rows[2].preco_unitario_venda == 0.0


def test_margin_pct_zero_price_guard(spark):
    df = spark.createDataFrame([(10.0, 7.0), (0.0, 7.0)], "p double, c double")
    out = [
        r.m for r in df.select(margin_pct(F.col("p"), F.col("c")).alias("m")).collect()
    ]
    assert out[0] == pytest.approx(30.0)
    assert out[1] == 0.0


def test_composite_id(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    out = df.select(composite_id(F.col("a"), F.col("b")).alias("o")).collect()
    assert out[0].o == "1_2"


def test_sentence_split_udtf_lateral(spark):
    """The UDTF fans one row per sentence with stable ids, drops empties,
    and handles NULL text (zero rows)."""
    from etl_globalretail_spark.functions.tablefuncs import (
        register_sentence_split,
    )

    register_sentence_split(spark, "t_sentence_split")
    df = spark.createDataFrame(
        [(1, "One. Two.  Three."), (2, None), (3, "NoPeriod")],
        "id int, text string",
    )
    df.createOrReplaceTempView("t_udtf_docs")
    rows = spark.sql(
        "SELECT d.id, s.sent_id, s.sentence "
        "FROM t_udtf_docs d, LATERAL t_sentence_split(d.text) s"
    ).collect()
    got = {(r.id, r.sent_id): r.sentence for r in rows}
    assert got == {
        (1, 0): "One",
        (1, 1): "Two",
        (1, 2): "Three.",
        (3, 0): "NoPeriod",
    }


def test_user_activity_features_hand_case(spark):
    """Sessions at 30-min gaps, bursts as <60 s runs, integer span."""
    import datetime as dt

    from etl_globalretail_spark.operators.text import user_activity_features

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)

    def ev(i, u, sec):
        return (i, u, "e", t0 + dt.timedelta(seconds=sec))

    rows = [
        # user 1: burst of 3 (0,30,59s), then +45 min (new session),
        # then single event +1s short burst of 2
        ev(1, 1, 0), ev(2, 1, 30), ev(3, 1, 59),
        ev(4, 1, 45 * 60), ev(5, 1, 45 * 60 + 1),
        # user 2: one event
        ev(6, 2, 0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = {r["user_id"]: r for r in user_activity_features(df).collect()}
    u1 = out[1]
    assert u1["n_events"] == 5 and u1["n_sessions"] == 2
    assert u1["longest_burst"] == 3
    assert u1["span_minutes"] == 45
    u2 = out[2]
    assert (u2["n_events"], u2["n_sessions"], u2["longest_burst"],
            u2["span_minutes"]) == (1, 1, 1, 0)
