"""Text-cleansing column builders (reference F1-F8, F13, F15).

Every function here returns a pyspark Column built from JVM-side built-ins
(whole-stage-codegen'd, Catalyst-optimizable) — no Python in the hot path.
Semantics replicate /root/reference/etl_completo.py:940-1054; file:line cites
on each builder.

One deliberate divergence, flagged where it occurs: Python ``str.title()``
and Spark ``initcap`` differ on apostrophes/digits ("o'neil" → "O'Neil" vs
"O'neil"). The Column builders use ``initcap`` (fast path); ``clean_text_exact``
is the Arrow-vectorized bit-exact fallback for callers that need Python
``.title()`` behavior byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Portuguese connectors kept lowercase inside names (etl_completo.py:957).
NAME_CONNECTORS = ("da", "de", "do", "das", "dos", "e", "em", "na", "no", "com")

# 9-entry canonical region map (etl_completo.py:975-985).
REGION_MAP = {
    "rio de janeiro": "Rio de Janeiro",
    "são paulo": "São Paulo",
    "minas gerais": "Minas Gerais",
    "mato grosso": "Mato Grosso",
    "mato grosso do sul": "Mato Grosso do Sul",
    "rio grande do sul": "Rio Grande do Sul",
    "rio grande do norte": "Rio Grande do Norte",
    "espírito santo": "Espírito Santo",
    "distrito federal": "Distrito Federal",
}

# 27 Brazilian capitals → UF code (etl_completo.py:992-999). The reference
# compares full state names from data against these 2-letter codes, so the
# predicate is latently always-false on typical data; we replicate the
# literal dict for fidelity (SURVEY.md §7.4 documents the bug).
CAPITALS = {
    "Rio Branco": "AC", "Maceió": "AL", "Macapá": "AP", "Manaus": "AM",
    "Salvador": "BA", "Fortaleza": "CE", "Brasília": "DF", "Vitória": "ES",
    "Goiânia": "GO", "São Luís": "MA", "Cuiabá": "MT", "Campo Grande": "MS",
    "Belo Horizonte": "MG", "Belém": "PA", "João Pessoa": "PB", "Curitiba": "PR",
    "Recife": "PE", "Teresina": "PI", "Rio de Janeiro": "RJ", "Natal": "RN",
    "Porto Alegre": "RS", "Porto Velho": "RO", "Boa Vista": "RR",
    "Florianópolis": "SC", "São Paulo": "SP", "Aracaju": "SE", "Palmas": "TO",
}


def _collapse_ws(col: Column) -> Column:
    # Collapse BEFORE trimming: trim only strips 0x20, so a pure-\n input
    # must first become ' ' to be trimmed away — otherwise cleaning is not
    # idempotent (f('\n') = ' ' but f(' ') = ''). Matches the reference's
    # strip()-then-sub, which also maps all-whitespace to ''.
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def clean_text(col: Column) -> Column:
    """F1 (etl_completo.py:940-949): null/empty → 'N/A'; collapse whitespace;
    title-case. ``initcap`` stands in for Python ``.title()`` (see module doc).
    Note the reference treats '' as falsy → 'N/A'; so do we.

    The sentinel itself must round-trip: ``.title()`` keeps 'N/A' (capitals
    follow any non-letter) but ``initcap`` would yield 'N/a', so re-cleaning
    already-clean data would corrupt the sentinel — branch it explicitly.
    """
    cleaned = F.initcap(_collapse_ws(col))
    return (
        F.when(col.isNull() | (col == ""), F.lit("N/A"))
        .when(F.upper(F.trim(col)) == "N/A", F.lit("N/A"))
        .otherwise(cleaned)
    )


def clean_text_exact(colname: str) -> Column:
    """Bit-exact F1 via an Arrow-vectorized pandas UDF (Python ``.title()``
    semantics, including apostrophe/digit word boundaries). Opt-in slow path.
    """
    import pandas as pd
    import re as _re
    from pyspark.sql.functions import pandas_udf

    def _clean(s):
        def one(x):
            if x is None or x == "":
                return "N/A"
            return _re.sub(r"\s+", " ", str(x).strip()).title()

        return s.map(one)

    # `from __future__ import annotations` stringifies hints, which Spark's
    # pandas_udf hint parser cannot resolve — attach real objects instead.
    _clean.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_clean, "string")(colname)


def standardize_name(col: Column) -> Column:
    """F2 (etl_completo.py:951-968): title-case each word except Portuguese
    connectors (lowercased), first word always capitalized; null/''/'N/A'
    pass through unchanged.

    Pure expression: split → ``transform`` with index → ``array_join``. The
    lambda compiles into codegen'd HigherOrderFunction — no UDF.
    """
    words = F.split(_collapse_ws(col), " ")
    mapped = F.transform(
        words,
        lambda w, i: F.when(
            (i == 0) | ~F.lower(w).isin(*NAME_CONNECTORS), F.initcap(w)
        ).otherwise(F.lower(w)),
    )
    return F.when(col.isNull() | (col == "") | (col == "N/A"), col).otherwise(
        F.array_join(mapped, " ")
    )


def standardize_region(col: Column) -> Column:
    """F3 (etl_completo.py:970-988): 9-entry canonical map on
    lower(strip(x)), else title-case; null/'' → 'Não Definido'.
    """
    key = F.lower(F.trim(col))
    expr = F.initcap(col)
    # Chained when() over a 9-entry literal map — constant-folded by Catalyst.
    for k, v in REGION_MAP.items():
        expr = F.when(key == k, F.lit(v)).otherwise(expr)
    return F.when(col.isNull() | (col == ""), F.lit("Não Definido")).otherwise(expr)


def is_capital(city: Column, state: Column) -> Column:
    """F4 (etl_completo.py:990-1002): (city, state) membership in the
    27-capital dict. Expressed as membership in a literal map — Catalyst
    folds it; no join needed at 27 entries.
    """
    pairs = F.create_map(
        *[x for c, uf in CAPITALS.items() for x in (F.lit(c), F.lit(uf))]
    )
    return F.coalesce(pairs[city] == state, F.lit(False))


def standardize_customer_category(col: Column) -> Column:
    """F5 (etl_completo.py:1004-1017): substring rules → Premium/Gold/Silver,
    else 'Padrão'; null/'' → 'Não Definido'.
    """
    low = F.lower(col)
    return (
        F.when(col.isNull() | (col == ""), F.lit("Não Definido"))
        .when(low.contains("vip") | low.contains("premium"), F.lit("Premium"))
        .when(low.contains("gold") | low.contains("ouro"), F.lit("Gold"))
        .when(low.contains("silver") | low.contains("prata"), F.lit("Silver"))
        .otherwise(F.lit("Padrão"))
    )


def standardize_product_category(col: Column) -> Column:
    """F6 (etl_completo.py:1019-1024): title-case; null/'' → 'Não Definido'."""
    return F.when(col.isNull() | (col == ""), F.lit("Não Definido")).otherwise(
        F.initcap(col)
    )


def classify_store_type(col: Column) -> Column:
    """F7 (etl_completo.py:1026-1039)."""
    low = F.lower(col)
    return (
        F.when(col.isNull() | (col == ""), F.lit("Loja Padrão"))
        .when(low.contains("shopping") | low.contains("mall"), F.lit("Shopping"))
        .when(low.contains("centro"), F.lit("Centro"))
        .when(low.contains("outlet"), F.lit("Outlet"))
        .otherwise(F.lit("Loja Padrão"))
    )


def classify_promotion_type(col: Column) -> Column:
    """F8 (etl_completo.py:1041-1054)."""
    low = F.lower(col)
    return (
        F.when(col.isNull() | (col == ""), F.lit("Desconto Geral"))
        .when(low.contains("black"), F.lit("Black Friday"))
        .when(low.contains("natal"), F.lit("Natal"))
        .when(low.contains("liquidação"), F.lit("Liquidação"))
        .otherwise(F.lit("Desconto Geral"))
    )


def norm_key(col: Column) -> Column:
    """F13 (etl_completo.py:562-566, 475-476): case/whitespace-insensitive
    compare key — the derived join key for J3.
    """
    return F.lower(F.trim(col))


def composite_id(*cols: Column) -> Column:
    """F15 (etl_completo.py:686): ``f"{id_venda}_{id_prod}"`` composite key."""
    return F.concat_ws("_", *cols)
