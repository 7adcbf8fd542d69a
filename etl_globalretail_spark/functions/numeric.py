"""Numeric derivations (reference F10, F12, P7, F16).

The fact table's measure math (etl_completo.py:666-683 effective loader;
:885-911 dead-code promo-aware variant) as one-projection Column math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DISCOUNT_RE = r"(\d+(?:\.\d+)?)"


def extract_discount_pct(col: Column) -> Column:
    """F10 (etl_completo.py:731-740): first ``\\d+(\\.\\d+)?`` in the
    discount-type text as a double percent; no match / null → 0.0.

    ``regexp_extract`` yields '' on no match; try_cast('double') turns ''
    into null (ANSI-safe); coalesce restores the reference's 0.0 default.
    """
    return F.coalesce(
        F.regexp_extract(col, DISCOUNT_RE, 1).try_cast("double"), F.lit(0.0)
    )


def positive_or_zero(col: Column) -> Column:
    """P7 (etl_completo.py:666-668): ``x if x > 0 else 0.0``."""
    return F.when(col > 0, col).otherwise(F.lit(0.0))


def sales_measures(
    qty: Column,
    unit_price: Column,
    unit_cost: Column,
    discount_pct: Column | None = None,
) -> dict[str, Column]:
    """F12 (etl_completo.py:666-683; dead loader :885-911): the full measure
    derivation for one fact row, with P7 guards applied to inputs.

    The effective loader hard-codes discount = 0 (etl_completo.py:600) so
    valor_desconto ≡ 0 and valor_final ≡ valor_total_item; pass
    ``discount_pct`` to get the dead-code loader's promo-aware semantics
    (J6) as an explicit variant.
    """
    q = positive_or_zero(qty)
    p = positive_or_zero(unit_price)
    pct = discount_pct if discount_pct is not None else F.lit(0.0)
    valor_total = q * p
    valor_desconto = valor_total * pct / F.lit(100.0)
    valor_final = valor_total - valor_desconto
    custo_total = q * unit_cost
    return {
        "quantidade_vendida": q,
        "preco_unitario_venda": p,
        "valor_total_item": valor_total,
        "custo_unitario": unit_cost,
        "custo_total_item": custo_total,
        "lucro_bruto": valor_final - custo_total,
        "percentual_desconto": pct,
        "valor_desconto": valor_desconto,
        "valor_final": valor_final,
    }


def estimated_cost(unit_price: Column, factor: float = 0.7) -> Column:
    """Reference derives product cost as 70% of price when no supplier cost
    exists (etl_completo.py:388-391)."""
    return unit_price * F.lit(factor)


def margin_pct(unit_price: Column, unit_cost: Column) -> Column:
    """margem = (preco − custo) / preco * 100, null-safe on zero price
    (etl_completo.py:390-391)."""
    return F.when(
        unit_price > 0, (unit_price - unit_cost) / unit_price * F.lit(100.0)
    ).otherwise(F.lit(0.0))
