"""Date parsing + calendar attribute derivation (reference F9, F11, P5).

All pure Column expressions — the reference's per-row try/except parse loop
(etl_completo.py:615-635) becomes one vectorized ``coalesce(to_date…)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinel strings the reference skips before parsing (etl_completo.py:615,
# 746-750).
DATE_SENTINELS = ("Data Inválida", "N/A", "NULL", "")

# Portuguese day/month names (etl_completo.py:781-790 uses locale-independent
# hardcoded lists in the reference's dim_tempo builder).
PT_DAY_NAMES = (
    "Segunda-feira", "Terça-feira", "Quarta-feira", "Quinta-feira",
    "Sexta-feira", "Sábado", "Domingo",
)
PT_MONTH_NAMES = (
    "Janeiro", "Fevereiro", "Março", "Abril", "Maio", "Junho",
    "Julho", "Agosto", "Setembro", "Outubro", "Novembro", "Dezembro",
)


def parse_multiformat_date(col: Column) -> Column:
    """F9 (etl_completo.py:615-635): try ``YYYY-MM-DD`` then ``DD/MM/YYYY``;
    sentinels and unparseable values → null.

    The reference *drops* rows whose date fails to parse (``continue`` at
    :629,:635); callers reproduce that with ``.filter(parsed.isNotNull())``
    — null-out vs row-drop is the caller's choice, as in SURVEY.md §7.4.
    """
    trimmed = F.trim(col)
    candidate = F.when(trimmed.isin(*DATE_SENTINELS), F.lit(None)).otherwise(trimmed)
    return F.coalesce(
        F.try_to_timestamp(candidate, F.lit("yyyy-MM-dd")).cast("date"),
        F.try_to_timestamp(candidate, F.lit("dd/MM/yyyy")).cast("date"),
    )


def calendar_attributes(date_col: Column) -> dict[str, Column]:
    """F11 (etl_completo.py:781-790): ano, mes, dia, trimestre, semestre,
    dia_semana (1=Mon..7=Sun), Portuguese names, eh_fim_semana.

    Returned as a dict for ``withColumns`` so every attribute derives from
    one date column in a single projection.
    """
    mes = F.month(date_col)
    dia_semana = F.weekday(date_col) + F.lit(1)  # weekday(): Monday=0
    return {
        "ano": F.year(date_col),
        "mes": mes,
        "dia": F.dayofmonth(date_col),
        "trimestre": F.quarter(date_col),
        "semestre": F.when(mes <= 6, F.lit(1)).otherwise(F.lit(2)),
        "dia_semana": dia_semana,
        "nome_dia_semana": F.element_at(
            F.array(*[F.lit(n) for n in PT_DAY_NAMES]), dia_semana
        ),
        "nome_mes": F.element_at(F.array(*[F.lit(n) for n in PT_MONTH_NAMES]), mes),
        "eh_fim_semana": dia_semana >= 6,
    }
