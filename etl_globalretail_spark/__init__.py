"""etl_globalretail_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL (JezzDiego/ETL-GlobalRetail): a retail
star-schema build (dimensions + fact with surrogate keys), a cleansing
function library, and the analytical query surface the warehouse exists to
serve — plus the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) that make the engine
useful at 100 TB.

Design stance (see SURVEY.md §7): everything is declarative DataFrame/SQL so
Catalyst owns the physical plan — broadcast hash joins for dimension lookups,
predicate pushdown + column pruning into parquet scans, AQE for runtime
re-planning. Python UDFs appear only where built-ins cannot express the
semantics, and then always Arrow-vectorized.
"""

__version__ = "0.1.0"
