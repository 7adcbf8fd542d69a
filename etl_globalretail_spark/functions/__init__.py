from etl_globalretail_spark.functions.cleansing import (  # noqa: F401
    classify_promotion_type,
    classify_store_type,
    clean_text,
    clean_text_exact,
    composite_id,
    is_capital,
    norm_key,
    standardize_customer_category,
    standardize_name,
    standardize_product_category,
    standardize_region,
)
from etl_globalretail_spark.functions.dates import (  # noqa: F401
    calendar_attributes,
    parse_multiformat_date,
)
from etl_globalretail_spark.functions.numeric import (  # noqa: F401
    extract_discount_pct,
    sales_measures,
)
