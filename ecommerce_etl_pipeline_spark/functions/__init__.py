"""Scalar / derived-column functions (SURVEY.md §2.9, §2.5)."""

from ecommerce_etl_pipeline_spark.functions.binning import (  # noqa: F401
    fixed_bins,
    quantile_bins,
    quantile_edges,
)
from ecommerce_etl_pipeline_spark.functions.scalar import (  # noqa: F401
    age_years,
    day_name,
    market_position,
    parse_currency,
    pct_ratio,
    safe_div,
    tenure_days,
    zero_guard,
)
