"""ecommerce_etl_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark re-expression of the analytical surface of the
reference e-commerce ETL platform (abilfarabil/ecommerce-etl-pipeline): typed
scans with dirty-data tolerance, derived-column feature engineering (incl.
nested-JSON array ops), multi-aggregate group-bys, small-dimension broadcast
joins, quantile/fixed binning, top-k, seeded / referential-integrity sampling
and star-schema writes — plus the large-scale training-data operations the
reference gestures at (dedup, similarity search, text analysis, multimodal
columns, streaming).

Design stance (see SURVEY.md §7): everything is a *lazy DataFrame program*.
Catalyst supplies predicate pushdown, column pruning, join selection, partial
aggregation and AQE; this library adds only thin, well-tested composition —
no custom planner, no RDDs, no row-at-a-time Python in the hot path.
"""

__version__ = "0.1.0"

from ecommerce_etl_pipeline_spark.session import get_spark  # noqa: F401
