"""Window-function queries — SURVEY.md §2.5 (W1-W3) plus the analytic
surface (lag/lead, frames, sessionization) the reference's clickstream data
implies but never implements.

Windows partition-shuffle once on the partition key and sort within
partitions; at 100 TB the partition key must be high-cardinality (user_id,
custkey — both are) so no single partition explodes. Skewed power-users are
handled by AQE skew splitting for joins, and for windows by capping with a
salt+re-merge if a key ever exceeds executor memory — not needed at these
cardinalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ecommerce_etl_pipeline_spark.functions.binning import fixed_bins
from ecommerce_etl_pipeline_spark.functions.exact_agg import exact_sum
from ecommerce_etl_pipeline_spark.plans.registry import register
from ecommerce_etl_pipeline_spark.sources.io import load_table


@register(
    "w2_balance_segments",
    oracle="""
    SELECT CASE WHEN c_acctbal <= 0 THEN 'Debt'
                WHEN c_acctbal <= 2500 THEN 'Low'
                WHEN c_acctbal <= 6000 THEN 'Mid'
                ELSE 'High' END AS balance_segment,
           COUNT(*) AS customer_count
    FROM customer
    GROUP BY 1
    """,
    doc="Fixed-interval bucketing, right-closed (W2) — reference pd.cut "
    "tenure segmentation, customer_analytics_dag.py:88-92.",
)
def w2_balance_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            fixed_bins(F.col("c_acctbal"), [0, 2500, 6000], ["Debt", "Low", "Mid", "High"]).alias(
                "balance_segment"
            )
        )
        .groupBy("balance_segment")
        .agg(F.count(F.lit(1)).alias("customer_count"))
    )


@register(
    "w3_top_orders_per_customer",
    oracle="""
    SELECT customer_id, o_orderkey, o_totalprice, rn AS order_rank
    FROM (
        SELECT o_custkey AS customer_id, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    doc="Top-N per group via row_number (W3) — reference per-product scrape "
    "rank, web_scraping_dag.py:95,111. Deterministic tiebreak on orderkey.",
)
def w3_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            F.col("o_custkey").alias("customer_id"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("order_rank"),
        )
        .filter(F.col("order_rank") <= 3)
    )


@register(
    "w4_sessionize",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_seq
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN date_diff('second',
                        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) <= 1800
                    THEN 0 ELSE 1 END AS is_new
        FROM events
    )
    """,
    doc="Clickstream sessionization: lag + gap threshold + running sum "
    "(SURVEY §2.5 note — the analytic surface the reference's click_stream "
    "table implies). 30-minute inactivity gap; one shuffle on user_id "
    "serves both window passes.",
)
def w4_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order = [F.asc("ts"), F.asc("event_id")]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_lag))
    is_new = F.when(gap <= 1800, F.lit(0)).otherwise(F.lit(1))
    w_run = (
        Window.partitionBy("user_id").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(is_new).over(w_run).cast("int").alias("session_seq"),
    )


@register(
    "w5_cumulative_daily_sales",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) / 100
                   AS day_sales,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_sales_dec
        FROM orders GROUP BY 1
    )
    SELECT order_date, day_sales,
           FLOOR(CAST(SUM(day_sales_dec) OVER (ORDER BY order_date
                                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 * 100 + 0.5) / 100 AS running_sales
    FROM daily
    """,
    doc="Running total over an explicit frame (rowsBetween) on top of the "
    "daily rollup (A1+frame spec). The cumulative sum stays in exact decimal "
    "until the final cast. Single-partition window over |days| rows only — "
    "fine at any fact size since it runs post-aggregation.",
)
def w5_cumulative_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.exact_agg import dec, portable_round

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        exact_sum("o_totalprice").alias("day_sales"),
        F.sum(dec("o_totalprice", 2)).alias("day_sales_dec"),
    )
    # EXPECTED WindowExec "No Partition Defined" WARN: this global window
    # runs over the DAILY ROLLUP (|distinct days| rows, ~2.4k for 7 years),
    # never the fact table — bounded by design;
    # tests/test_plans.py::test_moving_avg_runs_over_daily_rollup pins the
    # rollup-first shape for the same family.
    w = Window.orderBy("order_date").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "order_date",
        "day_sales",
        portable_round(F.sum("day_sales_dec").over(w).cast("double"), 2).alias("running_sales"),
    )


@register(
    "w6_event_gaps",
    oracle="""
    SELECT user_id, event_id,
           CAST(date_diff('second', ts,
                LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT)
               AS seconds_to_next,
           RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank
    FROM events
    """,
    doc="lead() gap-to-next plus rank() (analytic window surface, SURVEY "
    "§2.5 note). Same user_id shuffle serves both windows.",
)
def w6_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_t = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    w_v = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        "user_id",
        "event_id",
        (F.unix_timestamp(F.lead("ts").over(w_t)) - F.unix_timestamp("ts")).alias(
            "seconds_to_next"
        ),
        F.rank().over(w_v).alias("value_rank"),
    )


@register(
    "w7_moving_avg_7d",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS daily_total
        FROM orders
        GROUP BY 1
    )
    SELECT order_date,
           FLOOR(CAST(daily_total AS DOUBLE) * 100 + 0.5) / 100 AS daily_sales,
           FLOOR(CAST(SUM(daily_total) OVER w AS DOUBLE)
                 / COUNT(*) OVER w * 100 + 0.5) / 100 AS moving_avg_7d
    FROM daily
    WINDOW w AS (ORDER BY order_date
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    """,
    doc="Sliding 7-day moving average over the daily sales rollup — a RANGE "
    "(value-based) window frame, the time-series surface the reference's "
    "daily rollup (A1) implies. Spark's rangeBetween needs a numeric order "
    "key, so the frame runs over epoch-days; the decimal daily totals keep "
    "the running sum order-independent for oracle parity. At scale the "
    "window input is one row per day — trivially small after the first "
    "aggregation; no skew concern.",
)
def w7_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("daily_total")
    )
    from ecommerce_etl_pipeline_spark.functions.exact_agg import portable_round

    # EXPECTED WindowExec WARN — global window over the daily rollup only
    # (bounded grain; see w5 note + test_moving_avg_runs_over_daily_rollup).
    w = (
        Window.orderBy(F.datediff("order_date", F.lit("1970-01-01")))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "order_date",
        portable_round(F.col("daily_total").cast("double")).alias("daily_sales"),
        portable_round(
            F.sum("daily_total").over(w).cast("double") / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_7d"),
    )


@register(
    "w8_gapfill_ffill",
    oracle="""
    WITH daily AS (
        SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS day_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_sales
        FROM orders
        WHERE o_totalprice > 400000
        GROUP BY 1, 2
    ),
    spine AS (
        SELECT o_orderpriority,
               CAST(UNNEST(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM daily
        GROUP BY o_orderpriority
    )
    SELECT s.o_orderpriority, s.day,
           CAST(COALESCE(d.day_orders, 0) AS BIGINT) AS day_orders,
           FLOOR(CAST(LAST_VALUE(d.day_sales IGNORE NULLS) OVER (
                     PARTITION BY s.o_orderpriority ORDER BY s.day
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE) * 100 + 0.5) / 100
               AS carried_sales,
           d.day IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d
      ON s.o_orderpriority = d.o_orderpriority AND s.day = d.day
    """,
    doc="Time-spine gap-fill + forward-fill (resample): per-key daily spine "
    "via sequence(min,max) explode, left join of the sparse daily rollup, "
    "last(ignorenulls) running window to carry the previous observation "
    "across gap days — the standard time-series densification every "
    "downstream ML feature pipeline needs (the reference's daily rollup A1 "
    "silently skips empty days). Scale shape: the spine is |keys|x|days| "
    "rows generated AFTER aggregation (never fact-sized); the fill window "
    "partitions on the series key so each series fills independently — one "
    "shuffle on the key serves the join and the window.",
)
def w8_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.exact_agg import dec, portable_round

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(F.col("o_totalprice") > 400000)
        .groupBy(
            "o_orderpriority", F.to_date("o_orderdate").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("day_orders"),
            F.sum(dec("o_totalprice", 2)).alias("day_sales"),
        )
    )
    spine = (
        daily.groupBy("o_orderpriority")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "o_orderpriority",
            F.explode(F.sequence("lo", "hi")).alias("day"),
        )
    )
    joined = spine.join(daily, ["o_orderpriority", "day"], "left")
    w_fill = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "o_orderpriority",
        "day",
        F.coalesce("day_orders", F.lit(0)).cast("bigint").alias("day_orders"),
        portable_round(
            F.last("day_sales", ignorenulls=True).over(w_fill).cast("double")
        ).alias("carried_sales"),
        F.col("day_sales").isNull().alias("is_gap"),
    )


@register(
    "w9_sliding_window",
    oracle="""
    WITH contrib AS (
        SELECT date_trunc('day', ts) AS ws, user_id FROM events
        UNION ALL
        SELECT date_trunc('day', ts) - INTERVAL 1 DAY AS ws, user_id FROM events
    )
    SELECT ws AS window_start,
           ws + INTERVAL 2 DAY AS window_end,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM contrib
    GROUP BY 1, 2
    """,
    doc="Sliding (hopping) event-time window in batch: window(ts, '2 days', "
    "'1 day') assigns each event to duration/slide = 2 overlapping windows "
    "— the batch twin of the streaming tumbling/session windows in "
    "streaming/streams.py, and the aggregation shape behind any "
    "trailing-48h dashboard. Scale shape: the fan-out factor is "
    "duration/slide (bounded, here 2x), applied narrowly before the "
    "partial aggregate, so the shuffle carries (window x group) partials, "
    "not 2x the raw events. Oracle: each event contributes to exactly the "
    "day-aligned window starts floor_day(ts) and floor_day(ts)-1d.",
)
def w9_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "n_users",
        )
    )


@register(
    "w10_scd2_intervals",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
        SELECT user_id, event_type, ts,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM ordered
    ), collapsed AS (
        SELECT user_id, event_type, island,
               MIN(ts) AS valid_from,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM islands
        GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
               AS valid_to,
           n_events,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY island) IS NULL
               AS is_current
    FROM collapsed
    """,
    doc="SCD Type-2 history build from a change log: collapse each user's "
    "consecutive runs of the same event_type into validity intervals "
    "[valid_from, valid_to) with an is_current flag — the gaps-and-islands "
    "window pattern (change flag -> running-sum island id -> collapse -> "
    "lead for the closing edge) that turns an event stream into a "
    "slowly-changing dimension. One shuffle on user_id serves every window "
    "and the collapse groupBy (same key, partitioning reused); "
    "high-cardinality user_id keeps partitions bounded at 100 TB.",
)
def w10_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    islands = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("island"),
    )
    collapsed = islands.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_close = Window.partitionBy("user_id").orderBy("island")
    valid_to = F.lead("valid_from").over(w_close)
    return collapsed.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        valid_to.isNull().alias("is_current"),
    )


@register(
    "w11_salted_hot_keys",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
    doc="Hot-key aggregation through the explicit salting path "
    "(operators/skew.py::salted_aggregate): phase 1 groups by "
    "(user_id, salt) so a pathologically hot user spreads over 16 "
    "reducers, phase 2 merges the partials by the true key — the manual "
    "complement to AQE skew-join splitting, which does NOT split "
    "aggregation groups. The oracle is the plain unsalted GROUP BY: "
    "salting must be a pure physical rewrite with identical results. "
    "Aggregates chosen to be salt-decomposable and order-independent "
    "(count/sum partials re-sum; max re-maxes; cents via FLOOR(value*100) "
    "keeps both engines in exact integer math).",
)
def w11_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        ["user_id"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "value_cents": F.sum(F.floor(F.col("value") * 100)),
            "max_value": F.max("value"),
        },
        merge={
            "n_events": F.sum("n_events").cast("bigint"),
            "value_cents": F.sum("value_cents").cast("bigint"),
            "max_value": F.max("max_value"),
        },
        buckets=16,
    )


@register(
    "w12_funnel_conversion",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'signup') AS t1,
               MIN(ts) FILTER (WHERE event_type = 'view') AS t2,
               MIN(ts) FILTER (WHERE event_type = 'click') AS t3,
               MIN(ts) FILTER (WHERE event_type = 'purchase') AS t4
        FROM events GROUP BY user_id
    ),
    flags AS (
        SELECT (t1 IS NOT NULL) AS s1,
               COALESCE(t2 > t1, FALSE) AS s2,
               COALESCE(t2 > t1 AND t3 > t2, FALSE) AS s3,
               COALESCE(t2 > t1 AND t3 > t2 AND t4 > t3, FALSE) AS s4
        FROM per_user
    ),
    agg AS (
        SELECT CAST(COUNT(*) FILTER (WHERE s1) AS BIGINT) AS n1,
               CAST(COUNT(*) FILTER (WHERE s2) AS BIGINT) AS n2,
               CAST(COUNT(*) FILTER (WHERE s3) AS BIGINT) AS n3,
               CAST(COUNT(*) FILTER (WHERE s4) AS BIGINT) AS n4
        FROM flags
    )
    SELECT stage, n_users,
           floor(CAST(n_users AS DOUBLE) / n1 * 1e6 + 0.5) / 1e6 AS conversion
    FROM (
        SELECT 'signup' AS stage, n1 AS n_users, n1 FROM agg
        UNION ALL SELECT 'view', n2, n1 FROM agg
        UNION ALL SELECT 'click', n3, n1 FROM agg
        UNION ALL SELECT 'purchase', n4, n1 FROM agg
    )
    """,
    doc="Ordered funnel conversion (signup -> view -> click -> purchase): "
    "a user reaches stage k only if the FIRST occurrence of each stage is "
    "strictly later than the previous stage's first occurrence — the "
    "product-analytics query every event pipeline answers. One groupBy "
    "per user with conditional mins (map-side combinable), one tiny "
    "global aggregate, stage fan-out after aggregation; at 100 TB the "
    "only wide stage is the per-user rollup.",
)
def w12_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_etl_pipeline_spark.functions.exact_agg import portable_round

    ev = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t1"),
        first_ts("view").alias("t2"),
        first_ts("click").alias("t3"),
        first_ts("purchase").alias("t4"),
    )
    s1 = F.col("t1").isNotNull()
    s2 = F.coalesce(F.col("t2") > F.col("t1"), F.lit(False))
    s3 = F.coalesce((F.col("t2") > F.col("t1")) & (F.col("t3") > F.col("t2")), F.lit(False))
    s4 = F.coalesce(
        (F.col("t2") > F.col("t1"))
        & (F.col("t3") > F.col("t2"))
        & (F.col("t4") > F.col("t3")),
        F.lit(False),
    )
    agg = per_user.agg(
        F.count(F.when(s1, 1)).alias("n1"),
        F.count(F.when(s2, 1)).alias("n2"),
        F.count(F.when(s3, 1)).alias("n3"),
        F.count(F.when(s4, 1)).alias("n4"),
    )
    stages = F.array(
        *[
            F.struct(F.lit(name).alias("stage"), F.col(n).alias("n_users"))
            for name, n in (
                ("signup", "n1"),
                ("view", "n2"),
                ("click", "n3"),
                ("purchase", "n4"),
            )
        ]
    )
    return (
        agg.select(F.col("n1"), F.explode(stages).alias("s"))
        .select(
            "s.stage",
            "s.n_users",
            portable_round(F.col("s.n_users").cast("double") / F.col("n1"), 6).alias(
                "conversion"
            ),
        )
    )


@register(
    "w13_retention_cohorts",
    oracle="""
    WITH firstw AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cw
        FROM events GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT CAST(cw AS DATE) AS cohort_week,
           CAST((CAST(wk AS DATE) - CAST(cw AS DATE)) / 7 AS INTEGER) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM act JOIN firstw USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Weekly retention cohorts: users grouped by first-seen ISO week, "
    "counted active in each subsequent week — the classic cohort-"
    "retention triangle every product-analytics stack computes. Plan "
    "shape: per-user first-event min (map-side combinable), a distinct "
    "over (user, week) that partial-aggregates before its exchange, one "
    "user-keyed join, and a tiny final rollup — at 100 TB the wide "
    "stages are all user-cardinality, never event-cardinality.",
)
def w13_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    return (
        act.join(firstw, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "w14_last_touch_attribution",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch
        FROM events
    )
    SELECT COALESCE(touch, 'none') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    doc="Last-touch purchase attribution: each purchase credits the most "
    "recent PRIOR non-purchase event of the same user (running "
    "last_value IGNORE NULLS over the user's event sequence — the w8 "
    "forward-fill idiom pointed backwards); first-event purchases "
    "attribute to 'none'. One shuffle on the user key, tiny rollup; "
    "deterministic via (ts, event_id) ordering.",
)
def w14_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("none")).alias("touch_type"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
