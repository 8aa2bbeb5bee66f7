"""General relational surface over the driver's TPC-H-ish tables.

The reference has no general query surface (its four join patterns are
hard-coded, SURVEY §2.3) — these operators demonstrate that the engine
this package wraps IS a general analytics engine: multi-way joins with
broadcast dims, grouped/rollup aggregation, window functions, JSON
extraction, sessionization. Every plan is declarative so Catalyst does
join reordering, predicate pushdown, and partial aggregation; at 100 TB
the fact tables (lineitem, orders, events) shuffle at most once on their
join/group keys and every dimension table is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation; only the
    post-aggregation rows (a handful of groups) shuffle."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact-fact join (orders x lineitem) shuffles on
    orderkey; customer/nation/region are broadcast so they never force
    a shuffle of the big side."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


def top_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Join + grouped agg + deterministic top-k (TakeOrderedAndProject)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("total_spent"),
             F.count("*").alias("n_orders"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select(F.col("c_custkey"), F.col("c_name"), F.col("total_spent"), F.col("n_orders"))
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(k)
    )


def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (orderstatus, orderpriority) — grouping-set
    surface the reference lacks entirely (SURVEY §2.4 'no grouping
    sets'); one pass with partial aggregation per grouping set."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 4).alias("total_price"))
    )


def status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority pivoted on status (explicit
    pivot values keep the plan static — no extra distinct-scan job)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
    )


def docs_top_by_length(spark: SparkSession, sf_dir: str, per_group: int = 3) -> DataFrame:
    """Window rank: top-N docs by length per language; ROWS-framed,
    unique tie-break so the frontier is deterministic."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= per_group)
        .select("lang", "doc_id", "n_chars", "rnk")
    )


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column + grouped stats — the
    engine-side analog of the reference's free-form extra_metadata
    passthrough (models.py:38,87), queried instead of opaque."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate over event time (batch form of the
    Structured Streaming windowed agg; same plan modulo the watermark).
    The window key is epoch-micros integer arithmetic — timezone-free,
    so the result doesn't depend on driver session timezone."""
    ev = load(spark, sf_dir, "events")
    hour_id = F.floor(F.col("ts_us") / F.lit(3_600_000_000)).alias("hour_id")
    return (
        ev.groupBy(hour_id)
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
    )


def events_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade (the hypertable rollup pattern):
    the DAILY aggregate is computed FROM the hourly partials — count and
    sum re-aggregate exactly, avg derives from them at the end — not from
    the raw events. At 100 TB this is how time-series rollups are served:
    maintain the hour-grain continuous aggregate incrementally (the
    streaming windowed agg writes it), answer coarser grains by
    re-aggregating 24 partial rows per day instead of re-scanning raw
    events. The oracle aggregates the RAW table directly, proving the
    partial-aggregate composition is lossless."""
    ev = load(spark, sf_dir, "events")
    hour_id = F.floor(F.col("ts_us") / F.lit(3_600_000_000)).alias("hour_id")
    hourly = ev.groupBy(hour_id, F.col("event_type")).agg(
        F.count("*").alias("n"), F.sum("value").alias("s")
    )
    day_id = F.floor(F.col("hour_id") / F.lit(24)).alias("day_id")
    return (
        hourly.groupBy(day_id, F.col("event_type"))
        .agg(F.sum("n").alias("n_events"), F.sum("s").alias("s"))
        .select(
            "day_id",
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.round(F.col("s"), 4).alias("sum_value"),
            # avg = rounded sum / count with NO outer round: the inputs
            # are already cross-engine identical, so the IEEE quotient is
            # too — while round(x/n, 4) hits half-up-vs-multiply rounding
            # tie divergence when the quotient lands exactly on .xxxx5
            # (e.g. 307.03/8), and the raw two-level sum differs from a
            # serial sum in the last ulp to begin with
            (F.round(F.col("s"), 4) / F.col("n_events")).alias("avg_value"),
        )
    )


def sessionize_events(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user sessions split on >gap inactivity.
    lag -> new-session flag -> running sum = session id; per-user
    session stats. One shuffle on user_id; within-partition sort only.
    (Streaming form: session_window / applyInPandasWithState —
    streaming/maintenance.py.)"""
    ev = load(spark, sf_dir, "events")
    # NULLS LAST = DuckDB's default null order; Spark ASC defaults to
    # nulls FIRST, so every window over a nullable key states it
    order = [F.asc_nulls_last("ts_us"), F.asc("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = gap_minutes * 60 * 1_000_000
    with_sess = (
        ev.withColumn("prev_ts", F.lag("ts_us").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | ((F.col("ts_us") - F.col("prev_ts")) > F.lit(gap_us)),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_sess").over(wrows))
    )
    per_session = with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


def token_heavy_hitters(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """Corpus-wide top-k token frequencies — the canonical heavy-hitters
    sweep. explode -> groupBy gets map-side partial aggregation, so the
    shuffle carries one row per distinct token per partition, not one per
    token occurrence; top-k is TakeOrderedAndProject. At 100 TB this is
    the exact shape of vocabulary building over a corpus."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for every purchase, the user's most recent STRICTLY
    PRIOR click. Expressed as a window over the unioned event stream
    (last-non-null carried forward) instead of a range join — one shuffle
    on user_id, no pair explosion, which is what survives at scale."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts_us"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts_us")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_click_ts", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "last_click_ts",
            F.when(
                F.col("last_click_ts").isNotNull(),
                (F.col("ts_us") - F.col("last_click_ts")) / F.lit(1_000_000.0),
            ).alias("secs_since_click"),
        )
    )


def range_join_purchase_context(spark: SparkSession, sf_dir: str,
                                window_s: int = 3600) -> DataFrame:
    """Interval/range join: count each user's events in the hour BEFORE
    each of their purchases. The equi-key (user_id) bounds the shuffle;
    the range predicate prunes inside each key group. At scale, add a
    coarse time-bucket to the equi-key so a key-group never holds more
    than ~2 buckets of rows."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_event_id"), F.col("ts_us").alias("p_ts")
    )
    context = ev.select("user_id", F.col("ts_us").alias("c_ts"))
    win_us = window_s * 1_000_000
    return (
        purchases.join(context, "user_id")
        .filter((F.col("c_ts") >= F.col("p_ts") - F.lit(win_us)) & (F.col("c_ts") < F.col("p_ts")))
        .groupBy("p_event_id", "user_id")
        .agg(F.count("*").alias("n_context_events"))
    )


def parts_by_type_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped stats over the part dimension. The mean price sums EXACT
    integer cents (prices are 2-dp by construction) and divides once:
    a double-summed avg() depends on partition summation order, and a
    group whose sum lands on a rounding knife-edge diverges from the
    oracle by 1e-4 (caught by the null fixture, which reshapes groups;
    same discipline as the micro-unit stats elsewhere)."""
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    return (
        load(spark, sf_dir, "part")
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(
                F.try_divide(
                    F.sum(cents) / F.lit(100.0), F.count("p_retailprice")
                ),
                4,
            ).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
    )


def value_deciles(spark: SparkSession, sf_dir: str, buckets: int = 10) -> DataFrame:
    """NTILE bucketing: per-event-type value deciles with per-bucket
    stats. The window order is the TOTAL order (value, event_id) so
    bucket membership is deterministic — both engines implement the SQL
    standard remainder rule (first buckets take the extra rows), which
    ties this to the oracle exactly."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(
        F.asc_nulls_last("value"), F.col("event_id")
    )
    return (
        ev.withColumn("decile", F.ntile(buckets).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (the general form rollup/cube specialize): order
    counts and revenue by priority, by status, and the grand total in ONE
    aggregation pass — at scale this is one shuffle producing all three
    report grains, where three separate GROUP BYs would scan and shuffle
    three times. grouping() flags disambiguate the null-keyed rows."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS g_pri,
               CAST(grouping(o_orderstatus) AS INT) AS g_st,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


def top_suppliers_per_nation(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Window top-k per group with a broadcast dimension join."""
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("n_name", "s_suppkey", "s_name",
                F.round("s_acctbal", 4).alias("acctbal"), "rnk")
    )


def user_event_counts_salted(spark: SparkSession, sf_dir: str, salt: int = 8) -> DataFrame:
    """Skew-safe two-stage aggregation: stage 1 aggregates (user_id, salt)
    partials, stage 2 combines per user. For algebraic aggs Catalyst's
    map-side partials already bound reducer load; explicit salting is the
    pattern for hot keys feeding holistic aggs (collect_list, exact
    median) where ONE reducer would otherwise receive a whole key. The
    oracle is the plain single-stage GROUP BY — identical results prove
    the decomposition."""
    ev = load(spark, sf_dir, "events")
    partial = (
        ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(salt)))
        .groupBy("user_id", "_salt")
        .agg(F.count("*").alias("pn"), F.sum("value").alias("pv"))
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("pv"), 4).alias("sum_value"),
    )


def shipping_priority(spark: SparkSession, sf_dir: str, segment: str = "BUILDING",
                      k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> two fact joins -> grouped
    revenue -> top-k. Catalyst pushes the segment filter into the
    customer scan and broadcasts the filtered dim; lineitem shuffles once
    on the join key."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(revenue, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
    )


def user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running event count and value total ordered by time —
    the classic cumulative-window op; one shuffle on user_id, ordering is
    intra-partition."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts_us"), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            F.count("*").over(w).alias("running_n"),
            F.round(F.sum("value").over(w), 4).alias("running_value"),
        )
    )


def value_outliers(spark: SparkSession, sf_dir: str, z_cut: float = 3.0) -> DataFrame:
    """Per-type z-score outlier detection over event values — two-pass
    (grouped moments, then a broadcast join back for the per-row z-test),
    the standard distributed anomaly sweep: both passes are single
    shuffles on the group key."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count("*").alias("n_events"),
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    is_out = F.abs(F.col("value") - F.col("mu")) > z_cut * F.col("sigma")
    return (
        joined.groupBy("event_type")
        .agg(
            F.first("n_events").alias("n_events"),
            F.round(F.first("mu"), 4).alias("mean_value"),
            F.round(F.first("sigma"), 4).alias("std_value"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        )
    )


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel: per user, did signup -> click -> purchase
    happen IN ORDER (first occurrences strictly increasing)? One grouped
    aggregation computes the three first-occurrence times; the ordering
    predicate is a projection — no self-joins, no explosion."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts_us"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts_us"))).alias("t_purchase"),
    )
    stage = (
        F.when(
            F.col("t_signup").isNotNull()
            & F.col("t_click").isNotNull()
            & F.col("t_purchase").isNotNull()
            & (F.col("t_signup") < F.col("t_click"))
            & (F.col("t_click") < F.col("t_purchase")),
            F.lit("full_funnel"),
        )
        .when(
            F.col("t_signup").isNotNull() & F.col("t_click").isNotNull()
            & (F.col("t_signup") < F.col("t_click")),
            F.lit("signup_click"),
        )
        .when(F.col("t_signup").isNotNull(), F.lit("signup_only"))
        .otherwise(F.lit("no_signup"))
    )
    return (
        firsts.select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count("*").alias("n_users"))
    )


def moving_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 3-event moving average of `value` (ROWS BETWEEN 2
    PRECEDING AND CURRENT ROW) — the rolling-feature shape a training
    pipeline derives per entity. One window over the user partition; at
    scale this is a single shuffle on user_id shared with every other
    per-user window."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts_us"), "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("ma3_value"),
        F.count("*").over(w).alias("n_in_window"),
    )


def percent_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist of order value within each priority —
    the distribution-position features (no global sort: one window per
    priority partition)."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = W.partitionBy("o_orderpriority").orderBy(
        F.asc_nulls_last("o_totalprice"), "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def customers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate pattern decorrelated by hand: customers with
    an account balance above their nation's average. The per-nation
    aggregate is a tiny broadcast side — the standard rewrite of a
    correlated scalar subquery at scale."""
    cust = load(spark, sf_dir, "customer")
    nation_avg = cust.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nat_avg"))
    return (
        cust.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nat_avg"))
        .select(
            "c_custkey",
            "c_nationkey",
            F.round("c_acctbal", 4).alias("acctbal"),
            F.round("nat_avg", 4).alias("nation_avg"),
        )
    )


def user_day_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention: of the users active on day d, how many
    were also active on day d+1. Distinct (user, day) pairs self-joined
    with a +1 shift — both sides are the same deduplicated frame, keyed
    on (user, day): an equi-join that scales."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.floor(F.col("ts_us") / F.lit(86_400_000_000)).alias("day_id"),
    ).distinct()
    nxt = ud.select("user_id", (F.col("day_id") - 1).alias("day_id"))
    return (
        ud.join(nxt.withColumn("_r", F.lit(1)), ["user_id", "day_id"], "left")
        .groupBy("day_id")
        .agg(
            F.count("*").alias("n_active"),
            F.sum(F.coalesce(F.col("_r"), F.lit(0))).cast("long").alias("n_retained"),
            F.round(
                F.sum(F.coalesce(F.col("_r"), F.lit(0)))
                / F.count("*").cast("double"),
                6,
            ).alias("retention_rate"),
        )
    )


def _skyline_survivors(pts: DataFrame, part_cols: list[str]) -> DataFrame:
    """Rows of `pts` not dominated WITHIN their `part_cols` group, where
    q dominates p iff q.price <= p.price AND q.d_day >= p.d_day with at
    least one strict inequality (minimize price, maximize d_day).

    Window algebra, no self-join: per distinct price, dmax = max(d_day);
    run_lt = max(dmax) over strictly-smaller prices (rowsBetween -1 on
    the one-row-per-distinct-price frame, so "previous row" IS "strictly
    smaller price" — exact for double prices, no range-frame integer
    cast needed). p is dominated iff run_lt >= p.d_day (a strictly
    cheaper point at least as recent) OR dmax > p.d_day (an equal-price
    strictly more recent point). Ties on BOTH dimensions dominate
    neither way and all survive — same verdict as the NOT EXISTS
    oracle."""
    pp = pts.groupBy(*part_cols, "price").agg(F.max("d_day").alias("dmax"))
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("price").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pp = pp.withColumn("run_lt", F.max("dmax").over(w))
    dominated = (
        (F.col("run_lt").isNotNull() & (F.col("run_lt") >= F.col("d_day")))
        | (F.col("dmax") > F.col("d_day"))
    )
    # NULL-SAFE join back: part_cols may carry a NULL class (e.g. an
    # unclassified priority) which is a real partition of the skyline —
    # a name-list equi-join would silently drop the whole class
    left, right = pts.alias("_sl"), pp.alias("_sr")
    cond = None
    for c in [*part_cols, "price"]:
        clause = F.col(f"_sl.{c}").eqNullSafe(F.col(f"_sr.{c}"))
        cond = clause if cond is None else cond & clause
    return left.join(right, cond).filter(~dominated).select("_sl.*")


def skyline_orders(spark: SparkSession, sf_dir: str,
                   prune_buckets: int = 16) -> DataFrame:
    """SKYLINE (Pareto front) of orders per priority class: the orders
    no other same-priority order beats on BOTH price (lower is better)
    and recency (later o_orderdate is better) — the classic
    multi-criteria shortlist (Borzsony/Kossmann/Stocker ICDE 2001,
    "The Skyline Operator") the reference's fixed query set has no
    analog for.

    Distributed shape is the canonical partition -> local skyline ->
    merge: stage 1 computes the skyline within (priority, hash-bucket)
    — lossless pruning, since a point dominated inside any subset is
    dominated globally, so ANY bucketing works and the bucket hash
    never has to match the oracle's engine — and stage 2 runs the same
    window algebra per priority over the few survivors. At 100 TB the
    local stage does the work at full scan parallelism and shuffles
    only |skyline|-sized survivor sets; the global stage's per-priority
    sort is over bucket-skyline unions, not the corpus (skyline size is
    O(log n) expected for independent dims). Both stages are the same
    _skyline_survivors window algebra — no self-join anywhere, where
    the textbook NOT EXISTS form (the DuckDB oracle, independent logic)
    is quadratic.

    Hash surface: price stays the parquet double (bit-identical on both
    engines, never recomputed); recency is integer days since
    1992-01-01."""
    # Pareto comparison needs BOTH dims: a NULL price/date row can
    # neither dominate nor be dominated (every comparison is unknown),
    # so it is outside the skyline population on both engines
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    pts = o.select(
        "o_orderpriority",
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("d_day"),
    )
    bucketed = pts.withColumn(
        "_b", F.pmod(F.xxhash64("o_orderkey"), F.lit(prune_buckets))
    )
    # stage 1 is a CONSERVATIVE one-window prune, not the exact algebra:
    # sorted by (price asc, d_day desc), the running max M of d_day over
    # preceding rows only ever reflects points with price <= current —
    # M > d_day proves strict dominance, so dropping exactly those rows
    # never removes a skyline point, while ambiguous M == d_day ties
    # (equal recency, possibly cheaper) are KEPT for stage 2 to settle.
    # One exchange + sort over the corpus, where the exact per-price
    # aggregate + join-back shape paid three 150k-row shuffles just to
    # resolve ties stage 2 resolves anyway on the tiny survivor set.
    w_local = (
        Window.partitionBy("o_orderpriority", "_b")
        .orderBy(F.col("price").asc(), F.col("d_day").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = (
        bucketed.withColumn("_m", F.max("d_day").over(w_local))
        .filter(F.col("_m").isNull() | (F.col("_m") <= F.col("d_day")))
        .drop("_b", "_m")
    )
    return (
        _skyline_survivors(local, ["o_orderpriority"])
        .select("o_orderpriority", "o_orderkey", "price", "d_day")
        .orderBy("o_orderpriority", "o_orderkey")
    )


def _morton_sql(xcol: str, ycol: str, bits: int = 10) -> str:
    """SQL text for the {2*bits}-bit Morton (Z-order) interleave of two
    {bits}-bit non-negative ints: x's bit i lands at position 2i, y's at
    2i+1. Plain shift/mask arithmetic, so the SAME text runs on Spark
    (inside whole-stage codegen) and DuckDB — the interleave is a
    DEFINITION shared by operator and oracle, like a hash function; the
    locality CLAIM the operator makes is what the test pins."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton-curve) clustering audit over orders: map each
    order onto a 1024x1024 grid (x = customer bucket, y = price
    bucket), interleave the bits into a 20-bit Morton key, and report
    per key-prefix bucket (top 10 bits) the row count and the exact
    (x, y) bounding box the bucket covers.

    This is THE data-layout primitive for multi-dimensional pruning at
    100 TB: writing files ordered by the Morton key makes every file's
    parquet min/max span a tight rectangle in BOTH dimensions at once
    (each 10-bit prefix here is a 32x32 cell — the x_span/y_span <= 31
    columns prove it), so a scan filtered on customer AND price range
    prunes files on either predicate — where a single-column sort order
    gives min/max locality on one dimension only. The whole operator is
    one narrow projection (codegen'd shift/mask arithmetic, no UDF) and
    a partial-aggregated groupBy over <=1024 buckets; at scale the
    shuffle carries only bucket-level partials."""
    o = load(spark, sf_dir, "orders")
    # floor-then-cast on BOTH engines: DuckDB's CAST(double AS BIGINT)
    # rounds half-away where Spark truncates, so the bucketing must
    # never cast an unfloored double; the prefix uses an integer shift,
    # not division, for the same reason
    pts = o.select(
        (F.col("o_custkey") % 1024).alias("x"),
        F.least(
            F.floor(F.col("o_totalprice") / F.lit(512.0)).cast("bigint"),
            F.lit(1023),
        ).alias("y"),
    )
    z = F.expr(f"({_morton_sql('x', 'y', 10)}) >> 10")
    return (
        pts.withColumn("z_bucket", z)
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
            (F.max("x") - F.min("x")).alias("x_span"),
            (F.max("y") - F.min("y")).alias("y_span"),
        )
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-SEQUENTIAL conversion funnel signup -> click ->
    purchase: a user converts at a stage only with an event of that
    type STRICTLY AFTER their previous stage's timestamp (first signup,
    then first click after it, then first purchase after that) — the
    product-analytics shape a bare per-type min() funnel gets wrong
    (it counts a click that happened before the signup). Distinct from
    rel_conversion_funnel, which stages users by comparing each type's
    GLOBAL first timestamp: here the qualifying click need not be the
    user's first click overall, only the first after their signup —
    a user whose history is click(t1), signup(t2), click(t5) converts
    here but not there.

    Spark-first: three chained window minimums over ONE user_id
    exchange (consecutive Window nodes on the same partitioning reuse
    the shuffle), then a global single-row rollup — at 100 TB the only
    wide op is the one user_id shuffle, and the rollup ships one
    partial row per task. The DuckDB oracle builds the same stage
    times via grouped-CTE self-joins — different logic shape, same
    semantics. Rates are NULL-guarded (nullif) under ANSI mode."""
    # identified users only: an unattributed (NULL user_id) event has no
    # funnel to belong to (the oracle's USING-joins drop it the same way)
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts_us")
    )
    w = Window.partitionBy("user_id")
    df = ev.withColumn(
        "t_signup",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).over(w),
    )
    df = df.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts_us") > F.col("t_signup")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts_us") > F.col("t_click")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    per_user = df.groupBy("user_id").agg(
        F.max("t_signup").alias("t_signup"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_signup").alias("n_signup"),
        F.count("t_click").alias("n_seq_click"),
        F.count("t_purchase").alias("n_seq_purchase"),
        F.round(
            F.count("t_click")
            / F.nullif(F.count("t_signup").cast("double"), F.lit(0.0)),
            6,
        ).alias("click_rate"),
        F.round(
            F.count("t_purchase")
            / F.nullif(F.count("t_click").cast("double"), F.lit(0.0)),
            6,
        ).alias("purchase_rate"),
    )


def scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension build from the events CDC feed —
    the warehouse pattern that turns a mutation log into versioned
    validity intervals: per user, consecutive events carrying the SAME
    event_type collapse into one version row; a type change closes the
    open interval and opens the next. Classic gaps-and-islands: one
    lag-flag window, a running-sum island id, a per-island aggregate,
    then a lead() for the exclusive valid_to (NULL -> -1 marks the
    current open row). Deterministic under ties via the (ts_us,
    event_id) total order.

    Scale shape: two window passes and one aggregate, all partitioned
    by user_id — a single hash exchange of skinny columns; no joins,
    no data-sized state. This is the dimension-build step a 100 TB
    training warehouse runs nightly over its CDC feed."""
    from ..sources.tables import load

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts_us"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts_us"), F.asc("event_id")
    )
    flagged = ev.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("chg").over(w))
    versions = flagged.groupBy("user_id", "island").agg(
        # event_type is constant within an island by construction
        F.min("event_type").alias("event_type"),
        F.min("ts_us").alias("valid_from_us"),
        F.count("*").cast("long").alias("n_events"),
    )
    # order versions by island id, not valid_from_us: two adjacent
    # islands can share a min ts when a type change happens inside a
    # timestamp tie (the (ts_us, event_id) order breaks the tie, and
    # island ids follow it)
    w2 = Window.partitionBy("user_id").orderBy(F.asc("island"))
    return versions.select(
        "user_id",
        F.col("island").cast("int").alias("version_no"),
        "event_type",
        "valid_from_us",
        F.coalesce(
            F.lead("valid_from_us").over(w2), F.lit(-1)
        ).cast("long").alias("valid_to_us"),
        "n_events",
    )


def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit over the warehouse — the
    expectations-suite shape (null rules, range rules, primary-key
    uniqueness, cross-table referential integrity), each rule emitting
    (rule, n_checked, n_failed). This is the gate a 100 TB ingest runs
    before promoting a snapshot: every rule is one aggregate or one
    broadcast anti-join, so the whole audit is a handful of scans with
    map-side partial aggregation and the only joins carry key columns.

    Rules are deterministic facts of the corpus (including expected-0
    referential failures — an audit that can only pass is not an
    audit, so the value-hash pins the exact failure counts either
    way)."""
    from ..sources.tables import embedding_dim, load

    dim = embedding_dim(sf_dir)
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    lineitem = load(spark, sf_dir, "lineitem")
    emb = load(spark, sf_dir, "embeddings")

    def rule(name: str, checked, failed) -> DataFrame:
        # two 1-row aggregates crossed — the only cross joins here are
        # against broadcast scalars, per the repo-wide discipline
        return (
            checked.agg(F.count("*").cast("long").alias("n_checked"))
            .crossJoin(
                failed.agg(F.count("*").cast("long").alias("n_failed"))
            )
            .select(F.lit(name).alias("rule"), "n_checked", "n_failed")
        )

    fk_oc = rule(
        "fk_orders_customer",
        orders,
        orders.join(
            F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey", "left_anti",
        ),
    )
    fk_lo = rule(
        "fk_lineitem_orders",
        lineitem,
        lineitem.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
            "l_orderkey", "left_anti",
        ),
    )
    nn_name = rule(
        "nn_customer_name", customer, customer.filter(F.col("c_name").isNull())
    )
    rng_total = rule(
        "range_order_totalprice_positive",
        orders,
        orders.filter(~(F.col("o_totalprice") > 0)),
    )
    rng_qty = rule(
        "range_lineitem_quantity_1_50",
        lineitem,
        lineitem.filter(
            ~F.col("l_quantity").between(F.lit(1), F.lit(50))
        ),
    )
    uniq = orders.agg(
        F.count("*").cast("long").alias("n_checked"),
        (F.count("*") - F.count_distinct(F.col("o_orderkey")))
        .cast("long").alias("n_failed"),
    ).select(
        F.lit("unique_pk_orders").alias("rule"), "n_checked", "n_failed"
    )
    dim_rule = rule(
        "embedding_dim_uniform",
        emb,
        emb.filter(F.size("embedding") != F.lit(dim)),
    )
    out = fk_oc
    for df in (fk_lo, nn_name, rng_total, rng_qty, uniq, dim_rule):
        out = out.unionByName(df)
    return out


def temporal_tier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-dated temporal join — fact events joined against a
    slowly-changing dimension DERIVED FROM A DIFFERENT event stream:
    each purchase advances its user's "purchase tier" (tier = how many
    purchases the user had completed so far), and every click joins the
    tier ACTIVE at its own timestamp. The classic product-analytics
    question ("do users click differently after their Nth purchase?")
    and the classic warehouse shape (facts x effective-dated dim)
    WITHOUT a non-equi range join: interleave both streams per user on
    the (ts, event_id) total order and take a running sum of purchase
    flags — one window pass, one hash exchange on user_id, no interval
    join anywhere. Deterministic under timestamp ties via the unique
    event_id. Output: (tier, n_clicks, n_users) — clicks per active
    tier and the distinct users contributing."""
    from ..sources.tables import load

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id", "event_id", "ts_us",
        (F.col("event_type") == "purchase").cast("long").alias("is_p"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts_us"), F.asc("event_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tiered = ev.withColumn("tier", F.sum("is_p").over(w))
    return (
        tiered.filter(F.col("is_p") == 0)
        .groupBy("tier")
        .agg(
            F.count("*").cast("long").alias("n_clicks"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order user-journey transition matrix: per user, each
    event's type paired with the PREVIOUS event's type on the
    (ts, event_id) total order, counted corpus-wide — the Markov-chain
    view funnels summarize away ('after a view, what actually happens
    next?'). One lag window partitioned by user, one grouped count;
    the chain START is modeled explicitly as prev_type = '_start'.
    Scale: one hash exchange on user_id, |types|^2-bounded output."""
    from ..sources.tables import load

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())  # journeys need an identity
        .select("user_id", "event_id", "event_type", "ts_us")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("ts_us"), F.asc("event_id")
    )
    return (
        ev.withColumn(
            "prev_type",
            F.coalesce(F.lag("event_type").over(w), F.lit("_start")),
        )
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("long").alias("n_transitions"))
    )


def kanonymity_audit(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """k-ANONYMITY audit over a quasi-identifier combination — the
    privacy gate a dataset release runs before publishing: any
    (nation, market segment) group with fewer than k members is a
    re-identification risk (its members are distinguishable by the
    published attributes alone), and the release either suppresses or
    generalizes those rows. One grouped count plus an integer flag —
    exact, order-independent, and at 100 TB a single map-side-combined
    aggregation whose output is bounded by the QI domain, never the
    row count. Output: every QI group with its size and at_risk
    verdict, so the suppression set is the driver-visible artifact."""
    from ..sources.tables import load

    cust = load(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").cast("long").alias("n_rows"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_rows",
            (F.col("n_rows") < k).alias("at_risk"),
        )
    )


_BUCKETED_CACHE: dict = {}


def _ensure_bucketed_tables(spark: SparkSession, sf_dir: str,
                            n_buckets: int = 8) -> tuple[str, str]:
    """Bucketed copies of orders and customer, CLUSTERED + SORTED by the
    join key — written once per source dataset (index-state lifecycle:
    the memo key carries the sources' path signatures, so a source
    rewrite forces a rebuild, and the bench snapshot/restore sees this
    cache like every other index memo). Stored under the repo
    spark-warehouse next to the other stored indexes."""
    import os

    from ..operators.store import DEFAULT_ROOT
    from ..sources.tables import path_signature

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    key = (
        path_signature(os.path.join(sf_dir, "orders.parquet")),
        path_signature(os.path.join(sf_dir, "customer.parquet")),
        n_buckets,
    )
    t_orders = f"bkt_orders_{tag}"
    t_cust = f"bkt_customer_{tag}"
    if _BUCKETED_CACHE.get((t_orders, t_cust)) == key and all(
        spark.catalog.tableExists(t) for t in (t_orders, t_cust)
    ):
        return t_orders, t_cust
    root = os.path.join(os.path.dirname(DEFAULT_ROOT), "vdbs_bucketed", tag)
    for tbl, src, bkey in (
        (t_orders, "orders", "o_custkey"),
        (t_cust, "customer", "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            spark.read.parquet(os.path.join(sf_dir, f"{src}.parquet"))
            .write.format("parquet")
            .mode("overwrite")
            .bucketBy(n_buckets, bkey)
            .sortBy(bkey)
            .option("path", os.path.join(root, tbl))
            .saveAsTable(tbl)
        )
    _BUCKETED_CACHE[(t_orders, t_cust)] = key
    return t_orders, t_cust


def bucketed_join_audit(spark: SparkSession, sf_dir: str,
                        n_buckets: int = 8) -> DataFrame:
    """CO-LOCATED bucketed join — the 100-TB fact-dimension join shape
    where BOTH sides were written bucketed on the join key, so the join
    is exchange-free: each task reads matching bucket files from both
    tables and merges them locally; no shuffle of either side, ever.
    This is the storage-layout contract (Spark bucketing / Hive
    CLUSTERED BY) that turns the biggest recurring shuffle in a
    warehouse into a scan, and the plan pin in tests asserts NO
    Exchange node feeds the join. Results are layout-independent by
    definition — the oracle runs the plain join over the raw parquet —
    and the revenue sums are exact integer cents so the hash compares
    bit-for-bit."""
    t_orders, t_cust = _ensure_bucketed_tables(spark, sf_dir, n_buckets)
    o = spark.table(t_orders).select(
        "o_custkey",
        F.expr(
            "CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)"
        ).alias("cents"),
    )
    c = spark.table(t_cust).select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
