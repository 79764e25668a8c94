"""Layer E — window functions (SURVEY.md §2.E).

Every ordering includes a unique tiebreak column (SURVEY.md §5.4): window
results over ties are otherwise nondeterministic and would flap the oracle
hash. Windows shuffle once on their partition key; all functions over the
same (partition, order) share a single sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataframe_differ_spark.queries import register
from dataframe_differ_spark.queries.relational import SQL_DSUM
from dataframe_differ_spark.tables import load_table


@register(
    "win_rank",
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
       CAST(RANK() OVER w AS INTEGER) AS rnk,
       CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
""",
)
def q_win_rank(spark, sf_dir):
    """E1: ranking family over one shared window spec (single sort)."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       FIRST_VALUE(o_totalprice) OVER w AS first_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_win_lag_lead(spark, sf_dir):
    """E2: analytic lag/lead/first over each customer's order history."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
    )


@register(
    "win_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM orders
""",
)
def q_win_running(spark, sf_dir):
    """E3a: running sum (rows frame), decimal-exact for engine parity."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "win_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY datediff('day', TIMESTAMP '1970-01-01', o_orderdate)
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS spend_30d
FROM orders
""",
)
def q_win_range_frame(spark, sf_dir):
    """E3b: 30-day trailing revenue — RANGE frame over epoch days.

    Range frames need a numeric ordering key, so the timestamp becomes
    epoch days in both engines; the frame covers the value interval
    [day-30, day], i.e. true time-based windows, not row counts.
    """
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


@register(
    "win_topk_group",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice
FROM (SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part)
WHERE rn <= 3
""",
)
def q_win_topk_group(spark, sf_dir):
    """E4: top-3 per group — rank-filter; per-partition heap at scale."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


WIN_DISTRIBUTION_SQL = """
SELECT c_custkey,
       ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 9) AS cume,
       CAST(NTILE(10) OVER w AS INTEGER) AS decile
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
"""


@register(
    "win_distribution",
    oracle=WIN_DISTRIBUTION_SQL,
    scale_path="win_distribution_sketch",
)
def q_win_distribution(spark, sf_dir):
    """E-family extension: distribution functions (percent_rank/cume_dist).

    Unpartitioned window = single-reducer sort; fine for a ranked export,
    but at 100 TB the partitioned form (per-nation, per-day) is the one to
    use — this query exists to pin the semantics. Ratios are single double
    divisions of identical integers → deterministic.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@register(
    "timeseries_gapfill",
    oracle=f"""
WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
     bounds AS (SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
                FROM e),
     days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
                       AS day
              FROM bounds),
     spine AS (SELECT days.day, et.event_type
               FROM days CROSS JOIN (SELECT DISTINCT event_type FROM e) AS et),
     daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      COUNT(*) AS n_events,
                      {SQL_DSUM('value', 'sum_value', '18,6')}
               FROM e GROUP BY 1, 2)
SELECT strftime(s.day, '%Y-%m-%d') AS day, s.event_type,
       COALESCE(d.n_events, 0) AS n_events,
       last_value(d.sum_value IGNORE NULLS)
         OVER (PARTITION BY s.event_type ORDER BY s.day
               ROWS UNBOUNDED PRECEDING) AS carried_sum
FROM spine s LEFT JOIN daily d
  ON s.day = d.day AND s.event_type = d.event_type
""",
)
def q_timeseries_gapfill(spark, sf_dir):
    """Time-series gap fill: dense daily spine + zero-fill + carry-forward.

    The resample/asfreq staple: days with no events still get a row
    (count 0) and the last observed daily sum is carried forward
    (last_value IGNORE NULLS). The spine is generated relationally from
    the data's own min/max (sequence + explode — no driver collect, no
    hardcoded range), sized |days| × |event types| — trivially small
    relative to the events themselves at any scale, so the left join
    broadcasts the spine at 100 TB.

    Thin binding over the parametric :func:`operators.warehouse.gapfill`
    (round-7 extraction): daily aggregate in, dense zero/ffill-filled
    spine out.
    """
    from dataframe_differ_spark.operators.warehouse import gapfill

    e = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    daily = e.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    filled = gapfill(
        daily,
        ["event_type"],
        "day",
        {"n_events": "zero", "sum_value": "ffill"},
    )
    # Date-typed outputs travel as ISO strings (DATE arrives as object vs
    # datetime64 across the Arrow/pandas boundary — established parity rule).
    return filled.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        F.col("sum_value").alias("carried_sum"),
    )


@register(
    "scd2_build",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events WHERE event_type IN ('signup', 'purchase'))
SELECT user_id, event_type,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS NULL AS BOOLEAN) AS is_current
FROM e
""",
)
def q_scd2_build(spark, sf_dir):
    """SCD2 dimension build: event stream -> validity intervals.

    The classic warehouse transform: each state-change event opens an
    interval [valid_from, valid_to) closed by the next event for the
    same key (lead over the key partition); the final interval stays
    open (is_current). One shuffle on user_id; at 100 TB the window is
    per-user sequential so skew only matters for pathological single
    users. Ties broken by event_id to keep both engines' LEAD aligned.

    Thin binding over the parametric
    :func:`operators.warehouse.scd2_build` (round-7 extraction) —
    callable on any (keys, ts, tiebreak) frame.
    """
    from dataframe_differ_spark.operators.warehouse import scd2_build

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "event_type", "ts", "event_id")
    )
    return scd2_build(
        e, ["user_id"], "ts", tiebreak_cols=["event_id"]
    ).select("user_id", "event_type", "valid_from", "valid_to", "is_current")


@register(
    "path_trigrams",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
SELECT e1, e2, e3, COUNT(*) AS n
FROM seq WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3
LIMIT 10
""",
)
def q_path_trigrams(spark, sf_dir):
    """Behavioral path mining: top-10 3-event sequences across users.

    Trigrams come from two LEADs over the per-user time-ordered window
    (one shuffle on user_id, no self-joins — the naive rank-equi-join
    formulation would shuffle the events table three times). The
    distribution groupBy lands on |event_types|^3 <= 125 keys and the
    global top-k is TakeOrderedAndProject, not a full sort.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(10)
    )


@register(
    "events_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS dst
  FROM events),
pairs AS (
  SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL
  GROUP BY src, dst),
tot AS (
  SELECT src, SUM(n) AS n_src FROM pairs GROUP BY src)
SELECT p.src, p.dst, CAST(p.n AS BIGINT) AS n,
       ROUND(CAST(p.n AS DOUBLE) / t.n_src, 9) AS p_transition
FROM pairs p JOIN tot t ON p.src = t.src
""",
)
def q_events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event streams.

    The sequence-model building block: consecutive event pairs via one
    LEAD window (single shuffle on user_id), then a |types|² transition
    count and per-source normalization — the row totals join is on ≤5
    keys and broadcasts. Probability is one double division, rounded to
    9 dp only to guard the division's last ulp in the hash compare.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    pairs = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("src").agg(F.sum("n").alias("n_src"))
    return pairs.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_src"), 9).alias(
            "p_transition"
        ),
    )


_INTERVAL_MERGE_SQL = """
WITH iv AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS s,
         CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS e,
         event_id
  FROM events),
flagged AS (
  SELECT user_id, s, e, event_id,
         CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged)
SELECT user_id, MIN(s) AS span_start, MAX(e) AS span_end,
       COUNT(*) AS n_events
FROM islands GROUP BY user_id, island
"""


@register("interval_merge", oracle=_INTERVAL_MERGE_SQL)
def q_interval_merge(spark, sf_dir):
    """Merge overlapping intervals per key (activity-span coalescing).

    Each event opens a 30-minute interval; overlapping/touching intervals
    for the same user merge into activity spans (gaps-and-islands: a new
    island starts when the interval's start exceeds the running MAX of
    all previous ends — plain max-over-window handles out-of-order and
    nested intervals). Two windows + one aggregate over a single shuffle
    on user_id; no self-join — the classic O(n²) overlap-join
    formulation would not survive 100 TB, this O(n log n) per-key form
    does. NULL running-max on each user's first row is handled by the
    CASE defaulting to 0 with SUM starting islands at 0. Tiebreak by
    event_id, not (s, e): e is always s + 30min, so tied-instant peers
    would land in either island nondeterministically without it.

    Thin binding over the parametric
    :func:`operators.warehouse.interval_merge` (round-7 extraction).
    """
    from dataframe_differ_spark.operators.warehouse import interval_merge

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
        "event_id",
    )
    return interval_merge(
        e,
        ["user_id"],
        "s",
        "e",
        tiebreak_cols=["event_id"],
        count_col="n_events",
    )


_EWMA_SQL = """
WITH days AS (
  SELECT UNNEST(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                INTERVAL 1 DAY))::DATE AS day),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
spine AS (
  SELECT t.event_type, d.day, COALESCE(daily.n, 0.0) AS n
  FROM days d CROSS JOIN types t
  LEFT JOIN daily ON daily.event_type = t.event_type AND daily.day = d.day),
hist AS (
  SELECT event_type, day, n,
         list(n) OVER (PARTITION BY event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS xs
  FROM spine)
SELECT event_type, STRFTIME(day, '%Y-%m-%d') AS day, n,
       list_reduce(xs, (acc, x) -> 0.5 * acc + 0.5 * x) AS ewma
FROM hist
"""


@register("timeseries_ewma", oracle=_EWMA_SQL)
def q_timeseries_ewma(spark, sf_dir):
    """EWMA smoothing (α = 0.5) of daily event counts per type.

    The EWMA recurrence y_t = α·x_t + (1−α)·y_{t−1} is inherently
    sequential, which most engines can't window — here it runs as a
    sequential FOLD over the per-key prefix list (collect_list over a
    running window, then the `aggregate` higher-order function seeded
    with the first element, matching DuckDB's list_reduce semantics).
    All arithmetic is two multiplies + one add per step in identical
    order in both engines → bit-identical doubles, no rounding needed.

    Thin binding over the parametric :func:`operators.timeseries.ewma`
    (round-6 extraction), which folds the WHOLE trajectory once per key —
    O(days) per key instead of the O(days²) prefix-list window this
    query originally shipped with, at bit-identical values (the same
    left-associated IEEE chain; IEEE addition commutes).
    """
    from dataframe_differ_spark.operators.timeseries import ewma as ts_ewma

    e = load_table(spark, sf_dir, "events")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    types = e.select("event_type").distinct()
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    spine = (
        days.crossJoin(types)
        .join(daily, ["event_type", "day"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0.0)))
    )
    out = ts_ewma(spine, ["event_type"], "day", "n", alpha=0.5)
    return out.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "ewma",
    )


@register(
    "win_percent_rank_cume",
    oracle="""
SELECT c_custkey, c_nationkey,
       ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 9) AS cume,
       CAST(c_acctbal >= QUANTILE_CONT(c_acctbal, 0.5)
              OVER (PARTITION BY c_nationkey) AS INTEGER) AS above_median
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
)
def q_win_percent_rank_cume(spark, sf_dir):
    """E1 completion (round 5): percent_rank + cume_dist + an
    above-partition-median flag — the relative-standing family that
    rounds out the ranking windows (row_number/rank/dense_rank/ntile in
    `win_rank`).

    percent_rank = (rank-1)/(n-1) and cume_dist = rank_last/n are pure
    rank arithmetic over the same single sort as E1 — one shuffle on the
    partition key, nothing global. The median flag uses Spark's
    partition-scoped percentile (exact, Greenwald-Khanna not needed at
    per-nation cardinality) ≡ DuckDB QUANTILE_CONT ... OVER; both
    interpolate linearly, and the >= compare keeps only the BOOLEAN
    cross-engine (float interpolation never reaches the hash). Ratios are
    exact dyadic divisions of small integers, rounded to 9 dp like every
    ratio in the suite.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wp = Window.partitionBy("c_nationkey")
    med = F.expr("percentile(c_acctbal, 0.5)").over(wp)
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        (F.col("c_acctbal") >= med).cast("int").alias("above_median"),
    )


# ---------------------------------------------------------------------------
# Markov entropy rate (round 8) — how predictable is the next event?
# ---------------------------------------------------------------------------

_ENTROPY_RATE_SQL = """
WITH seq AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
           AS dst
  FROM events),
pairs AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM seq
  WHERE dst IS NOT NULL GROUP BY src, dst),
tot AS (
  SELECT src, CAST(SUM(n) AS BIGINT) AS n_src FROM pairs GROUP BY src),
gt AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n FROM pairs),
terms AS (
  SELECT p.src, t.n_src, gt.big_n,
         ROUND(-(CAST(p.n AS DOUBLE) / t.n_src)
               * log2(CAST(p.n AS DOUBLE) / t.n_src), 12) AS hterm,
         ROUND(-(CAST(p.n AS DOUBLE) / gt.big_n)
               * log2(CAST(p.n AS DOUBLE) / t.n_src), 12) AS cterm
  FROM pairs p JOIN tot t ON p.src = t.src CROSS JOIN gt),
per_src AS (
  SELECT src, n_src,
         CAST(SUM(CAST(hterm AS DECIMAL(38,12))) AS DOUBLE) AS h_src,
         CAST(SUM(CAST(cterm AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS csum
  FROM terms GROUP BY src, n_src),
total AS (
  SELECT CAST(SUM(csum) AS DOUBLE) AS h_rate FROM per_src)
SELECT s.src, s.n_src,
       ROUND(s.h_src, 9) AS h_conditional_bits,
       ROUND(t.h_rate, 9) AS entropy_rate_bits
FROM per_src s CROSS JOIN total t
"""


@register("events_entropy_rate", oracle=_ENTROPY_RATE_SQL)
def q_events_entropy_rate(spark, sf_dir):
    """First-order Markov entropy rate of the per-user event streams:
    H = SUM_src pi(src) * H(next | src) in bits, with pi the empirical
    source frequency — the sequence-predictability scalar built on the
    same transition counts as `events_markov_transitions` (a per-edge
    view; this is its information-theoretic rollup). Low H = rigid
    funnels, high H = exploratory behavior; the sequence analogue of
    `text_char_entropy`.

    Parity: log2 is libm-tainted, so each transition's conditional-
    entropy term AND its pi-weighted contribution are rounded to 12 dp
    and summed as DECIMAL(38,12) — order-free, replayed bit-exactly by
    the oracle (same device as drift_js_divergence). Counts stay
    BIGINT. Plan: one LEAD window (single shuffle on user_id), a
    |types|^2-key transition rollup, broadcast totals, and a
    |types|-row output — scan-bound at 100 TB.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    pairs = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = pairs.groupBy("src").agg(F.sum("n").cast("long").alias("n_src"))
    gt = pairs.agg(F.sum("n").cast("long").alias("big_n"))
    p_cond = F.col("n").cast("double") / F.col("n_src")
    terms = (
        pairs.join(F.broadcast(tot), "src")
        .crossJoin(F.broadcast(gt))
        .select(
            "src",
            "n_src",
            F.round(-p_cond * F.log2(p_cond), 12).alias("hterm"),
            F.round(
                -(F.col("n").cast("double") / F.col("big_n"))
                * F.log2(p_cond),
                12,
            ).alias("cterm"),
        )
    )
    per_src = terms.groupBy("src", "n_src").agg(
        F.sum(F.col("hterm").cast("decimal(38,12)"))
        .cast("double")
        .alias("h_src"),
        F.sum(F.col("cterm").cast("decimal(38,12)")).alias("csum"),
    )
    total = per_src.agg(F.sum("csum").cast("double").alias("h_rate"))
    return per_src.crossJoin(F.broadcast(total)).select(
        "src",
        "n_src",
        F.round("h_src", 9).alias("h_conditional_bits"),
        F.round("h_rate", 9).alias("entropy_rate_bits"),
    )


# ---------------------------------------------------------------------------
# STL-lite additive decomposition (round 8): trend + day-of-week seasonality
# ---------------------------------------------------------------------------

_STL_SQL = """
WITH daily AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
idxd AS (
  SELECT d, c, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS idx
  FROM daily),
ma AS (
  SELECT a.d, a.c,
         CAST(COUNT(*) AS BIGINT) AS w,
         CAST(SUM(b.c) AS BIGINT) AS sum7
  FROM idxd a JOIN idxd b ON b.idx BETWEEN a.idx - 3 AND a.idx + 3
  GROUP BY a.d, a.c),
det AS (
  SELECT d, c, CAST(c AS DOUBLE) - CAST(sum7 AS DOUBLE) / 7.0 AS detr
  FROM ma WHERE w = 7),
seas AS (
  SELECT dayofweek(d) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(c) AS BIGINT) AS sum_c,
         CAST(SUM(CAST(ROUND(detr, 12) AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS seasonal
  FROM det GROUP BY 1),
resid AS (
  SELECT seas.dow, seas.n_days, seas.sum_c, seas.seasonal,
         CAST(SUM(CAST(ROUND((det.detr - seas.seasonal)
                             * (det.detr - seas.seasonal), 12)
                       AS DECIMAL(38,12))) AS DOUBLE) AS sse
  FROM det JOIN seas ON dayofweek(det.d) = seas.dow
  GROUP BY 1, 2, 3, 4)
SELECT dow, n_days,
       ROUND(CAST(sum_c AS DOUBLE) / n_days, 9) AS avg_count,
       ROUND(seasonal, 9) AS seasonal_idx,
       ROUND(sse / n_days, 9) AS resid_var
FROM resid
"""


@register("events_stl_decompose", oracle=_STL_SQL)
def q_events_stl_decompose(spark, sf_dir):
    """STL-lite additive decomposition of the daily event count:
    trend = centered 7-day moving average, seasonal = mean detrended
    value per day-of-week, residual variance per weekday — the
    classical decomposition sanity check behind `events_seasonality_dow`
    (raw DOW means) and `events_holt_winters` (recursive smoothing):
    here seasonality is measured AFTER removing trend, so a ramp-up
    cannot masquerade as a weekday effect.

    Plan: one scan -> calendar-bounded daily rollup; the day index, the
    +-3-day moving-average band join, and the DOW rollups all live on
    that bounded spine (~30 rows per sf-INDEPENDENT calendar day at any
    scale) — no global window on the engine side. Edge days without a
    full 7-day window are dropped by both engines (w = 7). Parity: the
    trend is an exact-integer sum over 7 BIGINTs divided once; each
    detrended / squared-residual term is rounded to 12 dp and summed
    DECIMAL(38,12) (order-free); DOW uses DuckDB's Sunday=0 convention
    (Spark dayofweek - 1).
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date(F.col("ts").cast("timestamp")).alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    spine = daily.select(F.col("d").alias("d2"))
    idxd = (
        daily.join(spine, F.col("d2") <= F.col("d"))
        .groupBy("d", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("idx"))
    )
    b = idxd.select(F.col("idx").alias("j"), F.col("c").alias("cb"))
    ma = (
        idxd.join(
            b,
            (F.col("j") >= F.col("idx") - 3) & (F.col("j") <= F.col("idx") + 3),
        )
        .groupBy("d", "c")
        .agg(
            F.count(F.lit(1)).cast("long").alias("w"),
            F.sum("cb").cast("long").alias("sum7"),
        )
    )
    det = ma.filter(F.col("w") == 7).select(
        "d",
        "c",
        (F.col("c").cast("double") - F.col("sum7").cast("double") / 7.0).alias(
            "detr"
        ),
    )
    seas = det.groupBy((F.dayofweek("d") - 1).cast("long").alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("sum_c"),
        (
            F.sum(F.round(F.col("detr"), 12).cast("decimal(38,12)"))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("seasonal"),
    )
    resid = (
        det.select((F.dayofweek("d") - 1).cast("long").alias("dow"), "detr")
        .join(F.broadcast(seas), "dow")
        .groupBy("dow", "n_days", "sum_c", "seasonal")
        .agg(
            F.sum(
                F.round(
                    (F.col("detr") - F.col("seasonal"))
                    * (F.col("detr") - F.col("seasonal")),
                    12,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("sse")
        )
    )
    return resid.select(
        "dow",
        "n_days",
        F.round(F.col("sum_c").cast("double") / F.col("n_days"), 9).alias(
            "avg_count"
        ),
        F.round("seasonal", 9).alias("seasonal_idx"),
        F.round(F.col("sse") / F.col("n_days"), 9).alias("resid_var"),
    )
