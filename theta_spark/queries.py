"""Driver-contract query suite: Spark DataFrame queries with DuckDB oracles.

Each QUERIES[name] is (spark, sf_dir) -> DataFrame; ORACLES[name] is the
ANSI-SQL twin DuckDB runs over the same parquet tables. Column names are
aliased identically on both sides (the driver hashes values after sorting
columns by name). Floats are rounded on both sides to avoid
engine-precision hash drift.

The suite maps SURVEY.md §2 operators onto the driver testdata tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------- A7 / A2-A3
@query(
    "a7_eda_stats",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def a7_eda_stats(spark, sf_dir):
    """A7 (theta/nlp/eda/__main__.py:20-144): label histogram + length stats."""
    return (
        _load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


@query(
    "a1_exact_match_metrics",
    """
    WITH pred AS (
      SELECT DISTINCT l_orderkey AS k1, l_partkey AS k2 FROM lineitem WHERE l_quantity > 25
    ), gold AS (
      SELECT DISTINCT l_orderkey AS k1, l_partkey AS k2 FROM lineitem WHERE l_extendedprice > 30000
    ), tp AS (SELECT COUNT(*) AS tp FROM pred JOIN gold USING (k1, k2)),
       cnts AS (SELECT (SELECT COUNT(*) FROM pred) AS n_pred, (SELECT COUNT(*) FROM gold) AS n_gold, tp FROM tp)
    SELECT tp,
           n_pred - tp AS fp,
           n_gold - tp AS fn,
           ROUND(tp / NULLIF(n_pred, 0), 6) AS precision_v,
           ROUND(tp / NULLIF(n_gold, 0), 6) AS recall_v
    FROM cnts
    """,
)
def a1_exact_match_metrics(spark, sf_dir):
    """A1/A3 (task_ner.py:1137-1154, 35-39): exact-match tp/fp/fn + P/R as
    semi/anti joins — pred vs gold sets derived from lineitem."""
    li = _load(spark, sf_dir, "lineitem")
    pred = li.filter(F.col("l_quantity") > 25).select(
        F.col("l_orderkey").alias("k1"), F.col("l_partkey").alias("k2")
    ).distinct()
    gold = li.filter(F.col("l_extendedprice") > 30000).select(
        F.col("l_orderkey").alias("k1"), F.col("l_partkey").alias("k2")
    ).distinct()
    tp = pred.join(gold, on=["k1", "k2"], how="left_semi").count()
    n_pred, n_gold = pred.count(), gold.count()
    return spark.createDataFrame(
        [
            (
                tp,
                n_pred - tp,
                n_gold - tp,
                round(tp / n_pred, 6) if n_pred else None,
                round(tp / n_gold, 6) if n_gold else None,
            )
        ],
        "tp long, fp long, fn long, precision_v double, recall_v double",
    )


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """A2-style pooled aggregation (TPC-H Q1 shape): map-side partial aggs,
    one shuffle on the grouping key."""
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_broadcast_join_agg",
    """
    SELECT n.n_name AS nation, ROUND(SUM(c.c_acctbal), 4) AS total_bal, COUNT(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name <> 'EUROPE'
    GROUP BY n.n_name ORDER BY nation
    """,
)
def q3_broadcast_join_agg(spark, sf_dir):
    """Broadcast-dim join chain (SURVEY.md §2.12 label↔id lookup shape):
    small dims broadcast, no shuffle on the fact side until the agg."""
    c = _load(spark, sf_dir, "customer")
    n = _load(spark, sf_dir, "nation")
    r = _load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") != "EUROPE")), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("c_acctbal"), 4).alias("total_bal"), F.count(F.lit(1)).alias("n_cust"))
        .orderBy("nation")
    )


# ------------------------------------------------------------- W1 windowing
@query(
    "w1_segments",
    """
    SELECT doc_id,
           CAST(s_seg / 63 AS INT) AS seg_id,
           CAST(s_seg AS INT) AS s_seg,
           substr(text, CAST(s_seg AS INT) + 1, 126) AS seg_text
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(0, CAST(length(text) AS BIGINT) - 1, 63)) AS s_seg
      FROM documents
    )
    ORDER BY doc_id, seg_id
    """,
)
def w1_segments(spark, sf_dir):
    """W1 sliding-window segmentation (task_ner.py:183-233) as
    sequence+posexplode+substring over the documents table."""
    from theta_spark.operators.segmentation import segment

    d = _load(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        segment(d, "text", 126, 63)
        .select("doc_id", "seg_id", "s_seg", "seg_text")
        .orderBy("doc_id", "seg_id")
    )


# --------------------------------------------------------------- G2/G3/G4/G5
@query(
    "g2_dedup_docs",
    """
    SELECT text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_dups
    FROM (SELECT doc_id, sha256(text) AS text_hash FROM documents)
    GROUP BY text_hash HAVING COUNT(*) >= 1
    ORDER BY text_hash
    """,
)
def g2_dedup_docs(spark, sf_dir):
    """G2 exact dedup by content hash (dedup family; sha256 invariant column
    per input_hint)."""
    d = _load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.sha2(F.col("text"), 256).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
        .orderBy("text_hash")
    )


@query(
    "g3_keep_last",
    """
    SELECT user_id, event_type, event_id AS last_event_id, ROUND(value, 6) AS last_value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def g3_keep_last(spark, sf_dir):
    """G3 keep-last dedup (samples.py:20-31) via row_number desc."""
    e = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.round("value", 6).alias("last_value"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "g4_merge_min_dups",
    """
    SELECT l_partkey, l_suppkey, COUNT(*) AS n_occurrences
    FROM lineitem GROUP BY l_partkey, l_suppkey HAVING COUNT(*) >= 2
    ORDER BY l_partkey, l_suppkey
    """,
)
def g4_merge_min_dups(spark, sf_dir):
    """G4 merge_entities(min_dups=2) (samples.py:34-45) = group-count filter."""
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 2)
        .orderBy("l_partkey", "l_suppkey")
    )


@query(
    "g5_entity_vote",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS votes
    FROM events GROUP BY event_type
    HAVING COUNT(DISTINCT user_id) >= CAST(0.5 * (SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT)
    ORDER BY event_type
    """,
)
def g5_entity_vote(spark, sf_dir):
    """G5 vote (ner_models.py:14-34): keep keys voted by >= threshold*n
    distinct 'models' (users stand in for models)."""
    e = _load(spark, sf_dir, "events")
    n_models = e.select("user_id").distinct().count()
    thr = int(0.5 * n_models)
    return (
        e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("votes"))
        .filter(F.col("votes") >= thr)
        .orderBy("event_type")
    )


@query(
    "g6_dataset_diff",
    """
    WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
         b AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT custkey, 'a_only' AS side FROM a WHERE custkey NOT IN (SELECT custkey FROM b)
    UNION ALL
    SELECT custkey, 'b_only' AS side FROM b WHERE custkey NOT IN (SELECT custkey FROM a)
    ORDER BY side, custkey
    """,
)
def g6_dataset_diff(spark, sf_dir):
    """G6 dataset diff (theta/__main__.py:592-622) via anti-joins."""
    o = _load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey")).distinct()
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey")).distinct()
    a_only = a.join(b, on="custkey", how="left_anti").withColumn("side", F.lit("a_only"))
    b_only = b.join(a, on="custkey", how="left_anti").withColumn("side", F.lit("b_only"))
    return a_only.unionByName(b_only).orderBy("side", "custkey")


# ----------------------------------------------------------- O: sorts/top-k
@query(
    "o6_topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 4) AS acctbal, rk
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer
    ) WHERE rk <= 3
    ORDER BY c_mktsegment, rk
    """,
)
def o6_topk_per_group(spark, sf_dir):
    """O6 top-k per group (save_top_k semantics, arguments.py:357-360)."""
    c = _load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 4).alias("acctbal"), "rk")
        .orderBy("c_mktsegment", "rk")
    )


# --------------------------------------------------------------- X: splits
@query(
    "x3_kfold_sizes",
    """
    SELECT fold, COUNT(*) AS n
    FROM (SELECT o_orderkey % 5 AS fold FROM orders)
    GROUP BY fold ORDER BY fold
    """,
)
def x3_kfold_sizes(spark, sf_dir):
    """X3 deterministic k-fold assignment (utils/utils.py:384-431 analog;
    modulo instead of seeded shuffle so the oracle can reproduce it)."""
    o = _load(spark, sf_dir, "orders")
    return (
        o.select((F.col("o_orderkey") % 5).alias("fold"))
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("fold")
    )


# --------------------------------------------- joins: interval / as-of / D3
@query(
    "p4_interval_containment",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_events
    FROM events e JOIN orders o
      ON e.ts >= o.o_orderdate AND e.ts < o.o_orderdate + INTERVAL 7 DAY
      AND e.user_id = o.o_custkey % 100
    GROUP BY o.o_orderpriority ORDER BY o_orderpriority
    """,
)
def p4_interval_containment(spark, sf_dir):
    """P4 interval-containment join (task_ner.py:199-205 shape): events
    falling inside per-order 7-day windows, equi-key + range predicate."""
    e = _load(spark, sf_dir, "events")
    o = _load(spark, sf_dir, "orders")
    joined = e.join(
        o,
        on=[
            e.ts >= o.o_orderdate,
            e.ts < F.date_add(o.o_orderdate, 7).cast("timestamp"),
            e.user_id == o.o_custkey % 100,
        ],
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("o_orderpriority")
    )


@query(
    "d1_asof_pairing",
    """
    SELECT user_id, event_id, prev_purchase_id
    FROM (
      SELECT user_id, event_id, event_type,
             LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_id
      FROM events
    ) WHERE event_type = 'click' AND prev_purchase_id IS NOT NULL
    ORDER BY user_id, event_id
    """,
)
def d1_asof_pairing(spark, sf_dir):
    """D1's start/end pairing as an as-of window (SURVEY.md §2.12): for each
    click, the nearest preceding purchase of the same user."""
    e = _load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        e.withColumn(
            "prev_purchase_id",
            F.last(F.when(F.col("event_type") == "purchase", F.col("event_id")), ignorenulls=True).over(w),
        )
        .filter((F.col("event_type") == "click") & F.col("prev_purchase_id").isNotNull())
        .select("user_id", "event_id", "prev_purchase_id")
        .orderBy("user_id", "event_id")
    )


@query(
    "d3_gaps_islands",
    """
    SELECT user_id, session_id, COUNT(*) AS n_events, MIN(event_id) AS first_event
    FROM (
      SELECT user_id, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
      )
    )
    GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
)
def d3_gaps_islands(spark, sf_dir):
    """D3 BIOES-walk analog: gaps-and-islands sessionization
    (SURVEY.md §2.6 relational alternative) — lag + cumulative flag sum."""
    e = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp_ltz").cast("long")
    prev_s = F.lag("ts").over(w).cast("timestamp_ltz").cast("long")
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (ts_s - prev_s > 1800), 1).otherwise(0),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        flagged.withColumn("session_id", F.sum("new_session").over(w2))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("event_id").alias("first_event"))
        .orderBy("user_id", "session_id")
    )
