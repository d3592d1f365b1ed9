"""Train-data splits/sampling (SURVEY.md §2.10, X1-X5) — seeded and
deterministic, expressed relationally.

- X1 shuffle: samples.py:85-90 -> orderBy(rand(seed)); bootstrap variant
  (sampling WITH replacement, utils/utils.py:245-257) -> sample(True, ...).
- X2 ratio split: samples.py:129-180 -> randomSplit(seed).
- X3 k-fold: utils/utils.py:384-431 -> ntile(k) over a seeded shuffle
  (random_type='shuffle') or modulo folds (random_type=None — the
  deterministic variant the DuckDB oracle mirrors).
- X5 seed_everything: every rand()/sample() below takes the seed
  explicitly; corpus synthesis is per-doc seeded (corpus.doc_rng).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shuffle(df: DataFrame, seed: int = 42) -> DataFrame:
    return df.orderBy(F.rand(seed))


def bootstrap(df: DataFrame, seed: int = 42, fraction: float = 1.0) -> DataFrame:
    """Sampling WITH replacement — the reference's bootstrap 'shuffle'
    variant actually resamples (utils/utils.py:245-257)."""
    return df.sample(withReplacement=True, fraction=fraction, seed=seed)


def ratio_split(df: DataFrame, train_rate: float = 0.9, seed: int = 42):
    return df.randomSplit([train_rate, 1.0 - train_rate], seed=seed)


def _with_global_index(df: DataFrame, order_col) -> DataFrame:
    """+ `_gidx`: the row's 0-based rank in the global `order_col`
    ordering, WITHOUT a single-partition window (VERDICT r4 #3 class):
    range-repartition on the key (contiguous key ranges per partition,
    same exchange a global sort pays), rank within each partition, then
    add per-partition offsets (a bounded numPartitions-row collect
    broadcast back as a literal map). Ties in `order_col` rank in an
    arbitrary-but-fixed order, as with any non-unique sort key."""
    d = df.repartitionByRange(F.col(order_col)).withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(order_col)
    d = d.withColumn("_rn", F.row_number().over(w)).localCheckpoint(eager=False)
    counts = {r["_pid"]: r["n"] for r in d.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    if not counts:  # empty input: no offsets to map
        return d.withColumn("_gidx", F.lit(0).cast("long")).drop("_pid", "_rn"), 0
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(*[F.lit(x) for pid in offsets for x in (pid, offsets[pid])])
    return (
        d.withColumn("_gidx", off_map[F.col("_pid")] + F.col("_rn") - 1)
        .drop("_pid", "_rn")
    ), acc


def kfold_assign(df: DataFrame, k: int, seed: int | None = 42, order_col: str | None = None) -> DataFrame:
    """+ fold column in [0, k). Seeded-shuffle ntile by default; when
    `order_col` is given (deterministic variant) folds are
    row_number-modulo over that ordering. Both variants rank via the
    two-phase global index (`_with_global_index`) — no single-partition
    window anywhere in the split path."""
    if order_col is not None:
        d, _ = _with_global_index(df, order_col)
        return d.withColumn("fold", (F.col("_gidx") % k).cast("int")).drop("_gidx")
    # seeded shuffle: materialize the draw as a column FIRST so the range
    # partitioner and the rank see the same value
    d = df.withColumn("_u", F.rand(seed))
    d, n = _with_global_index(d, "_u")
    # exact ntile(k) semantics over n rows: the first n%k folds get
    # ceil(n/k) rows, the rest floor(n/k) — pure arithmetic on the global
    # index (n is known driver-side from the offset pass)
    base, rem = n // k, n % k
    cut = rem * (base + 1)
    fold = F.when(F.col("_gidx") < cut, F.floor(F.col("_gidx") / (base + 1))).otherwise(
        rem + F.floor((F.col("_gidx") - cut) / max(base, 1))
    )
    return d.withColumn("fold", fold.cast("int")).drop("_gidx", "_u")


def kfold_slices(df: DataFrame, k: int, fold: int, seed: int | None = 42, order_col: str | None = None):
    """(train, eval) for one fold index."""
    a = kfold_assign(df, k, seed, order_col)
    return a.filter(F.col("fold") != fold).drop("fold"), a.filter(F.col("fold") == fold).drop("fold")


def cap_and_sample(df: DataFrame, max_rows: int | None = None, sample_rate: float | None = None, seed: int = 42) -> DataFrame:
    """O5 (max_train_examples / train_sample_rate, theta/__main__.py:108-113)."""
    out = df
    if sample_rate is not None and sample_rate < 1.0:
        out = out.sample(withReplacement=False, fraction=sample_rate, seed=seed)
    if max_rows is not None:
        out = out.limit(max_rows)
    return out
