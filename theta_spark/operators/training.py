"""A8/A9: epoch-level validation metrics and best-model selection.

The reference tracks training as driver-side control flow:

- A8 — epoch validation metrics are the UNWEIGHTED mean of per-batch
  means (``theta/nlp/tasks/task.py:1300-1305``,
  ``task_glue.py:692-695``: ``sum(out[k] for out in outputs) /
  len(outputs)`` where each ``out[k]`` is already a batch mean) — a
  small batch counts exactly as much as a full one. We keep that quirk
  and expose the sample-weighted mean beside it for comparison.

- A9 — best-model selection with early stopping
  (``task.py:483-518``): ``best_score`` starts at **0.0** when
  ``greater_is_better`` (NOT -inf — a score that never exceeds 0 is
  never "best") and +inf otherwise; an epoch is best only on STRICT
  improvement; ``wait_count`` resets to 0 on improvement, increments
  otherwise, and training stops after the epoch where ``wait_count >=
  patience``.

Spark shape: both are relational over a metrics table keyed by
(run_id, epoch[, batch]). The sequential early-stop scan is inherently
serial PER RUN, so every window partitions by ``run_col`` — the scale
dimension is the number of concurrent runs (hyperparameter sweeps,
k-fold replicas train thousands of models side by side), and each
run's partition holds O(epochs) rows, bounded by wall-clock training
reality, never by data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epoch_val_metrics(
    batch_df: DataFrame,
    metric_cols: list[str],
    run_col: str = "run_id",
    epoch_col: str = "epoch",
    weight_col: str | None = None,
) -> DataFrame:
    """A8: per-(run, epoch) validation metrics from per-batch means.

    Each input row is one validation batch's already-averaged outputs
    (the reference's ``outputs`` list). The epoch metric is the plain
    AVG over batch rows — the reference's mean-of-means, which weights
    every batch equally regardless of batch size. When ``weight_col``
    (the batch size) is given, a ``<metric>_weighted`` column carries
    the sample-weighted mean beside it.

    One groupBy with map-side partials; no window, no collect.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n_batches")]
    for c in metric_cols:
        aggs.append(F.round(F.avg(c), 6).alias(c))
        if weight_col is not None:
            aggs.append(
                F.round(
                    F.sum(F.col(c) * F.col(weight_col)) / F.sum(weight_col), 6
                ).alias(f"{c}_weighted")
            )
    return batch_df.groupBy(run_col, epoch_col).agg(*aggs)


def best_model_selection(
    epoch_df: DataFrame,
    score_col: str = "score",
    run_col: str = "run_id",
    epoch_col: str = "epoch",
    greater_is_better: bool = False,
    patience: int = 3,
) -> DataFrame:
    """A9: the reference's save_best_model/early-stop loop as windows.

    Input: one row per (run, epoch) with the selection metric. Output:
    the PREFIX of epochs each run actually trains (everything after the
    early stop is dropped — those epochs never run), annotated with

    - ``is_best``  (1/0): strict improvement over the running best,
      seeded with the reference's init quirk (0.0 when
      ``greater_is_better``, +inf otherwise; ``task.py:331``);
    - ``best_so_far``: the running best score after this epoch;
    - ``wait_count``: epochs since the last improvement (reset on
      improvement; ``task.py:504,513``);
    - ``stopped`` (1/0): this epoch tripped ``wait_count >= patience``
      — training halts after it (``task.py:517-518``);
    - ``selected`` (1/0): the checkpoint that survives — the LAST
      is_best epoch within the trained prefix.

    Every window partitions by run: runs scale out, epochs per run are
    O(10-100) by construction.
    """
    w_ord = Window.partitionBy(run_col).orderBy(epoch_col)
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_cur = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_run = Window.partitionBy(run_col)

    score = F.col(score_col)
    if greater_is_better:
        init = F.lit(0.0)
        best_prev = F.greatest(F.coalesce(F.max(score).over(w_prev), init), init)
        is_best = score > best_prev
    else:
        init = F.lit(float("inf"))
        best_prev = F.least(F.coalesce(F.min(score).over(w_prev), init), init)
        is_best = score < best_prev

    annotated = (
        epoch_df.withColumn("_rn", F.row_number().over(w_ord))
        .withColumn("is_best", is_best.cast("int"))
        .withColumn("best_so_far", F.when(is_best, score).otherwise(best_prev))
    )
    last_best_rn = F.max(
        F.when(F.col("is_best") == 1, F.col("_rn"))
    ).over(w_cur)
    annotated = annotated.withColumn(
        "wait_count", F.col("_rn") - F.coalesce(last_best_rn, F.lit(0))
    ).withColumn("stopped", (F.col("wait_count") >= patience).cast("int"))

    stop_rn = F.coalesce(
        F.min(F.when(F.col("stopped") == 1, F.col("_rn"))).over(w_run),
        F.lit(2**31),
    )
    kept = annotated.withColumn("_stop_rn", stop_rn).filter(
        F.col("_rn") <= F.col("_stop_rn")
    )
    sel_rn = F.max(F.when(F.col("is_best") == 1, F.col("_rn"))).over(w_run)
    return (
        kept.withColumn(
            "selected", (F.col("_rn") == F.coalesce(sel_rn, F.lit(-1))).cast("int")
        )
        .drop("_rn", "_stop_rn")
    )
