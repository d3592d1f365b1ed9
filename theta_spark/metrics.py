"""Evaluation metrics (SURVEY.md §2.8, A1-A5) as pure relational ops.

Reference semantics mirrored exactly, including the naming quirks:
- A1 tp/fp/fn by exact span match: theta/nlp/tasks/task_ner.py:1137-1154
  (tp = pred span with an exact (doc, cat, start, end) gold match; fp =
  the rest of pred; fn = gold minus tp) — semi/anti joins here.
- A2 accumulation across batches: task_ner.py:1156-1167 -> groupBy-sum.
- A3 P/R/F1 with zero-guards: task_ner.py:35-39.
- A4 "Micro" (actually a type-weighted macro): per-category F1 times the
  category weight, averaged over categories — task_ner.py:1216-1222,1106.
- A5 "Macro" (actually pooled micro): pooled tp/fp/fn -> one P/R/F1 —
  task_ner.py:1292-1297.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_KEYS = ["doc_id", "category", "start", "end"]


def span_match_counts(pred: DataFrame, gold: DataFrame, keys: list | None = None) -> DataFrame:
    """-> (category, tp, fp, fn) per category (A1+A2). Inputs are mention
    tables carrying the key columns; duplicates are collapsed first (the
    reference compares per-guid dict entries, i.e. sets)."""
    keys = keys or SPAN_KEYS
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    tp = p.join(g, on=keys, how="left_semi").groupBy("category").agg(F.count(F.lit(1)).alias("tp"))
    fp = p.join(g, on=keys, how="left_anti").groupBy("category").agg(F.count(F.lit(1)).alias("fp"))
    fn = g.join(p, on=keys, how="left_anti").groupBy("category").agg(F.count(F.lit(1)).alias("fn"))
    cats = (
        p.select("category").union(g.select("category")).distinct()
    )
    return (
        cats.join(tp, on="category", how="left")
        .join(fp, on="category", how="left")
        .join(fn, on="category", how="left")
        .fillna(0, subset=["tp", "fp", "fn"])
    )


def _prf_cols(tp, fp, fn):
    p = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    r = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return p, r, f1


def prf_per_category(counts: DataFrame) -> DataFrame:
    """(category, tp, fp, fn) -> + (precision_v, recall_v, f1) (A3),
    sorted by F1 desc like the reference report (task_ner.py:1240-1242)."""
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    p, r, f1 = _prf_cols(tp, fp, fn)
    return counts.select(
        "category", "tp", "fp", "fn",
        F.round(p, 6).alias("precision_v"),
        F.round(r, 6).alias("recall_v"),
        F.round(f1, 6).alias("f1"),
    ).orderBy(F.desc("f1"), "category")


def micro_metrics(
    counts: DataFrame, weights: DataFrame | None = None, num_labels: int | None = None
) -> DataFrame:
    """Reference "Micro" (A4 — computed like a type-weighted macro).

    Two reference variants:
    - default (num_labels=None): mean over the categories PRESENT in
      `counts` — matches the show_val_results report, which only iterates
      categories that appear in pred/gold;
    - num_labels given: sum over categories divided by `num_labels` —
      matches task_ner.py:1216-1222 exactly, which iterates ALL id2label
      categories (zero-count ones contribute 0) and divides by
      self.num_labels (= len(categories) + 1, the +1 being the reserved
      no-entity label). Absent categories need no join: they add 0 to the
      sum, so dividing the present-category sum by num_labels is identical.

    `weights` is an optional broadcast dim (category, weight), default 1.0.
    """
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    p, r, f1 = _prf_cols(tp, fp, fn)
    per_cat = counts.select("category", p.alias("p"), r.alias("r"), f1.alias("f"))
    if weights is not None:
        per_cat = per_cat.join(F.broadcast(weights), on="category", how="left").withColumn(
            "w", F.coalesce(F.col("weight"), F.lit(1.0))
        )
    else:
        per_cat = per_cat.withColumn("w", F.lit(1.0))
    if num_labels is not None:
        return per_cat.agg(
            F.round(F.sum(F.col("p") * F.col("w")) / num_labels, 6).alias("micro_precision"),
            F.round(F.sum(F.col("r") * F.col("w")) / num_labels, 6).alias("micro_recall"),
            F.round(F.sum(F.col("f") * F.col("w")) / num_labels, 6).alias("micro_f1"),
        )
    return per_cat.agg(
        F.round(F.avg(F.col("p") * F.col("w")), 6).alias("micro_precision"),
        F.round(F.avg(F.col("r") * F.col("w")), 6).alias("micro_recall"),
        F.round(F.avg(F.col("f") * F.col("w")), 6).alias("micro_f1"),
    )


def macro_metrics(counts: DataFrame) -> DataFrame:
    """Reference "Macro" (A5 — actually pooled micro): sum tp/fp/fn over
    categories, then one P/R/F1."""
    pooled = counts.agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    p, r, f1 = _prf_cols(tp.cast("double"), fp.cast("double"), fn.cast("double"))
    return pooled.select(
        "tp", "fp", "fn",
        F.round(p, 6).alias("macro_precision"),
        F.round(r, 6).alias("macro_recall"),
        F.round(f1, 6).alias("macro_f1"),
    )


def triple_set_prf(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """BASELINE metric: P/R/F1 between two (subj, pred, obj, doc_id) triple
    sets (exact match, A1/A3 applied to triples)."""
    keys = ["subj", "pred", "obj", "doc_id"]
    p = pred.select(*keys).distinct()
    g = gold.select(*keys).distinct()
    tp = p.join(g, on=keys, how="left_semi").count()
    n_pred, n_gold = p.count(), g.count()
    prec = tp / n_pred if n_pred else 0.0
    rec = tp / n_gold if n_gold else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    spark = pred.sparkSession
    return spark.createDataFrame(
        [(tp, n_pred - tp, n_gold - tp, round(prec, 6), round(rec, 6), round(f1, 6))],
        "tp long, fp long, fn long, precision_v double, recall_v double, f1 double",
    )


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two labelings of the same rows — the
    annotation-QC / label-drift metric (e.g. declared metadata vs a
    heuristic re-classifier). One row: (n, n_agree, po, pe, kappa).

    Integer-exact core: with diag = Σ agreements and S = Σ_l row_l·col_l
    (the chance-agreement mass),

        kappa = (n·diag − S) / (n² − S)

    — every term an exact i64 product/sum, ONE float division at the end
    (po = diag/n and pe = S/n² likewise single divisions), so the result
    is bit-identical across engines and partitionings. When n² == S
    (chance agreement saturates: both annotators constant), kappa
    degenerates to 1.0 on full agreement else 0.0.

    Scale shape: one (a, b) groupBy over the pair stream, then joins
    over the tiny per-label marginals — contingency state is O(labels²),
    never O(rows).
    """
    pairs = df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    cont = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cont.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("diag"),
    )
    ra = cont.groupBy(F.col("a").alias("lbl")).agg(F.sum("c").cast("long").alias("ra"))
    cb = cont.groupBy(F.col("b").alias("lbl")).agg(F.sum("c").cast("long").alias("cb"))
    s = (
        ra.join(cb, "lbl")
        .agg(F.coalesce(F.sum(F.col("ra") * F.col("cb")), F.lit(0)).cast("long").alias("s"))
    )
    num = F.col("n") * F.col("diag") - F.col("s")
    den = F.col("n") * F.col("n") - F.col("s")
    return (
        tot.crossJoin(F.broadcast(s))
        .select(
            "n",
            F.col("diag").alias("n_agree"),
            F.round(F.col("diag") / F.col("n"), 6).alias("po"),
            F.round(F.col("s") / (F.col("n") * F.col("n")), 6).alias("pe"),
            F.round(
                F.when(den != 0, num / den)
                .otherwise(F.when(F.col("diag") == F.col("n"), 1.0).otherwise(0.0)),
                6,
            ).alias("kappa"),
        )
    )
