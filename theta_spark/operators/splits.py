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


def kfold_assign(df: DataFrame, k: int, seed: int | None = 42, order_col: str | None = None) -> DataFrame:
    """+ fold column in [0, k). Seeded-shuffle ntile by default; when
    `order_col` is given (deterministic variant) folds are
    row_number-modulo over that ordering."""
    if order_col is not None:
        w = Window.orderBy(order_col)
        return df.withColumn("fold", (F.row_number().over(w) - 1) % k)
    w = Window.orderBy(F.rand(seed))
    return df.withColumn("fold", F.ntile(k).over(w) - 1)


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
