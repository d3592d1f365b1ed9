"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full KG-construction pipeline.

    Loads the sf0.001 documents table (driver testdata) to size the run,
    synthesizes the deterministic source-code corpus in the input_hint shape
    (corpus(repo, path, commit, lang, content) — no external data, seed=42),
    and runs corpus -> segments -> fused score/decode -> mention dedup ->
    triple assembly. Returns triples(subj, pred, obj, doc_id).
    """
    from theta_spark.corpus import corpus_df
    from theta_spark.pipeline import extract_triples

    docs = spark.read.parquet(os.path.join(SF0001, "documents.parquet"))
    n_docs = docs.count()  # 500 at sf0.001 — sizes the synthetic corpus
    corpus, _ = corpus_df(spark, n_docs, seed=42, num_partitions=8, with_docs=False)
    return extract_triples(corpus)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Alias every computed/aggregate column so names match ``oracle_sql``.
    """
    from theta_spark import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (tables region nation
    customer supplier part orders lineitem events documents embeddings are
    pre-registered). Omitted keys get a weaker rows-only check."""
    from theta_spark import queries as q

    return q.ORACLES
