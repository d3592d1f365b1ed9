"""Sources/sinks (SURVEY.md §2.1, S1-S9) with an Iceberg-first, parquet-
fallback table abstraction.

- S1 corpus scan: `read_table` — Iceberg table name when a catalog is
  configured (partition pruning + column projection from the table
  format), plain parquet directory otherwise (this sandbox).
- S2 JSON entity scan with schema check: the reference asserts dict keys
  idx/text/tags and tag keys category/start/mention at
  theta/nlp/data/samples.py:236-258; here the schema is a StructType and
  the runtime asserts become a validation filter returning (valid,
  rejected) — rejects carry a reason instead of raising.
- S3 prediction/submission sink: theta/templates/ner/run_ner.py:49-112 —
  tags sorted by start (O1), empty mentions dropped (P2), one JSON doc per
  row.
- S4/S5 stage snapshot tables: theta_spark.pipeline.run_checkpointed.
- S9 model/run registry: the per-stage manifests double as the registry
  (ordered by snapshot time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENTITY_TAG_TYPE = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("mention", T.StringType()),
    ]
)

ENTITY_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("idx", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tags", T.ArrayType(ENTITY_TAG_TYPE)),
    ]
)


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        return (
            spark.conf.get("spark.sql.catalog.spark_catalog", "") != ""
            or spark.conf.get("spark.sql.catalog.iceberg", "") != ""
        )
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, target: str, fmt: str | None = None) -> DataFrame:
    """Iceberg table name (dotted identifier, when a catalog is up) or a
    parquet/json path. Keeps the rest of the engine storage-agnostic."""
    if fmt == "iceberg" or ("/" not in target and _has_iceberg(spark)):
        return spark.read.format("iceberg").load(target)
    if fmt == "json" or target.endswith(".json") or target.endswith(".jsonl"):
        return spark.read.json(target)
    return spark.read.parquet(target)


def write_table(
    df: DataFrame,
    target: str,
    mode: str = "overwrite",
    partition_cols: list | None = None,
    fmt: str | None = None,
) -> None:
    """writeTo(...).append/createOrReplace for Iceberg identifiers; a
    partitioned parquet write otherwise."""
    if fmt == "iceberg" or ("/" not in target and _has_iceberg(df.sparkSession)):
        writer = df.writeTo(target)
        if partition_cols:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_cols])
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(target)


def load_entity_samples(spark: SparkSession, path: str):
    """S2: read {idx, text, tags[]} JSON with the declared schema; split
    into (valid, rejected) where rejected rows carry a `reject_reason`.

    Checks (samples.py:247-258 + the span-slice assert at
    task_ner.py:212-218): tags present with non-null category/start/mention,
    start in range, and text[start : start+len(mention)] == mention.
    """
    df = spark.read.schema(ENTITY_SAMPLE_SCHEMA).json(path)
    bad_tag = F.exists(
        F.col("tags"),
        lambda t: t["category"].isNull()
        | t["start"].isNull()
        | t["mention"].isNull()
        | (t["start"] < 0)
        | (
            F.col("text").substr(t["start"] + 1, F.length(t["mention"]))
            != t["mention"]
        ),
    )
    reason = (
        F.when(F.col("idx").isNull(), "missing idx")
        .when(F.col("text").isNull(), "missing text")
        .when(F.col("tags").isNull(), "missing tags")
        .when(bad_tag, "invalid tag (schema or span-slice mismatch)")
    )
    annotated = df.withColumn("reject_reason", reason)
    valid = annotated.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    rejected = annotated.filter(F.col("reject_reason").isNotNull())
    return valid, rejected


def submission_df(mentions: DataFrame) -> DataFrame:
    """S3: document-level mentions -> one row per doc
    {idx, text?, tags: sorted array<struct>} with empty mentions dropped
    (P2, run_ner.py:78-80) and tags sorted by start (O1, run_ner.py:86)."""
    tags = mentions.filter(F.length("mention") > 0).select(
        F.col("doc_id").alias("idx"),
        F.struct(
            F.col("start").cast("int").alias("start"),
            F.col("category").alias("category"),
            F.col("mention").alias("mention"),
        ).alias("tag"),
    )
    return (
        tags.groupBy("idx")
        .agg(F.array_sort(F.collect_list("tag")).alias("tags"))
        .select(
            "idx",
            F.transform(
                F.col("tags"),
                lambda t: F.struct(
                    t["category"].alias("category"),
                    t["start"].alias("start"),
                    t["mention"].alias("mention"),
                ),
            ).alias("tags"),
        )
        .orderBy("idx")
    )


def write_submission(mentions: DataFrame, path: str) -> None:
    submission_df(mentions).write.mode("overwrite").json(path)


def load_cluener(spark: SparkSession, path: str):
    """CLUENER-format adapter (reference fixture shape,
    theta/tutorials/cluener/data/cluener_train_data.json: one JSON object
    per line {guid, text, tags:[{category,start,mention}]}) -> the S2
    (valid, rejected) split. `guid` maps onto the engine's `idx`; offsets
    are CHARACTER offsets (the fixture is Chinese text, so byte offsets
    would fail the span-slice check — substr on Spark strings is
    char-based, matching)."""
    df = (
        spark.read.schema(
            T.StructType(
                [
                    T.StructField("guid", T.StringType()),
                    T.StructField("text", T.StringType()),
                    T.StructField("tags", T.ArrayType(ENTITY_TAG_TYPE)),
                ]
            )
        )
        .json(path)
        .withColumnRenamed("guid", "idx")
    )
    bad_tag = F.exists(
        F.col("tags"),
        lambda t: t["category"].isNull()
        | t["start"].isNull()
        | t["mention"].isNull()
        | (t["start"] < 0)
        | (
            F.col("text").substr(t["start"] + 1, F.length(t["mention"]))
            != t["mention"]
        ),
    )
    reason = (
        F.when(F.col("idx").isNull(), "missing idx")
        .when(F.col("text").isNull(), "missing text")
        .when(F.col("tags").isNull(), "missing tags")
        .when(bad_tag, "invalid tag (schema or span-slice mismatch)")
    )
    annotated = df.withColumn("reject_reason", reason)
    valid = annotated.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    rejected = annotated.filter(F.col("reject_reason").isNotNull())
    return valid, rejected


def brat_export_df(mentions: DataFrame) -> DataFrame:
    """S6 brat standoff export: one row per document (doc_id, ann) where
    `ann` is the .ann file body — lines "T<i>\\t<category> <start> <end_excl>
    \\t<mention>", numbered in start order per doc. (The reference's own brat
    module is absent from the snapshot — SURVEY.md §2.1 S6; format per the
    public brat standoff spec.) Built with JVM array ops: collect per doc,
    sort by start, transform to lines — no Python.

    Mention text containing a tab or newline would corrupt the line-based
    standoff format, so both are replaced with a single space — what real
    brat does with newlines in text-bound annotations (the offsets remain
    the source of truth; parse_brat_df splits on the first two tabs only,
    so a replaced mention still round-trips structurally)."""
    tags = mentions.select(
        "doc_id",
        F.struct(
            F.col("start").cast("long").alias("start"),
            (F.col("end").cast("long") + 1).alias("end_excl"),
            F.col("category").alias("category"),
            F.regexp_replace(F.col("mention"), "[\t\n\r]", " ").alias("mention"),
        ).alias("tag"),
    )
    return (
        tags.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("tag")).alias("tags"))
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.col("tags"),
                    lambda t, i: F.concat_ws(
                        "",
                        F.lit("T"), (i + 1).cast("string"), F.lit("\t"),
                        t["category"], F.lit(" "),
                        t["start"].cast("string"), F.lit(" "),
                        t["end_excl"].cast("string"), F.lit("\t"),
                        t["mention"],
                    ),
                ),
                "\n",
            ).alias("ann"),
        )
    )


def parse_brat_df(anns: DataFrame) -> DataFrame:
    """S6 import: (doc_id, ann) -> mention rows (doc_id, category, start,
    end inclusive, mention) — the standoff lines split relationally."""
    lines = anns.select(
        "doc_id", F.explode(F.split(F.col("ann"), "\n")).alias("line")
    ).filter(F.col("line").startswith("T"))
    # limit=3: only the first two tabs are structural (id / span header /
    # mention); any further tab belongs to the mention text itself
    mid = F.split(F.col("line"), "\t", 3)
    head = F.split(mid.getItem(1), " ")
    return lines.select(
        "doc_id",
        head.getItem(0).alias("category"),
        head.getItem(1).cast("int").alias("start"),
        (head.getItem(2).cast("int") - 1).alias("end"),
        mid.getItem(2).alias("mention"),
    )
