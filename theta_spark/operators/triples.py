"""Triple assembly: mentions -> (subj, pred, obj, doc_id).

The reference composes triples as (subject span, predicate label, object
span) — SPO = span tagging conditioned on predicate + predicate
classification (SURVEY.md §0; theta/nlp/tasks/ner_models.py:194,313-331,
theta/__main__.py:300-316). Here the predicate "classifier" is the
deterministic structural rule set over mention categories and positions;
everything is window functions + joins, no Python:

- defines:     top-level function/class def-site  -> (module, defines, x)
- contains:    indented (method) def-site         -> (nearest class, contains, x)
- imports:     library mention                    -> (module, imports, lib)
- calls:       call-site mention                  -> (nearest preceding def, calls, x)
    (an as-of join, expressed as last(...) ignoreNulls over an ordered
     doc window — SURVEY.md §2.12)
- instance_of: variable adjacent to a constructor call of a same-doc class

Entity normalization: last dotted component, lowercased — `u.shared_util`
and `shared_util` refer to one entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from theta_spark.config import ID2LABEL


def with_category_names(mentions: DataFrame) -> DataFrame:
    """category_id -> category string via a literal map (broadcast dim)."""
    mapping = F.create_map(*[F.lit(x) for kv in ID2LABEL.items() for x in kv])
    return mentions.withColumn("category", mapping[F.col("category_id")])


def with_norm(mentions: DataFrame) -> DataFrame:
    return mentions.withColumn(
        "norm", F.lower(F.element_at(F.split(F.col("mention"), r"\."), -1))
    )


def assemble_triples(mentions: DataFrame) -> DataFrame:
    """mentions(doc_id, category, start, end, mention, norm, indent) ->
    triples(subj, pred, obj, doc_id), distinct."""
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_before = (
        Window.partitionBy("doc_id")
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = (
        mentions.withColumn(
            "module",
            F.first(F.when(F.col("category") == "module", F.col("norm")), ignorenulls=True).over(w_doc),
        )
        .withColumn(
            "prev_class",
            F.last(F.when(F.col("category") == "class", F.col("norm")), ignorenulls=True).over(w_before),
        )
        .withColumn(
            "prev_def",
            F.last(F.when(F.col("category") == "function", F.col("norm")), ignorenulls=True).over(w_before),
        )
    )

    defines = m.filter(
        (F.col("category").isin("function", "class")) & (F.col("indent") == 0)
    ).select(F.col("module").alias("subj"), F.lit("defines").alias("pred"), F.col("norm").alias("obj"), "doc_id")

    contains = m.filter(
        (F.col("category") == "function") & (F.col("indent") > 0) & F.col("prev_class").isNotNull()
    ).select(F.col("prev_class").alias("subj"), F.lit("contains").alias("pred"), F.col("norm").alias("obj"), "doc_id")

    imports = m.filter(F.col("category") == "library").select(
        F.col("module").alias("subj"), F.lit("imports").alias("pred"), F.col("norm").alias("obj"), "doc_id"
    )

    calls = m.filter((F.col("category") == "call") & F.col("prev_def").isNotNull()).select(
        F.col("prev_def").alias("subj"), F.lit("calls").alias("pred"), F.col("norm").alias("obj"), "doc_id"
    )

    # instance_of: variable v directly assigned a constructor call `v = C()`
    # where C is a class defined in the same doc. Adjacency: the call starts
    # exactly len(" = ")+1 chars after the variable's inclusive end.
    doc_classes = (
        m.filter(F.col("category") == "class")
        .select("doc_id", F.col("norm").alias("callee_norm"))
        .distinct()
    )
    variables = m.filter(F.col("category") == "variable").select(
        "doc_id",
        F.col("mention").alias("var_mention"),
        (F.col("end") + 4).alias("call_start"),
    )
    ctor_calls = m.filter(F.col("category") == "call").select(
        "doc_id", F.col("norm").alias("callee_norm"), F.col("start").alias("call_start")
    )
    instance_of = (
        variables.join(ctor_calls, on=["doc_id", "call_start"])
        .join(doc_classes, on=["doc_id", "callee_norm"])
        .select(
            F.lower(F.col("var_mention")).alias("subj"),
            F.lit("instance_of").alias("pred"),
            F.col("callee_norm").alias("obj"),
            "doc_id",
        )
    )

    return defines.unionByName(contains).unionByName(imports).unionByName(calls).unionByName(instance_of).distinct()
