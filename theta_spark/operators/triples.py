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
    """mentions(doc_id, category, start, end, mention, norm, indent
    [, sha256]) -> triples(subj, pred, obj, doc_id[, sha256]), distinct.
    When the input carries the per-row sha256(content) invariant it is
    carried through (constant per doc, so distinct cardinality is
    unchanged).

    Single-pass assembly: one set of doc-partitioned window columns, then
    every predicate rule becomes an element of a candidate array that is
    filtered and exploded — no per-predicate branch re-reading the upstream
    (a naive 5-way union would recompute the Python scoring stage 5x), no
    join for instance_of (the adjacent-call test probes a per-doc
    collect_list of call structs for a call starting exactly at
    variable.end + 4 — same any-position semantics as the fused
    reference_impl path, robust to an unrelated mention sorting between the
    variable and its constructor call). All window specs partition by
    doc_id, so after the dedup stage's repartition the whole assembly is
    shuffle-free sorts."""
    w_all = (
        Window.partitionBy("doc_id")
        .orderBy("start", "category_id", "end")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_before = (
        Window.partitionBy("doc_id")
        .orderBy("start", "category_id", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = Window.partitionBy("doc_id").orderBy("start", "category_id", "end")

    cat = F.col("category")
    norm = F.col("norm")
    m = (
        mentions.withColumn(
            "module", F.first(F.when(cat == "module", norm), ignorenulls=True).over(w_all)
        )
        .withColumn("classes", F.collect_set(F.when(cat == "class", norm)).over(w_all))
        .withColumn(
            "prev_class", F.last(F.when(cat == "class", norm), ignorenulls=True).over(w_before)
        )
        .withColumn(
            "prev_def", F.last(F.when(cat == "function", norm), ignorenulls=True).over(w_before)
        )
        .withColumn(
            "calls",
            F.collect_list(
                F.when(cat == "call", F.struct(F.col("start").alias("cs"), norm.alias("cn")))
            ).over(w_all),
        )
    )

    def t(subj, pred, obj):
        return F.struct(subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"))

    module_c, prev_class, prev_def = F.col("module"), F.col("prev_class"), F.col("prev_def")
    candidates = F.array(
        # top-level function/class def-site -> (module, defines, x)
        F.when(
            cat.isin("function", "class") & (F.col("indent") == 0) & module_c.isNotNull(),
            t(module_c, "defines", norm),
        ),
        # indented (method) def-site -> (nearest preceding class, contains, x)
        F.when(
            (cat == "function") & (F.col("indent") > 0) & prev_class.isNotNull(),
            t(prev_class, "contains", norm),
        ),
        # library mention -> (module, imports, lib)
        F.when((cat == "library") & module_c.isNotNull(), t(module_c, "imports", norm)),
        # call-site -> (nearest preceding def, calls, x)  [as-of window]
        F.when((cat == "call") & prev_def.isNotNull(), t(prev_def, "calls", norm)),
        # variable v adjacent to constructor call `v = C()` of a same-doc
        # class C: the call starts len(" = ")+1 chars after v's inclusive
        # end. The F.filter HOF scans the per-doc CALL list (small — a few
        # entries per doc), not the full mention stream; it is evaluated
        # only while building the candidate array of this non-default
        # relational path (the production path is the fused per-doc stage)
        F.when(
            (cat == "variable") & F.col("inst_hit").isNotNull(),
            t(F.lower(F.col("mention")), "instance_of", F.col("inst_hit")["cn"]),
        ),
    )
    m = m.withColumn(
        "inst_hit",
        F.try_element_at(
            F.filter(
                F.col("calls"),
                lambda c: (c["cs"] == F.col("end") + 4)
                & F.array_contains(F.col("classes"), c["cn"]),
            ),
            F.lit(1),
        ),
    )
    carry = ["doc_id"] + (["sha256"] if "sha256" in mentions.columns else [])
    # plain explode + null WHERE, NOT F.filter(lambda): higher-order array
    # functions run interpreted (outside whole-stage codegen) and measured
    # ~10x slower on this hot path (336s -> 35s over 20M mentions)
    return (
        m.select(*carry, F.explode(candidates).alias("t"))
        .where(F.col("t").isNotNull())
        .select("t.subj", "t.pred", "t.obj", *carry)
        .distinct()
    )
