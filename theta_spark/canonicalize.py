"""Entity canonicalization: MinHash-LSH blocking + connected components.

North-rule requirement (BASELINE.json): canonicalize entities via MinHash-LSH
blocking plus connected components. Not present in the reference (its dedup
is exact-key only — SURVEY.md §2.7); built Spark-first here:

1. shingle each distinct name into char-k-grams (pure column exprs);
2. MinHash signature: min over md5-derived 64-bit hashes per seed
   (md5 so the DuckDB oracle can reproduce it bit-for-bit);
3. LSH banding: names sharing any band bucket become candidate pairs —
   this is the blocking join (no O(n^2) cross join);
4. exact Jaccard filter on candidate pairs (shingle-set join + counts);
5. connected components by iterative label propagation
   (small-star style: label = min(label) over neighbors, localCheckpoint
   every iteration to cut lineage), fixpoint when no label changes;
6. canonical id = min name in each component.

At 10^12-file scale the distinct-name table is orders of magnitude smaller
than mentions; every step is shuffle-on-key with AQE, and step 5's join is
on the current label (hash-partitioned, re-used across iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shingles(df: DataFrame, name_col: str = "name", k: int = 3) -> DataFrame:
    """(name) -> (name, shingle) distinct char-k-grams; short names yield the
    whole name as a single shingle."""
    arr = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({name_col}) - {k - 1}, 1)), i -> substr({name_col}, i, {k}))"
        )
    )
    return df.select(name_col, F.explode(arr).alias("shingle"))


def _mh_hash(shingle_col, seed: int):
    """Deterministic 60-bit hash from md5 — reproducible in DuckDB as
    CAST(('0x' || substr(md5(...),1,15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}#"), shingle_col)), 1, 15), 16, 10).cast("long")


def minhash_signatures(sh: DataFrame, name_col: str = "name", num_hashes: int = 16) -> DataFrame:
    """(name, shingle) -> (name, sig array<long>)."""
    aggs = [F.min(_mh_hash(F.col("shingle"), s)).alias(f"h{s}") for s in range(num_hashes)]
    sig = sh.groupBy(name_col).agg(*aggs)
    return sig.select(name_col, F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    sig: DataFrame, name_col: str = "name", bands: int = 8, max_bucket: int = 64
) -> DataFrame:
    """Band the signature; names sharing any (band_id, band_hash) bucket are
    candidates. Returns (a, b) with a < b, distinct.

    `max_bucket` drops degenerate buckets (> max_bucket members) before the
    self-join: short identifier names share most of their few shingles, so
    without the cap one hot band bucket yields O(bucket^2) pairs — the
    classic LSH-at-scale failure. A pair lost to one oversized bucket still
    has the other bands to surface in, and a bucket that large means the
    band carries ~no discriminating information anyway."""
    sig = sig.withColumn("_n", F.size("sig"))
    rows_per_band = F.floor(F.col("_n") / bands).cast("int")
    banded = sig.select(
        F.col(name_col).alias("name"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
            )
        ).alias("band_id", "band"),
    ).withColumn("bucket", F.hash("band_id", F.col("band").cast("string")))
    bucket_w = Window.partitionBy("band_id", "bucket")
    banded = (
        banded.withColumn("_sz", F.count(F.lit(1)).over(bucket_w))
        .filter(F.col("_sz") <= max_bucket)
        .drop("_sz")
    )
    left = banded.select(F.col("name").alias("a"), "band_id", "bucket")
    right = banded.select(F.col("name").alias("b"), "band_id", "bucket")
    return (
        left.join(right, on=["band_id", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_filter(pairs: DataFrame, sh: DataFrame, name_col: str = "name", threshold: float = 0.9) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs only."""
    sizes = sh.groupBy(name_col).agg(F.count(F.lit(1)).alias("sz"))
    sh_a = sh.select(F.col(name_col).alias("a"), "shingle")
    sh_b = sh.select(F.col(name_col).alias("b"), "shingle")
    inter = (
        pairs.join(sh_a, on="a")
        .join(sh_b, on=["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(name_col).alias("a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(name_col).alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, on="a")
        .join(sz_b, on="b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def connected_components(edges: DataFrame, nodes: DataFrame | None = None, name_col: str = "name", max_iters: int = 20) -> DataFrame:
    """(a,b) undirected edges [+ optional (name) isolated nodes] ->
    (name, component) where component = min name reachable. Iterative
    min-label propagation with a fixpoint check; lineage cut via
    localCheckpoint each iteration.

    Only edge endpoints can ever change label, so when `nodes` is given its
    edge-free members are unioned in as identity rows without entering the
    iteration — at corpus scale the iterative joins then run on the (tiny)
    near-duplicate subgraph, not the full entity vocabulary."""
    # checkpoint the symmetric edge set FIRST and derive endpoints/labels
    # from it: every fixpoint-check count below is an action, and without
    # the cut each one would re-evaluate the whole upstream (LSH banding +
    # Jaccard verify) per iteration
    sym = edges.select("a", "b").union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)
    endpoints = sym.select(F.col("a").alias("name")).distinct().localCheckpoint(eager=True)
    labels = endpoints.select("name", F.col("name").alias("component"))
    for _ in range(max_iters):
        neigh = (
            sym.join(labels.withColumnRenamed("name", "b"), on="b")
            .groupBy(F.col("a").alias("name"))
            .agg(F.min("component").alias("n_comp"))
        )
        new_labels = (
            labels.join(neigh, on="name", how="left")
            .select("name", F.least(F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))).alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="name")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if nodes is not None:
        isolated = nodes.select(F.col(name_col).alias("name")).join(
            endpoints, on="name", how="left_anti"
        )
        labels = labels.union(isolated.select("name", F.col("name").alias("component")))
    return labels


def canonicalize_names(
    names: DataFrame,
    name_col: str = "name",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.9,
    max_iters: int = 20,
    max_bucket: int = 64,
) -> DataFrame:
    """(name) distinct -> (name, canonical). Names in the same near-duplicate
    component share the lexicographically smallest member as canonical."""
    names = names.select(F.col(name_col).alias("name")).distinct()
    sh = shingles(names, "name", k).localCheckpoint(eager=True)
    sig = minhash_signatures(sh, "name", num_hashes)
    pairs = lsh_candidate_pairs(sig, "name", bands, max_bucket)
    edges = jaccard_filter(pairs, sh, "name", threshold)
    # CC over edge members only; names with no near-duplicate are identity
    # and are NOT returned — callers coalesce(canonical, name)
    comp = connected_components(edges, nodes=None, name_col="name", max_iters=max_iters)
    return comp.withColumnRenamed("component", "canonical")
