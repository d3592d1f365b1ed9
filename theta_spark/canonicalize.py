"""Entity canonicalization: MinHash-LSH blocking + connected components.

North-rule requirement (BASELINE.json): canonicalize entities via MinHash-LSH
blocking plus connected components. Not present in the reference (its dedup
is exact-key only — SURVEY.md §2.7); built Spark-first here:

1. shingle each distinct name into char-k-grams (pure column exprs);
2. MinHash signature computed INLINE from the name string (array_min over
   xxhash64 of the shingle array — a narrow projection, no shingle table,
   no groupBy: entity names are short, so the whole signature is a few
   hundred JVM hash calls per row);
3. LSH banding: explode bands -> groupBy(band, bucket) -> collect_list ->
   inline pair combinations. One shuffle; no bucket self-join, no window.
   Oversized buckets (degenerate bands) are dropped (`max_bucket`);
4. exact Jaccard verify computed INLINE from the two name strings
   (array_intersect/array_union of their shingle arrays) — candidate
   volume is driven by the corpus's real similarity structure (numeric-
   suffix identifier families produce millions of 0.6-0.8-similar pairs at
   1M names), so the verify must be a narrow expression, not a join
   against an exploded shingle table;
5. connected components by iterative min-label propagation over the (tiny)
   surviving edge set, localCheckpoint per iteration, fixpoint on count;
6. canonical id = min name in each component; identity names omitted.

At 10^12-file scale the distinct-name table is orders of magnitude smaller
than mentions; the only wide ops are names.distinct(), the bucket groupBy,
and the final small distinct — all shuffle-on-key with AQE.

The exploded-shingle variants (shingles / minhash_signatures /
jaccard_filter) are kept for LONG texts (document-level n-gram dedup in
functions.dedup), where shingle sets are large and live in a table rather
than being recomputed per candidate pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shingle_array(name_col, k: int = 3):
    """Column expr: distinct char-k-gram array of a string column; short
    strings yield the whole string as a single shingle."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(name_col) - (k - 1), F.lit(1))),
            lambda i: name_col.substr(i, F.lit(k)),
        )
    )


def shingles(df: DataFrame, name_col: str = "name", k: int = 3) -> DataFrame:
    """(name) -> (name, shingle) exploded distinct char-k-grams (long-text
    variant; for short names prefer the inline shingle_array)."""
    return df.select(name_col, F.explode(shingle_array(F.col(name_col), k)).alias("shingle"))


def _mh_hash(shingle_col, seed: int):
    """Deterministic 64-bit hash per seed (JVM xxhash64 — the MinHash is
    engine-internal blocking, never compared against an oracle, so it needs
    speed, not cross-engine reproducibility)."""
    return F.xxhash64(F.lit(seed), shingle_col)


def inline_signatures(
    names: DataFrame, name_col: str = "name", k: int = 3, num_hashes: int = 16
) -> DataFrame:
    """(name) -> (name, sig array<long>) as a narrow projection: the MinHash
    of a short string needs no shingle table and no aggregation."""
    def _hash_with_seed(seed):
        # NOTE: must be a one-arg lambda — a two-parameter lambda (e.g. a
        # seed smuggled via default arg) is interpreted by F.transform as
        # (element, index) and silently replaces the seed with the index
        return lambda s: _mh_hash(s, seed)

    sharr = shingle_array(F.col(name_col), k)
    sig = F.array(
        *[F.array_min(F.transform(sharr, _hash_with_seed(i))) for i in range(num_hashes)]
    )
    return names.select(F.col(name_col).alias("name"), sig.alias("sig"))


def minhash_signatures(sh: DataFrame, name_col: str = "name", num_hashes: int = 16) -> DataFrame:
    """(name, shingle) -> (name, sig array<long>)."""
    aggs = [F.min(_mh_hash(F.col("shingle"), s)).alias(f"h{s}") for s in range(num_hashes)]
    sig = sh.groupBy(name_col).agg(*aggs)
    return sig.select(name_col, F.array(*[F.col(f"h{s}") for s in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    sig: DataFrame, name_col: str = "name", bands: int = 8, max_bucket: int = 64
) -> DataFrame:
    """Band the signature; names sharing any (band_id, band_hash) bucket are
    candidates. Returns (a, b) with a < b; the SAME pair may appear once per
    matching band — run the (cheap) verify first and dedup the (small)
    surviving edge set, not the raw candidate stream.

    `max_bucket` caps degenerate buckets: short identifier names share most
    of their few shingles, so without a cap one hot band bucket yields
    O(bucket^2) pairs — the classic LSH-at-scale failure. Oversized buckets
    are NOT dropped (a short-identifier family can exceed the cap in EVERY
    band, which would silently lose its true near-dup edges); instead a
    deterministic pseudo-random sample of max_bucket members (ordered by
    xxhash64(name)) still emits capped pairs, so hot families keep
    surfacing edges — recall degrades gracefully instead of cliffing, and
    the transitive closure of the surviving edges recovers most of the
    family's component."""
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
    # one shuffle: bucket members collected per (band, bucket); pair
    # combinations generated inline (no self-join, no window count)
    sampled = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    F.col("ms_all"),
                    lambda m: F.struct(F.xxhash64(m).alias("h"), m.alias("m")),
                )
            ),
            1,
            max_bucket,
        ),
        lambda s: s["m"],
    )
    buckets = (
        banded.groupBy("band_id", "bucket")
        .agg(F.collect_list("name").alias("ms_all"))
        .filter(F.size("ms_all") >= 2)
        .withColumn(
            "ms",
            F.when(F.size("ms_all") <= max_bucket, F.col("ms_all")).otherwise(sampled),
        )
    )
    combos = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda y: F.struct(
                    F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                ),
            ),
        )
    )
    return buckets.select(F.explode(combos).alias("p")).select("p.a", "p.b")


def jaccard_inline(pairs: DataFrame, k: int = 3, threshold: float = 0.9) -> DataFrame:
    """Exact Jaccard verify for SHORT-string pairs, computed inline from the
    pair's own strings (array_intersect/union of shingle arrays) — a narrow
    expression over the candidate stream; no join, no shuffle. Requires
    unique pair rows downstream (callers distinct() the survivors)."""
    sa = shingle_array(F.col("a"), k)
    sb = shingle_array(F.col("b"), k)
    j = F.size(F.array_intersect(sa, sb)) / F.size(F.array_union(sa, sb))
    return (
        pairs.withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .distinct()
    )


def jaccard_filter(pairs: DataFrame, sh: DataFrame, name_col: str = "name", threshold: float = 0.9) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs only (long-text
    variant joining the exploded shingle table; pairs must be distinct)."""
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


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., 'Connected Components in MapReduce
    and Beyond', SOCC'14): for each node u (over the symmetrized edge set),
    connect every strictly-larger neighbor to min(N(u) ∪ {u}). Expressed as
    a window min (one shuffle, no self-join, no collect_list — safe for
    hot nodes with millions of neighbors). Output edges satisfy a > b."""
    sym = e.select("a", "b").union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    w = Window.partitionBy("a")
    return (
        sym.withColumn("mn", F.least(F.min("b").over(w), F.col("a")))
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("mn").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: input edges satisfy a > b; for each node u connect
    all of its smaller neighbors AND u itself to the smallest neighbor.
    Window min again — no join. Output edges satisfy a > b."""
    w = Window.partitionBy("a")
    t = e.select("a", "b").withColumn("mn", F.min("b").over(w))
    pairs = t.where(F.col("b") != F.col("mn")).select(
        F.col("b").alias("a"), F.col("mn").alias("b")
    )
    self_pairs = t.select("a", F.col("mn").alias("b"))
    return pairs.union(self_pairs).distinct()


def connected_components(edges: DataFrame, nodes: DataFrame | None = None, name_col: str = "name", max_iters: int = 20) -> DataFrame:
    """(a,b) undirected edges [+ optional (name) isolated nodes] ->
    (name, component) where component = min name reachable.

    Alternating large-star/small-star (SURVEY.md §4.2): converges in
    O(log n) rounds vs O(component diameter) for naive min-label
    propagation — a transitive near-duplicate chain of length k needs
    ~log k rounds instead of k. Each round is two window-min passes (one
    shuffle each, no joins); the only action per round is one tiny
    fingerprint aggregate (count + hash sum) used as the convergence
    check, so the driver round-trips are O(log n) cheap aggregates instead
    of O(diameter) join-compare-count pipelines. Lineage is cut via
    localCheckpoint once per round; AQE coalesces the tiny shuffles.

    Only edge endpoints can ever change label, so when `nodes` is given its
    edge-free members are unioned in as identity rows without entering the
    iteration — at corpus scale the rounds run on the (small)
    near-duplicate subgraph, not the full entity vocabulary."""
    raw = edges.select("a", "b")
    # endpoints from the RAW input: a self-loop-only node has no real edge
    # but is still an endpoint and must keep its identity label
    endpoints = (
        raw.select(F.col("a").alias("name"))
        .union(raw.select(F.col("b").alias("name")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = raw.where(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)

    def fingerprint(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(1_000_003))).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = None
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        fp = fingerprint(e)
        if fp == prev:
            break
        prev = fp
    # converged: every edge points directly at its component root (a > b =
    # root); roots never appear on the left. groupBy-min (not distinct)
    # stays deterministic even if max_iters cut convergence short.
    labels = e.select(F.col("a").alias("name"), F.col("b").alias("component"))
    roots = e.select(F.col("b").alias("name")).distinct().select(
        "name", F.col("name").alias("component")
    )
    labels = labels.union(roots).groupBy("name").agg(F.min("component").alias("component"))
    # isolated endpoints (self-loop-only inputs) keep identity labels
    covered = labels.select("name")
    isolated_endpoints = endpoints.join(covered, on="name", how="left_anti")
    labels = labels.union(isolated_endpoints.select("name", F.col("name").alias("component")))
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
    sig = inline_signatures(names, "name", k, num_hashes)
    pairs = lsh_candidate_pairs(sig, "name", bands, max_bucket)
    edges = jaccard_inline(pairs, k, threshold)
    # CC over edge members only; names with no near-duplicate are identity
    # and are NOT returned — callers coalesce(canonical, name)
    comp = connected_components(edges, nodes=None, name_col="name", max_iters=max_iters)
    return comp.withColumnRenamed("component", "canonical")
