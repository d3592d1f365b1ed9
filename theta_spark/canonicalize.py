"""Entity canonicalization: MinHash-LSH blocking + connected components.

North-rule requirement (BASELINE.json): canonicalize entities via MinHash-LSH
blocking plus connected components. Not present in the reference (its dedup
is exact-key only — SURVEY.md §2.7); built Spark-first here:

1. shingle each distinct name into char-k-grams (pure column exprs); the
   distinct-name table is checkpointed ONCE (recompute amplification of
   its lineage across the candidate self-joins was the dominant cost of
   the whole graph phase before this);
2. candidate pairs routed by shingle count:
   - short names (the bulk of an identifier vocabulary): deletion-
     neighborhood blocking (`deletion_candidate_pairs`) — EXACT at high
     thresholds, no probabilistic machinery;
   - long tail: MinHash signatures computed INLINE (array_min over
     xxhash64 of the shingle array), LSH banding with window-capped
     buckets + a co-partitioned self-join, and a signature-agreement
     prefilter before the exact verify;
3. exact Jaccard verify computed INLINE from the two name strings
   (array_intersect/array_union of their shingle arrays) on the distinct
   candidate stream; the verified edge set is checkpointed (lazily —
   the CC edge-count action materializes the whole candidate DAG in one
   job; the intermediate checkpoints dedup compute via the RDD cache
   without paying a serialized driver action each);
4. connected components by alternating large-star/small-star over the
   (tiny) surviving edge set, one fingerprint action per round;
5. canonical id = min name in each component; identity names omitted.

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
    sig: DataFrame, name_col: str = "name", bands: int = 8, max_bucket: int = 64,
    min_agree: int | None = None,
) -> DataFrame:
    """Band the signature; names sharing any (band_id, band_hash) bucket are
    candidates. Returns DISTINCT (a, b) with a < b.

    `max_bucket` caps degenerate buckets: short identifier names share most
    of their few shingles, so without a cap one hot band bucket yields
    O(bucket^2) pairs — the classic LSH-at-scale failure. Oversized buckets
    are NOT dropped (a short-identifier family can exceed the cap in EVERY
    band, which would silently lose its true near-dup edges); instead a
    deterministic pseudo-random sample of max_bucket members (window
    row_number ordered by xxhash64(name)) still emits capped pairs, so hot
    families keep surfacing edges — recall degrades gracefully instead of
    cliffing, and the transitive closure of the surviving edges recovers
    most of the family's component.

    Physical shape (reworked after profiling 200k-name runs): window-cap
    then SELF-JOIN on (band_id, bucket). The row_number window and both
    join sides hash-partition on the same key, so the join adds no extra
    exchange; pairs stream out of the join in parallel instead of being
    built inside per-bucket collect_list arrays (the former nested
    transform/flatten was a per-bucket serial hotspot and dominated the
    graph phase). The cap bounds the join fan-out at max_bucket^2/2 per
    bucket. Candidates are distinct()-ed HERE, before the exact-Jaccard
    verify: a pair can surface in up to `bands` buckets and the verify is
    expensive interpreted array math per pair — deduping the stream first
    cuts that work by the duplication factor, while the distinct itself is
    a cheap shuffle of short string pairs.

    `min_agree` (optional): minhash-agreement prefilter — keep a pair only
    if >= min_agree of its num_hashes signature slots match. The signature
    is already in hand on both join sides, the per-pair check is one
    zip_with equality count (an order of magnitude cheaper than the exact
    shingle Jaccard), and E[agreement] = J * num_hashes, so a cutoff a
    safety margin below threshold*num_hashes drops the bulk of the
    0.5-0.7-similar candidate mass (numeric-suffix identifier families)
    while passing true >=threshold pairs with probability ~1."""
    sig = sig.withColumn("_n", F.size("sig"))
    rows_per_band = F.floor(F.col("_n") / bands).cast("int")
    proj = [F.col(name_col).alias("name")] + ([F.col("sig")] if min_agree is not None else [])
    banded = sig.select(
        *proj,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
            )
        ).alias("band_id", "band"),
    ).withColumn("bucket", F.hash("band_id", F.col("band").cast("string")))
    w = Window.partitionBy("band_id", "bucket").orderBy(F.xxhash64("name"), "name")
    carry = ["band_id", "bucket", "name"] + (["sig"] if min_agree is not None else [])
    # checkpointed for the same both-sides-of-the-self-join reason as in
    # deletion_candidate_pairs; LAZY so it materializes inside the edges
    # job instead of as its own serialized blocking action (the RDD cache
    # still computes it once and shares it across both join sides)
    capped = (
        banded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_bucket)
        .select(*carry)
        .localCheckpoint(eager=False)
    )
    left = capped.withColumnRenamed("name", "a").withColumnRenamed("sig", "sig_a")
    right = capped.withColumnRenamed("name", "b").withColumnRenamed("sig", "sig_b")
    joined = left.join(right, on=["band_id", "bucket"]).filter(F.col("a") < F.col("b"))
    if min_agree is not None:
        agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        joined = joined.filter(agree >= min_agree)
    return joined.select("a", "b").distinct()


def deletion_candidate_pairs(
    names: DataFrame, name_col: str = "name", k: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Deletion-neighborhood blocking (SymSpell-style) for SHORT names —
    candidate pairs whose transitive closure EXACTLY reproduces the
    >=threshold near-dup components (the only downstream consumer is
    connected components; individual non-star edges are not needed).

    Why exact: if both names have <= ~18 distinct shingles, J(A,B) >=
    0.9 forces |A Δ B| <= 1 ((n+m)(1-J)/(1+J) < 2), i.e. the two shingle
    SETS are identical, or one is the other plus exactly one element.
    Every such pair shares a key where ONE side contributes its FULL-set
    hash and the other its {full} ∪ {set minus element i} hashes — and
    ONLY those: a minus-one key matching another name's minus-one key
    with a DIFFERENT element removed means |A Δ B| = 2, which can never
    reach the threshold for short names. Restricting matches to
    full x any kills the dominant false-candidate source (numeric-suffix
    identifier families — "foo_1" vs "foo_2" share the deletion key that
    drops the suffix shingle from each side, J ~ 0.5; profiled at 200k
    names: 1.16M any x any candidates -> ~800, with the exact verify
    shrinking proportionally).

    Pair generation is a STAR per key, not a quadratic bucket join: all
    full-key members of a key have the SAME shingle set (pairwise J = 1),
    so pairing every member of the key (either kind) with one
    deterministic full-side representative preserves every component
    reachable through that key — linear output per bucket, no cap, no
    recall cliff on mega-families, and no row_number window (the former
    per-bucket sort was a profiled hotspot). Keys with no full-side
    member emit nothing (minus-one x minus-one can't reach threshold).

    A second size cut: the (full A, B minus one) match implies J =
    (m-1)/m for |B| = m, which reaches `threshold` only when
    m >= 1/(1-threshold) (10 at 0.9) — so names with fewer shingles emit
    ONLY their full-set key (1 key instead of n+1; they can still match
    as the full side of a larger name's deletion key, and as identical
    sets). This shrinks the exploded key table ~4x on an identifier
    vocabulary dominated by very short names.

    Cost: <= (n+1) keys per name (n = shingle count, <= ~19), one
    explode + one partial-agg (min) + one equi-join on key; a hot key is
    one skewed join key, which AQE splits."""
    import math

    min_del = math.ceil(1.0 / (1.0 - threshold)) if threshold < 1 else 10**9
    # DISTINCT before sort: the exact verify (jaccard_inline) is set
    # Jaccard, so keys must hash the shingle SET — hashing the multiset
    # loses pairs that differ only in a duplicated occurrence (set-J 1.0
    # but different full keys) and breaks the (m-1)/m size bound
    arr = F.array_sort(F.array_distinct(shingle_array(F.col(name_col), k)))
    # kind 0 = hash of the full shingle set, kind 1 = minus-one-element
    keyed = names.select(F.col(name_col).alias("name"), arr.alias("sh")).select(
        "name",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.when(F.size("sh") >= min_del, F.size("sh")).otherwise(F.lit(0)),
                ),
                lambda i: F.xxhash64(
                    F.concat_ws("\x01", F.filter(F.col("sh"), lambda x, j: j != i - 1))
                ),
            )
        ).alias("kind_pos", "key"),
    ).withColumn("kind", F.least(F.col("kind_pos"), F.lit(1))).drop("kind_pos")
    # checkpoint before the agg + join: both consumers scan the same
    # checkpointed table instead of re-executing the key-explode lineage
    # (the table is ~(n_shingles+1) longs per name — small). LAZY: it
    # materializes within the first consuming job rather than as its own
    # serialized driver action
    keyed = keyed.localCheckpoint(eager=False)
    reps = (
        keyed.filter(F.col("kind") == 0)
        .groupBy("key")
        .agg(F.min("name").alias("rep"))
    )
    return (
        keyed.join(reps, on="key")
        .filter(F.col("name") != F.col("rep"))
        .select(F.least("rep", "name").alias("a"), F.greatest("rep", "name").alias("b"))
        .distinct()
    )


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


def _uf_batches(batches):
    """Union-find (union-by-min-label + path compression) over an iterator
    of pandas batches of (a, b) edges -> (parent dict, find fn). Shared by
    the single-task finisher and the per-partition forest stage; the final
    root of every component is its min label regardless of edge order."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for pdf in batches:
        for a, b in zip(pdf["a"], pdf["b"]):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
    return parent, find


def _local_cc(e: DataFrame) -> DataFrame:
    """Single-task union-find finisher for SMALL verified edge sets:
    (a,b) -> (name, component=min reachable name) in ONE narrow Arrow
    stage — no rounds, no shuffles, no per-round driver actions.

    Why it exists: each large-star/small-star round costs two window
    shuffles plus one convergence action, a fixed overhead that does not
    shrink with more cores; when the surviving near-dup edge set is a few
    thousand rows (the common case — LSH blocking + exact verify leave
    only true near-duplicate pairs, orders of magnitude fewer than
    names), those fixed costs dominate the whole graph phase. One task
    holding the edge endpoints in a dict is far cheaper than O(log n)
    distributed rounds — but ONLY while that one task stays small, so
    connected_components caps this path at `single_task_budget` edges and
    routes bigger sets through the two-level variant (`_two_level_cc`),
    whose per-task input is bounded by the same budget. Deterministic:
    the final root of every component is its global min name regardless
    of edge order. Label type follows the edge endpoint type (names are
    strings; doc-level dedup passes numeric ids)."""
    import pandas as pd
    from pyspark.sql import types as T

    dt = e.schema["a"].dataType
    schema = T.StructType(
        [T.StructField("name", dt), T.StructField("component", dt)]
    )

    def uf(batches):
        parent, find = _uf_batches(batches)
        yield pd.DataFrame(
            [(x, find(x)) for x in parent], columns=["name", "component"]
        )

    return e.coalesce(1).mapInPandas(uf, schema)


def _two_level_cc(e: DataFrame, tasks: int, max_iters: int = 20,
                  single_task_budget: int = 200_000) -> DataFrame:
    """Two-level union-find for MID-size edge sets (the measured 600k-doc
    superlinear phase): the raw edges are split across `tasks` parallel
    union-find tasks, each emitting its local spanning forest as
    (name, local_root) star rows; only the CONTRACTED cross-partition
    root graph is finished serially.

    Level 1 (parallel, the bulk of the work): per-partition union-find
    over ~|E|/tasks edges each — the union of per-partition spanning
    forests preserves exactly the original connectivity (a forest keeps
    its own partition's components connected; partitions connect through
    shared nodes).

    Level 2 (tiny): for every node, m = min of its local roots; each
    extra root r != m contributes a root-graph edge (r, m) — two local
    trees sharing a node thereby link their roots through that node's m.
    The root graph has one edge per DUPLICATED (node, root) row, so for
    clustered near-dup graphs it is orders of magnitude smaller than |E|
    (a k-clique spread over P tasks contributes <= P*(k-1) forest rows
    and ~P root edges vs k^2/2 raw edges). It is finished by the
    single-task union-find, or — for adversarial non-contracting shapes
    (e.g. a long path whose every node straddles two tasks) — by the
    star-rounds fallback, keyed on its measured size.

    Label correctness: the global min name y of a component is the min of
    its own local tree, hence a local root, hence present in the root
    graph (or the sole root, in which case every member's m is already
    y); min-label union at both levels therefore yields component = min
    reachable name — identical to the other two paths, under ANY edge
    partitioning."""
    import pandas as pd
    from pyspark.sql import types as T

    dt = e.schema["a"].dataType
    schema = T.StructType([T.StructField("name", dt), T.StructField("root", dt)])

    def forest(batches):
        parent, find = _uf_batches(batches)
        yield pd.DataFrame([(x, find(x)) for x in parent], columns=["name", "root"])

    # round-robin repartition: each task gets ~|E|/tasks edges; the result
    # is partitioning-invariant (min-label CC), so determinism holds
    lv1 = e.repartition(tasks).mapInPandas(forest, schema).localCheckpoint(eager=False)
    w = Window.partitionBy("name")
    lv = lv1.withColumn("m", F.min("root").over(w))
    mapping = lv.select("name", "m").distinct().localCheckpoint(eager=False)
    root_edges = (
        lv.where(F.col("root") != F.col("m"))
        .select(F.col("root").alias("a"), F.col("m").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # one scalar action: routes the finisher AND materializes lv1/mapping
    n_roots = root_edges.count()
    if n_roots == 0:
        return mapping.select("name", F.col("m").alias("component"))
    if n_roots <= single_task_budget:
        root_labels = _local_cc(root_edges)
    else:
        root_labels = _star_cc(root_edges, max_iters=max_iters)
    rl = root_labels.withColumnRenamed("name", "m").withColumnRenamed("component", "c")
    return mapping.join(rl, "m", "left").select(
        "name", F.coalesce("c", "m").alias("component")
    )


def _star_cc(e: DataFrame, max_iters: int = 20) -> DataFrame:
    """Alternating large-star/small-star rounds (Kiveris et al., SOCC'14)
    -> (name, component=min reachable name) for edge members. Input edges
    must be distinct with a != b. O(log n) rounds; each round is two
    window-min shuffles; the only driver action per CHECKED round is one
    tiny fingerprint aggregate. After the first three rounds convergence
    is only checked every second round — star rounds converge
    monotonically (no period-2 cycles), so fp(k) == fp(k-2) still implies
    a fixpoint, and skipped rounds stack lazily (their checkpoint
    materializes inside the next checked round's action), halving the
    tail's driver round-trips."""
    def fingerprint(df: DataFrame):
        # convergence check = equality of successive edge-set
        # fingerprints. TWO independent bounded hash sums (different
        # seeds and moduli) + the count: a false fixpoint needs a
        # simultaneous collision of both sums AND the count between
        # DIFFERENT sets — ~1e-12 per round vs ~1e-6 for one sum.
        # (pmod bounds each term so the bigint sum cannot overflow
        # under ANSI mode.)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(1_000_003))).alias("h1"),
            F.sum(F.pmod(F.xxhash64(F.lit(13), "b", "a"), F.lit(999_983))).alias("h2"),
        ).collect()[0]
        return (row["n"], row["h1"], row["h2"])

    prev = None
    for i in range(max_iters):
        # lazy checkpoint: the fingerprint aggregate is the round's ONE
        # action and materializes the checkpoint as a side effect — one
        # driver round-trip per checked round instead of two per round
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        if i >= 3 and (i - 3) % 2 == 0:
            continue  # unchecked round: stacks lazily into the next action
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
    return labels.union(roots).groupBy("name").agg(F.min("component").alias("component"))


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    name_col: str = "name",
    max_iters: int = 20,
    local_threshold: int | None = None,
    single_task_budget: int = 200_000,
) -> DataFrame:
    """(a,b) undirected edges [+ optional (name) isolated nodes] ->
    (name, component) where component = min name reachable.

    Size-adaptive, three physical paths routed by ONE count action (which
    also materializes the edge checkpoint):
    - n <= single_task_budget: single-task union-find (`_local_cc`) —
      the star rounds' fixed per-round costs (two window shuffles + an
      action) dominate tiny edge sets, and a <=200k-edge dict is
      sub-second Python;
    - n <= local_threshold (default: single_task_budget x cluster
      parallelism, capped at 16M — it SCALES with the cluster instead of
      being a constant): two-level union-find (`_two_level_cc`) — the raw
      edges are unioned in parallel tasks of ~budget edges each and only
      the contracted cross-partition root graph is finished serially.
      This is the fix for the measured 600k-doc superlinear phase, where
      a single-task 1M+-edge dict was minutes of one-core work at BOTH
      parallelism levels;
    - above: alternating large-star/small-star rounds (`_star_cc`,
      SURVEY.md §4.4): O(log n) rounds of two window-min shuffles each,
      convergence via a tiny fingerprint aggregate (checked every 2nd
      round after round 3). At 10^12-file scale this path carries
      arbitrarily large near-dup graphs.
    All three paths produce component = min reachable name and are
    bit-identical under any partitioning (min-label union is
    order-free); tests run each path on the same graphs.

    Only edge endpoints can ever change label, so when `nodes` is given its
    edge-free members are unioned in as identity rows without entering the
    iteration — at corpus scale the heavy paths run on the (small)
    near-duplicate subgraph, not the full entity vocabulary."""
    raw = edges.select("a", "b")
    # endpoints from the RAW input: a self-loop-only node has no real edge
    # but is still an endpoint and must keep its identity label
    endpoints = (
        raw.select(F.col("a").alias("name"))
        .union(raw.select(F.col("b").alias("name")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    par = max(1, edges.sparkSession.sparkContext.defaultParallelism)
    if local_threshold is None:
        local_threshold = min(single_task_budget * par, 16_000_000)
    e = (
        raw.where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    # one count action: decides the path AND materializes the lazy
    # checkpoint (the heavy paths' first round would have paid this anyway)
    n_edges = e.count()
    if n_edges <= min(single_task_budget, local_threshold):
        labels = _local_cc(e)
    elif n_edges <= local_threshold:
        tasks = max(2, min(2 * par, -(-n_edges // single_task_budget)))
        labels = _two_level_cc(
            e, tasks, max_iters=max_iters, single_task_budget=single_task_budget
        )
    else:
        # collapse to a bounded partition count first: each star round's
        # window pass should be a handful of real tasks, not
        # shuffle_partitions near-empty ones (the rounds' fixed cost is
        # what bounds CC at high parallelism)
        labels = _star_cc(
            e.coalesce(max(8, min(par, -(-n_edges // single_task_budget)))),
            max_iters=max_iters,
        )
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
    cc_local_threshold: int | None = None,
) -> DataFrame:
    """(name) distinct -> (name, canonical). Names in the same near-duplicate
    component share the lexicographically smallest member as canonical.

    Candidate generation is routed by shingle count (profiled on 200k-name
    tables; see deletion_candidate_pairs):
    - names with <= B shingles, B = ceil((1+thr)/(1-thr)) - 1 (18 at
      thr=0.9): deletion-neighborhood blocking — EXACT at the threshold,
      no minhash;
    - longer names (a small tail for identifier vocabularies): the
      MinHash-LSH banding path with the signature-agreement prefilter.
      The long subset starts at B-1 so cross-boundary pairs (one name just
      under B shingles, one just over) are seen by the LSH path too.
    The union is verified by exact Jaccard and materialized eagerly ONCE
    before connected components (whose own eager checkpoints would
    otherwise recompute the whole candidate DAG per action)."""
    import math

    # ONE materialization of the distinct name table: every consumer below
    # (the short/long routing filters and both sides of each candidate
    # self-join) would otherwise re-execute the full upstream lineage —
    # scan + distinct shuffle + interpreted shingle expressions — per use
    # (profiled: the recompute amplification, not the candidate math, was
    # the dominant cost of the whole graph phase). The distinct-name table
    # is orders of magnitude smaller than the mention stream, so the
    # checkpoint is cheap; on a cluster this is a persisted dataset.
    #
    # Explicit repartition to the cluster's parallelism BEFORE the
    # checkpoint: AQE coalesces the distinct's output to ONE partition
    # (the table is a few MB), which would serialize every downstream
    # interpreted expression — shingle arrays, deletion keys, minhash
    # signatures — onto a single core (profiled: the whole candidate
    # phase ran 1-partition serial and therefore did not speed up from
    # local[2] to local[8]). AQE does not re-coalesce a user-specified
    # repartition, so the candidate compute fans out across the cluster
    # while the shuffles stay tiny.
    # LAZY checkpoint: the whole candidate DAG (short + long branches) is
    # one union materialized by the edge-count action inside
    # connected_components, so the names table computes exactly once
    # within that job and is cached for every later consumer — without
    # spending a serialized blocking action per checkpoint here (profiled:
    # the graph phase's flat ~25s tail at high parallelism was mostly
    # these fixed-cost driver round-trips, the very thing that caps the
    # N->4N efficiency).
    par = names.sparkSession.sparkContext.defaultParallelism
    names = (
        names.select(F.col(name_col).alias("name"))
        .distinct()
        .repartition(par)
        .localCheckpoint(eager=False)
    )
    n_sh = F.size(F.array_distinct(shingle_array(F.col("name"), k)))
    max_short = max(2, math.ceil((1 + threshold) / (1 - threshold)) - 1) if threshold < 1 else 64
    short = names.filter(n_sh <= max_short)
    long_tail = names.filter(n_sh >= max_short - 1)
    pairs_short = deletion_candidate_pairs(short, "name", k, threshold=threshold)
    sig = inline_signatures(long_tail, "name", k, num_hashes)
    # minhash-agreement prefilter a 0.25-wide safety margin below the
    # verify threshold: P(drop | true J >= threshold) ~ 0.3% at 16 hashes,
    # while most sub-0.7 candidate mass dies before the expensive exact
    # verify (see lsh_candidate_pairs)
    min_agree = math.ceil(max(0.0, threshold - 0.25) * num_hashes)
    pairs_long = lsh_candidate_pairs(sig, "name", bands, max_bucket, min_agree=min_agree)
    pairs = pairs_short.union(pairs_long).distinct()
    edges = jaccard_inline(pairs, k, threshold).localCheckpoint(eager=False)
    # CC over edge members only; names with no near-duplicate are identity
    # and are NOT returned — callers coalesce(canonical, name)
    comp = connected_components(
        edges, nodes=None, name_col="name", max_iters=max_iters,
        local_threshold=cc_local_threshold,
    )
    return comp.withColumnRenamed("component", "canonical")
