"""X6 data augmentation (reference: theta/utils/augment.py) as
deterministic DataFrame transformations.

Reference semantics re-expressed Spark-first:

- token-level del / swap / repl (`Augmenter.augment`, augment.py:90-148):
  the reference samples a position with `random`; here every "random"
  draw is an md5 hash of (doc_id, draw tag, seed) so the same row always
  augments the same way on any executor AND the DuckDB oracle can replay
  the draw bit-for-bit. `token_del` keeps sequence length by splicing in
  `[PAD]` (augment.py:96-104 pads to the deleted token's bert_length; the
  whitespace analog is one PAD).
- the token index (`Augmenter.__init__`, augment.py:17-28: per-token
  document_freq loaded from a prebuilt JSON) becomes a distributed
  aggregation over the corpus itself — `vocab_index` — so there is no
  driver-side index file to build or ship.
- frequency-weighted sampling (`np.random.choice(..., p=span_freqs)`,
  augment.py:76-79) becomes an interval lookup on the cumulative-
  frequency table: candidate c owns [lo_c, hi_c) of [0, 1), the row's
  uniform draw u picks the owner. The lookup is a BUCKETED EQUI-JOIN
  (candidates exploded onto the fixed-width buckets their interval
  overlaps, rows joined on floor(u*B)) — a hash join on a broadcastable
  index, NOT an O(rows x vocab) nested-loop range join, so the plan
  survives a 100x corpus. Degenerate case: one candidate interval can
  span many buckets, but the explode is bounded by B + |vocab|.
- span-level 'span_freq' replacement (`Augmenter.augment`,
  augment.py:56-88): replace one mention per doc with a same-category
  span drawn by document frequency, then rewrite the text and SHIFT the
  offsets of every later mention — the tagged-example (tokens, labels)
  rewrite of augment.py:85-88 done on (text, char-offset mentions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAD = "[PAD]"
N_BUCKETS = 1024


def _h32(*cols) -> "F.Column":
    """Deterministic 32-bit draw: first 8 md5 hex chars of the
    concatenated inputs as a bigint in [0, 2^32). The DuckDB twin is
    ('0x' || substr(md5(s), 1, 8))::BIGINT."""
    return F.conv(F.substring(F.md5(F.concat_ws("", *cols)), 1, 8), 16, 10).cast("long")


def _pos(id_col, tag: str, seed: int, n) -> "F.Column":
    """1-based deterministic position in [1, n]."""
    return (F.lit(1) + F.pmod(_h32(F.col(id_col), F.lit(f"#{tag}#{seed}")), n)).cast("int")


def vocab_index(docs: DataFrame, text_col: str = "text", bucket_chars: int = 2) -> DataFrame:
    """The reference's token index (augment.py:17-28) built distributed:
    whitespace token -> document frequency -> cumulative [lo, hi) share
    of [0, 1). -> (token, lo, hi); ordering/intervals identical to a
    global ORDER BY token cumsum.

    TWO-PHASE prefix sum (VERDICT r4 #3 — the old unpartitioned
    orderBy-token window ran the whole vocab cumsum on ONE task; a 100-TB
    code corpus has 10^8+ distinct tokens):

      1. within-bucket cumsum: Window.partitionBy(bkt).orderBy(token)
         where bkt = the token's first `bucket_chars` chars — a PREFIX of
         the sort key, so (bkt, token) ordering == global token ordering
         and buckets are contiguous token ranges;
      2. per-bucket offsets: total dfreq of all strictly-smaller buckets,
         via a tiny triangular self-join over the per-bucket totals (no
         window at all). |buckets| is bounded by the alphabet^bucket_chars
         of token first-chars (a few thousand for code), so the join is
         O(B^2) over an aggregated side that does not grow with the
         corpus; raise bucket_chars if a corpus concentrates tokens under
         few prefixes.

    lo/hi stay INTEGER sums until the final division, so the result is
    bit-identical to the single-window formula (and to the DuckDB oracle).
    """
    from theta_spark.prefix import two_phase_cumsum

    vocab = (
        docs.select(F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("dfreq"))
        .withColumn("bkt", F.substring("token", 1, bucket_chars))
    )
    cum = two_phase_cumsum(vocab, "dfreq", "token", "bkt")
    grand = vocab.agg(F.sum("dfreq").alias("grand"))
    return (
        cum.crossJoin(F.broadcast(grand))
        .select(
            "token",
            ((F.col("_cum") - F.col("dfreq")) / F.col("grand")).alias("lo"),
            (F.col("_cum") / F.col("grand")).alias("hi"),
        )
    )


def bucketize_index(
    cum: DataFrame,
    n_buckets: int = N_BUCKETS,
    token_col: str = "token",
    key_cols: tuple = (),
) -> DataFrame:
    """Explode each candidate's [lo, hi) interval onto every fixed-width
    bucket it overlaps, so weighted choice becomes an equi-join on
    `bucket` instead of a nested-loop u BETWEEN lo AND hi scan.
    `key_cols` are carried through for per-key indexes (e.g. the span
    index's per-category [0,1) shares)."""
    return cum.select(
        *key_cols,
        F.explode(
            F.sequence(
                F.floor(F.col("lo") * n_buckets).cast("int"),
                F.least(
                    F.ceil(F.col("hi") * n_buckets).cast("int") - 1, F.lit(n_buckets - 1)
                ),
            )
        ).alias("bucket"),
        token_col,
        "lo",
        "hi",
    )


def weighted_choice(
    rows: DataFrame,
    cum_bucketed: DataFrame,
    u_col: str,
    out_col: str,
    n_buckets: int = N_BUCKETS,
    token_col: str = "token",
    key_cols: tuple = (),
    how: str = "left",
) -> DataFrame:
    """Attach the frequency-weighted pick for each row's uniform draw
    `u_col` in [0, 1): broadcast-hash-join on the draw's bucket (plus any
    `key_cols` equality for per-key indexes), then the interval test
    selects the single owning candidate."""
    cond = (
        (F.floor(rows[u_col] * n_buckets).cast("int") == cum_bucketed["bucket"])
        & (rows[u_col] >= cum_bucketed["lo"])
        & (rows[u_col] < cum_bucketed["hi"])
    )
    for kc in key_cols:
        cond = cond & (rows[kc] == cum_bucketed[kc])
    picked = rows.join(F.broadcast(cum_bucketed), cond, how)
    for kc in key_cols:
        picked = picked.drop(cum_bucketed[kc])
    return picked.drop("bucket", "lo", "hi").withColumnRenamed(token_col, out_col)


def augment_tokens(
    docs: DataFrame,
    ops: tuple = ("del", "swap", "repl"),
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Token-level augment_sent (augment.py:151-214 tokenize -> augment
    -> rejoin; ops at :96-148): one output column per op.

    - del_text:  token at pos1 replaced by [PAD] (del, :96-104)
    - swap_text: tokens at pos1/pos2 exchanged (swap, :139-143)
    - repl_text: token at pos1 replaced by a document-frequency-weighted
      draw from the whole-corpus vocab (repl via sample_token, :105-138;
      the reference draws from its prebuilt index, here the index is the
      `vocab_index` aggregation)

    Everything stays in whole-stage codegen (split/sequence/element_at/
    array_join); the only join is the broadcast bucketed vocab lookup.
    """
    t = F.split(F.col(text_col), " ")
    n = F.size(t)
    pos1 = _pos(id_col, "p1", seed, n)
    pos2 = _pos(id_col, "p2", seed, n)
    out = docs.select(
        id_col,
        text_col,
        t.alias("_t"),
        n.alias("_n"),
        pos1.alias("_p1"),
        pos2.alias("_p2"),
        (_h32(F.col(id_col), F.lit(f"#u#{seed}")) / F.lit(4294967296.0)).alias("_u"),
    )
    idx = F.sequence(F.lit(1), F.col("_n"))
    if "del" in ops:
        out = out.withColumn(
            "del_text",
            F.array_join(
                F.transform(
                    idx,
                    lambda i: F.when(i == F.col("_p1"), F.lit(PAD)).otherwise(
                        F.element_at(F.col("_t"), i)
                    ),
                ),
                " ",
            ),
        )
    if "swap" in ops:
        out = out.withColumn(
            "swap_text",
            F.array_join(
                F.transform(
                    idx,
                    lambda i: F.element_at(
                        F.col("_t"),
                        F.when(i == F.col("_p1"), F.col("_p2"))
                        .when(i == F.col("_p2"), F.col("_p1"))
                        .otherwise(i),
                    ),
                ),
                " ",
            ),
        )
    if "repl" in ops:
        cum = bucketize_index(vocab_index(docs, text_col), n_buckets)
        out = weighted_choice(out, cum, "_u", "_repl", n_buckets)
        out = out.withColumn(
            "repl_text",
            F.array_join(
                F.transform(
                    idx,
                    # coalesce guards the float-boundary gap case: if a draw
                    # u falls in a 1-ulp crack between adjacent [lo, hi)
                    # intervals the left join yields a null pick, and a bare
                    # _repl would make array_join silently DROP the token —
                    # keeping the original token instead preserves the token
                    # count (and the miss stays detectable as repl_text ==
                    # text, never as a corrupted shorter sentence)
                    lambda i: F.when(
                        i == F.col("_p1"),
                        F.coalesce(F.col("_repl"), F.element_at(F.col("_t"), i)),
                    ).otherwise(F.element_at(F.col("_t"), i)),
                ),
                " ",
            ),
        ).drop("_repl")
    return out.drop("_t", "_n", "_p1", "_p2", "_u")


def span_freq_index(mentions: DataFrame) -> DataFrame:
    """Per-category span document-frequency index (augment.py:20-28:
    all_spans + span_freqs normalized per span type) -> (category, mention,
    lo, hi) with [lo, hi) the span's share of [0, 1) WITHIN its category."""
    spans = mentions.groupBy("category", "mention").agg(
        F.countDistinct("doc_id").alias("dfreq")
    )
    w = Window.partitionBy("category").orderBy("mention")
    total = Window.partitionBy("category")
    return spans.select(
        "category",
        "mention",
        (
            F.coalesce(F.sum("dfreq").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
            / F.sum("dfreq").over(total)
        ).alias("lo"),
        (F.sum("dfreq").over(w.rowsBetween(Window.unboundedPreceding, 0)) / F.sum("dfreq").over(total)).alias("hi"),
    )


def augment_span_freq(
    docs: DataFrame,
    mentions: DataFrame,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> tuple:
    """Span-level 'span_freq' (augment.py:56-88): per doc, replace ONE
    deterministic target mention with a same-category span drawn by
    document frequency, splice the text, and shift every later mention's
    char offset by the length delta (the (tokens, labels) rewrite of
    augment.py:85-88 done on char offsets).

    mentions: (doc_id, category, start, mention) with `start` a 0-based
    char offset into the doc text. Returns (aug_docs, aug_mentions);
    docs without mentions pass through unchanged (augment.py:58-59
    returns the example untouched when no span position exists).

    Scale shape: one window per doc to pick the target (shuffle on
    doc_id, same key as every downstream per-doc stage), the span index
    broadcast, the splice pure codegen string ops.
    """
    pick = Window.partitionBy("doc_id").orderBy(
        _h32(F.col("doc_id"), F.lit(f"#t#{seed}"), F.col("start"), F.col("category")),
        "start",
        "category",
    )
    target = (
        mentions.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_u", _h32(F.col("doc_id"), F.lit(f"#su#{seed}")) / F.lit(4294967296.0))
    )
    # per-category weighted pick: the shared bucketed-interval machinery
    # with category as the index key (bucket within (category, bucket))
    cum = span_freq_index(mentions).withColumnRenamed("mention", "span")
    cumb = bucketize_index(cum, token_col="span", key_cols=("category",))
    tgt = weighted_choice(
        target, cumb, "_u", "new_span",
        token_col="span", key_cols=("category",), how="inner",
    ).select(
        "doc_id",
        F.col("category").alias("old_category"),
        F.col("start").alias("old_start"),
        F.length("mention").alias("old_len"),
        "new_span",
    )
    aug_docs = (
        docs.join(tgt, on=docs[id_col] == tgt["doc_id"], how="left")
        .select(
            docs["*"],
            F.when(
                tgt["doc_id"].isNull(), F.col(text_col)
            )
            .otherwise(
                F.concat(
                    F.substring(F.col(text_col), 1, F.col("old_start")),
                    F.col("new_span"),
                    F.expr(f"substring({text_col}, old_start + old_len + 1)"),
                )
            )
            .alias("aug_text"),
        )
    )
    delta = F.length("new_span") - F.col("old_len")
    aug_mentions = (
        mentions.join(tgt, on="doc_id", how="left")
        .select(
            "doc_id",
            "category",
            F.when(F.col("old_start").isNull() | (F.col("start") <= F.col("old_start")), F.col("start"))
            .otherwise(F.col("start") + delta)
            .cast("int")
            .alias("start"),
            F.when(
                (F.col("start") == F.col("old_start")) & (F.col("category") == F.col("old_category")),
                F.col("new_span"),
            )
            .otherwise(F.col("mention"))
            .alias("mention"),
        )
    )
    return aug_docs, aug_mentions
