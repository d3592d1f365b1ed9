"""Physical-plan audits: the properties that matter at 100 TB, asserted on
explain() output — filter pushdown reaches the scan, small dims broadcast,
the fused extraction is narrow (no shuffle before the Python stage), and
triple assembly reuses one doc_id exchange."""

from pyspark.sql import functions as F

from theta_spark.config import PipelineConfig
from theta_spark.operators.triples import assemble_triples
from theta_spark.pipeline import extract_mentions_df, with_doc_id


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = d.filter(F.col("l_quantity") > 25).select("l_orderkey", "l_quantity")
    p = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25" in p
    # column pruning: ReadSchema carries only the two needed columns
    rs = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in rs and "l_extendedprice" not in rs


def test_broadcast_join_for_small_dims(spark):
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    q = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).groupBy("n_name").count()
    assert "BroadcastHashJoin" in plan_of(q)


def test_fused_extraction_is_narrow(spark, corpus50):
    m = extract_mentions_df(corpus50, PipelineConfig())
    p = plan_of(m)
    # no Exchange between the corpus scan and the Python stage: the fused
    # mapInPandas consumes the corpus partitioning directly
    before_py = p.split("MapInPandas")[0] if "MapInPandas" in p else p
    section = before_py.split("ArrowEvalPython")[0]
    assert "Exchange" not in section.split("== Physical Plan ==")[-1]


def test_triple_assembly_single_exchange(spark, corpus50):
    m = extract_mentions_df(corpus50, PipelineConfig())
    t = assemble_triples(m)
    p = plan_of(t)
    phys = p.split("== Physical Plan ==")[-1].split("== Initial Plan ==")[0]
    # exchanges: one hashpartitioning(doc_id) for the window family + the
    # final distinct's (AQE may add shuffle reads but not more writes)
    n_exchange = phys.count("Exchange hashpartitioning")
    assert n_exchange <= 2, f"{n_exchange} exchanges:\n{phys[:2000]}"
    assert "WindowGroupLimit" in phys or "Window" in phys


def test_doc_id_projection_prunes_corpus(spark, corpus50):
    d = with_doc_id(corpus50).select("doc_id")
    p = plan_of(d)
    assert "sha2" not in p.lower().split("== physical plan ==")[-1]


def test_multiprobe_corpus_never_shuffles(spark):
    """IVF multi-probe: the corpus side reaches its scorer through
    broadcast joins only — the only Exchange writes allowed are the tiny
    centroid aggregation's (cell, pos) shuffle and broadcast exchanges.
    At 10^9 vectors the corpus table must not hash-repartition."""
    from theta_spark.functions.similarity import ivf_topk_multiprobe

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 25 == 0)
    p = plan_of(ivf_topk_multiprobe(e, q, k=5, nprobe=2))
    phys = p.split("== Physical Plan ==")[-1].split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in phys or "BroadcastNestedLoopJoin" in phys
    # hash exchanges: centroid per-(cell,pos) agg + its rebuild + the final
    # per-query rank window; none keyed on the corpus row id
    assert "Exchange hashpartitioning(vec_id" not in phys
    assert "Exchange hashpartitioning(neighbor_id" not in phys


def test_partitioned_edges_prune_on_pred(spark, corpus50, tmp_path):
    """run_pipeline writes edges partitioned by pred (nodes by category);
    a predicate filter must prune whole partition directories at the scan
    (PartitionFilters), not read-then-filter."""
    from theta_spark.pipeline import run_pipeline

    stages = run_pipeline(spark, corpus50, str(tmp_path / "wd"), PipelineConfig(), resume=False)
    assert stages["edges"].count() > 0
    edges = spark.read.parquet(str(tmp_path / "wd" / "edges"))
    q = edges.filter(F.col("pred") == "calls")
    p = plan_of(q)
    pf = [l for l in p.splitlines() if "PartitionFilters" in l]
    assert pf and "pred" in pf[0], p
    got = {r.pred for r in q.select("pred").distinct().collect()}
    assert got == {"calls"}
