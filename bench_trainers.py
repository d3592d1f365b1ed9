"""Two-level scaling evidence for the distributed trainers (instrument).

Same discipline as bench_scaling.py (separate JVM per parallelism level,
alternating best-of-N, /proc/stat steal telemetry), applied to the two
fixed-point training operators:

- quality-LR (operators/training.py train_quality_lr): 8 full-batch GD
  iterations over the synthetic corpus content at --n-docs scale;
- TransE (functions/kge.py train_transe): 2 epochs over --n-triples
  md5-synthesized triples / --n-entities entities (dim 4).

Usage: python bench_trainers.py [n_low=2] [n_docs=300000] [n_triples=1000000]
Prints one JSON line (results are curated into BENCH.md §U by hand).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

RUNNER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from theta_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app_name="bench-trainers", master="local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")

out = {{}}

# ---- quality-LR over the corpus content ----
from theta_spark.corpus import corpus_df
from theta_spark.operators.training import train_quality_lr
corpus, _ = corpus_df(spark, {n_docs}, seed=42, num_partitions={cpus} * 4, with_docs=False)
docs = corpus.select(
    F.col("content").alias("text"), F.length("content").alias("n_chars")
).persist()
docs.count()  # corpus synthesis OUTSIDE the timed window: time TRAINING, not generation
t0 = time.time()
hist = train_quality_lr(docs, iters=8).collect()
lr_sec = time.time() - t0
out["qlr"] = {{
    "n_docs": {n_docs}, "iters": 8, "sec": round(lr_sec, 3),
    "doc_iters_per_sec": round({n_docs} * 9 / lr_sec, 1),
    "final_acc": hist[-1]["acc_num"] / hist[-1]["n_rows"],
}}

# ---- TransE over synthesized triples ----
from theta_spark.functions.kge import _draw32, init_embeddings, train_transe
NE, NR, NT = {n_entities}, 8, {n_triples}
tri = spark.range(NT).repartition({cpus} * 4).select(
    (_draw32(F.col("id"), "h", 1) % NE).alias("h"),
    (_draw32(F.col("id"), "r", 1) % NR).alias("r"),
    (_draw32(F.col("id"), "t", 1) % NE).alias("t"),
).withColumn("t_corr", (F.col("t") + 1 + _draw32(F.col("t"), "c", 1) % (NE - 1)) % NE).persist()
tri.count()  # triple synthesis outside the timed window
ent0 = init_embeddings(spark.range(NE).repartition({cpus} * 2), dim=4, tag="kge")
rel0 = init_embeddings(spark.range(NR), dim=4, tag="kger")
t0 = time.time()
ent_f, rel_f = train_transe(ent0, rel0, tri, epochs=2)
n_out = ent_f.count()
kge_sec = time.time() - t0
out["transe"] = {{
    "n_triples": NT, "n_entities": NE, "epochs": 2, "sec": round(kge_sec, 3),
    "triple_epochs_per_sec": round(NT * 2 / kge_sec, 1), "n_out": n_out,
}}
print("BENCHJSON:" + json.dumps(out))
"""


def _proc_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    user, nice, system, idle, iowait, irq, softirq, steal = (vals + [0] * 8)[:8]
    busy = user + nice + system + irq + softirq
    return busy, steal, busy + steal + idle + iowait


def run_level(cpus: int, n_docs: int, n_triples: int, n_entities: int) -> dict:
    code = RUNNER.format(
        repo=os.path.dirname(os.path.abspath(__file__)),
        cpus=cpus, n_docs=n_docs, n_triples=n_triples, n_entities=n_entities,
    )
    hz = os.sysconf("SC_CLK_TCK")
    b0, s0, t0 = _proc_stat()
    w0 = time.time()
    p = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    wall = time.time() - w0
    b1, s1, t1 = _proc_stat()
    for line in p.stdout.splitlines():
        if line.startswith("BENCHJSON:"):
            out = json.loads(line[len("BENCHJSON:"):])
            out["telemetry"] = {
                "proc_wall_s": round(wall, 1),
                "host_busy_cpu_s": round((b1 - b0) / hz, 1),
                "host_steal_cpu_s": round((s1 - s0) / hz, 1),
                "steal_pct": round(100.0 * (s1 - s0) / max(t1 - t0, 1), 1),
            }
            return out
    raise RuntimeError(f"runner failed: {p.stderr[-2000:]}")


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 300000
    n_triples = int(sys.argv[3]) if len(sys.argv) > 3 else 1000000
    n_entities = n_triples // 10
    n_high = n_low * 4
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2"))

    results: dict = {"levels": {}, "n_low": n_low, "n_high": n_high}
    best: dict = {}
    for t in range(trials):
        # alternate order per trial to decorrelate neighbor-load windows
        order = (n_low, n_high) if t % 2 == 0 else (n_high, n_low)
        for cpus in order:
            r = run_level(cpus, n_docs, n_triples, n_entities)
            results["levels"].setdefault(str(cpus), []).append(r)
            cur = best.get(cpus)
            if cur is None or (r["qlr"]["sec"] + r["transe"]["sec"]) < (
                cur["qlr"]["sec"] + cur["transe"]["sec"]
            ):
                best[cpus] = r
    factor = n_high // n_low
    effs = {}
    for key in ("qlr", "transe"):
        tp_l = best[n_low][key][
            "doc_iters_per_sec" if key == "qlr" else "triple_epochs_per_sec"
        ]
        tp_h = best[n_high][key][
            "doc_iters_per_sec" if key == "qlr" else "triple_epochs_per_sec"
        ]
        effs[key] = round((tp_h / tp_l) / factor, 3)
    results["best"] = {str(k): v for k, v in best.items()}
    results["scaling_efficiency"] = effs
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
