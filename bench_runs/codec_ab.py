"""Interleaved zstd-vs-snappy A/B on the kg-only bench (own JVM per run).

Motive: r5 rehearsal showed kg_pipeline 19.9s vs r4's 14.8s after the
session default moved snappy->zstd; the 553720a commit claimed wall
parity.  Interleaving z/s/z/s in one window separates codec cost from the
host's sporadic interference bursts.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_scaling import run_level

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out = []
for i, codec in enumerate(["zstd", "snappy", "zstd", "snappy"]):
    os.environ["SPARK_GRAFT_PARQUET_CODEC"] = codec
    r = run_level(32, SF_DIR, n_docs=0, skip_graph=False, kg_only=True, kg_trials=1)
    row = {
        "i": i,
        "codec": codec,
        "kg_pipeline": r["queries"].get("kg_pipeline"),
        "kg_graph": r["queries"].get("kg_graph"),
        "e2e": r["kg"]["end_to_end_sec"],
        "stage_walls": r["kg"].get("stage_walls"),
        "busy_cpu_s": r["kg"].get("busy_cpu_s"),
        "steal_pct": r["kg"].get("steal_pct"),
        "telemetry": r.get("telemetry"),
    }
    out.append(row)
    print("ABROW:" + json.dumps(row), flush=True)
with open(os.path.join(os.path.dirname(__file__), "r5_codec_ab.json"), "w") as f:
    json.dump(out, f, indent=1)
