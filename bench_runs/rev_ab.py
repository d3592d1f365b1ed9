"""Interleaved HEAD-vs-r4 A/B on the kg-only bench (own JVM per run).

Motive: every r5 window read kg_pipeline slower than BENCH_r04's 14.8s
(rehearsal 19.9s, codec-A/B window 26-28s) while the codec A/B ruled out
zstd. Interleaving HEAD/r4/HEAD/r4 in one window — each side running its
OWN checked-out bench_scaling + theta_spark — decides regression vs host.
r4 side: worktree at f5228da (the round-4 tag commit).
"""
import importlib.util
import json
import os
import sys

HEAD = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R4 = os.path.join(HEAD, "bench_runs", "wt_r4")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# r4's run_level predates the kg_trials kwarg; the knob is this env var in
# both revisions, so set it once instead of passing the kwarg
os.environ["SPARK_GRAFT_BENCH_KG_TRIALS"] = "1"


def load_run_level(repo):
    spec = importlib.util.spec_from_file_location(
        f"bs_{os.path.basename(repo)}", os.path.join(repo, "bench_scaling.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.run_level


out = []
for i, (label, repo) in enumerate(
    [("head", HEAD), ("r4", R4), ("head", HEAD), ("r4", R4), ("head", HEAD), ("r4", R4)]
):
    r = load_run_level(repo)(32, SF_DIR, n_docs=0, skip_graph=False, kg_only=True)
    row = {
        "i": i,
        "rev": label,
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
with open(os.path.join(HEAD, "bench_runs", "r5_rev_ab.json"), "w") as f:
    json.dump(out, f, indent=1)
