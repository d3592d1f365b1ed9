"""One-off: re-run bench_scaling part B (full pipeline, headline pair)
with extra alternating trials and print the per-trial + best JSON; used
to extend the best-of-N evidence when a run landed in a neighbor burst."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import best_of, control_pair  # noqa: E402

if __name__ == "__main__":
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs_full = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    fp = best_of([2, 8], sf_dir, n_docs_full, skip_graph=False, trials=trials)
    e2e_low = fp[2]["kg"]["n_triples"] / fp[2]["kg"]["end_to_end_sec"]
    e2e_high = fp[8]["kg"]["n_triples"] / fp[8]["kg"]["end_to_end_sec"]
    ctrl = control_pair(2, 8, 100000, 2)
    print("CTRL:" + json.dumps(ctrl))
    print("EFF_E2E:", round(e2e_high / e2e_low / 4, 3))
    print("BEST:" + json.dumps({"2": fp[2], "8": fp[8]}))
