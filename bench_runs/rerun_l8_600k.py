"""One-off: local[8]-only 600k full-pipeline trials to pair with the
probe-clean local[2] trial in r5_partb_600k_v2.out (its local[8] side
caught a 5.7%-steal window — §H/§M: degraded, retry)."""
import json, os, sys
sys.path.insert(0, "/root/repo")
from bench_scaling import run_level
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
for i in range(int(sys.argv[1]) if len(sys.argv) > 1 else 2):
    r = run_level(8, sf_dir, 600000, skip_graph=False, kg_only=True)
    k = r["kg"]
    print(f"trial {i}: e2e {k['end_to_end_sec']}s steal {k.get('steal_pct')}% "
          f"unit {k.get('in_run_unit_s')}s calib_speedup {k.get('host_calib',{}).get('parallel_speedup')}")
    print("JSON:" + json.dumps(r))
