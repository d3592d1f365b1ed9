"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two parallelism levels — local[N] and local[4N] — in
separate JVMs on the same input, and we report throughput at both plus
    eff = (throughput_4N / throughput_N) / 4.

Usage: python bench_scaling.py [n_low] [n_docs]
Writes BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

RUNNER = """
import json, sys
sys.path.insert(0, {repo!r})
from bench import run_bench
out = run_bench(sf_dir={sf_dir!r}, cpus={cpus!r}, n_docs={n_docs})
print("BENCHJSON:" + json.dumps(out))
"""


def run_level(cpus: int, sf_dir: str, n_docs: int) -> dict:
    code = RUNNER.format(repo=os.path.dirname(os.path.abspath(__file__)), sf_dir=sf_dir, cpus=str(cpus), n_docs=n_docs)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in proc.stdout.splitlines():
        if line.startswith("BENCHJSON:"):
            return json.loads(line[len("BENCHJSON:"):])
    raise RuntimeError(f"no bench output at cpus={cpus}: {proc.stderr[-2000:]}")


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    n_high = n_low * 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    t0 = time.time()
    low = run_level(n_low, sf_dir, n_docs)
    high = run_level(n_high, sf_dir, n_docs)

    tl = low["kg"]["triples_per_sec"]
    th = high["kg"]["triples_per_sec"]
    eff = (th / tl) / (n_high / n_low)
    # end-to-end incl. graph materialization
    el = low["kg"]["n_triples"] / low["kg"]["end_to_end_sec"]
    eh = high["kg"]["n_triples"] / high["kg"]["end_to_end_sec"]
    eff_e2e = (eh / el) / (n_high / n_low)

    result = {
        "n_docs": n_docs,
        "levels": {str(n_low): low, str(n_high): high},
        "triples_per_sec": {str(n_low): tl, str(n_high): th},
        "scaling_efficiency_extract": round(eff, 3),
        "scaling_efficiency_end_to_end": round(eff_e2e, 3),
        "wall_s": round(time.time() - t0, 1),
    }

    with open("BENCH.md", "w") as f:
        f.write(f"""# BENCH — engine throughput + scaling evidence

Input: deterministic synthetic corpus (input_hint schema), {n_docs} docs,
seed 42, generated distributed. Same input at both parallelism levels;
separate JVMs per level (stand-in for N vs 4N executors per driver
instruction). Pipeline = the checkpoint-resumable production path
(parquet stage snapshots included in timings).

| level | extract (mentions+triples) sec | triples/sec | end-to-end sec (incl. LSH+CC+graph) |
|---|---|---|---|
| local[{n_low}] | {low['queries']['kg_pipeline']} | {tl} | {low['kg']['end_to_end_sec']} |
| local[{n_high}] | {high['queries']['kg_pipeline']} | {th} | {high['kg']['end_to_end_sec']} |

- extraction scaling efficiency (local[{n_low}] -> local[{n_high}]): **{eff:.3f}**
- end-to-end scaling efficiency: **{eff_e2e:.3f}**
- corpus: {low['kg']['n_chars']} chars, {low['kg']['n_mentions']} mentions,
  {low['kg']['n_triples']} triples, {low['kg']['n_nodes']} nodes,
  {low['kg']['n_edges']} edges

Full per-level JSON:

```json
{json.dumps(result['levels'], indent=2)}
```
""")
    print(json.dumps({k: v for k, v in result.items() if k != "levels"}))


if __name__ == "__main__":
    main()
