"""Model checkpoint store + registry (S7/S9, O3).

Reference semantics re-expressed storage-first:
- `save_model` = theta/nlp/tasks/task.py:386-397 (`save_model` dill-dumps
  the state dict into a per-run directory) — here the numpy weight arrays
  of an `MLPScorer` go to one .npz per saved version;
- the registry = the reference's run-dir convention plus its
  `latest_path` symlink (task.py:576-577, 763-767) — here an append-only
  JSON-lines file of (name, ts, path, metrics) rows, queried as a
  DataFrame ordered by ts (O3: registry ordered by timestamp), with
  `latest` resolving the newest row instead of a symlink (object stores
  have no symlinks; an ordered scan is the cluster-correct equivalent).

The registry file is driver-side metadata (a few rows per training run —
never big data); the .npz weights are what executors ultimately receive
via closure broadcast when the scorer is plugged into the fused stage.
"""

from __future__ import annotations

import json
import os
import time


WEIGHT_KEYS = ("W1", "b1", "Ws", "bs", "We", "be")


def save_model(scorer, registry_dir: str, name: str, metrics: dict | None = None, ts: int | None = None) -> str:
    """Persist an MLPScorer's weights and append a registry row. Returns
    the weights path."""
    import numpy as np

    ts = int(ts if ts is not None else time.time() * 1000)
    os.makedirs(os.path.join(registry_dir, "models"), exist_ok=True)
    path = os.path.join(registry_dir, "models", f"{name}-{ts}.npz")
    np.savez(path, **{k: getattr(scorer, k) for k in WEIGHT_KEYS})
    row = {
        "name": name,
        "ts": ts,
        "path": path,
        "n_params": int(sum(getattr(scorer, k).size for k in WEIGHT_KEYS)),
        "metrics": metrics or {},
    }
    with open(os.path.join(registry_dir, "registry.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    return path


def load_model(path: str):
    """Rehydrate an MLPScorer from a saved .npz — the second half of the
    checkpoint-store contract: a scorer saved on one driver loads on
    another and plugs into the same fused stage."""
    import numpy as np

    from theta_spark.operators.neural import MLPScorer

    with np.load(path) as z:
        return MLPScorer(*(z[k] for k in WEIGHT_KEYS))


def registry_df(spark, registry_dir: str):
    """Registry scan as a DataFrame ordered newest-first (O3). The
    metrics map comes back as a JSON string column so the schema stays
    stable regardless of which metrics each run recorded."""
    from pyspark.sql import functions as F

    rows = []
    reg = os.path.join(registry_dir, "registry.jsonl")
    if os.path.exists(reg):
        with open(reg) as f:
            for line in f:
                r = json.loads(line)
                rows.append((r["name"], r["ts"], r["path"], r["n_params"], json.dumps(r["metrics"])))
    df = spark.createDataFrame(
        rows, "name string, ts long, path string, n_params long, metrics string"
    )
    return df.orderBy(F.desc("ts"), "name")


def latest(registry_dir: str, name: str) -> str | None:
    """Newest saved weights path for `name` (the reference's latest_path
    symlink, resolved by ordered scan)."""
    reg = os.path.join(registry_dir, "registry.jsonl")
    if not os.path.exists(reg):
        return None
    best = None
    with open(reg) as f:
        for line in f:
            r = json.loads(line)
            if r["name"] == name and (best is None or r["ts"] > best["ts"]):
                best = r
    return best["path"] if best else None
