"""A/B the SimHash UDF interior (old per-token-occurrence md5 loop vs the
r5 distinct-token + bincount path) over the real sf0.1 documents text,
in-process on equal pandas batches — isolates exactly the changed code."""
import sys, time, hashlib
import numpy as np, pandas as pd
import pyarrow.parquet as pq
sys.path.insert(0, "/root/repo")
from theta_spark.functions.dedup import _simhash64_batch as new_impl

def old_impl(texts: pd.Series) -> pd.Series:
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    out = np.zeros(len(texts), dtype=np.int64)
    for row, text in enumerate(texts):
        acc = np.zeros(64, dtype=np.int64)
        for tok in (text or "").lower().split():
            h = np.frombuffer(hashlib.md5(tok.encode()).digest()[:8], dtype=">u8")[0]
            bits = (h >> shifts) & one
            acc += np.where(bits == one, 1, -1)
        u = int(np.sum((acc > 0).astype(np.uint64) << shifts, dtype=np.uint64))
        out[row] = u - (1 << 64) if u >= (1 << 63) else u
    return pd.Series(out)

t = pq.read_table("/root/testdata/sf0.1/documents.parquet", columns=["text"])
texts = t.column("text").to_pandas()
print(f"{len(texts)} docs, {texts.str.len().sum()/1e6:.1f}M chars")
batches = [texts.iloc[i:i+10000].reset_index(drop=True) for i in range(0, len(texts), 10000)]
res = {}
for name, fn in (("new", new_impl), ("old", old_impl), ("new2", new_impl), ("old2", old_impl)):
    t0 = time.time(); outs = [fn(b) for b in batches]; dt = time.time() - t0
    res[name] = (dt, outs)
    print(f"{name}: {dt:.2f}s  ({len(texts)/dt:,.0f} docs/s)")
a = pd.concat(res["new"][1]); b = pd.concat(res["old"][1])
print("bit-identical:", bool((a.values == b.values).all()))
best_new = min(res["new"][0], res["new2"][0]); best_old = min(res["old"][0], res["old2"][0])
print(f"speedup (best-of-2): {best_old/best_new:.2f}x  old {best_old:.2f}s -> new {best_new:.2f}s")
