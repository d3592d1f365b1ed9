"""Driver-mimic: run each __spark_entry__.queries()[name] in Spark and its
oracle_sql()[name] in DuckDB over the same parquet, compare row count +
order-insensitive value hash (columns sorted by name, like the driver)."""

from __future__ import annotations

import hashlib

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark, sf_dir: str, name: str, fn, sql: str | None):
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    result = {"name": name, "spark_rows": len(srows)}
    if sql is None:
        result["status"] = "rows_only"
        result["ok"] = True
        return result
    con = duck_con(sf_dir)
    cur = con.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    result["duck_rows"] = len(drows)
    if sorted(scols) != sorted(dcols):
        result["status"] = f"schema_mismatch spark={sorted(scols)} duck={sorted(dcols)}"
        result["ok"] = False
        return result
    sh = value_hash(srows, scols)
    dh = value_hash(drows, dcols)
    result["ok"] = (len(srows) == len(drows)) and (sh == dh)
    result["status"] = "match" if result["ok"] else f"hash_mismatch ({sh[:8]} vs {dh[:8]})"
    return result


def run_all(spark, sf_dir: str, only: list | None = None):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            results.append(compare(spark, sf_dir, name, fn, oracles.get(name)))
        except Exception as e:  # noqa: BLE001
            results.append({"name": name, "ok": False, "status": f"error: {e}"})
    return results
