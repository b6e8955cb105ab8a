"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at a given sf dir on Spark AND its oracle_sql()
in DuckDB, compares row count, column names, and an order-insensitive value
hash (columns sorted by name, rows sorted, values stringified like the
driver plausibly does). Prints one line per query.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from entity_resolution_pipeline_spark.session import build_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return str(int(val))
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        if val == int(val) and abs(val) < 1e15:
            return str(int(val))
        return f"{val:.9g}"
    return str(val)


def frame_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sig_rows = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows
    )
    import hashlib

    h = hashlib.sha1("\n".join(sig_rows).encode()).hexdigest()[:16]
    return sorted(cols), len(rows), h


def main(sf_dir: str, only: list[str] | None = None):
    spark = build_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            s_sig = frame_signature(scols, [tuple(r) for r in srows])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:160]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {s_sig[1]} rows (no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            o_sig = frame_signature(ocols, orows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:160]}")
            failures += 1
            continue
        if s_sig == o_sig:
            print(f"OK    {name}: {s_sig[1]} rows")
        else:
            failures += 1
            print(f"FAIL  {name}: spark={s_sig} oracle={o_sig}")
    print("FAILURES:", failures)
    spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    main(sf, only)
