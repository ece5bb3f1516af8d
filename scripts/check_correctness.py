"""Driver-style correctness check: run every ``queries()`` entry in
``__spark_entry__.py`` at sf0.01 next to its DuckDB ``oracle_sql()``
and compare row count, schema (column names), and a value hash with
columns sorted by name — the same comparison shape the round driver
records in CORRECTNESS_r{N}.json. Run before round end to catch a
red cell locally instead of in the verdict.

Usage: python scripts/check_correctness.py [sf_dir] [key ...]
"""
from __future__ import annotations

import hashlib
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # match integral floats to ints so HUGEINT->float artifacts show
        # up as schema/type diffs, not silent value diffs
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .appName("check_correctness")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    report, n_bad = {}, 0
    for key, fn in qs.items():
        if only and key not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            osql = oracles.get(key)
            if osql is None:
                report[key] = {"rows": len(srows), "no_oracle": True}
                continue
            ores = con.execute(osql)
            ocols = [d[0] for d in ores.description]
            orows = [tuple(r) for r in ores.fetchall()]
            rec = {
                "rows_match": len(srows) == len(orows),
                "schema_match": sorted(scols) == sorted(ocols),
                "hash_match": _hash(scols, srows) == _hash(ocols, orows),
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
            }
        except Exception as e:  # noqa: BLE001 — driver records err strings
            rec = {"err": f"{type(e).__name__}: {e}"[:300]}
        report[key] = rec
        ok = rec.get("rows_match") and rec.get("schema_match") and rec.get(
            "hash_match"
        )
        if not ok and "no_oracle" not in rec:
            n_bad += 1
        print(f"{key}: {'OK' if ok else rec}", flush=True)

    print(json.dumps({"n_checked": len(report), "n_bad": n_bad}))
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
