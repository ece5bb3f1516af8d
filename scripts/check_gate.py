"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf_dir and
compares against ``oracle_sql()`` executed by DuckDB on the same
parquet tables: row count, column names, and an order-insensitive
value comparison (exact for ints/strings/bools, tiny tolerance probe
for doubles to surface rounding-boundary flakiness early).

Usage: python scripts/check_gate.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from quickwit_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("gate_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = normalize(
                [r.asDict() for r in sdf.collect()], scols
            )
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        dcols = list(ddf.columns)
        drows = normalize(ddf.to_dict("records"), dcols)
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            ok = False
        else:
            # align column order to sorted names for both
            order_s = [scols.index(c) for c in sorted(scols)]
            order_d = [dcols.index(c) for c in sorted(dcols)]
            a = sorted(tuple(r[i] for i in order_s) for r in srows)
            b = sorted(tuple(r[i] for i in order_d) for r in drows)
            mism = 0
            for ra, rb in zip(a, b):
                for va, vb in zip(ra, rb):
                    if isinstance(va, float) and isinstance(vb, float):
                        if not (
                            va == vb
                            or (math.isnan(va) and math.isnan(vb))
                            or abs(va - vb) < 1e-12
                        ):
                            mism += 1
                            break
                    elif va != vb:
                        mism += 1
                        break
            if mism:
                print(f"FAIL {name}: {mism}/{len(a)} rows differ")
                for ra, rb in list(zip(a, b))[:200]:
                    if ra != rb:
                        print(f"   spark={ra}\n   duck ={rb}")
                        break
                ok = False
        if ok:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
