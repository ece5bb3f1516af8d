"""Row-level oracle differ: when check_correctness reports a hash
mismatch for a key, this prints the first N differing rows with the
exact cell that diverges, so a red driver cell localizes itself to a
column + value pair instead of an opaque hash.

Rows from both sides are normalized the same way the checker hashes
them (columns sorted by name), keyed by the full normalized line, and
the symmetric difference is paired up by best-effort prefix match so
the output reads as "spark has X, oracle has Y, first diff at col C".

Usage: python scripts/diff_oracle.py <key> [sf_dir] [max_rows]
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from check_correctness import TABLES, _norm  # noqa: E402  (same dir)


def _rows_to_lines(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i]) for i in order))
    return names, sorted(out)


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    max_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("diff-oracle")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qfn = entry.queries()[key]
    sql = entry.oracle_sql().get(key)
    if sql is None:
        print(f"{key}: no oracle_sql entry (rows-only check)")
        sys.exit(0)

    sdf = qfn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        print(f"SCHEMA MISMATCH\n  spark:  {sorted(s_cols)}\n  oracle: {sorted(o_cols)}")
        sys.exit(1)
    names, s_lines = _rows_to_lines(s_cols, s_rows)
    _, o_lines = _rows_to_lines(o_cols, o_rows)
    s_set, o_set = set(s_lines), set(o_lines)
    only_s = sorted(s_set - o_set)
    only_o = sorted(o_set - s_set)
    if not only_s and not only_o and len(s_lines) == len(o_lines):
        print(f"{key}: IDENTICAL ({len(s_lines)} rows)")
        sys.exit(0)

    print(
        f"{key}: {len(only_s)} spark-only rows, {len(only_o)} oracle-only rows "
        f"(spark {len(s_lines)} / oracle {len(o_lines)} total)"
    )

    def _pair_key(line):
        # pair rows by their longest shared prefix cells (usually the key
        # columns sort first alphabetically, e.g. doc_id)
        return line[0]

    o_by_key = {}
    for ln in only_o:
        o_by_key.setdefault(_pair_key(ln), []).append(ln)
    shown = 0
    for ln in only_s:
        if shown >= max_rows:
            break
        mates = o_by_key.get(_pair_key(ln), [])
        mate = mates.pop(0) if mates else None
        print(f"\nrow key {ln[0]!r}:")
        for i, name in enumerate(names):
            sv = ln[i]
            ov = mate[i] if mate else "<row absent>"
            marker = "   " if sv == ov else ">> "
            if sv != ov or len(names) <= 8:
                print(f"  {marker}{name}: spark={sv!r} oracle={ov!r}")
        shown += 1
    # unpaired oracle rows
    for k_, rem in o_by_key.items():
        for ln in rem[: max(0, max_rows - shown)]:
            print(f"\noracle-only row key {ln[0]!r}: {dict(zip(names, ln))}")
            shown += 1
    sys.exit(1)


if __name__ == "__main__":
    main()
