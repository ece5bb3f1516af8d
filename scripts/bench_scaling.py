"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule demands throughput scaling efficiency >= 0.8 from N to 4N
executors; the sandbox proxy (driver instruction) is the same job at
two local parallelism levels. This runs ``bench.py`` in SEPARATE
processes at local[N] and local[4N] (a JVM can't change core count
in-process) and reports

    efficiency = (docs_per_sec_hi / docs_per_sec_lo) / (cores_hi / cores_lo)

appending the measured table to BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [lo_cores] [hi_cores] [docs]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys


def run_bench(cores: int, docs: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["QWS_BENCH_DOCS"] = str(docs)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo,
        check=True,
    )
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    docs = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    r_lo = run_bench(lo, docs, sf_dir)
    r_hi = run_bench(hi, docs, sf_dir)
    tp_lo = r_lo["build_docs_per_sec"]
    tp_hi = r_hi["build_docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)

    result = {
        "docs": docs,
        "cores_lo": lo,
        "cores_hi": hi,
        "build_docs_per_sec_lo": tp_lo,
        "build_docs_per_sec_hi": tp_hi,
        "scaling_efficiency": round(eff, 3),
        "query_p50_lo": {k: v for k, v in r_lo["queries"].items()},
        "query_p50_hi": {k: v for k, v in r_hi["queries"].items()},
    }
    print(json.dumps(result))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_md = os.path.join(repo, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(bench_md), exist_ok=True)
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    lines = [
        f"\n## Scaling run {stamp}\n",
        f"Corpus: {docs} synthetic web pages (seed 42), 8 splits; "
        f"same job at local[{lo}] vs local[{hi}].\n",
        "| cores | build docs/sec | q_term p50 s | q_or p50 s | q_phrase p50 s |",
        "|---|---|---|---|---|",
        f"| {lo} | {tp_lo} | {r_lo['queries'].get('q_term')} | "
        f"{r_lo['queries'].get('q_or')} | {r_lo['queries'].get('q_phrase')} |",
        f"| {hi} | {tp_hi} | {r_hi['queries'].get('q_term')} | "
        f"{r_hi['queries'].get('q_or')} | {r_hi['queries'].get('q_phrase')} |",
        f"\n**Scaling efficiency ({lo}→{hi} cores): {eff:.3f}** "
        f"(target ≥ 0.8 per north_rule; proxy for N→4N executors).\n",
    ]
    with open(bench_md, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended to {bench_md}")


if __name__ == "__main__":
    main()
