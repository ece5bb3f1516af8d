"""REST searcher concurrency benchmark — qps + p50/p99 per level.

The reference's stated design envelope is ~10 QPS of subsecond
queries per searcher (docs/introduction.md:35). This drives
``serve.py`` (the rest_handler analogue) with concurrent HTTP
clients over ONE warm index in ONE Spark driver and reports, per
concurrency level: achieved qps, latency p50/p90/p99, and error
count. FAIR scheduling is enabled so concurrent search jobs share
executor cores instead of queueing FIFO behind each other — the
multi-tenant searcher configuration a real deployment would use.

Prints ONE JSON line. Run:

  python scripts/rest_concurrency_bench.py [--docs 200000] \
      [--cpus 32] [--levels 1,4,8] [--requests 40]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import threading
import time
import urllib.parse
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ambient_sample  # noqa: E402
from quickwit_spark.operators.build import build_index  # noqa: E402
from quickwit_spark.plans.config import webpages_config  # noqa: E402
from quickwit_spark.serve import serve  # noqa: E402
from quickwit_spark.session import get_spark  # noqa: E402
from quickwit_spark.sources.corpus import webpages_df  # noqa: E402
from quickwit_spark.sources.extract import with_extracted_text  # noqa: E402

QUERY_MIX = [
    "word",
    "the",
    "hot word",
    "hot OR word OR one",
    '"of the"',
    "lang:de the",
    "qw_marker_7",
]


def _pctl(xs: list[float], q: float) -> float:
    xs = sorted(xs)
    return round(xs[min(len(xs) - 1, int(q * len(xs)))], 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--levels", default="1,4,8")
    ap.add_argument("--requests", type=int, default=40,
                    help="requests per client thread")
    ap.add_argument("--port", type=int, default=7299)
    args = ap.parse_args()

    spark = get_spark(
        "rest_bench", cores=args.cpus,
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    root = tempfile.mkdtemp(prefix="qws_rest_root_")
    index_dir = os.path.join(root, "bench")
    pages = with_extracted_text(
        webpages_df(spark, args.docs, seed=42).drop("text")
    )
    build_index(spark, pages, index_dir, webpages_config(), num_splits=8)
    server = serve(spark, root, port=args.port)
    base = f"http://127.0.0.1:{args.port}/api/v1/bench/search"

    def one(q: str) -> float:
        url = base + "?" + urllib.parse.urlencode(
            {"query": q, "maxHits": "10"}
        )
        t0 = time.time()
        with urllib.request.urlopen(url, timeout=120) as r:
            json.loads(r.read())
        return time.time() - t0

    # warm: searcher cache + JIT, one request per query shape
    for q in QUERY_MIX:
        one(q)

    out: dict = {"docs": args.docs, "cpus": args.cpus or "all",
                 "levels": {}, "ambient_pre": ambient_sample()}
    for level in [int(x) for x in args.levels.split(",")]:
        lat: list[float] = []
        errors = [0]
        lock = threading.Lock()

        def client(tid: int) -> None:
            mine = []
            for i in range(args.requests):
                q = QUERY_MIX[(tid + i) % len(QUERY_MIX)]
                try:
                    mine.append(one(q))
                except Exception:
                    with lock:
                        errors[0] += 1
            with lock:
                lat.extend(mine)

        t0 = time.time()
        threads = [
            threading.Thread(target=client, args=(t,)) for t in range(level)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        out["levels"][str(level)] = {
            "wall_secs": round(wall, 3),
            "requests": level * args.requests,
            "errors": errors[0],
            "qps": round(len(lat) / wall, 2),
            "p50": _pctl(lat, 0.50),
            "p90": _pctl(lat, 0.90),
            "p99": _pctl(lat, 0.99),
        }
    out["ambient_post"] = ambient_sample()
    server.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
