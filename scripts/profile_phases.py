"""One-off: per-phase build timing at two parallelism levels.

Finds the non-scaling component of the build (the thing that caps
N→4N efficiency) by printing the phase_secs lineage metrics the
build records, at each level, on the identical staged corpus.

    python scripts/profile_phases.py --cores 2 --docs 2000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scaling_bench import CORPUS_PATH, NUM_SPLITS, SHUFFLE_PARTITIONS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--docs", type=int, default=2_000_000)
    args = ap.parse_args()

    from quickwit_spark.operators.build import build_index
    from quickwit_spark.plans.config import webpages_config
    from quickwit_spark.session import get_spark
    from quickwit_spark.sources.extract import with_extracted_text

    spark = get_spark(
        f"profile_{args.cores}",
        cores=args.cores,
        shuffle_partitions=SHUFFLE_PARTITIONS,
    )
    pages = with_extracted_text(spark.read.parquet(CORPUS_PATH))

    idx = tempfile.mkdtemp(prefix=f"qws_prof_warm_{args.cores}_")
    shutil.rmtree(idx)
    build_index(
        spark, pages.limit(args.docs // 20), idx, webpages_config(),
        num_splits=4, term_buckets=32,
    )
    shutil.rmtree(idx, ignore_errors=True)

    idx = tempfile.mkdtemp(prefix=f"qws_prof_{args.cores}_")
    shutil.rmtree(idx)
    t0 = time.time()
    metas = build_index(
        spark, pages, idx, webpages_config(),
        num_splits=NUM_SPLITS, term_buckets=SHUFFLE_PARTITIONS,
    )
    wall = time.time() - t0
    shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps({
        "cores": args.cores,
        "docs": sum(m.num_docs for m in metas),
        "wall_secs": round(wall, 2),
        "phase_secs": metas[0].lineage["phase_secs"],
    }))


if __name__ == "__main__":
    main()
