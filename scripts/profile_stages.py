"""One-off: per-stage wall/task-time breakdown of the build via the
Spark event log — finds WHICH stage has idle cores (serial tail,
stragglers) at a given parallelism.

    python scripts/profile_stages.py --cores 8 --docs 2000000
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scaling_bench import CORPUS_PATH, NUM_SPLITS, SHUFFLE_PARTITIONS

EVDIR = "/tmp/qws_eventlogs"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--docs", type=int, default=2_000_000)
    args = ap.parse_args()

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from quickwit_spark.operators.build import build_index
    from quickwit_spark.plans.config import webpages_config
    from quickwit_spark.session import get_spark
    from quickwit_spark.sources.extract import with_extracted_text

    spark = get_spark(
        f"stageprof_{args.cores}",
        cores=args.cores,
        shuffle_partitions=SHUFFLE_PARTITIONS,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            # match scaling_bench: >=2 read waves at every level
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
        },
    )
    pages = with_extracted_text(spark.read.parquet(CORPUS_PATH))

    idx = tempfile.mkdtemp(prefix=f"qws_sprof_warm_{args.cores}_")
    shutil.rmtree(idx)
    build_index(
        spark, pages.limit(args.docs // 20), idx, webpages_config(),
        num_splits=4, term_buckets=32,
    )
    shutil.rmtree(idx, ignore_errors=True)

    idx = tempfile.mkdtemp(prefix=f"qws_sprof_{args.cores}_")
    shutil.rmtree(idx)
    t0 = time.time()
    mark = time.time()
    build_index(
        spark, pages, idx, webpages_config(),
        num_splits=NUM_SPLITS, term_buckets=SHUFFLE_PARTITIONS,
    )
    wall = time.time() - t0
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()

    # parse the event log: stages submitted after `mark`
    stages = {}
    logs = sorted(
        p
        for p in glob.glob(os.path.join(EVDIR, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    )

    def lines():
        for log in logs:
            with open(log) as f:
                yield from f

    # pass 1: stages only; pass 2: task accounting (TaskEnd events can
    # appear on either side of their StageCompleted, so counting in a
    # single combined pass would double-count the late ones)
    for line in lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time", 0) / 1000.0
            if sub < mark:
                continue
            comp = si.get("Completion Time", 0) / 1000.0
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:70],
                "tasks": si["Number of Tasks"],
                "wall": round(comp - sub, 2),
                "sub": round(sub - mark, 2),
            }

    for line in lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            if sid in stages:
                ti = ev["Task Info"]
                dur = (ti["Finish Time"] - ti["Launch Time"]) / 1000.0
                st = stages[sid]
                st["task_sum"] = round(st.get("task_sum", 0) + dur, 2)
                st["task_max"] = round(max(st.get("task_max", 0), dur), 2)

    print(json.dumps({"cores": args.cores, "wall": round(wall, 2)}))
    for sid in sorted(stages):
        st = stages[sid]
        ideal = st.get("task_sum", 0) / args.cores
        idle = st["wall"] - ideal
        print(
            f"stage {sid:3d} sub+{st['sub']:7.2f} wall {st['wall']:7.2f} "
            f"tasks {st['tasks']:4d} task_sum {st.get('task_sum', 0):8.2f} "
            f"task_max {st.get('task_max', 0):6.2f} "
            f"idle~{idle:6.2f}  {st['name']}"
        )


if __name__ == "__main__":
    main()
