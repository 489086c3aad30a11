"""Extra measurement harness (guide §1.4/§1.5): per-query isolation with
noop-style sinks, stage-level attribution via the Spark REST API, and
`.explain("formatted")` capture.  Never used by the driver — bench.py
stays the frozen measurement contract; numbers from here are cited in
OPTIMIZATION_r07.md.

Usage: python bench_extra.py [q1 q2 ... q7 | plans | stages]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from parquetjs_spark import pipeline
from parquetjs_spark.sources.synthetic import source_code_df
from parquetjs_spark.sources.tables import get_spark, load_table


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def stage_report(spark, since_stage: int):
    rows = []
    for st in _rest(spark, "stages?status=complete"):
        if st["stageId"] < since_stage:
            continue
        rows.append(
            {
                "stage": st["stageId"],
                "name": st["name"].split("\n")[0][:60],
                "tasks": st["numCompleteTasks"],
                "executorRunTime_s": round(st["executorRunTime"] / 1e3, 3),
                "executorCpuTime_s": round(st["executorCpuTime"] / 1e9, 3),
                "shuffleRead_mb": round(st["shuffleReadBytes"] / 1e6, 2),
                "shuffleWrite_mb": round(st["shuffleWriteBytes"] / 1e6, 2),
                "input_mb": round(st.get("inputBytes", 0) / 1e6, 2),
                "wall_s": None,
            }
        )
        try:
            t0 = st.get("firstTaskLaunchedTime")
            t1 = st.get("completionTime")
            if t0 and t1:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                rows[-1]["wall_s"] = round(
                    (datetime.strptime(t1, fmt) - datetime.strptime(t0, fmt)).total_seconds(),
                    3,
                )
        except Exception:
            pass
    return sorted(rows, key=lambda r: r["stage"])


def last_stage_id(spark) -> int:
    sts = _rest(spark, "stages")
    return max((s["stageId"] for s in sts), default=-1) + 1


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    src_rows = int(os.environ.get("BENCH_SOURCE_ROWS", "160000"))
    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    lineitem = load_table(spark, sf_dir, "lineitem").repartition(cpus * 2).cache()
    lineitem.count()
    import pandas as pd

    def _pt(batches):
        for _ in batches:
            pass
        yield pd.DataFrame({"n": [1]})

    lineitem.mapInPandas(_pt, "n long").count()
    pipeline.encode_columns(lineitem.limit(8192), codec="auto").count()

    def q1():
        blobs = pipeline.encode_columns(lineitem)
        return pipeline.encode_summary(blobs).collect()

    def q2():
        blobs = pipeline.encode_columns(lineitem)
        return pipeline.verify_blobs(blobs).where(~F.col("ok")).count()

    queries = {"q1": q1, "q2": q2}

    which = sys.argv[1:] or ["q1", "q2"]
    for name in which:
        fn = queries.get(name)
        if fn is None:
            continue
        fn()  # warm this plan shape
        best = None
        for _ in range(3):
            mark = last_stage_id(spark)
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            fn()
            t = time.perf_counter() - t0
            rep = stage_report(spark, mark)
            if best is None or t < best[0]:
                best = (t, rep)
        t, rep = best
        print(f"== {name}: {t:.3f}s wall ==")
        for r in rep:
            print(
                f"  stage {r['stage']:4d} tasks={r['tasks']:3d} "
                f"run={r['executorRunTime_s']:7.2f}s cpu={r['executorCpuTime_s']:7.2f}s "
                f"wall={r['wall_s']}s shr={r['shuffleRead_mb']} shw={r['shuffleWrite_mb']} "
                f"in={r['input_mb']} {r['name']}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
