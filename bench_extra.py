#!/usr/bin/env python
"""bench_extra.py — noop-sink isolation harness (guide §1.4) for iterating
on per-query plan cost without touching the frozen ``bench.py``.

Per named query: builds once, then times N warm executions into the noop
sink (steady-state plan cost — worker start and codegen amortized), prints
min/median. Labels jobs via setJobDescription so the timeline is readable.

Usage:
    python bench_extra.py [query ...]          # default: bench headliners
    SPARK_GRAFT_BENCH_REPS=3 python bench_extra.py dedup_ngram_jaccard
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import HEADLINE_QUERIES
    from intelligent_ocr_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    names = sys.argv[1:] or HEADLINE_QUERIES

    spark = build_session(parallelism=cores, app_name="bench_extra")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        sc = spark.sparkContext
        sc.setJobDescription(f"bench_extra:{name}:build")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        first = time.perf_counter() - t0
        times = []
        for r in range(reps):
            sc.setJobDescription(f"bench_extra:{name}:warm{r}")
            t0 = time.perf_counter()
            # rebuild per rep: queries with eager localCheckpoints do their
            # materialization inside the build, exactly as the driver bench
            # times them
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        out[name] = {
            "first": round(first, 3),
            "warm_min": round(min(times), 3),
            "warm_med": round(statistics.median(times), 3),
        }
        print(f"{name}: first={first:.3f} warm_min={min(times):.3f} "
              f"warm_med={statistics.median(times):.3f}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
