#!/usr/bin/env python
"""Capture .explain("formatted") for registry keys into plans/<tag>/.

Usage: python tools/capture_plans.py TAG SUFFIX [KEYS...]
  TAG    e.g. r14  -> writes plans/r14/<key>_<SUFFIX>.txt
  SUFFIX e.g. before | after
  KEYS   default: the bench.py HEADLINE list

Plan capture only builds the DataFrame and formats its physical plan — no
action is run, so it is safe next to other workloads. Streaming-flavored
keys whose fn() executes eagerly still work: their returned (batch) frame
is what gets explained.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdp_spark.plans.registry import load_all
from sdp_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    if not keys:
        import bench

        keys = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    spark = get_spark("sdp_spark_plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        df = registry[key].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {key} @ {sf_dir} ({suffix})\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
