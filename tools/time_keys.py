#!/usr/bin/env python
"""Time individual registry keys at a given fixture dir (scale-evidence
runs beyond bench.py's fixed headline set).

Usage: python tools/time_keys.py SF_DIR key [key...]
Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_DRIVER_MEM, SPARK_GRAFT_REPS (default 1).

Each key executes fully via the noop sink; prints one `key: sec` line per
key (best of REPS) and a final JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdp_spark.plans.registry import load_all
from sdp_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    keys = sys.argv[2:]
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "1"))
    registry = load_all()
    spark = get_spark("sdp_spark_time_keys")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for key in keys:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            registry[key].fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[key] = round(best, 2)
        print(f"{key}: {out[key]}s", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "times": out}))


if __name__ == "__main__":
    main()
