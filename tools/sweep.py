#!/usr/bin/env python
"""Driver-emulation oracle sweep (verify skill recipe): vanilla session,
__spark_entry__ surface, DuckDB side-by-side at the given sf, exact string
equality + identical dtypes. Usage: python /tmp/sweep.py [SF_DIR] [KEYS...]"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

qs, osql = e.queries(), e.oracle_sql()

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def norm(pdf: pd.DataFrame) -> tuple[str, str]:
    pdf = pdf[sorted(pdf.columns)]
    dtypes = str(list(pdf.dtypes))
    if len(pdf) == 0:
        return "", dtypes
    s = pdf.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values()
    return "\n".join(s.tolist()), dtypes


fails, n_ok, n_rows_only = [], 0, 0
keys = [k for k in qs if not ONLY or k in ONLY]
t_start = time.time()
for i, k in enumerate(keys):
    t0 = time.time()
    try:
        sdf = qs[k](spark, SF).toPandas()
        if k not in osql:
            n_rows_only += 1
            status = f"rows-only ({len(sdf)} rows)"
        else:
            odf = con.execute(osql[k]).fetchdf()
            sv, sd = norm(sdf)
            ov, od = norm(odf)
            if sv != ov or sd != od:
                status = "MISMATCH" + ("(dtypes)" if sv == ov else "(values)")
                fails.append((k, status, sd, od, len(sdf), len(odf)))
            else:
                n_ok += 1
                status = "ok"
    except Exception as ex:
        status = f"ERROR {type(ex).__name__}: {str(ex)[:120]}"
        fails.append((k, status, "", "", -1, -1))
    print(f"[{i+1}/{len(keys)}] {k}: {status} ({time.time()-t0:.1f}s)", flush=True)

print(
    f"\nTOTAL {len(keys)} keys: {n_ok} hash-ok, {n_rows_only} rows-only, "
    f"{len(fails)} FAIL in {time.time()-t_start:.0f}s"
)
for f in fails:
    print("FAIL:", f)
sys.exit(1 if fails else 0)
