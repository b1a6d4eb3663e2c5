

def test_week_mode0_matches_mysql_documented_values(spark):
    """Pin WEEK(d, 0) against MySQL-documented/manually-verified literals:
    2008-02-20 -> 7; 2008-01-05 (before first Sunday 2008-01-06) -> 0;
    2008-01-06 (first Sunday) -> 1; 2024-01-01 (Monday) -> 0."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2008-02-20",), ("2008-01-05",), ("2008-01-06",), ("2024-01-01",)],
        "d STRING",
    ).select(F.col("d").cast("date").alias("o_orderdate"))
    doy = F.dayofyear("o_orderdate")
    dow_jan1 = F.dayofweek(F.trunc("o_orderdate", "year"))
    fs_doy = 1 + (8 - dow_jan1) % 7
    week0 = (
        F.when(doy < fs_doy, F.lit(0))
        .otherwise(F.floor((doy - fs_doy) / 7).cast("bigint") + 1)
        .cast("bigint")
    )
    got = [r[0] for r in df.select(week0).collect()]
    assert got == [7, 0, 1, 0], got
