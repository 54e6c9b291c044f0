"""Sourcetable metadata path (SURVEY §3.2) as a driver-checked query:
S5 directory rows → P18 ';'-split/STR-filter/column-projection → P19
first-wins mountpoint dedup, all as DataFrame ops.

The directory text is synthesized deterministically from the
``supplier`` table (every field an integer/string function of
s_suppkey), so the DuckDB oracle re-derives the PARSED result
analytically — value-checking the actual split/filter/getItem/dedup
path (reference: src/ingestion.py:476-515, src/ntripclient.py:359-401).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ntripmonitor_spark.plans.registry import register
from ntripmonitor_spark.tables import table

# Projected STR-row columns, by ';' position (src/ingestion.py:476-483).
_PROJ = {1: "mountpoint", 2: "identifier", 3: "format", 8: "countrycode",
         9: "latitude", 10: "longitude", 13: "generator"}


def _raw_lines(suppliers: DataFrame) -> DataFrame:
    """supplier rows → raw NTRIP sourcetable lines: STR rows with
    deliberate mountpoint collisions (s_suppkey % 97) plus CAS junk
    rows (s_suppkey % 7 == 0) the filter must drop."""
    k = F.col("s_suppkey")
    line = F.concat_ws(
        ";",
        F.when(k % 7 == 0, F.lit("CAS")).otherwise(F.lit("STR")),
        F.concat(F.lit("MP"), (k % 97).cast("string")),
        F.col("s_name"),
        F.concat(F.lit("RTCM 3."), (k % 2 + 2).cast("string")),
        F.lit("x4"), F.lit("x5"), F.lit("x6"), F.lit("x7"),
        F.concat(F.lit("C"), F.col("s_nationkey").cast("string")),
        (k % 180 - 90).cast("string"),
        (k % 360 - 180).cast("string"),
        F.lit("x11"), F.lit("x12"),
        F.concat(F.lit("GEN"), (k % 5).cast("string")),
    )
    return suppliers.select(k.alias("line_no"), line.alias("raw"))


@register(
    "st01_sourcetable",
    tags=("sourcetable", "S5", "P18", "P19"),
    oracle="""
SELECT mountpoint, identifier, format, countrycode, latitude, longitude, generator
FROM (
    SELECT 'MP' || CAST(s_suppkey % 97 AS VARCHAR) AS mountpoint,
           s_name AS identifier,
           'RTCM 3.' || CAST(s_suppkey % 2 + 2 AS VARCHAR) AS format,
           'C' || CAST(s_nationkey AS VARCHAR) AS countrycode,
           CAST(s_suppkey % 180 - 90 AS VARCHAR) AS latitude,
           CAST(s_suppkey % 360 - 180 AS VARCHAR) AS longitude,
           'GEN' || CAST(s_suppkey % 5 AS VARCHAR) AS generator,
           row_number() OVER (PARTITION BY s_suppkey % 97 ORDER BY s_suppkey) AS rn
    FROM supplier
    WHERE s_suppkey % 7 <> 0
) WHERE rn = 1
""",
)
def st01_sourcetable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse+project+dedup of the caster directory: split(';'),
    STR filter, positional projection, first-wins (min line order)
    mountpoint dedup via window rank."""
    parts = F.split(F.col("raw"), ";")
    parsed = (
        _raw_lines(table(spark, sf_dir, "supplier"))
        .select("line_no", parts.alias("p"))
        .filter(F.col("p").getItem(0) == "STR")
        .select(
            "line_no",
            *[F.col("p").getItem(i).alias(name) for i, name in _PROJ.items()],
        )
    )
    w = Window.partitionBy("mountpoint").orderBy("line_no")
    return (
        parsed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "line_no")
    )


@register(
    "st02_upsert_snapshot",
    tags=("sourcetable", "K3", "K4", "P19"),
    oracle="""
WITH e0 AS (
    SELECT 'MP' || CAST(s_suppkey % 97 AS VARCHAR) AS mountpoint,
           s_name AS identifier,
           'GEN' || CAST(s_suppkey % 5 AS VARCHAR) AS generator,
           0 AS fetch_epoch, s_suppkey AS line_no
    FROM supplier WHERE s_suppkey % 7 <> 0
),
e1 AS (
    SELECT 'MP' || CAST(s_suppkey % 97 AS VARCHAR) AS mountpoint,
           'UPD-' || s_name AS identifier,
           'GEN' || CAST((s_suppkey + 1) % 5 AS VARCHAR) AS generator,
           1 AS fetch_epoch, s_suppkey AS line_no
    FROM supplier WHERE s_suppkey % 7 <> 0 AND s_suppkey % 3 = 0
),
u AS (SELECT * FROM e0 UNION ALL SELECT * FROM e1),
r AS (
    SELECT *, row_number() OVER (PARTITION BY mountpoint
                                 ORDER BY fetch_epoch DESC, line_no ASC) AS rn,
           min(fetch_epoch) OVER (PARTITION BY mountpoint) AS ep_lo,
           max(fetch_epoch) OVER (PARTITION BY mountpoint) AS ep_hi
    FROM u
)
SELECT mountpoint, identifier, generator,
       CAST(fetch_epoch AS INT) AS last_epoch,
       CAST(ep_lo <> ep_hi AS INT) AS was_updated
FROM r WHERE rn = 1
""",
)
def st02_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sourcetable-constants upsert (K3/K4: ON CONFLICT (mountpoint)
    DO UPDATE — reference src/databasehandling.py:185-218,
    initdb/20-sourcetable_constants.sql) as a declarative snapshot:
    two directory fetch epochs (epoch 1 re-fetches a third of the
    mountpoints with changed identifier/generator), last-write-wins per
    mountpoint with st01's first-wins line order INSIDE an epoch, plus
    a was_updated audit flag. This is the MERGE a lakehouse mirror of
    the upsert table runs per refresh; one window over the keyed
    exchange, no join — the update batch unions into the base and the
    rank picks the survivor, so the plan is insert-vs-update agnostic
    (the same shape at 10^9 keys: one shuffle on the upsert key)."""
    sup = table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    base = sup.filter(k % 7 != 0).select(
        F.concat(F.lit("MP"), (k % 97).cast("string")).alias("mountpoint"),
        F.col("s_name").alias("identifier"),
        F.concat(F.lit("GEN"), (k % 5).cast("string")).alias("generator"),
        F.lit(0).alias("fetch_epoch"), k.alias("line_no"),
    )
    upd = sup.filter((k % 7 != 0) & (k % 3 == 0)).select(
        F.concat(F.lit("MP"), (k % 97).cast("string")).alias("mountpoint"),
        F.concat(F.lit("UPD-"), F.col("s_name")).alias("identifier"),
        F.concat(F.lit("GEN"), ((k + 1) % 5).cast("string")).alias("generator"),
        F.lit(1).alias("fetch_epoch"), k.alias("line_no"),
    )
    u = base.unionByName(upd)
    w = Window.partitionBy("mountpoint").orderBy(
        F.col("fetch_epoch").desc(), F.col("line_no").asc()
    )
    we = Window.partitionBy("mountpoint")
    return (
        u.withColumn("rn", F.row_number().over(w))
        .withColumn("ep_lo", F.min("fetch_epoch").over(we))
        .withColumn("ep_hi", F.max("fetch_epoch").over(we))
        .filter(F.col("rn") == 1)
        .select(
            "mountpoint", "identifier", "generator",
            F.col("fetch_epoch").cast("int").alias("last_epoch"),
            (F.col("ep_lo") != F.col("ep_hi")).cast("int").alias("was_updated"),
        )
    )
