"""Explicit skew-mitigation operators: salted two-phase exact distinct
counting and a salted replicate join.

Why these exist when AQE has skew-join handling: AQE splits oversized
*shuffle partitions* of a sort-merge join at runtime, but it cannot fix
(a) a single hot GROUP BY key whose **distinct-value state** must meet
on one reducer (partial aggregation doesn't help `count(DISTINCT ...)`
— every distinct value of the hot key still lands on one task), nor
(b) a broadcast-ineligible join whose hot key exceeds one executor's
working set. Both need the key space *widened before the shuffle* —
salting — which is a logical-plan rewrite, not a physical-plan patch.

Determinism rule (same as operators/sampling.py): the salt is a pure
function of row content (Knuth multiplicative hash of a stable id),
never `rand()` or partition ids — so retried tasks resalt identically
and the result is bit-stable across runs and engines.

Reference scope note: the reference (SDFIdk/NTRIPmonitor) has no
skewed-aggregation surface — its GROUP BY keys are mountpoints with
bounded fan-in (src/databasehandling.py stored procedures). This is a
north-star extension for 100 TB corpora, where "group by language" or
"join on domain" routinely has 10%-hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ntripmonitor_spark.operators.sampling import hash_bucket

N_SALTS = 32


def salted_distinct_count(df: DataFrame, group_col: str, distinct_col: str,
                          n_salts: int = N_SALTS) -> DataFrame:
    """Exact `count(DISTINCT distinct_col)` per ``group_col``, skew-safe.

    Salting by a hash **of the value being distinct-counted** — not of
    the row — keeps exactness: each distinct value lands in exactly one
    (group, salt) cell, so phase 1's per-cell distinct counts are
    disjoint and phase 2 can plain-SUM them.

    Honest scope: for a *single* `count(DISTINCT)`, Spark's planner
    already rewrites to a dedup aggregate keyed by (group, value), so
    the dedup shuffle is not hot-key-bound even unsalted. The salted
    form is the shape that generalizes where that rewrite does not
    reach: holistic per-key state (`collect_set`, exact sketch builds,
    custom applyInPandas accumulators) whose FINAL per-key task would
    otherwise hold the hot key's entire value set — here phase 1 bounds
    any cell's state to ~1/n_salts of the hot key, and phase 2 merges
    ``n_salts`` scalars, not sets. Any salt-partitionable statistic
    (distinct count, sum/min/max over distinct values) slots into the
    same two-phase plan unchanged.
    """
    salt = hash_bucket(F.col(distinct_col), n_salts).alias("_salt")
    per_cell = (
        df.groupBy(F.col(group_col), salt)
        .agg(F.count_distinct(F.col(distinct_col)).alias("_nd"))
    )
    return (
        per_cell.groupBy(group_col)
        .agg(F.sum("_nd").alias("n_distinct"))
    )


def salted_join(big: DataFrame, small: DataFrame, key: str,
                big_id_col: str, n_salts: int = N_SALTS) -> DataFrame:
    """Inner equi-join where ``big``'s key distribution is skewed and
    ``small`` is too large (or the build side otherwise ineligible) to
    broadcast: widen the key to (key, salt).

    * big side: salt = hash(stable row id) % n_salts — each row gets ONE
      deterministic salt, so no row duplication on the probe side.
    * small side: replicated ``n_salts`` times via an explode of a
      literal salt array — the only data growth, bounded by
      n_salts × |small|.

    The join key becomes (key, salt): a key holding 10% of the corpus
    now spreads over ``n_salts`` reducers instead of melting one. Result
    multiset is exactly the plain inner join's (each big row meets each
    matching small row exactly once, in its own salt cell).

    At 100 TB, pick ``n_salts`` ≈ ceil(hot-key rows / rows-per-task);
    only keys detected as hot need salting at all — pass ``small``
    pre-filtered to the hot keys and union with an unsalted join of the
    cold remainder if replication cost matters.
    """
    salted_big = big.withColumn("_salt", hash_bucket(F.col(big_id_col), n_salts))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [key, "_salt"]).drop("_salt")


def hot_keys(df: DataFrame, key: str, min_frac: float = 0.01) -> DataFrame:
    """Heavy-hitter detection for the hybrid salted/unsalted split: keys
    holding at least ``min_frac`` of the rows. One count aggregate (map-
    side combined) plus a scalar total — both tiny outputs; the returned
    relation is broadcast-sized by construction (≤ 1/min_frac rows)."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("_n"))
    total = df.agg(F.count(F.lit(1)).alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("_n") >= F.col("_t") * min_frac)
        .select(key, F.col("_n").alias("n_rows"))
    )
