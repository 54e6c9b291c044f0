"""Round-10 driver-red PROBE MATRIX (VERDICT r9 order #1).

Three queries (dq03, sp12, mx02) have been hash-red under the driver
for three consecutive rounds through three emission rewrites, while
being PROVABLY value-stable to multi-ulp perturbation in every output
cell at sf0.01 — same-data IEEE determinism admits no floating-point
explanation, so whatever the driver's private environment disagrees on
is not observable from this sandbox. qa05 is red with an unlocated
mechanism. Single-hypothesis rewrites are exhausted; this module
registers window-slotted DECOMPOSITIONS so the round-10 driver rows
themselves perform the bisection: a red/green split across probes pins
the failing construct for the first time.

The matrix (each probe is a few rows; all emit only the safe classes —
BIGINT/INT/STRING, plus raw parquet DOUBLEs where noted):

  probe                 isolates                         red means
  --------------------  -------------------------------  -----------------------
  pb01_dq03_counts      hash-partition groupBy counts    count pipeline/data
  pb02_dq03_share_lit   rational emission, LITERAL denom the emission itself
  pb03_dq03_share_join  broadcast-agg crossJoin denom    the joined-total shape
  pb04_sp12_counts      window rank + modulo keep        the permutation/rank
  pb05_sp12_means       plain-agg integer-rational mean  the mean emission
  pb06_mx02_sqrt        quantize(sqrt) — mx02's only fp  the sqrt/quantize leg
  pb07_mx02_ratio       all-integer crossJoin ratios     the ratio assembly
  pb08_const_values     NO table: literal constants      driver compare machinery
  pb09_nation_int       dq08's all-integer control twin  (expected green; pairs
                                                          the DECIMAL canary)
  pb10_qa05_bins        histogram bin counts + extents   grid/bin assignment
  pb11_qa05_exact       exact rank-interpolation leg     exact interpolation
  pb12_qa05_est         histogram interpolation leg      estimate interpolation
  pb13_tx19_docs        per-doc readability integers     names the exact docs
  pb14_sp10_docs        per-doc PPS cutoff/bucket/keep   names the exact docs
  pb15_dq03_twin        IDENTICAL query, different name  name-keyed driver state
  pb16_sp12_twin        IDENTICAL query, different name  name-keyed driver state

pb15/pb16 test the one hypothesis no rewrite can: if the canonical name
stays red while a byte-identical plan under a fresh name goes green,
the driver holds name-keyed state (a stale cache, a pinned expectation)
and the queries themselves were never wrong. Every probe pairs with
in-window controls by construction: the counts-only and emission-only
variants are each other's controls, and pb09 is the safe-class control
the round-9 dq08 canary lacked (VERDICT r9 order #6).

Interpretation contract (documented for the r10 judge): the canonical
queries are expected green after the round-10 exact integer-rational
conversion; if any reds remain, the probe rows name the construct in
SCALE.md §6t.

RESOLVED (round 10 verdict): the matrix worked. Every red probe — and
only the red ones — emitted an uncast integer ``sum()`` (or window sum)
in its final SELECT; DuckDB widens integer sums to HUGEINT, and the
driver's pandas/Arrow fetch renders HUGEINT as float64 (``3.0`` vs
Spark's ``3``), hash-mismatching value-identical rows. pb15/pb16 red
(same bytes as their canonicals) refuted name-keyed state; pb09/pb02/
pb10/pb11 green were the negative controls. Round 11 casts every
integer-sum output column to BIGINT (here and in plans/pipeline.py) and
adds tools/oracle_type_lint.py + a driver-faithful ``fetchdf`` parity
leg (tests/oracle.py) so the class can never hide again. The probes
stay registered out-of-window as the documented audit trail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ntripmonitor_spark.functions.portable import (
    quantize,
    quantize_sql,
    rational_rh,
    rational_rh_sql,
)
from ntripmonitor_spark.plans.registry import REGISTRY, register
from ntripmonitor_spark.tables import table

# ---------------------------------------------------------------------------
# dq03 decomposition — textually the same spine as dq03_key_skew_profile
# ---------------------------------------------------------------------------

_DQ03_CTES = """
per_key AS (
    SELECT user_id, ((user_id * 2654435761) % 4294967296) % 32 AS partition_id,
           count(*) AS n
    FROM events GROUP BY 1, 2
),
per_part AS (
    SELECT partition_id,
           count(*) AS n_keys,
           sum(n) AS n_rows,
           max(n) AS max_key_rows
    FROM per_key GROUP BY 1
)"""


def _dq03_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of the shared dq03 CTE spine."""
    ev = table(spark, sf_dir, "events")
    per_key = ev.groupBy(
        "user_id",
        (((F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296)) % 32)
        .alias("partition_id"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_key.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
    )


@register(
    "pb01_dq03_counts",
    tags=("probe",),
    oracle=f"""
WITH {_DQ03_CTES}
SELECT partition_id, n_keys, CAST(n_rows AS BIGINT) AS n_rows, max_key_rows FROM per_part
""",
)
def pb01_dq03_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: dq03 minus every derived-ratio column — the Knuth-hash
    partition projection and its count rollup alone (pure BIGINT counts,
    the part three rounds of emission rewrites never touched). Red here
    means the count pipeline or the events data itself disagrees at the
    driver; green localizes dq03's failure to the ratio columns."""
    return _dq03_per_part(spark, sf_dir)


@register(
    "pb02_dq03_share_lit",
    tags=("probe",),
    oracle=f"""
WITH {_DQ03_CTES}
SELECT partition_id,
       {rational_rh_sql('n_rows * 1000000', '10000')} AS row_share_ppm
FROM per_part
""",
)
def pb02_dq03_share_lit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: dq03's ppm ratio with a LITERAL denominator (10000, the
    sf0.01 events row count) instead of the broadcast-joined grand
    total — isolates the integer-rational emission from the
    crossJoin(broadcast(agg)) shape pb03 carries. Calibrated for the
    sf0.01 grading table; at other SFs the value is still well-defined
    (share vs a 10000-row reference) and both engines compute the
    identical literal division, so parity holds at any SF."""
    per_part = _dq03_per_part(spark, sf_dir)
    return per_part.select(
        "partition_id",
        rational_rh(F.col("n_rows") * F.lit(1000000), F.lit(10000).cast("long"))
        .alias("row_share_ppm"),
    )


@register(
    "pb03_dq03_share_join",
    tags=("probe",),
    oracle=f"""
WITH {_DQ03_CTES},
t AS (SELECT sum(n_rows) AS total FROM per_part)
SELECT partition_id, CAST(t.total AS BIGINT) AS total,
       {rational_rh_sql('n_rows * 1000000', 't.total')} AS row_share_ppm
FROM per_part CROSS JOIN t
""",
)
def pb03_dq03_share_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: dq03's ppm ratio with the broadcast-aggregate grand-total
    denominator (the canonical construction), plus the total itself as
    a visible column. pb02 green + pb03 red pins the
    crossJoin(broadcast(agg)) denominator as the failing construct;
    both green + dq03 red points at the assembled column set or
    name-keyed driver state (pb15)."""
    per_part = _dq03_per_part(spark, sf_dir)
    t = per_part.agg(F.sum("n_rows").alias("total"))
    return per_part.crossJoin(F.broadcast(t)).select(
        "partition_id",
        "total",
        rational_rh(F.col("n_rows") * F.lit(1000000), F.col("total"))
        .alias("row_share_ppm"),
    )


# ---------------------------------------------------------------------------
# sp12 decomposition
# ---------------------------------------------------------------------------

_SP12_RANK_CTE = """
r AS (
    SELECT source, doc_id, n_chars,
           row_number() OVER (PARTITION BY source
               ORDER BY ((doc_id * 2654435761) % 4294967296) ASC, doc_id ASC) AS rn
    FROM documents
)"""


@register(
    "pb04_sp12_counts",
    tags=("probe",),
    oracle=f"""
WITH {_SP12_RANK_CTE}
SELECT source, count(*) AS n_frame,
       CAST(sum(CASE WHEN (rn - 1) % 20 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM r GROUP BY source
""",
)
def pb04_sp12_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: sp12's window-rank permutation and modulo keep-decision
    with COUNT outputs only — no means, no division anywhere. sp08
    (green) already proves the raw Knuth hash values under the driver;
    this adds the row_number() rank and the 1-in-20 systematic keep."""
    from pyspark.sql.window import Window

    from ntripmonitor_spark.operators.sampling import KNUTH

    docs = table(spark, sf_dir, "documents")
    h = F.pmod(F.col("doc_id").cast("long") * F.lit(KNUTH), F.lit(1 << 32))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    staged = docs.select(
        "source", "doc_id", F.row_number().over(w).alias("rn")
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_frame"),
        F.sum(((F.col("rn") - 1) % 20 == 0).cast("int")).alias("n_kept"),
    )


@register(
    "pb05_sp12_means",
    tags=("probe",),
    oracle=f"""
WITH a AS (
    SELECT source, count(*) AS n_frame, sum(n_chars) AS sz_frame
    FROM documents GROUP BY source
)
SELECT source, CAST(sz_frame AS BIGINT) AS sz_frame,
       {rational_rh_sql('sz_frame * 1000', 'n_frame')} AS mean_chars_frame_e3
FROM a
""",
)
def pb05_sp12_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: sp12's integer-rational mean emission over a PLAIN
    aggregate — no window function at all. pb04 green + pb05 green +
    sp12 red implicates the rank/mean interaction (or name-keyed
    driver state, pb16); pb05 red alone implicates the mean emission."""
    docs = table(spark, sf_dir, "documents")
    a = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_frame"),
        F.sum(F.col("n_chars").cast("long")).alias("sz_frame"),
    )
    return a.select(
        "source", "sz_frame",
        rational_rh(F.col("sz_frame") * F.lit(1000), F.col("n_frame"))
        .alias("mean_chars_frame_e3"),
    )


# ---------------------------------------------------------------------------
# mx02 decomposition
# ---------------------------------------------------------------------------


@register(
    "pb06_mx02_sqrt",
    tags=("probe",),
    oracle=f"""
SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
       {quantize_sql('sqrt(CAST(sum(n_chars) AS DOUBLE))', 3)} AS sq_e3
FROM documents GROUP BY source
""",
)
def pb06_mx02_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: mx02's ONLY remaining floating-point op in isolation —
    the correctly-rounded sqrt of an exact integer sum, quantized to
    integer thousandths. Red here would be the first observed
    quantize-of-correctly-rounded-double failure; green removes the
    sqrt leg from mx02's suspect list entirely."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum("n_chars").alias("n_chars_total"),
    ).select(
        "source", "n_chars_total",
        quantize(F.sqrt(F.col("n_chars_total").cast("double")), 3).alias("sq_e3"),
    )


@register(
    "pb07_mx02_ratio",
    tags=("probe",),
    oracle=f"""
WITH s AS (
    SELECT source, sum(n_chars) AS n_chars_total FROM documents GROUP BY source
),
t AS (SELECT sum(n_chars_total) AS total FROM s)
SELECT source, CAST(n_chars_total AS BIGINT) AS n_chars_total,
       {rational_rh_sql('n_chars_total * 1000000', 't.total')} AS share_ppm
FROM s CROSS JOIN t
""",
)
def pb07_mx02_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: mx02's ratio-assembly shape with ZERO doubles — the
    per-source share of exact character totals through the same
    crossJoin(broadcast(agg)) + integer-rational emission the canonical
    query uses. With pb06 this covers both halves of mx02; both green +
    mx02 red implicates the composed query or name-keyed state."""
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.sum("n_chars").alias("n_chars_total"))
    t = s.agg(F.sum("n_chars_total").alias("total"))
    return s.crossJoin(F.broadcast(t)).select(
        "source", "n_chars_total",
        rational_rh(F.col("n_chars_total") * F.lit(1000000), F.col("total"))
        .alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# pb08 — VALUES-only constant probe (no table at all)
# ---------------------------------------------------------------------------

# python floats repr()-serialized: shortest-roundtrip strings parse to the
# identical binary64 on both engines
_PB08_ROWS: list[tuple[int, float]] = [
    (1, 0.1),
    (2, 2.5),            # quantize scale-0 tie: floor(2.5 + 0.5) = 3
    (3, -2.5),           # negative tie: floor(-2.0) = -2
    (4, 1.0 / 3.0),
    (5, 5e-07),          # x*10^6 lands next to 0.5 — the half boundary
    (6, 58407.4999999),  # the tx19 boundary-class magnitude
    (7, 1000.0),         # the sp10 cutoff boundary value
]


@register(
    "pb08_const_values",
    tags=("probe",),
    oracle="WITH t(k, x) AS (VALUES "
    + ", ".join(f"({k}, CAST({x!r} AS DOUBLE))" for k, x in _PB08_ROWS)
    + f""")
SELECT k, x,
       {quantize_sql('x', 0)} AS q0,
       {quantize_sql('x', 6)} AS q6,
       {rational_rh_sql('k * 1000000', '7')} AS r7_ppm,
       {rational_rh_sql('-(k * 1000000)', '7')} AS rneg_ppm
FROM t
""",
)
def pb08_const_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: no table input at all — seven literal constants through
    quantize (double path, tie cases included) and rational_rh (integer
    path, negatives included), plus the raw double echoed back. Both
    engines fold constants; any red here indicts the driver's
    compare/canonicalization machinery itself rather than any query,
    and a green certifies quantize/rational_rh as constructs under the
    driver's exact environment. sf_dir is deliberately unused."""
    df = spark.createDataFrame(_PB08_ROWS, "k int, x double")
    return df.select(
        "k", "x",
        quantize(F.col("x"), 0).alias("q0"),
        quantize(F.col("x"), 6).alias("q6"),
        rational_rh(F.col("k").cast("long") * F.lit(1000000), F.lit(7).cast("long"))
        .alias("r7_ppm"),
        rational_rh(-(F.col("k").cast("long") * F.lit(1000000)), F.lit(7).cast("long"))
        .alias("rneg_ppm"),
    )


# ---------------------------------------------------------------------------
# pb09 — the all-integer control twin of the dq08 DECIMAL canary
# ---------------------------------------------------------------------------


@register(
    "pb09_nation_int",
    tags=("probe", "canary-control"),
    oracle="""
SELECT n_regionkey,
       count(*) AS n_nations,
       count(*) * 250000 AS n_quarter_e6
FROM nation GROUP BY 1
""",
)
def pb09_nation_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE (canary control): the dq08_decimal_canary's values emitted
    in the SAFE class — identical 5-row aggregate over nation, the
    quarter-count as BIGINT millionths instead of DECIMAL(18,6). The
    round-9 canary red could not distinguish "DECIMAL canonicalization"
    from "this query would red anyway" (VERDICT r9 order #6); with this
    twin in the same window, dq08-red + pb09-green is a CONTROLLED
    confirmation that DECIMAL output — and only DECIMAL output — is the
    failing class on that shape."""
    nation = table(spark, sf_dir, "nation")
    g = nation.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n_nations"))
    return g.select(
        "n_regionkey", "n_nations",
        (F.col("n_nations") * F.lit(250000)).alias("n_quarter_e6"),
    )


# ---------------------------------------------------------------------------
# qa05 decomposition — legs share stats.py builders and the oracle CTE text
# ---------------------------------------------------------------------------


def _qa05_parts() -> tuple[str, ...]:
    from ntripmonitor_spark.plans.pipeline import (
        QA05_BASE_CTES,
        qa05_est_ppm_sql,
        qa05_exact_ppm_sql,
    )

    return (
        QA05_BASE_CTES,
        qa05_est_ppm_sql(0.5) + "," + qa05_est_ppm_sql(0.9) + ","
        + qa05_est_ppm_sql(0.99),
        qa05_exact_ppm_sql(0.5) + "," + qa05_exact_ppm_sql(0.9) + ","
        + qa05_exact_ppm_sql(0.99),
    )


def _pb10_oracle() -> str:
    from ntripmonitor_spark.plans.pipeline import QA05_BASE_CTES

    return f"WITH {QA05_BASE_CTES}\nSELECT g AS event_type, vmin, vmax, b, n FROM h"


@register(
    "pb10_qa05_bins",
    tags=("probe",),
    oracle=_pb10_oracle(),
)
def pb10_qa05_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: qa05's mergeable histogram STATE — per (group, bin)
    counts on the deterministic global grid, plus the raw [vmin, vmax]
    extents (unmodified parquet doubles; no arithmetic beyond the bin
    floor both CTEs share). Red localizes qa05 to the bin assignment
    floor((v - vmin) / w) — the one place the VERDICT r9 boundary scan
    could not exhaustively clear; green clears it."""
    from ntripmonitor_spark.operators.stats import hq_cum

    cum = hq_cum(table(spark, sf_dir, "events"))
    return cum.select(
        F.col("g").alias("event_type"), "vmin", "vmax", "b", "n"
    )


def _pb11_oracle() -> str:
    base, _, exact = _qa05_parts()
    return (
        f"WITH {base},{exact}\n"
        "SELECT ex50.g AS event_type, ex50.exact_p50_ppm, ex90.exact_p90_ppm,"
        " ex99.exact_p99_ppm\n"
        "FROM ex50 JOIN ex90 ON ex90.g = ex50.g JOIN ex99 ON ex99.g = ex50.g"
    )


@register(
    "pb11_qa05_exact",
    tags=("probe",),
    oracle=_pb11_oracle(),
)
def pb11_qa05_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: qa05's exact rank-interpolation leg alone — the
    v[k] + (v[k+1] - v[k]) * frac chain over identically-ranked rows,
    quantized to integer millionths. Shares stats.hq_exact_leg with the
    canonical query so a red/green split against pb12 attributes which
    interpolation the driver's environment disputes."""
    from ntripmonitor_spark.operators.stats import hq_exact_leg, hq_ranked

    ranked = hq_ranked(table(spark, sf_dir, "events"))
    out = None
    for q in (0.5, 0.9, 0.99):
        leg = hq_exact_leg(ranked, q)
        out = leg if out is None else out.join(leg, "g")
    return out.select(
        F.col("g").alias("event_type"),
        "exact_p50_ppm", "exact_p90_ppm", "exact_p99_ppm",
    )


def _pb12_oracle() -> str:
    base, est, _ = _qa05_parts()
    return (
        f"WITH {base},{est}\n"
        "SELECT p50.g AS event_type, CAST(p50.n_total AS BIGINT) AS n, p50.est_p50_ppm,"
        " p90.est_p90_ppm, p99.est_p99_ppm\n"
        "FROM p50 JOIN p90 ON p90.g = p50.g JOIN p99 ON p99.g = p50.g"
    )


@register(
    "pb12_qa05_est",
    tags=("probe",),
    oracle=_pb12_oracle(),
)
def pb12_qa05_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: qa05's histogram-interpolation leg alone — grid fix, bin
    pick, and the within-bin linear interpolation, quantized to integer
    millionths. Shares stats.hq_est_leg with the canonical query; with
    pb10 (state) and pb11 (exact leg) the three probes partition qa05's
    plan, so the four driver rows attribute its red mechanically."""
    from ntripmonitor_spark.operators.stats import hq_cum, hq_est_leg

    cum = hq_cum(table(spark, sf_dir, "events"))
    out = None
    for q in (0.5, 0.9, 0.99):
        leg = hq_est_leg(cum, q)
        out = leg if out is None else out.join(leg.drop("n_total"), "g")
    return out.select(
        F.col("g").alias("event_type"), F.col("n_total").alias("n"),
        "est_p50_ppm", "est_p90_ppm", "est_p99_ppm",
    )


# ---------------------------------------------------------------------------
# pb13/pb14 — per-doc localizers for the two proven-fragile queries
# ---------------------------------------------------------------------------

_TX19_F_NUM_DOC = (
    "206835 * n_sents * n_words - 1015 * n_words * n_words"
    " - 84600 * n_syll * n_sents"
)


@register(
    "pb13_tx19_docs",
    tags=("probe",),
    oracle=f"""
WITH d AS (
    SELECT doc_id, source,
           CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n_words,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sents,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syll
    FROM documents
)
SELECT doc_id, source, n_words, n_sents, n_syll,
       CASE WHEN n_words > 0 THEN {rational_rh_sql(_TX19_F_NUM_DOC, 'n_sents * n_words')}
            ELSE 0 END AS f_milli
FROM d
""",
)
def pb13_tx19_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: tx19's per-doc relation BEFORE the rollup — doc_id, the
    three counts, and the exact integer-rational f_milli for every
    document (shares text.doc_readability with the canonical query).
    If tx19 reds again after the round-10 rational conversion, this
    row set names the exact disagreeing documents and whether the raw
    counts or the division diverged — the per-cell evidence three
    rounds of aggregate red/green could not produce."""
    from ntripmonitor_spark.operators.text import doc_readability

    return doc_readability(
        table(spark, sf_dir, "documents"), keep_cols=("doc_id",)
    ).select("doc_id", "source", "n_words", "n_sents", "n_syll", "f_milli")


@register(
    "pb14_sp10_docs",
    tags=("probe",),
    oracle=f"""
WITH mx AS (SELECT max(n_chars) AS mx FROM documents)
SELECT doc_id, source, n_chars,
       greatest(1, least(1000,
           {{idiv}})) AS cutoff,
       ((doc_id * 2654435761) % 4294967296) % 1000 AS bucket,
       CAST(((doc_id * 2654435761) % 4294967296) % 1000 <
            greatest(1, least(1000, {{idiv}})) AS INT) AS kept
FROM documents CROSS JOIN mx
""".replace("{idiv}", "CAST(((CAST(n_chars AS BIGINT) * 1000) - ((CAST(n_chars AS BIGINT) * 1000) % (mx.mx))) / (mx.mx) AS BIGINT)"),
)
def pb14_sp10_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE: sp10's per-doc keep-decision BEFORE the rollup — the
    BIGINT integral-division cutoff, the Knuth hash bucket, and the
    kept flag for every document (shares sampling.pps_stage with the
    canonical query). The round-9 fragility sat exactly here (the
    max-length doc's cutoff at the 1000.0 floor boundary); a red after
    the integer conversion names the doc and the leg that still moves."""
    from ntripmonitor_spark.operators.sampling import pps_stage

    staged = pps_stage(table(spark, sf_dir, "documents"))
    return staged.select(
        "doc_id", "source", "n_chars", "cutoff", "bucket",
        (F.col("bucket") < F.col("cutoff")).cast("int").alias("kept"),
    )


# ---------------------------------------------------------------------------
# pb15/pb16 — byte-identical twins under fresh names (name-keyed-state test)
# ---------------------------------------------------------------------------


def _twin(canonical: str, twin_name: str, doc: str) -> None:
    q = REGISTRY[canonical]

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return q.fn(spark, sf_dir)

    fn.__doc__ = doc
    register(twin_name, oracle=q.oracle, doc=doc, tags=("probe", "twin"))(fn)


_twin(
    "dq03_key_skew_profile",
    "pb15_dq03_twin",
    "PROBE: byte-identical twin of dq03_key_skew_profile — the same "
    "Spark callable and the same oracle SQL string, registered under a "
    "fresh name. dq03 has been hash-red three consecutive rounds while "
    "provably value-stable; if the canonical name reds again while this "
    "twin greens, the driver holds NAME-KEYED state (a stale cached "
    "result or pinned expectation) and no further query rewrite can "
    "ever fix it — the one hypothesis only a renamed duplicate can test.",
)

_twin(
    "sp12_systematic",
    "pb16_sp12_twin",
    "PROBE: byte-identical twin of sp12_systematic (same callable, same "
    "oracle) under a fresh name — the second, independent instance of "
    "the pb15 name-keyed-state test so a single flaky row cannot fake "
    "the pattern.",
)
