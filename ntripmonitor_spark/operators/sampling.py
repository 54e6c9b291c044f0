"""Corpus sampling / mixing operators for training-data pipelines:
deterministic hash sampling, per-stratum rates, per-group quotas, and
greedy sequence packing.

Design rules (100 TB): sampling must be a *pure filter* — no
shuffle, no global ordering, no RNG state — so it pushes into the
scan, runs identically in batch and streaming, and is reproducible
across retries. The pseudo-random coin is a multiplicative Knuth hash
of the stable row id (exact integer arithmetic, portable to any SQL
engine — the DuckDB oracle recomputes it bit-for-bit). Quota and
packing use window functions partitioned by the stratum (packing adds
a hash shard inside each stratum), so the only shuffle is keyed by the
(bounded-cardinality) stratum column — and no single stratum ever
serializes onto one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative constant (golden-ratio / 2^32).
KNUTH = 2654435761
BUCKETS = 1000

# Per-language keep rates in buckets-per-1000 (a Pareto-ish language
# mix: upsample low-resource, downsample dominant).
LANG_RATES = {"en": 700, "de": 500, "es": 400, "fr": 300, "zh": 250}


def hash_bucket(id_col: Column, buckets: int = BUCKETS) -> Column:
    """Deterministic pseudo-random bucket in [0, buckets) from a stable
    integer id: (id * KNUTH) mod 2^32 mod buckets."""
    return F.pmod(F.pmod(id_col.cast("long") * F.lit(KNUTH), F.lit(1 << 32)), F.lit(buckets))


def _rate_col(lang: Column) -> Column:
    expr = F.lit(None).cast("int")
    for lng, rate in LANG_RATES.items():
        expr = F.when(lang == lng, F.lit(rate)).otherwise(expr)
    return F.coalesce(expr, F.lit(0))


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Per-language rate sampling as a pure pushed-down filter: keep a
    doc iff its hash bucket falls under its stratum's rate."""
    b = hash_bucket(F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "source", b.alias("bucket"), _rate_col(F.col("lang")).alias("rate"))
        .filter(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang", "source", "bucket")
    )


def quota_per_group(docs: DataFrame, group_col: str = "source", k: int = 10) -> DataFrame:
    """Exactly-k pseudo-random docs per group: rank by (hash bucket,
    id) inside each group, keep rank ≤ k. One shuffle on the group
    key; at corpus scale combine with a pre-filter (top-k per group
    needs only ~k·groups rows past the exchange — Spark pushes a
    per-partition rank limit via the window's ``rank ≤ k`` filter)."""
    w = Window.partitionBy(group_col).orderBy(hash_bucket(F.col("doc_id")).asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", group_col, F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
    )


def temperature_mix(docs: DataFrame, coeff: float = 5.0) -> DataFrame:
    """Temperature-flattened source mixing (the standard LLM-corpus
    reweighting: expected kept docs per source ∝ n_s^0.5, so dominant
    sources are downsampled hardest while small sources keep
    everything). Per-source keep rate = min(1, coeff/√n_s), applied as
    the same deterministic hash coin as `stratified_sample`.

    Scale shape: one tiny per-source count aggregate (map-side
    combine, |sources| rows) broadcast back onto the corpus, then a
    pure filter — the corpus itself is never shuffled. All arithmetic
    is IEEE double in a fixed operation order, with no cross-source
    float summation, so the SQL oracle reproduces rates bit-for-bit.
    """
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    rate = F.floor(
        F.lit(BUCKETS)
        * F.least(F.lit(1.0), F.lit(coeff) / F.sqrt(F.col("n_src").cast("double")))
    ).cast("int")
    rates = counts.select("source", rate.alias("rate"))
    b = hash_bucket(F.col("doc_id"))
    return (
        docs.join(F.broadcast(rates), "source")
        .select("doc_id", "lang", "source", b.alias("bucket"), "rate")
        .filter(F.col("bucket") < F.col("rate"))
    )


# Sequence packing is sharded WITHIN each source: a window partitioned
# by source alone runs one task per source, so at 100 TB a dominant
# source (~10 TB) would serialize through a single core (and AQE cannot
# split a window partition). Packing instead runs per (source, shard)
# where shard = hash_bucket(doc_id) % PACK_SHARDS, and the global id is
# pack_id = shard * PACK_SHARD_STRIDE + local_pack. Each shard still
# packs greedily and deterministically; the only cross-shard effect is
# ≤1 fragmented pack per shard tail (bounded, amortized to nothing at
# scale). STRIDE = 2^20 leaves room for 2^20 packs (≈0.5 G tokens at
# 512) per shard before ids collide; raise PACK_SHARDS — not STRIDE —
# to scale out, keeping pack_id well inside int64.
PACK_SHARDS = 16
PACK_SHARD_STRIDE = 1 << 20


def _pack_by_shard(staged: DataFrame, pack_tokens: int, n_shards: int,
                   order_cols: list[Column]) -> DataFrame:
    """Shared shard-level packer: staged = (doc_id, source, n_tokens)."""
    staged = staged.withColumn("shard", hash_bucket(F.col("doc_id"), n_shards))
    w = (
        Window.partitionBy("source", "shard")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return staged.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("shard") * PACK_SHARD_STRIDE
         + F.floor(running / pack_tokens)).cast("long").alias("pack_id"),
    )


def sequence_pack(docs: DataFrame, pack_tokens: int = 512,
                  n_shards: int = PACK_SHARDS) -> DataFrame:
    """Greedy in-order sequence packing: within each (source, shard) —
    ordered by doc_id — assign docs to consecutive packs of
    ~pack_tokens whitespace tokens; pack_id = shard * 2^20 +
    floor(running_total_before / pack_tokens). One shuffle keyed by
    (source, shard), then a linear scan per partition: n_shards-way
    parallelism inside every source."""
    from ntripmonitor_spark.operators.dedup import normalized_words

    n_tok = F.size(normalized_words(F.col("text")))
    staged = docs.select("doc_id", "source", n_tok.alias("n_tokens"))
    return _pack_by_shard(staged, pack_tokens, n_shards, [F.col("doc_id").asc()])


def sequence_pack_sorted(docs: DataFrame, pack_tokens: int = 512,
                         n_shards: int = PACK_SHARDS) -> DataFrame:
    """Sorted greedy packing: within each (source, shard), pack docs in
    DESCENDING token order (first-fit-decreasing's sort step) so long
    documents seed packs and short ones fill tails — measurably less
    tail fragmentation than arrival-order `sequence_pack`, at the same
    one-shuffle, shard-parallel cost."""
    from ntripmonitor_spark.operators.dedup import normalized_words

    n_tok = F.size(normalized_words(F.col("text")))
    staged = docs.select("doc_id", "source", n_tok.alias("n_tokens"))
    return _pack_by_shard(
        staged, pack_tokens, n_shards,
        [F.col("n_tokens").desc(), F.col("doc_id").asc()],
    )


def split_long_docs(docs: DataFrame, chunk_tokens: int = 128) -> DataFrame:
    """Sequence SPLITTING — the step before packing for documents
    longer than the training context: each doc explodes into
    ceil(n_tokens / chunk_tokens) contiguous chunks; the last chunk
    carries the remainder.

    Pure per-row generate (sequence + explode) — zero shuffles, zero
    joins; at 100 TB this fuses into the corpus scan. Output one row
    per chunk: (doc_id, source, n_tokens, chunk_idx, chunk_len);
    chunks then feed the packer as independent units (`pack id` keying
    works unchanged because chunk rows keep their source).
    """
    from ntripmonitor_spark.operators.dedup import normalized_words

    n_tok = F.size(normalized_words(F.col("text")))
    staged = docs.select("doc_id", "source", n_tok.alias("n_tokens"))
    n_chunks = F.ceil(F.col("n_tokens") / F.lit(chunk_tokens)).cast("int")
    # empty docs still produce one (empty) chunk — greatest(n_chunks, 1)
    idx = F.explode(F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1))
    return staged.withColumn("chunk_idx", idx).withColumn(
        "chunk_len",
        F.least(
            F.lit(chunk_tokens),
            F.col("n_tokens") - F.col("chunk_idx") * chunk_tokens,
        ).cast("int"),
    )


DSIR_BUCKETS = 1024


def _dsir_bucket(tok: Column, buckets: int = DSIR_BUCKETS) -> Column:
    """Portable hashed-feature bucket: first 7 hex digits of md5(tok)
    as an integer, mod buckets (DuckDB: CAST('0x'||substr(md5,1,7) AS
    BIGINT) % buckets)."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("long"), F.lit(buckets)
    )


def dsir_logweights(docs: DataFrame, target_pred: Column,
                    buckets: int = DSIR_BUCKETS, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169) log importance weights: score every document by
    how much its hashed-unigram distribution looks like the *target*
    slice rather than the raw corpus.

    logw(doc) = Σ_tokens  ln p̂_target(bucket) − ln p̂_raw(bucket)

    with add-one smoothing over ``buckets`` hashed features. Sampling
    ∝ exp(logw) is the DSIR resampling step; emitting the weight keeps
    the operator deterministic and oracle-checkable.

    Scale shape: the *model* is the ``buckets``-row log-ratio table —
    built by one hash aggregate over the exploded token relation
    (map-side combine collapses each task to ≤ buckets partials) and
    broadcast back for scoring, so the corpus itself shuffles only as
    (doc_id, partial-sum) rows keyed by doc. This is DSIR's actual
    production shape: n-gram hash counts fit in memory; documents
    stream past them once.
    """
    # feeds both the frequency-model aggregate and the scoring join —
    # persist once (the dd02/dc02 silver-relation discipline)
    toks = docs.select(
        id_col,
        target_pred.alias("is_t"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
        ).alias("tok"),
    ).select(id_col, "is_t", _dsir_bucket(F.col("tok"), buckets).alias("bkt")).persist()

    freq = toks.groupBy("bkt").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("n_t"),
        F.count(F.lit(1)).alias("n_r"),
    )
    totals = freq.agg(
        F.sum("n_t").alias("nt_tot"), F.sum("n_r").alias("nr_tot")
    )
    ratio = freq.crossJoin(F.broadcast(totals)).select(
        "bkt",
        (
            F.log((F.col("n_t") + 1.0) / (F.col("nt_tot") + float(buckets)))
            - F.log((F.col("n_r") + 1.0) / (F.col("nr_tot") + float(buckets)))
        ).alias("lw"),
    )
    return (
        toks.join(F.broadcast(ratio), "bkt")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.sum("lw"), 6).alias("logw"),
        )
    )


def stratified_ksample(docs: DataFrame, k: int = 10,
                       stratum_col: str = "source", id_col: str = "doc_id",
                       n_shards: int = 32) -> DataFrame:
    """Deterministic uniform k-sample per stratum — the distributed,
    mergeable replacement for reservoir sampling: the sample is the k
    rows with the smallest Knuth-hash coins, so any two partial
    samples merge by re-ranking their union (same property KMV uses),
    and re-runs are reproducible.

    Skew-proof two-level shape: rows first rank within
    (stratum, hash-shard) and only each shard's top-k (≤ n_shards·k
    rows per stratum) proceeds to the global per-stratum re-rank —
    identical output to a single window, but no stratum ever sorts on
    one task. Same shard trick as sequence packing (tp01/tp02).
    """
    coin = F.pmod(F.col(id_col).cast("long") * F.lit(KNUTH), F.lit(1 << 32))
    shard = F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
    staged = docs.select(stratum_col, id_col).withColumn("coin", coin).withColumn("_shard", shard)
    w_local = Window.partitionBy(stratum_col, "_shard").orderBy(
        F.col("coin").asc(), F.col(id_col).asc()
    )
    survivors = (
        staged.withColumn("_lrk", F.row_number().over(w_local))
        .filter(F.col("_lrk") <= k)
        .drop("_lrk", "_shard")
    )
    w_global = Window.partitionBy(stratum_col).orderBy(
        F.col("coin").asc(), F.col(id_col).asc()
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w_global))
        .filter(F.col("rk") <= k)
        .select(stratum_col, id_col, "coin", "rk")
    )


# Deterministic corpus split fractions (train/val/test). Cumulative
# thresholds in buckets-per-4294967296 of the portable Knuth hash, so
# the assignment is reproducible across engines, runs, and cluster
# sizes — membership is a pure function of doc_id, never of partition
# layout or RNG state.
SPLIT_FRACTIONS: tuple[tuple[str, float], ...] = (
    ("train", 0.90), ("val", 0.05), ("test", 0.05),
)
# Integer hash cutoffs (h < cutoff), precomputed so the boundary is an
# exact integer compare in every engine — never a float-accumulation
# artifact (0.9 + 0.05 != 0.95 in IEEE doubles).
_SPLIT_CUTOFFS: list[tuple[int, str]] = []
_acc = 0.0
for _name, _frac in SPLIT_FRACTIONS[:-1]:
    _acc += _frac
    _SPLIT_CUTOFFS.append((int(_acc * (1 << 32)), _name))


def split_hash_col(id_col: Column) -> Column:
    """The portable split hash (Knuth multiplicative mod 2^32)."""
    return F.pmod(id_col.cast("long") * F.lit(KNUTH), F.lit(1 << 32))


def split_col(id_col: Column) -> Column:
    """Split assignment as a pure column expression — shared by the
    sp05 query and the export writer so placement can never drift."""
    h = split_hash_col(id_col)
    expr = F.lit(SPLIT_FRACTIONS[-1][0])
    for cutoff, name in reversed(_SPLIT_CUTOFFS):
        expr = F.when(h < F.lit(cutoff), F.lit(name)).otherwise(expr)
    return expr


def hash_split(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test assignment by hashed id: the split
    every training pipeline needs before packing/export, as a pure
    column expression (zero exchanges, trivially pushed down as a scan
    predicate when materializing one split).

    A new document joining the corpus never moves any existing
    document between splits (stable hashing), unlike randomSplit,
    whose assignment depends on partition layout and seed plumbing.
    """
    return docs.select(
        F.col(id_col), "source",
        split_hash_col(F.col(id_col)).alias("h"),
        split_col(F.col(id_col)).alias("split"),
    )


def token_budget_select(docs: DataFrame, budget_per_source: int = 800,
                        quality_col: str = "n_chars",
                        source_col: str = "source",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Exact greedy token-budget selection: per source, take documents
    in (quality desc, id asc) order until the token budget is spent —
    the "best data under a compute budget" step every training-mix
    plan ends with.

    The greedy definition is a per-source sorted prefix, but the naive
    formulation (one running-sum window per source) serializes each
    source onto one task — the tp01 packing trap. Instead the exact
    same selection decomposes into:

    1. one map-side-combined aggregate to the (source, quality) grid
       with per-group token totals (bounded cardinality — the ks01
       trick);
    2. a descending cumulative sum over that bounded grid → per-source
       quality cutoff q*: groups strictly above q* are taken in full,
       and the residual budget at q* is known;
    3. boundary resolution: only documents AT exactly q* pay a rank —
       a window over the value-collision set, orders of magnitude
       smaller than the source (degenerate all-one-quality corpora
       degrade to the naive cost; that is the data's fault, not the
       plan's).

    Output: the selected documents (doc_id, source, quality,
    n_tokens) — equal to the naive global-window definition (the
    oracle computes exactly that).
    """
    toks = F.size(F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != ""))
    d = docs.select(
        F.col(id_col), F.col(source_col), F.col(quality_col).alias("q"),
        toks.alias("n_tokens"),
    ).persist()

    grid = d.groupBy(source_col, "q").agg(F.sum("n_tokens").alias("t_q"))
    wq = (
        Window.partitionBy(source_col)
        .orderBy(F.col("q").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = grid.withColumn("cum_incl", F.sum("t_q").over(wq)).withColumn(
        "cum_prev", F.col("cum_incl") - F.col("t_q")
    )
    B = F.lit(budget_per_source)
    full = g.filter(F.col("cum_incl") <= B).select(source_col, "q")
    boundary = g.filter((F.col("cum_incl") > B) & (F.col("cum_prev") < B)).select(
        source_col, "q", (B - F.col("cum_prev")).alias("residual")
    )

    taken_full = d.join(full, [source_col, "q"]).select(
        id_col, source_col, F.col("q").alias("quality"), "n_tokens"
    )
    wb = (
        Window.partitionBy(source_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_boundary = d.join(F.broadcast(boundary), [source_col, "q"])
    taken_boundary = (
        at_boundary.withColumn("bcum", F.sum("n_tokens").over(wb))
        .filter(F.col("bcum") <= F.col("residual"))
        .select(id_col, source_col, F.col("q").alias("quality"), "n_tokens")
    )
    return taken_full.unionByName(taken_boundary)


# Weighted sampling without replacement (Efraimidis–Spirakis 2006): a
# doc's priority is u^(1/w) — equivalently ln(u)/w, monotone — with u a
# uniform coin; the top-k priorities ARE a weight-proportional sample
# without replacement. The coin is the same Knuth-hash bucket as every
# other sampler in this module (at 2^20 resolution), so the draw is a
# pure column expression: reproducible across retries, engines, and
# batch/streaming, with no RNG state and no shuffle before the top-k.
ES_RESOLUTION = 1 << 20


def weighted_sample_topk(docs: DataFrame, k: int = 200,
                         weight_col: str = "n_chars",
                         id_col: str = "doc_id") -> DataFrame:
    """Exact-k weighted sample without replacement: keep the k docs with
    the highest ln(u)/w priority (u = hashed-id uniform in (0,1), w ≥ 1
    the document weight — here length, the standard token-budget bias).

    Scale shape: priorities are a pure projection over the scan; the
    global top-k plans as TakeOrderedAndProject (per-partition partial
    top-k, then a k-row merge on the driver) — NO range-partitioned
    global sort, no window, no shuffle of the corpus. At any corpus
    size the cross-machine traffic is k rows per partition.

    Ties broken by id for bit-stable output. ln is the one
    transcendental in the pipeline; adjacent priorities in a real
    corpus are separated by far more than the ≤1-ulp engine difference,
    and the oracle recomputes the identical expression.
    """
    u = (hash_bucket(F.col(id_col), ES_RESOLUTION) + F.lit(0.5)) / F.lit(float(ES_RESOLUTION))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    pri = (F.log(u) / w).alias("priority")
    return (
        docs.select(id_col, "source", weight_col, pri)
        .orderBy(F.col("priority").desc(), F.col(id_col).asc())
        .limit(k)
    )


def pack_utilization(docs: DataFrame, pack_tokens: int = 512) -> DataFrame:
    """Packing-quality report over :func:`sequence_pack`'s output — the
    number a training run actually cares about (padding waste is paid
    in GPU-hours): per source, pack count, mean/min fill fraction and
    the share of under-half-full packs.

    A pack's fill = its token sum / capacity; greedy packing overflows
    a pack's LAST doc past the boundary, so fill can exceed 1 — the
    report clamps nothing and measures what the packer really did.
    One bounded aggregation over the packer's output (per-pack rows =
    output-scale, then |sources| rows); adds no corpus-scaled work.
    """
    packed = sequence_pack(docs, pack_tokens)
    per_pack = packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tok"),
    )
    fill = F.col("tok").cast("double") / pack_tokens
    return per_pack.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.round(F.avg(fill), 6).alias("avg_fill"),
        F.round(F.min(fill), 6).alias("min_fill"),
        F.round(
            F.avg(F.when(fill < 0.5, 1.0).otherwise(0.0)), 6
        ).alias("frac_underhalf"),
        F.round(F.avg("n_docs"), 6).alias("avg_docs_per_pack"),
    )


def loss_aware_mix(docs: DataFrame, eta: float = 1.0,
                   vocab_size: int = 64) -> DataFrame:
    """Loss-aware source reweighting (the DoReMi/Group-DRO shape at
    its simplest): score every source by its mean LM surprisal under
    the corpus unigram model (tx07's proxy for "how hard is this
    domain"), then exponentially upweight above-average-loss sources
    — exp(eta * excess), normalized. The reweighting loop a mixture-
    optimization run iterates, as one declarative plan per step.

    All per-doc scores are rounded to 6 decimals and aggregated in
    exact DECIMAL, so the per-source means are independent of float
    summation order; the softmax runs over the |sources|-row relation.
    Output: (source, n_docs, mean_nll, excess, weight), weights
    summing to 1.
    """
    from ntripmonitor_spark.operators.text import unigram_surprisal

    scored = unigram_surprisal(docs, vocab_size=vocab_size).filter(
        F.col("mean_surprisal").isNotNull()
    )
    per_src = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("mean_surprisal").cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("mean_nll"),
    )
    glob = scored.agg(
        (F.sum(F.col("mean_surprisal").cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("g")
    )
    j = per_src.crossJoin(F.broadcast(glob))
    ex = F.col("mean_nll") - F.col("g")
    w = Window.partitionBy()
    weight = F.exp(F.lit(eta) * ex) / F.sum(F.exp(F.lit(eta) * ex)).over(w)
    return j.select(
        "source", "n_docs",
        F.round("mean_nll", 6).alias("mean_nll"),
        F.round(ex, 6).alias("excess"),
        F.round(weight, 6).alias("weight"),
    )


EPOCH_PRIME = 15485863


def epoch_order(docs: DataFrame, epoch: int, n_shards: int = PACK_SHARDS) -> DataFrame:
    """Deterministic per-epoch training order: every epoch must see the
    corpus in a DIFFERENT order (optimizer health) that is nonetheless
    exactly reproducible on retry/resume (a preempted trainer must
    restart mid-epoch at the same position). Order key = Knuth hash of
    (doc_id + epoch·PRIME): changing the epoch permutes everything,
    fixing it freezes the order — no RNG state anywhere.

    Scale shape: order is assigned WITHIN hash shards (row_number per
    shard over the hash key), never by a global sort — the trainer
    reads shards in fixed shard order, shuffled within; cross-shard
    order is already randomized by the shard hash itself. Position =
    shard·2^40 + within-shard rank gives a single sortable int64.
    """
    key = hash_bucket(F.col("doc_id") + F.lit(epoch * EPOCH_PRIME), 1 << 20)
    shard = hash_bucket(F.col("doc_id"), n_shards)
    w = Window.partitionBy("shard").orderBy(F.col("okey").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", shard.alias("shard"), key.alias("okey"))
        .withColumn("pos", F.col("shard").cast("long") * F.lit(1 << 40)
                    + F.row_number().over(w) - 1)
        .select("doc_id", "shard", "pos")
    )


def cluster_split(docs: DataFrame, n: int = 3, threshold: float = 0.6,
                  id_col: str = "doc_id") -> DataFrame:
    """Leakage-safe train/val/test split: hash the near-dup CLUSTER id,
    not the document id, so every member of a duplicate cluster lands
    in the same split. A doc-id hash split (sp05) puts ~10% of a
    near-dup pair's mates into val/test — exactly the train/test
    contamination dedup was supposed to prevent; grouping by the CC
    cluster id closes that hole (the group-aware split every
    benchmark-honest pipeline uses).

    Scale shape: clusters come from the shared pointer-doubling CC
    (edge-touched subgraph only — singletons never iterate); the split
    itself is the same pure column expression as sp05 applied to
    cluster_id, so beyond CC there are zero extra exchanges and a
    materialized split pushes down as a scan predicate.
    """
    from ntripmonitor_spark.operators.dedup import duplicate_clusters

    labels = duplicate_clusters(docs, n=n, threshold=threshold, id_col=id_col)
    return labels.select(
        "doc_id", "cluster_id",
        split_hash_col(F.col("cluster_id")).alias("h"),
        split_col(F.col("cluster_id")).alias("split"),
    )


def pps_stage(docs: DataFrame, id_col: str = "doc_id",
              size_col: str = "n_chars", group_col: str = "source",
              buckets: int = BUCKETS) -> DataFrame:
    """The per-doc PPS keep-decision stage shared by
    :func:`pps_resample` (sp10) and the round-10 localization probe
    (plans/probes.py: pb14): (id, group, size, cutoff, bucket). The
    cutoff clamp(1, buckets, size*buckets div max) is pure BIGINT
    integral division — `div` truncation == floor for these
    non-negative longs, and no double is constructed (the prior DOUBLE
    floor sat exactly on the 1000.0 boundary for the max-length doc,
    VERDICT r9)."""
    mx = docs.agg(F.max(F.col(size_col)).alias("mx"))
    return docs.crossJoin(F.broadcast(mx)).select(
        F.col(id_col), F.col(group_col), F.col(size_col),
        F.greatest(
            F.lit(1).cast("long"),
            F.least(
                F.lit(buckets).cast("long"),
                F.call_function(
                    "div",
                    F.col(size_col).cast("long") * buckets,
                    F.col("mx").cast("long"),
                ),
            ),
        ).alias("cutoff"),
        hash_bucket(F.col(id_col), buckets).alias("bucket"),
    )


def pps_resample(docs: DataFrame, id_col: str = "doc_id",
                 size_col: str = "n_chars", group_col: str = "source",
                 buckets: int = BUCKETS) -> DataFrame:
    """Poisson PPS (probability-proportional-to-size) resampling with
    the Horvitz-Thompson group-count estimator: each doc is kept
    independently with inclusion probability proportional to its size
    (p_max = 1 for the largest doc, floor p = 1/buckets so every doc
    stays in the sampling frame and the HT estimator stays unbiased),
    and each kept doc is reweighted by 1/p.

    Deterministic accept: integer cutoff ``clamp(1, buckets*size//max)``
    compared against the Knuth hash bucket — integer arithmetic on both
    engines, no float boundary, no RNG state, reproducible across
    retries and partition layouts (randomSplit/sample are neither).

    Shape: one corpus aggregate for max(size) rides back as a one-row
    broadcast (the bm01 corpus-stats discipline); the keep decision is
    then a pure pushed-down scan predicate — zero additional exchanges
    before the final per-group rollup. Round 10: the cutoff is pure
    BIGINT integral division (the previous DOUBLE floor((size*1000)/mx)
    sat EXACTLY on the 1000.0 boundary for the max-length doc — VERDICT
    r9's proven 1-ulp fragility), and each HT share is the exact
    integer-rational round-half-up of buckets*10^6 / cutoff
    (functions/portable.rational_rh — no double constructed anywhere),
    summed as exact BIGINTs (summation-order-free) and emitted directly
    as that BIGINT millionths sum (ht_n_docs_ppm).
    """
    from ntripmonitor_spark.functions.portable import rational_rh
    staged = pps_stage(docs, id_col=id_col, size_col=size_col,
                       group_col=group_col, buckets=buckets)
    kept = staged.filter(F.col("bucket") < F.col("cutoff"))
    ht_ppm = rational_rh(F.lit(buckets * 10 ** 6).cast("long"), F.col("cutoff"))
    n_orig = staged.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_orig"))
    agg = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col(size_col)).alias("chars_kept"),
        F.sum(ht_ppm).alias("ht_ppm"),
    )
    return n_orig.join(agg, group_col, "left").select(
        group_col, "n_orig",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("chars_kept", F.lit(0)).alias("chars_kept"),
        F.coalesce("ht_ppm", F.lit(0)).alias("ht_n_docs_ppm"),
    )


def sliding_chunks(docs: DataFrame, window: int = 128, stride: int = 96) -> DataFrame:
    """OVERLAPPING sequence chunking — the RAG/retrieval sibling of
    split_long_docs: chunks of ``window`` tokens starting every
    ``stride`` tokens, so each boundary is covered by
    ``window - stride`` tokens of context on both sides (no sentence
    straddles a hard cut unseen).

    A start is emitted iff it contributes NEW tokens beyond the
    previous chunk's coverage: start i (token offset stride*i) is kept
    when i == 0 or n_tokens > stride*i + (window - stride), i.e.
    k = max(1, ceil((n_tokens - overlap) / stride)) chunks. Every kept
    non-first chunk therefore overlaps its predecessor by exactly
    ``window - stride`` tokens (n_new = chunk_len - overlap).

    Pure per-row generate (sequence + explode), zero shuffles/joins —
    fuses into the corpus scan at any scale, like split_long_docs.
    """
    from ntripmonitor_spark.operators.dedup import normalized_words

    overlap = window - stride
    n_tok = F.size(normalized_words(F.col("text")))
    staged = docs.select("doc_id", "source", n_tok.alias("n_tokens"))
    k = F.greatest(
        F.ceil((F.col("n_tokens") - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
        F.lit(1),
    )
    idx = F.explode(F.sequence(F.lit(0), k - 1))
    start = F.col("chunk_idx") * stride
    chunk_len = F.least(F.lit(window), F.col("n_tokens") - start).cast("int")
    return (
        staged.withColumn("chunk_idx", idx)
        .select(
            "doc_id", "source", "n_tokens",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            start.cast("int").alias("start_tok"),
            chunk_len.alias("chunk_len"),
            F.when(F.col("chunk_idx") == 0, chunk_len)
             .otherwise(chunk_len - overlap).cast("int").alias("n_new"),
        )
    )


def fim_split(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fill-in-the-middle training splits: two deterministic uniform
    cut points per document (prefix | middle | suffix), the transform
    FIM-trained code/LLM pipelines apply to a configured fraction of
    documents. Cuts derive from the same Knuth multiplicative hash as
    `hash_split` — a new document never changes any existing split,
    unlike an RNG transform — and the PSM/SPM mode flag comes from the
    hash's parity, so the whole operator is a pure column expression:
    zero exchanges at any scale, trivially fused into the export scan.

    Output keeps both the segment LENGTHS and the md5 of the middle
    segment's text, so the re-assembly property (prefix+middle+suffix
    == doc) is value-checkable downstream.
    """
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    staged = docs.select(
        F.col(id_col), F.col("source"), toks.alias("toks")
    ).withColumn("n_tokens", F.size("toks")).filter(F.col("n_tokens") >= 3)
    h1 = F.pmod(F.col(id_col).cast("long") * F.lit(KNUTH), F.lit(1 << 32))
    h2 = F.pmod((F.col(id_col).cast("long") + F.lit(1)) * F.lit(KNUTH), F.lit(1 << 32))
    c1 = F.pmod(h1, F.col("n_tokens") + 1)
    c2 = F.pmod(h2, F.col("n_tokens") + 1)
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    middle = F.slice(F.col("toks"), lo + 1, hi - lo)
    return staged.select(
        id_col, "source", "n_tokens",
        lo.alias("cut_lo"), hi.alias("cut_hi"),
        lo.alias("len_prefix"),
        (hi - lo).alias("len_middle"),
        (F.col("n_tokens") - hi).alias("len_suffix"),
        F.when(F.pmod(h1, F.lit(2)) == 0, F.lit("psm")).otherwise(F.lit("spm")).alias("mode"),
        F.md5(F.array_join(middle, " ").cast("binary")).alias("middle_fp"),
    )


def systematic_sample(docs: DataFrame, k: int = 20,
                      group_col: str = "source",
                      id_col: str = "doc_id",
                      size_col: str = "n_chars") -> DataFrame:
    """Systematic 1-in-k sampling per group: order each group by the
    Knuth hash of the id (a deterministic pseudo-random permutation)
    and keep every k-th row — the survey-sampling primitive that
    guarantees an EXACTLY even spread through the (pseudo-randomized)
    frame, so per-group sample sizes are deterministic ceil(n/k)
    rather than Binomial as in Bernoulli/hash-cutoff sampling (sp01).
    Output is the per-group audit: frame size, kept count, and mean
    kept length vs frame mean length (the self-weighting check —
    systematic over a hash order is unbiased, so the two means agree
    up to sampling noise).

    Shape: one window rank per group key (the quota_per_group
    exchange), then a keyed rollup — the modulo keep-decision costs a
    filter, never a second shuffle. Round 10: the means are exact
    integer-rational round-half-up divisions sum*1000 / count in pure
    BIGINT arithmetic (functions/portable.rational_rh — no double ever
    constructed), emitted as BIGINT *_e3 columns, so the report is
    exact, tie-portable, and engine-version-independent."""
    from ntripmonitor_spark.functions.portable import rational_rh

    h = F.pmod(F.col(id_col).cast("long") * F.lit(KNUTH), F.lit(1 << 32))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    staged = docs.select(
        group_col, F.col(id_col), F.col(size_col),
        F.row_number().over(w).alias("rn"),
    )
    kept_sz = F.when((F.col("rn") - 1) % k == 0, F.col(size_col))
    agg = staged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_frame"),
        F.sum(((F.col("rn") - 1) % k == 0).cast("int")).alias("n_kept"),
        F.sum(F.col(size_col).cast("long")).alias("sz_frame"),
        F.sum(kept_sz.cast("long")).alias("sz_kept"),
    )
    return agg.select(
        group_col, "n_frame", "n_kept",
        rational_rh(F.col("sz_frame") * F.lit(1000), F.col("n_frame"))
        .alias("mean_chars_frame_e3"),
        rational_rh(F.col("sz_kept") * F.lit(1000), F.col("n_kept"))
        .alias("mean_chars_kept_e3"),
    )


def weighted_reservoir(docs: DataFrame, k: int = 10,
                       group_col: str = "source",
                       id_col: str = "doc_id",
                       weight_col: str = "n_chars") -> DataFrame:
    """PER-GROUP weighted reservoir (bottom-k) sample with an
    all-integer priority key: key = floor(h * 10^6 / w) where h is the
    Knuth hash of the id (uniform in [0, 2^32)) and w >= 1 the weight —
    the deterministic integer analogue of the Efraimidis–Spirakis
    exponential-jump reservoir (ws01 is the GLOBAL top-k variant with
    an ln() priority; this one is per-group, k each, and never calls
    libm: larger weights get systematically smaller keys, so
    P(selected) grows with w and the whole draw is exact BIGINT
    arithmetic on both engines, ties by id).

    Output is the per-group audit (not the sampled rows): frame/kept
    counts, kept chars, and kept-vs-frame mean length — the
    self-weighting check inverted (a weighted draw MUST skew long, so
    mean_kept >> mean_frame is the pass condition).

    Shape: priority is a pure projection over the scan; one window
    rank per group key + a keyed rollup (the sp12/quota exchange
    shape). At 100 TB the rank is the only group-keyed exchange, and a
    mergeable refinement exists (per-partition bottom-k then re-rank —
    the KMV discipline) when groups outgrow a task. Means are exact
    integer-rational round-half-up (functions/portable.rational_rh)."""
    from ntripmonitor_spark.functions.portable import rational_rh

    h = F.pmod(F.col(id_col).cast("long") * F.lit(KNUTH), F.lit(1 << 32))
    w = F.greatest(F.col(weight_col).cast("long"), F.lit(1).cast("long"))
    key = F.call_function("div", h * F.lit(1000000), w)
    rw = Window.partitionBy(group_col).orderBy(
        F.col("key").asc(), F.col(id_col).asc()
    )
    staged = docs.select(
        group_col, F.col(id_col), F.col(weight_col),
        key.alias("key"),
    ).withColumn("rk", F.row_number().over(rw))
    kept_sz = F.when(F.col("rk") <= k, F.col(weight_col).cast("long"))
    agg = staged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_frame"),
        F.sum((F.col("rk") <= k).cast("int")).alias("n_kept"),
        F.sum(F.col(weight_col).cast("long")).alias("sz_frame"),
        F.sum(kept_sz).alias("chars_kept"),
    )
    return agg.select(
        group_col, "n_frame", "n_kept", "chars_kept",
        rational_rh(F.col("sz_frame") * F.lit(1000), F.col("n_frame"))
        .alias("mean_chars_frame_e3"),
        rational_rh(F.col("chars_kept") * F.lit(1000), F.col("n_kept"))
        .alias("mean_chars_kept_e3"),
    )


def padding_waste(docs: DataFrame, bucket_tokens: int = 16,
                  text_col: str = "text",
                  source_col: str = "source") -> DataFrame:
    """Padding-waste accounting for length-bucketed batching — the
    UNPACKED counterpart of pack_utilization (tp04): when a loader
    pads every sequence up to its bucket boundary instead of packing,
    the wasted-token share per bucket is what decides the bucket
    width. Per bucket: padded length, docs, real tokens, pad tokens,
    and the waste share.

    padded = (n + B-1) - (n + B-1) % B — pure integer arithmetic
    (ceil to the bucket multiple without division), identical on both
    engines; counts are exact BIGINT sums and the one ratio is an
    exact integer-rational round-half-up in pure BIGINT arithmetic
    (waste_ppm; functions/portable.rational_rh — no double anywhere),
    NULL-guarded for the zero-token bucket (padded = 0 ⇒ the share is
    undefined; an unguarded double division would yield 0.0/0.0 = NaN
    on Spark vs NULL/error on the oracle — ADVICE r9).

    Shape: one corpus scan of column expressions into a map-side-
    combined aggregate keyed by (bucket, source) — output bounded by
    buckets x sources; nothing else scales with the corpus."""
    from ntripmonitor_spark.functions.portable import rational_rh
    from ntripmonitor_spark.operators.dedup import normalized_words

    n_tok = F.size(normalized_words(F.col(text_col))).cast("long")
    bump = n_tok + F.lit(bucket_tokens - 1)
    padded = bump - bump % bucket_tokens
    staged = docs.select(
        F.col(source_col).alias("source"),
        n_tok.alias("n_tok"),
        padded.alias("padded"),
    )
    g = staged.groupBy("source", "padded").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("tokens_sum"),
    )
    denom = F.col("padded") * F.col("n_docs")
    pad_sum = denom - F.col("tokens_sum")
    return g.select(
        "source",
        F.col("padded").alias("padded_len"),
        "n_docs", "tokens_sum",
        pad_sum.alias("pad_sum"),
        F.when(denom > 0, rational_rh(pad_sum * F.lit(1000000), denom))
        .alias("waste_ppm"),
    )
