"""End-to-end corpus curation funnel — the composition the individual
operators exist for: quality gate → exact dedup → temperature-
flattened source mixing → sequence packing, as ONE declarative plan.

Scale shape (100 TB): the gate and the final mix filter are pure
column predicates on the scan; dedup is one window keyed by content
hash (the only corpus-sized shuffle); the mix rates are a tiny
broadcast aggregate; packing shuffles only (doc_id, source, n_tokens)
survivors keyed by (source, shard) — shard-level parallelism inside
every source, so no single source serializes onto one core (see
sampling.PACK_SHARDS). Everything is deterministic — hash coin,
min-doc_id dedup winner — so retries and the SQL oracle reproduce the
exact survivor set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ntripmonitor_spark.operators.sampling import BUCKETS, hash_bucket
from ntripmonitor_spark.operators.text import quality_score_col


def curation_funnel(docs: DataFrame, quality_min: float = 0.5,
                    coeff: float = 5.0, pack_tokens: int = 512) -> DataFrame:
    """documents → packed training sequences after three cuts:

    1. quality gate: weighted score ≥ ``quality_min``;
    2. exact dedup: min-doc_id winner per md5(text);
    3. temperature mix: per-source keep rate min(1, coeff/√n_s)
       computed over the DEDUPED survivors, applied as the
       deterministic hash coin;
    then greedy in-order packing into ~``pack_tokens`` packs per
    (source, shard). Output: (doc_id, source, n_tokens, pack_id) with
    pack_id = shard * 2^20 + local_pack.
    """
    from ntripmonitor_spark.operators.dedup import normalized_words

    d = docs.withColumn("quality_score", quality_score_col(F.col("text"))).filter(
        F.col("quality_score") >= quality_min
    )
    w_dup = Window.partitionBy(F.md5(F.col("text")))
    d = d.withColumn("win", F.min("doc_id").over(w_dup)).filter(
        F.col("doc_id") == F.col("win")
    )

    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    rate = F.floor(
        F.lit(BUCKETS)
        * F.least(F.lit(1.0), F.lit(coeff) / F.sqrt(F.col("n_src").cast("double")))
    ).cast("int")
    d = d.join(F.broadcast(counts.select("source", rate.alias("rate"))), "source").filter(
        hash_bucket(F.col("doc_id")) < F.col("rate")
    )

    from ntripmonitor_spark.operators.sampling import _pack_by_shard

    n_tok = F.size(normalized_words(F.col("text")))
    staged = d.select("doc_id", "source", n_tok.alias("n_tokens"))
    return _pack_by_shard(staged, pack_tokens, n_shards=16,
                          order_cols=[F.col("doc_id").asc()])


def full_pipeline(docs: DataFrame, benchmark_pred, quality_min: float = 0.5,
                  coeff: float = 5.0, pack_tokens: int = 512,
                  chunk_tokens: int = 128, n: int = 3) -> DataFrame:
    """The COMPLETE curation pipeline as one declarative plan — every
    cut a real training run makes, in order:

    1. quality gate (weighted score ≥ ``quality_min``);
    2. exact dedup (min-doc_id winner per md5(text));
    3. eval-set decontamination (drop docs whose distinct 3-gram
       overlap with the benchmark slice reaches 80% — dc01 semantics;
       the benchmark slice itself never enters the corpus);
    4. temperature-flattened source mixing over the CLEAN survivors;
    5. long-document splitting into ≤ ``chunk_tokens`` chunks;
    6. greedy packing of chunks into ~``pack_tokens`` packs per
       (source, shard).

    Output: (doc_id, chunk_idx, source, n_tokens, chunk_len, pack_id).

    Scale shape: gate + mix stay scan predicates; dedup is one
    content-hash window; decontamination broadcasts the benchmark
    shingle set and joins its per-doc verdict back keyed by doc_id;
    splitting is a per-row generate; packing shuffles only chunk
    metadata keyed by (source, shard). Two corpus-keyed exchanges
    total (dedup window, verdict join) before the packer.
    """
    from ntripmonitor_spark.operators.dedup import decontaminate, normalized_words
    from ntripmonitor_spark.operators.sampling import PACK_SHARD_STRIDE, hash_bucket

    corpus = docs.filter(~benchmark_pred)
    d = corpus.withColumn("quality_score", quality_score_col(F.col("text"))).filter(
        F.col("quality_score") >= quality_min
    )
    w_dup = Window.partitionBy(F.md5(F.col("text")))
    d = d.withColumn("win", F.min("doc_id").over(w_dup)).filter(
        F.col("doc_id") == F.col("win")
    )

    verdict = decontaminate(docs, benchmark_pred, n).select("doc_id", "is_contaminated")
    d = d.join(verdict, "doc_id", "left").filter(
        F.col("is_contaminated").isNull() | ~F.col("is_contaminated")
    )

    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    rate = F.floor(
        F.lit(BUCKETS)
        * F.least(F.lit(1.0), F.lit(coeff) / F.sqrt(F.col("n_src").cast("double")))
    ).cast("int")
    d = d.join(F.broadcast(counts.select("source", rate.alias("rate"))), "source").filter(
        hash_bucket(F.col("doc_id")) < F.col("rate")
    )

    n_tok = F.size(normalized_words(F.col("text")))
    staged = d.select("doc_id", "source", n_tok.alias("n_tokens"))
    n_chunks = F.ceil(F.col("n_tokens") / F.lit(chunk_tokens)).cast("int")
    chunks = staged.withColumn(
        "chunk_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1))
    ).withColumn(
        "chunk_len",
        F.least(
            F.lit(chunk_tokens),
            F.col("n_tokens") - F.col("chunk_idx") * chunk_tokens,
        ).cast("int"),
    )

    shard = hash_bucket(F.col("doc_id"), 16)
    chunks = chunks.withColumn("_shard", shard)
    w = (
        Window.partitionBy("source", "_shard")
        .orderBy(F.col("doc_id").asc(), F.col("chunk_idx").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum("chunk_len").over(w) - F.col("chunk_len")
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "source",
        "n_tokens",
        "chunk_len",
        (F.col("_shard") * PACK_SHARD_STRIDE
         + F.floor(running / pack_tokens)).cast("long").alias("pack_id"),
    )


def drop_reasons(docs: DataFrame, quality_min: float = 0.5,
                 coeff: float = 5.0) -> DataFrame:
    """Provenance ledger for the curation funnel: for EVERY input
    document, the first stage that dropped it — 'gate' (quality),
    'duplicate' (lost the min-doc_id race; ``winner_id`` says to
    whom), 'mix' (temperature coin) — or 'kept'. The answer to "why
    is my document not in the training set", which a production
    curation run must be able to produce without re-running the
    funnel N times.

    One plan, same cuts as :func:`curation_funnel` (equality of the
    'kept' slice with the funnel's survivor set is test-pinned): the
    gate is a column predicate, the duplicate race is the same md5
    window with the winner restricted to gate-passers, the mix rates
    aggregate over survivors and broadcast back LEFT (dropped rows
    keep their verdict; no input row is ever filtered out — this is
    an audit, not a filter).
    """
    d = docs.withColumn("quality_score", quality_score_col(F.col("text")))
    q = F.col("quality_score") >= quality_min
    w_dup = Window.partitionBy(F.md5(F.col("text")))
    d = d.withColumn("win", F.min(F.when(q, F.col("doc_id"))).over(w_dup))
    surv = q & (F.col("doc_id") == F.col("win"))

    counts = d.filter(surv).groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    rate = F.floor(
        F.lit(BUCKETS)
        * F.least(F.lit(1.0), F.lit(coeff) / F.sqrt(F.col("n_src").cast("double")))
    ).cast("int")
    d = d.join(F.broadcast(counts.select("source", rate.alias("rate"))), "source", "left")

    stage = (
        F.when(~q, F.lit("gate"))
        .when(F.col("doc_id") != F.col("win"), F.lit("duplicate"))
        .when(hash_bucket(F.col("doc_id")) >= F.coalesce(F.col("rate"), F.lit(0)), F.lit("mix"))
        .otherwise(F.lit("kept"))
    )
    return d.select(
        "doc_id",
        "source",
        "quality_score",
        stage.alias("stage"),
        F.when(q & (F.col("doc_id") != F.col("win")), F.col("win")).alias("winner_id"),
    )


def ccnet_buckets(docs: DataFrame, mid_rate: int = 500) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the corpus-fit bigram-LM NLL (tx10's proxy for
    KenLM perplexity), split the corpus at the NLL terciles into
    head / middle / tail, and apply the standard kept-rate policy —
    head kept, middle coin-sampled, tail dropped. The audit-style
    output keeps EVERY scored doc with its bucket and verdict, so the
    downstream filter is a pushed-down `kept` predicate.

    Scale shape: the NLL scorer is tx10's (models broadcast, one
    per-doc aggregate); the tercile cuts are ONE bounded aggregate
    (exact percentile locally; approx_percentile at 100 TB) broadcast
    back as two scalars; bucketing and the coin are pure column
    expressions. Docs too short to score (no bigrams) are excluded —
    they are the gate's problem, not the perplexity filter's.
    """
    from ntripmonitor_spark.operators.text import bigram_nll

    # Persist the scored relation (round-12): it feeds BOTH the tercile
    # aggregate and the bucketing join, and without materialization the
    # whole NLL scorer (model broadcast + per-doc aggregate) runs twice
    # per action. |docs|-rows × 2 columns — the cached relation every
    # two-pass data-driven filter keeps at scale.
    scored = bigram_nll(docs).persist()
    cuts = scored.agg(
        F.expr("percentile(avg_nll, 0.3333333333333333)").alias("t1"),
        F.expr("percentile(avg_nll, 0.6666666666666666)").alias("t2"),
    )
    j = scored.crossJoin(F.broadcast(cuts))
    bucket = (
        F.when(F.col("avg_nll") <= F.col("t1"), "head")
        .when(F.col("avg_nll") <= F.col("t2"), "middle")
        .otherwise("tail")
    )
    coin = hash_bucket(F.col("doc_id")) < mid_rate
    kept = (
        F.when(bucket == "head", F.lit(True))
        .when(bucket == "middle", coin)
        .otherwise(F.lit(False))
    )
    return j.select(
        "doc_id",
        F.round("avg_nll", 6).alias("avg_nll"),
        bucket.alias("bucket"),
        kept.alias("kept"),
    )
