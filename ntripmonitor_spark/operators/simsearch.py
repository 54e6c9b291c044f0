"""Similarity search over embedding columns (array<float>).

Cosine math stays JVM-side via higher-order functions (zip_with +
aggregate — a sequential fold, so the result is deterministic and
engine-portable after rounding). Two paths:

  * brute-force top-k — the exactness baseline; broadcast the query
    set, scan the corpus once (scales linearly with corpus size,
    embarrassingly parallel across partitions).
  * anchor-bucketed ANN — a deterministic LSH variant: sign-of-dot
    against fixed anchor vectors partitions the corpus into 2^A
    buckets; a query searches only its own bucket. At 100 TB the
    bucket id becomes the storage partition key so a query touches
    one partition instead of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_vec(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """Cosine similarity rounded to `decimals` — rounding absorbs any
    cross-engine ULP noise so thresholds and ranks are reproducible."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), decimals)


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """Blocked cosine near-duplicates above a threshold.

    Candidate pairs are keyed on (label, sign-bucket): the label is the
    coarse cluster (at scale: the IVF coarse quantizer) and the
    anchor-sign signature (`_bucket_signature`, shared with the ANN
    path) sub-blocks within each label — so no label block is ever
    all-pairs, even when one label dominates the corpus. Norms are
    precomputed once per vector, not per pair.
    """
    from ntripmonitor_spark.tables import ensure_parallelism

    anchors_rows = (
        emb.filter(F.col("vec_id").isin(*ANCHOR_IDS))
        .select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
        .collect()
    )
    anchors = sorted((r["vec_id"], list(r["v"])) for r in anchors_rows)

    v = ensure_parallelism(emb).select(
        "vec_id",
        "label",
        as_double_vec(F.col("embedding")).alias("v"),
    ).withColumn("nrm", norm(F.col("v"))).withColumn(
        "bucket", _bucket_signature(F.col("v"), anchors)
    )
    a = v.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("bucket"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"), F.col("label"), F.col("bucket"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    cos = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, ["label", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "label", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def knn_bruteforce(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for the first `n_queries` vectors.

    The (tiny) query set is broadcast; the corpus is scanned once.
    Ranking uses (rounded cosine DESC, vec_id ASC) so ties are
    deterministic.
    """
    from pyspark.sql.window import Window

    from ntripmonitor_spark.tables import ensure_parallelism

    v = ensure_parallelism(emb).select("vec_id", as_double_vec(F.col("embedding")).alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    )
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


ANCHOR_IDS = (11, 23, 37, 41)  # fixed corpus vectors as hyperplane anchors


def _bucket_signature(vec_col: Column, anchors: list[tuple[int, list[float]]]) -> Column:
    """Concatenated sign bits of ⟨v, anchor_i⟩ — the ANN bucket id."""
    from ntripmonitor_spark.functions.fastlit import double_array_lit

    bits = [
        F.when(dot(vec_col, double_array_lit(vec)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for _, vec in anchors
    ]
    return F.concat(*bits)


# Three independent hash tables × three anchor hyperplanes each: a
# candidate needs to collide in ONE table only, so recall is far
# higher than the single-signature `ann_bucketed` at the same cost
# class (the classic multi-table LSH trade).
LSH_TABLES = ((3, 14, 25), (8, 19, 30), (12, 23, 34))


def ann_lsh_multitable(emb: DataFrame, n_queries: int = 10, k: int = 3) -> DataFrame:
    """Multi-table sign-LSH approximate top-k.

    Each table's bucket id is the sign signature of the vector against
    that table's anchor set; corpus and queries are exploded into one
    (table, bucket) row per table, joined per table (broadcast query
    side), and candidate pairs are deduplicated BEFORE the vectors are
    re-attached for scoring — so the wide embedding column never rides
    the candidate-generation shuffle. At 100 TB: signatures (bytes per
    vector per table) are what the join moves; candidates ≪ corpus and
    only they pay the cosine.
    """
    from pyspark.sql.window import Window

    from ntripmonitor_spark.tables import ensure_parallelism

    all_ids = sorted({i for tbl in LSH_TABLES for i in tbl})
    anchors_rows = (
        emb.filter(F.col("vec_id").isin(*all_ids))
        .select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
        .collect()
    )
    by_id = {r["vec_id"]: list(r["v"]) for r in anchors_rows}

    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    sig_structs = F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            _bucket_signature(
                F.col("v"), [(i, by_id[i]) for i in sorted(tbl)]
            ).alias("sig"),
        )
        for t, tbl in enumerate(LSH_TABLES)
    ])
    stack = v.select("vec_id", F.explode(sig_structs).alias("ts")).select(
        "vec_id", F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig")
    )
    qstack = stack.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "tbl", "sig"
    )
    cand = (
        stack.join(F.broadcast(qstack), ["tbl", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    n = v.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), F.col("nrm").alias("nn"))
    cos = F.round(dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6)
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(n, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_bucketed(emb: DataFrame, n_queries: int = 10, k: int = 3) -> DataFrame:
    """Anchor-bucketed approximate top-k: candidates limited to the
    query's own sign-bucket. Deterministic (fixed anchors), so the
    oracle reproduces it exactly.

    The anchors are collected once (4 rows) and folded into the plan as
    literals — at scale this is the broadcast ANN index.
    """
    from pyspark.sql.window import Window

    anchors_rows = (
        emb.filter(F.col("vec_id").isin(*ANCHOR_IDS))
        .select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
        .collect()
    )
    anchors = sorted((r["vec_id"], list(r["v"])) for r in anchors_rows)

    from ntripmonitor_spark.tables import ensure_parallelism

    v = ensure_parallelism(emb).select("vec_id", as_double_vec(F.col("embedding")).alias("v")).withColumn(
        "nrm", norm(F.col("v"))
    ).withColumn("bucket", _bucket_signature(F.col("v"), anchors))
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    cos = F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    scored = (
        v.join(F.broadcast(q), v.bucket == q.qbucket)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


IVF_K = 8  # coarse-quantizer size; seeds = corpus vectors 0..K-1


def _seed_dists(vec_col: Column, seeds: list[tuple[int, list[float]]]) -> Column:
    """Array of rounded squared-L2 distances from ``vec_col`` to each
    seed centroid (seeds folded in as literals, ordered by seed id).

    Emitted as ONE ``transform`` over a nested-array centroid literal
    rather than k unrolled per-centroid aggregates: codegen compiles
    the distance lambda once and loops it over the codebook, instead
    of inlining k copies of the zip_with/aggregate tree (round-11
    verdict #4 — the unrolled form made ss09/ss11's fixed codegen cost
    the dominant wall-clock term). Element order and the IEEE op chain
    are identical to the unrolled form, so values and hashes are
    unchanged."""
    from ntripmonitor_spark.functions.fastlit import double_matrix_lit

    return _dist_table(vec_col, double_matrix_lit([vec for _, vec in seeds]))


def _dist_table(vec_col: Column, codebook: Column) -> Column:
    """transform(codebook, c -> round(sum((v-c)^2), 6)) — the shared
    one-lambda distance-table kernel."""
    return F.transform(
        codebook,
        lambda c: F.round(
            F.aggregate(
                F.zip_with(vec_col, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, d: acc + d,
            ), 6),
    )


def _sub_codebook(seeds: list[tuple[int, list[float]]], s: int, d: int) -> Column:
    """Nested-array literal of subspace ``s``'s codeword sub-vectors."""
    from ntripmonitor_spark.functions.fastlit import double_matrix_lit

    return double_matrix_lit([vec[s * d:(s + 1) * d] for _, vec in seeds])


def _collect_seed_vectors(emb: DataFrame, k: int) -> list[tuple[int, list[float]]]:
    rows = (
        emb.filter(F.col("vec_id") < k)
        .select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
        .collect()
    )
    return sorted((r["vec_id"], list(r["v"])) for r in rows)


def _collect_seed_and_query_vectors(
    emb: DataFrame, k: int, n_queries: int
) -> tuple[list[tuple[int, list[float]]], dict[int, list[float]]]:
    """Seeds (vec_id < k) AND query vectors (vec_id < n_queries) in ONE
    bounded collect (round-12, guide §1/§5): the serving operators used
    to pay two sequential driver jobs over the same parquet — one for
    the seed centroids, one for the query rows — plus, on the query
    job, codegen of the full distance-table expression tree. Both
    driver-side model quantities (distance tables, probe cells) are now
    derived in plain Python from this single raw collect
    (:func:`_py_dist_table`), bit-identically to the former JVM path.
    """
    rows = (
        emb.filter(F.col("vec_id") < max(k, n_queries))
        .select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
        .collect()
    )
    allv = {int(r["vec_id"]): [float(x) for x in r["v"]] for r in rows}
    seeds = sorted((i, v) for i, v in allv.items() if i < k)
    queries = {i: v for i, v in allv.items() if i < n_queries}
    return seeds, queries


def _round6_half_up(x: float) -> float:
    """Exact replica of Spark's round(double, 6): java BigDecimal
    .valueOf(x) (= the shortest round-trip decimal string, which is
    also what Python's repr yields) rescaled HALF_UP — validated
    bit-identical against the JVM expression on all test SFs.

    Caveat (round-13, ADVICE): on JDK < 19 ``Double.toString`` is NOT
    always the shortest round-trip decimal — it diverges from Python's
    ``repr`` for ~0.3% of doubles, but only at magnitudes ≥ ~1e16
    where rounding at 1e-6 is the identity (a 2M-sample fuzz on this
    JDK found zero HALF_UP-at-1e-6 disagreements). The replica
    therefore assumes the implicit |x| ≪ 1e15 domain these distance
    tables live in; the pin test (test_py_dist_table_matches_jvm_kernel)
    re-validates value-for-value on every run, so a JDK change that
    broke the contract would surface there, not silently."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def _py_sqdist(a: list[float], b: list[float]) -> float:
    """Sequential-fold squared L2 — the same IEEE op chain as the
    zip_with/aggregate expression in :func:`_dist_table`."""
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc += d * d
    return acc


def _py_dist_table(vec: list[float], codebook: list[list[float]]) -> list[float]:
    """Driver-side replica of :func:`_dist_table` (round6 of the
    sequential-fold squared L2 per codeword) for query-side model
    constants — bounded inputs only (queries × codebook)."""
    return [_round6_half_up(_py_sqdist(vec, c)) for c in codebook]


def ivf_train_step(emb: DataFrame, k: int = IVF_K) -> DataFrame:
    """One Lloyd iteration of IVF coarse-quantizer training,
    DataFrame-native: assign every vector to its nearest seed centroid
    (deterministic seeds = vec_id 0..k-1, collected once and folded in
    as literals — the broadcast "ANN index under training"), then
    recompute each centroid as the member mean.

    Output: (centroid_id, n_members, centroid) with the new centroid
    rounded per component. Scale shape: seeds ride the closure (k
    rows), assignment is a pure column expression over one corpus
    scan, and the update is one aggregate keyed by centroid_id —
    exactly the shape of a full distributed k-means round; iterating
    is a driver loop over this step. At serving time the assignment
    column becomes the storage partition key, so a query probes one
    centroid's partition (classic IVF)."""
    from ntripmonitor_spark.tables import ensure_parallelism

    seeds = _collect_seed_vectors(emb, k)

    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    # nearest seed by squared L2 distance, rounded to absorb ULP noise;
    # ties break to the lower centroid id (array_position of the min)
    dists = _seed_dists(F.col("v"), seeds)
    assigned = v.withColumn(
        "centroid_id",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
    )
    dim = len(seeds[0][1])
    sums = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        *[F.sum(F.element_at(F.col("v"), i + 1)).alias(f"s{i}") for i in range(dim)],
    )
    # + 0.0 normalizes IEEE -0.0 (a near-zero mean whose residue sign
    # depends on summation order) so both engines print the same zero
    centroid = F.array(*[
        F.round(F.col(f"s{i}") / F.col("n_members"), 4) + 0.0 for i in range(dim)
    ])
    return sums.select("centroid_id", "n_members", centroid.alias("centroid"))


PQ_M = 8  # product-quantization subspaces (64-dim → 8 sub-vectors of 8)
PQ_K = 4  # codewords per subspace; codebook = sub-vectors of seeds 0..K-1


def pq_encode(emb: DataFrame, m: int = PQ_M, k: int = PQ_K,
              seeds: list[tuple[int, list[float]]] | None = None) -> DataFrame:
    """Product-quantization encoder: split each embedding into ``m``
    contiguous sub-vectors and replace each with the id of its nearest
    codeword (codebook = the matching sub-vectors of corpus seeds
    0..k-1, folded in as literals — the broadcast trained codebook).

    Output: (vec_id, pq_code, distortion) — pq_code is the m-digit
    code string (one digit per subspace), distortion the summed
    squared quantization error. This is the storage-side compression
    step of an IVF-PQ index: at 100 TB the 64×8-byte vector column
    becomes m bytes, candidates are re-ranked on codes (asymmetric
    distance), and only the final top-k re-reads real vectors. One
    corpus scan, zero joins, zero shuffles — pure column expressions.

    Reference scope note: the reference has no vector surface; this is
    a north-star extension (SURVEY.md §2 "beyond the reference").
    """
    from ntripmonitor_spark.tables import ensure_parallelism

    # Callers that already hold the (bounded) seed collect pass it in,
    # saving one sequential driver job (round-12, guide §1).
    if seeds is None:
        seeds = _collect_seed_vectors(emb, k)
    dim = len(seeds[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    d = dim // m

    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    codes, sub_errs = [], []
    for s in range(m):
        sub = F.slice(F.col("v"), s * d + 1, d)
        dists = _dist_table(sub, _sub_codebook(seeds, s, d))
        # argmin with ties to the lower codeword id (first position of min)
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
        sub_errs.append(F.array_min(dists))
    code_str = F.concat(*[c.cast("string") for c in codes])
    distortion = F.round(sum(sub_errs[1:], sub_errs[0]), 6)
    return v.select(
        "vec_id", code_str.alias("pq_code"), distortion.alias("distortion")
    )


def _ivf_scored(emb: DataFrame, k_centroids: int, n_queries: int,
                nprobe: int) -> DataFrame:
    """Shared IVF candidate-scoring stage: (query_id, neighbor_id,
    cell, cos_sim) for every candidate in a query's probed cells —
    `ivf_probe` ranks it (top-k), `ivf_radius` filters it (cos ≥ τ).
    The corpus is scanned once and never shuffled; the query side
    broadcasts onto the cell column."""
    import math

    from ntripmonitor_spark.tables import ensure_parallelism

    # Seeds + query vectors in ONE bounded collect; the nprobe nearest
    # cells per query (ties to the lower centroid id) and the query
    # norms are derived on the driver in plain Python (round-12, guide
    # §1/§5) — this replaces a second scan subtree (posexplode of the
    # cell-distance expression + a row_number window over 10 rows) with
    # a LocalTableScan of n_queries·nprobe probe rows. _py_dist_table /
    # math.sqrt replicate the JVM op chain bit-identically (validated
    # on all SFs; oracle hashes unchanged).
    seeds, queries = _collect_seed_and_query_vectors(emb, k_centroids, n_queries)

    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    dists = _seed_dists(F.col("v"), seeds)
    corpus = v.withColumn(
        "cell", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )

    prows = []
    for qid, qv in sorted(queries.items()):
        cd = _py_dist_table(qv, [sv for _, sv in seeds])
        qn = math.sqrt(_py_sqdist(qv, [0.0] * len(qv)))
        for cid, _ in sorted(enumerate(cd), key=lambda t: (t[1], t[0]))[:nprobe]:
            prows.append((qid, qv, qn, int(cid)))
    probes = emb.sparkSession.createDataFrame(
        prows, "query_id bigint, qv array<double>, qn double, cell int"
    )

    cos = F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    scored = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cell",
                cos.alias("cos_sim"))
    )
    return scored


def ivf_probe(emb: DataFrame, k_centroids: int = IVF_K, n_queries: int = 10,
              nprobe: int = 2, k: int = 5) -> DataFrame:
    """IVF serving path: the search that the trained coarse quantizer
    (`ivf_train_step`) exists for. Every corpus vector belongs to its
    nearest centroid's cell (at scale: the storage partition key);
    a query probes only its ``nprobe`` nearest cells and ranks the
    candidates there by cosine.

    Scale shape: the corpus is scanned once and NEVER shuffled — the
    query side (n_queries × nprobe rows) is broadcast onto the cell
    column, so candidate generation is a broadcast hash join touching
    nprobe/k_centroids of the data; only candidates pay the cosine.
    Output: (query_id, neighbor_id, cell, cos_sim, rank).
    """
    from pyspark.sql.window import Window

    scored = _ivf_scored(emb, k_centroids, n_queries, nprobe)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_radius(emb: DataFrame, tau: float, k_centroids: int = IVF_K,
               n_queries: int = 10, nprobe: int = 2) -> DataFrame:
    """Radius (range) search: ALL candidates within cosine ≥ ``tau``
    of each query, not a fixed top-k — the dedup-ish serving mode
    ("give me everything this close") where the result size is
    data-dependent. Same IVF candidate stage as `ivf_probe`; the cut
    is a pure predicate on the 6-dp-rounded cosine (no window at all,
    so nothing ranks and nothing is ordered — cheaper than top-k and
    embarrassingly parallel at any scale). Output: (query_id,
    neighbor_id, cos_sim)."""
    scored = _ivf_scored(emb, k_centroids, n_queries, nprobe)
    return scored.filter(F.col("cos_sim") >= tau).select(
        "query_id", "neighbor_id", "cos_sim"
    )


def ivf_train(emb: DataFrame, k: int = IVF_K, iters: int = 3):
    """Full Lloyd training loop for the IVF coarse quantizer — the
    driver-side iteration `ivf_train_step` is one round of.

    Each round: one corpus scan computes assignments (nearest centroid
    by the same rounded squared-L2 as the step operator) and one
    aggregate reduces to k rows of (count, per-dim sums, summed
    min-distance) — collected to the driver (k·dim doubles, bounded)
    to fold the NEW centroids into the next round's plan as literals.
    Classic distributed k-means: per-round cost is one scan + one
    shuffle of k×(dim+2) partials; nothing corpus-sized ever reaches
    the driver. Empty clusters keep their previous centroid.

    Returns (centroids, inertia_history): centroids as a list of
    (centroid_id, vector), inertia as the per-round sum of min
    distances — non-increasing by Lloyd's guarantee (modulo the 1e-6
    rounding the cross-engine determinism needs).
    """
    from ntripmonitor_spark.tables import ensure_parallelism

    cents = [list(vec) for _, vec in _collect_seed_vectors(emb, k)]
    dim = len(cents[0])
    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    history: list[float] = []
    for _ in range(iters):
        dists = _seed_dists(F.col("v"), list(enumerate(cents)))
        assigned = v.select(
            "v",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cid"),
            F.array_min(dists).alias("mind"),
        )
        rows = (
            assigned.groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("mind").alias("inertia"),
                *[F.sum(F.element_at(F.col("v"), i + 1)).alias(f"s{i}")
                  for i in range(dim)],
            )
            .collect()
        )
        by_cid = {r["cid"]: r for r in rows}
        history.append(round(sum(r["inertia"] for r in rows), 6))
        cents = [
            [by_cid[c][f"s{i}"] / by_cid[c]["n"] for i in range(dim)]
            if c in by_cid else cents[c]
            for c in range(k)
        ]
    return list(enumerate(cents)), history


def semantic_dedup(emb: DataFrame, k_centroids: int = IVF_K,
                   threshold: float = 0.3) -> DataFrame:
    """SemDeDup-style cluster-scoped embedding dedup: vectors are
    assigned to their nearest coarse-quantizer cell (seeds 0..k−1 as
    literals, same assignment as `ivf_probe`), pairwise cosine runs
    ONLY within a cell, and a vector is dropped when a lower-id vector
    in its cell sits at-or-above the threshold (keep-lowest-id rule —
    deterministic and oracle-reproducible).

    Scale shape: the pairwise stage is an equi self-join on the cell id
    — never a corpus cross-join. Cell population is the knob: k scales
    with the corpus (SemDeDup uses k ≈ √N clusters) so per-cell
    pairwise work stays bounded; the cell id is also the storage
    partition key, making the join co-located at rest. Output:
    (vec_id, cell, is_kept).
    """
    from ntripmonitor_spark.tables import ensure_parallelism

    seeds = _collect_seed_vectors(emb, k_centroids)
    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    dists = _seed_dists(F.col("v"), seeds)
    corpus = v.withColumn(
        "cell", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )

    a = corpus.select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("av"),
        F.col("nrm").alias("an"), "cell",
    )
    b = corpus.select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("bv"),
        F.col("nrm").alias("bn"), "cell",
    )
    cos = F.round(dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6)
    dups = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(cos >= threshold)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return corpus.join(dups, "vec_id", "left").select(
        "vec_id", "cell", F.col("_dup").isNull().alias("is_kept")
    )


def ann_recall(emb: DataFrame, k_centroids: int = IVF_K, n_queries: int = 10,
               nprobe: int = 2, k: int = 5) -> DataFrame:
    """Recall@k of the IVF probe against the exact brute-force top-k —
    the evaluation harness every ANN deployment needs (was the nprobe
    budget enough?).

    Both sides are the operators under test; the comparison itself
    moves only n_queries × k id pairs. Output: (query_id, n_hits,
    recall) with recall = n_hits / k.
    """
    bf = knn_bruteforce(emb, n_queries=n_queries, k=k).select(
        "query_id", "neighbor_id"
    )
    ann = ivf_probe(
        emb, k_centroids=k_centroids, n_queries=n_queries, nprobe=nprobe, k=k
    ).select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    return (
        bf.join(F.broadcast(ann), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").cast("int").alias("n_hits"))
        .select(
            "query_id", "n_hits",
            F.round(F.col("n_hits") / F.lit(float(k)), 6).alias("recall"),
        )
    )


def pq_adc_topk(emb: DataFrame, m: int = PQ_M, k: int = PQ_K,
                n_queries: int = 10, topk: int = 5) -> DataFrame:
    """PQ asymmetric-distance search — the serving half of the ss05
    compression step (Jégou et al. 2011): rank the ENCODED corpus for
    each query by ADC, the sum over subspaces of the distance from the
    query's sub-vector to the codeword the corpus vector stored.

    Scale shape: each query's m×k distance table is computed JVM-side
    over the seed literals and collected (n_queries·m·k bounded rows),
    then ships back as a broadcast column — scoring the corpus is ONE
    scan over the m-byte codes doing m array lookups per row; the raw
    vector column is never read, which is the entire point of PQ at
    100 TB (codes are ~64× smaller than vectors). The per-query top-k
    window partitions on qid; with few queries per batch that is the
    standard serving shape (shard the corpus, merge per-shard top-k,
    exactly as sp04 does for strata, if queries ever become many).
    """
    from pyspark.sql import Window

    # Seeds and query vectors in ONE bounded collect; each query's
    # flattened (m·k)-element distance table (subspace-major, codeword
    # order within a subspace) is then derived on the driver in plain
    # Python (round-12, guide §1/§5): the former second collect paid a
    # separate sequential job PLUS codegen of the full distance-table
    # expression tree just to produce n_queries·m·k bounded constants.
    # _py_dist_table replicates the JVM op chain bit-identically
    # (validated on all SFs; oracle hashes unchanged).
    seeds, queries = _collect_seed_and_query_vectors(emb, k, n_queries)
    dim = len(seeds[0][1])
    d = dim // m

    qrows = [
        (qid, [x
               for s in range(m)
               for x in _py_dist_table(qv[s * d:(s + 1) * d],
                                       [sv[s * d:(s + 1) * d] for _, sv in seeds])])
        for qid, qv in sorted(queries.items())
    ]
    qdf = emb.sparkSession.createDataFrame(qrows, "qid bigint, dt array<double>")

    codes = pq_encode(emb, m, k, seeds=seeds).select("vec_id", "pq_code")
    joined = codes.crossJoin(F.broadcast(qdf))
    adc = None
    for s in range(m):
        digit = F.substring("pq_code", s + 1, 1).cast("int")
        term = F.get(F.col("dt"), F.lit(s * k) + digit)
        adc = term if adc is None else adc + term
    scored = joined.select("qid", "vec_id", F.round(adc, 6).alias("adc"))
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= topk)


def sq8_quantize(emb: DataFrame, dim: int = 64) -> DataFrame:
    """Scalar (int8-range) quantization of the embedding column: per-
    dimension global [min, max] → each component becomes an 8-bit code
    ``floor((x-mn)/(mx-mn)*255 + 0.5)`` (floor(+0.5) instead of
    round(): identical half-up behaviour in every engine, so the codes
    are bit-reproducible).

    Two scans, both reading only the embedding column: pass 1 reduces
    the corpus to ONE row of per-dimension bounds (128 mergeable
    partial aggregates — map-side combine, no data-bearing shuffle);
    pass 2 broadcasts that row onto the corpus and encodes with pure
    elementwise zip_with expressions. At 100 TB this is the storage
    path that turns the 64×4-byte vector column into 64 bytes
    (4× smaller, 8× vs doubles) while pq_encode (ss05) goes further to
    m bytes; sq8 keeps enough fidelity for exact re-ranking.

    Output per vector: (vec_id, label, code_sum, micro_mse) —
    code_sum a checksum over the 64 codes, micro_mse the
    reconstruction MSE × 1e6 (rounded to 4), both scalars so results
    stay hash-canonicalizable.
    """
    v = emb.select("vec_id", "label", as_double_vec(F.col("embedding")).alias("v"))
    # the two per-dimension bound arrays as ONE SQL expression each
    # (round-13, guide §5): the F.min(v[i]) comprehension paid ~5 py4j
    # round trips per dimension per plan build (128 aggregates); the
    # parsed expression tree (same min/max-of-element aggregates, same
    # order) is identical.
    stats = v.agg(
        F.expr(f"array({','.join(f'min(v[{i}])' for i in range(dim))})").alias("mins"),
        F.expr(f"array({','.join(f'max(v[{i}])' for i in range(dim))})").alias("maxs"),
    )
    q = v.crossJoin(F.broadcast(stats))
    spans = F.zip_with("maxs", "mins", lambda mx, mn: mx - mn)
    shifted = F.zip_with("v", "mins", lambda x, mn: x - mn)
    codes = F.zip_with(
        shifted, spans,
        lambda s, sp: F.when(sp == 0.0, F.lit(0.0)).otherwise(
            F.floor(s / sp * 255.0 + 0.5).cast("double")
        ),
    )
    recon = F.zip_with(codes, spans, lambda c, sp: c / 255.0 * sp)
    err = F.zip_with(recon, shifted, lambda r, s: (r - s) * (r - s))
    return q.select(
        "vec_id",
        "label",
        F.aggregate(codes, F.lit(0.0), lambda a, x: a + x).cast("long").alias("code_sum"),
        F.round(F.aggregate(err, F.lit(0.0), lambda a, x: a + x) / dim * 1e6, 4).alias("micro_mse"),
    )


def ivfpq_search(emb: DataFrame, k_centroids: int = IVF_K, m: int = PQ_M,
                 k_codes: int = PQ_K, n_queries: int = 10, nprobe: int = 2,
                 shortlist: int = 20, topk: int = 5) -> DataFrame:
    """The COMPLETE IVF-PQ serving stack (Jégou et al. 2011), end to
    end in one declarative plan: coarse probe → PQ-code candidate scan
    → ADC shortlist → exact rerank.

    1. Corpus vectors are assigned to their nearest coarse centroid
       (seeds 0..k_centroids-1 as literals) — the cell is the storage
       partition key at scale.
    2. Each query (vec_id < n_queries) probes its ``nprobe`` nearest
       cells. Queries, their probe cells, their m×k ADC distance
       tables, and their raw vectors are all driver-bounded (collected
       once, re-shipped as a broadcast relation exploded per cell).
    3. Candidates = corpus rows in probed cells, scored by ADC over
       the m-digit PQ codes ONLY — the scan reads (vec_id, cell,
       codes), never the vector column.
    4. The per-query ADC shortlist (top ``shortlist``) joins BACK to
       the embedding table to fetch true vectors for exact L2
       reranking — queries·shortlist rows, the only rows whose
       vectors are ever re-read. Top ``topk`` per query by exact
       distance is the answer.

    This is the at-100-TB honest shape: cell pruning bounds the scan,
    codes (m bytes) ride the candidate path instead of vectors
    (dim×4 bytes), and full-precision data is touched for
    queries·shortlist rows total. Output: (query_id, neighbor_id,
    adc, l2, rank).
    """
    from ntripmonitor_spark.tables import ensure_parallelism

    # Seeds + query vectors in ONE bounded collect; every query-side
    # model quantity (probe cells, ADC distance tables) is derived on
    # the driver in plain Python (round-12, guide §1/§5) — the former
    # second collect paid a separate sequential job plus codegen of the
    # full cell-dist + distance-table expression tree for 10 rows.
    # _py_dist_table replicates the JVM op chain bit-identically
    # (validated on all SFs; oracle hashes unchanged).
    seeds8, queries = _collect_seed_and_query_vectors(emb, k_centroids, n_queries)
    seeds4 = seeds8[:k_codes]
    dim = len(seeds8[0][1])
    d = dim // m

    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )

    # --- corpus side: cell + PQ digit codes, vector column DROPPED ---
    cell_dists = _seed_dists(F.col("v"), seeds8)
    digits = []
    for s in range(m):
        sub = F.slice(F.col("v"), s * d + 1, d)
        dists = _dist_table(sub, _sub_codebook(seeds4, s, d))
        digits.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    corpus = v.select(
        "vec_id",
        (F.array_position(cell_dists, F.array_min(cell_dists)) - 1).cast("int").alias("cell"),
        F.array(*digits).alias("codes"),
    )

    # --- query side: driver-derived (qid, cell, dt, qv) rows — cd is
    # the round6 cell-distance vector, dt the flattened subspace-major
    # distance table (same value order as the former JVM expressions).
    qdata = []
    for qid, qv in sorted(queries.items()):
        cd = _py_dist_table(qv, [sv for _, sv in seeds8])
        probe_cells = [c for c, _ in sorted(enumerate(cd), key=lambda t: (t[1], t[0]))[:nprobe]]
        dt = [x
              for s in range(m)
              for x in _py_dist_table(qv[s * d:(s + 1) * d],
                                      [sv[s * d:(s + 1) * d] for _, sv in seeds4])]
        for cell in probe_cells:
            qdata.append((qid, int(cell), dt, qv))
    qdf = emb.sparkSession.createDataFrame(
        qdata, "qid bigint, cell int, dt array<double>, qv array<double>"
    )

    # --- ADC over codes only (BroadcastHashJoin on cell) ---
    cand = corpus.join(F.broadcast(qdf), "cell").filter(F.col("vec_id") != F.col("qid"))
    adc = None
    for s in range(m):
        term = F.get(F.col("dt"), F.lit(s * k_codes) + F.get(F.col("codes"), F.lit(s)))
        adc = term if adc is None else adc + term
    scored = cand.select("qid", "vec_id", "qv", F.round(adc, 6).alias("adc"))
    from pyspark.sql import Window

    w_adc = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("vec_id").asc())
    short = scored.withColumn("_rk", F.row_number().over(w_adc)).filter(
        F.col("_rk") <= shortlist
    ).drop("_rk")

    # --- exact rerank: re-read vectors ONLY for the shortlist rows ---
    # broadcast the queries x shortlist relation so the vector fetch is
    # a map-side hash probe over one embeddings scan, never a shuffle
    rer = v.join(F.broadcast(short), "vec_id").select(
        "qid", F.col("vec_id").alias("neighbor_id"), "adc",
        F.round(
            F.aggregate(
                F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, e: acc + e,
            ), 6).alias("l2"),
    )
    w_l2 = Window.partitionBy("qid").orderBy(F.col("l2").asc(), F.col("neighbor_id").asc())
    return (
        rer.withColumn("rank", F.row_number().over(w_l2))
        .filter(F.col("rank") <= topk)
        .select(F.col("qid").alias("query_id"), "neighbor_id", "adc", "l2", "rank")
    )


def cell_assignments(emb: DataFrame, seeds: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid cell assignment against a FROZEN coarse
    quantizer (seeds folded as literals): (vec_id, cell). Pure column
    expressions over one scan — the assignment half of `ivf_probe`'s
    corpus side, exposed separately so the streaming index maintainer
    (`streaming/ann.py`) and the batch server share one definition."""
    from ntripmonitor_spark.tables import ensure_parallelism

    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    dists = _seed_dists(F.col("v"), seeds)
    return v.select(
        "vec_id",
        (F.array_position(dists, F.array_min(dists)) - 1).cast("int").alias("cell"),
    )


def mips_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Maximum inner-product search (MIPS) with the norm-augmentation
    reduction: recommendation/reranking scores are DOT products, not
    cosines, and dot has no triangle inequality — no metric index
    serves it directly. The classic fix (Bachrach et al. 2014): append
    one dimension sqrt(M² − |x|²) to every corpus vector (M = max
    corpus norm) and 0 to queries; all augmented corpus vectors then
    share norm M, so augmented-cosine order == inner-product order and
    ANY cosine ANN structure (ss02/ss03/ss06's buckets) serves MIPS
    unchanged. The returned frame carries both scores; the order
    equivalence is test-pinned.

    Scale shape: M is ONE scalar (map-side-combined max, bounded
    collect, folded as a literal); queries broadcast; one corpus scan;
    per-query top-k via the qid-keyed window. Exactly ss01's plan plus
    one literal.
    """
    from pyspark.sql.window import Window

    from ntripmonitor_spark.tables import ensure_parallelism

    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    m_norm = float(v.agg(F.max("nrm")).first()[0])

    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    ip = F.round(dot(F.col("qv"), F.col("v")), 6)
    # augmented cosine: dot([q,0],[x,aug]) / (|q| · |[x,aug]|) with
    # |[x,aug]| = M by construction — same order as ip, kept as proof
    aug_cos = F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.lit(m_norm)), 6)
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            ip.alias("inner_product"), aug_cos.alias("aug_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("inner_product").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def sq8_recall(emb: DataFrame, n_queries: int = 10, k: int = 5,
               dim: int = 64) -> DataFrame:
    """Recall@k of cosine search over the SQ8-RECONSTRUCTED corpus
    against exact search — the number that justifies (or vetoes) the
    4x storage compression: queries stay exact (the standard
    asymmetric setup), the corpus is decode(encode(x)).

    Shape: the per-dim bounds broadcast once; reconstruction is pure
    elementwise zip_with on the scan; both top-k sides reuse the
    knn_bruteforce pattern (broadcast query set x one corpus scan,
    rounded-cosine + id tie-break ranking); the recall join moves
    n_queries x k id pairs."""
    from pyspark.sql.window import Window

    from ntripmonitor_spark.tables import ensure_parallelism

    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    )
    # one SQL expression per bound array (round-13, guide §5) — same
    # aggregates in the same order as the former F.min/F.max loop, at
    # one py4j call each instead of ~5·dim
    stats = v.agg(
        F.expr(f"array({','.join(f'min(v[{i}])' for i in range(dim))})").alias("mins"),
        F.expr(f"array({','.join(f'max(v[{i}])' for i in range(dim))})").alias("maxs"),
    )
    with_stats = v.crossJoin(F.broadcast(stats))
    spans = F.zip_with("maxs", "mins", lambda mx, mn: mx - mn)
    shifted = F.zip_with("v", "mins", lambda x, mn: x - mn)
    codes = F.zip_with(
        shifted, spans,
        lambda s, sp: F.when(sp == 0.0, F.lit(0.0)).otherwise(
            F.floor(s / sp * 255.0 + 0.5).cast("double")
        ),
    )
    rv = F.zip_with(
        F.zip_with(codes, spans, lambda c, sp: c / 255.0 * sp),
        F.col("mins"),
        lambda x, mn: x + mn,
    )
    recon = with_stats.select("vec_id", rv.alias("rv")).withColumn("rn", norm(F.col("rv")))

    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    cos_r = F.round(dot(F.col("qv"), F.col("rv")) / (F.col("qn") * F.col("rn")), 6)
    scored = (
        recon.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos_r.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    sq_topk = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

    bf = knn_bruteforce(emb, n_queries=n_queries, k=k).select("query_id", "neighbor_id")
    hits = sq_topk.select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    return (
        bf.join(F.broadcast(hits), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").cast("int").alias("n_hits"))
        .select(
            "query_id", "n_hits",
            F.round(F.col("n_hits") / F.lit(float(k)), 6).alias("recall"),
        )
    )


def mmr_rerank(emb: DataFrame, n_queries: int = 10, pool_k: int = 10,
               k: int = 3, lam: float = 0.7, penalty: float = 0.3) -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick ``k`` results per query maximizing
    ``lam * rel(c) - penalty * max_sim(c, selected)`` — the
    diversity-aware second stage every retrieval pipeline runs after
    ANN recall.

    ``penalty`` is passed explicitly instead of computed as ``1 - lam``
    because ``1 - 0.7 != 0.3`` in IEEE doubles and the oracle SQL spells
    the literal ``0.3``.

    Shape: retrieval (one broadcast-query corpus scan + per-query
    top-``pool_k`` window) runs ONCE and the tiny candidate pool
    (``n_queries * pool_k`` rows) is persisted — at production scale
    this is the materialized candidate table reranking always starts
    from. Everything after operates on that pool: the pairwise cosine
    matrix is a per-query self-join (≤ pool_k² rows per query, never
    corpus-sized), and each greedy step is a broadcast join + window
    argmax. The greedy loop is unrolled ``k`` times — fixed-iteration
    driver loops are SQL-expressible as chained CTEs, and all scores
    are arithmetic over 6-dp-rounded cosines so both engines compare
    identical doubles.
    """
    from pyspark.sql.window import Window

    from ntripmonitor_spark.tables import ensure_parallelism

    v = ensure_parallelism(emb).select(
        "vec_id", as_double_vec(F.col("embedding")).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    rel = F.round(dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("neighbor_id").asc())
    cand = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), rel.alias("rel"), "v", "nrm")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= pool_k)
        .persist()
    )
    a = cand.select("query_id", F.col("neighbor_id").alias("a_id"),
                    F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = cand.select("query_id", F.col("neighbor_id").alias("b_id"),
                    F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    s = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    # The pairwise-cosine pool is re-referenced once per greedy step;
    # persist it (≤ n_queries·pool_k² rows) so each step scans the
    # materialized matrix instead of re-running the self-join.
    sim = (
        a.join(b, "query_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("query_id", "a_id", "b_id", s.alias("s"))
        .persist()
    )

    selected = [cand.filter(F.col("rnk") == 1).select("query_id", "neighbor_id", "rel")]
    scores = [None]  # rank-1 score is lam * rel, attached at output time
    pool = cand.select("query_id", "neighbor_id", "rel")
    for _ in range(1, k):
        remaining = pool
        max_sim = None
        for i, sel in enumerate(selected):
            sel_i = F.broadcast(sel.select(
                "query_id", F.col("neighbor_id").alias(f"sel_{i}")
            ))
            remaining = remaining.join(sel_i, "query_id").filter(
                F.col("neighbor_id") != F.col(f"sel_{i}")
            )
            sim_i = sim.select(
                "query_id", F.col("a_id").alias("neighbor_id"),
                F.col("b_id").alias(f"sel_{i}"), F.col("s").alias(f"s_{i}")
            )
            remaining = remaining.join(sim_i, ["query_id", "neighbor_id", f"sel_{i}"])
            col = F.col(f"s_{i}")
            max_sim = col if max_sim is None else F.greatest(max_sim, col)
        # Exact decimal arithmetic: double score math can land exactly on
        # a 6-dp rounding boundary (0.7 * 0.371485 = 0.2600395), where
        # Spark (shortest-repr HALF_UP) and DuckDB (binary-value
        # rounding) disagree. DECIMAL(2,1) * DECIMAL(18,6) is exact, and
        # both engines round an exact trailing-5 decimal away from zero.
        scored = remaining.withColumn(
            "score",
            F.lit(str(lam)).cast("decimal(2,1)") * F.col("rel").cast("decimal(18,6)")
            - F.lit(str(penalty)).cast("decimal(2,1)") * max_sim.cast("decimal(18,6)"),
        )
        ws = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("neighbor_id").asc()
        )
        # Persist each greedy step's winners (≤ n_queries rows): step
        # i+1 re-references every earlier step (broadcast exclusion +
        # similarity attach) and the output union references each step
        # once more — without materialization the step-2 subtree is
        # re-executed ~3× inside the one output action (round-12).
        nxt = (
            scored.withColumn("r", F.row_number().over(ws))
            .filter(F.col("r") == 1)
            .select("query_id", "neighbor_id", "rel", "score")
            .persist()
        )
        selected.append(nxt)
        scores.append("score")

    outs = []
    for rank, (sel, sc) in enumerate(zip(selected, scores), start=1):
        score_col = (
            F.round(F.lit(str(lam)).cast("decimal(2,1)") * F.col("rel").cast("decimal(18,6)"), 6)
            if sc is None else F.round(F.col(sc), 6)
        ).cast("double")
        outs.append(sel.select(
            "query_id", F.lit(rank).alias("mmr_rank"), "neighbor_id", "rel",
            score_col.alias("mmr_score"),
        ))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def power_iteration(emb: DataFrame, iters: int = 3, dim: int = 64) -> DataFrame:
    """Dominant eigenvector of the corpus Gram matrix (sum over docs of
    v vᵀ) by ``iters`` unrolled power-method rounds — the first
    principal direction of the raw embedding cloud, the one-component
    PCA every embedding-drift / collapse monitor starts from.

    Output: (dim_idx, loading, eigenvalue) — the unit eigenvector
    estimate after the final round plus the Rayleigh-style eigenvalue
    (the pre-normalization vector's L2 norm).

    Determinism contract: the start vector is exactly representable
    (1/sqrt(64) = 0.125); every per-row dot product and every norm is
    an EXPLICIT left-associated add chain (identical fold order on both
    engines, no library dot whose summation order is unspecified); the
    per-row projection is rounded to 6 dp and each component product to
    9 dp before riding a DECIMAL(38,9) sum, so the matvec result is
    summation-order-free at any partition count.

    Scale shape: one corpus scan per round over a persisted projected
    relation — per round the aggregate reduces everything map-side to
    ONE 64-decimal row; the current iterate rides back as a one-row
    broadcast (never a collect). The plan is a fixed unroll, so round
    count is budget, not shape.
    """
    from ntripmonitor_spark.tables import ensure_parallelism

    v = ensure_parallelism(emb).select(
        as_double_vec(F.col("embedding")).alias("v")
    ).persist()
    spark = emb.sparkSession
    xcols = [f"x{j}" for j in range(dim)]
    xrow = spark.range(1).select(*[F.lit(0.125).alias(c) for c in xcols])

    def el(j: int) -> Column:
        return F.element_at(F.col("v"), j + 1)

    for _ in range(iters):
        j0 = v.crossJoin(F.broadcast(xrow.select(*xcols)))
        d = el(0) * F.col("x0")
        for j in range(1, dim):
            d = d + el(j) * F.col(f"x{j}")
        staged = j0.select(F.col("v"), F.round(d, 6).alias("d"))
        sums = staged.agg(*[
            F.sum(F.round(el(j) * F.col("d"), 9).cast("decimal(38,9)")).alias(f"s{j}")
            for j in range(dim)
        ])
        sd = [F.col(f"s{j}").cast("double") for j in range(dim)]
        nsq = sd[0] * sd[0]
        for j in range(1, dim):
            nsq = nsq + sd[j] * sd[j]
        xrow = sums.select(
            *[F.round(sd[j] / F.sqrt(nsq), 9).alias(f"x{j}") for j in range(dim)],
            F.round(F.sqrt(nsq), 4).alias("lam"),
        )
    arr = F.array(*[F.col(c) for c in xcols])
    return xrow.select(
        F.posexplode(arr).alias("dim_idx", "loading"),
        F.col("lam").alias("eigenvalue"),
    ).select(F.col("dim_idx").cast("int").alias("dim_idx"), "loading", "eigenvalue")
