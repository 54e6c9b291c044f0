"""Invariant checks for the round-7 curation operators — properties
the DuckDB oracle comparison can't express (quantified guarantees over
constructed inputs, conservation laws over outputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntripmonitor_spark.operators import dedup, sampling, text
from ntripmonitor_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_sp08_no_cluster_straddles_splits(spark):
    """The whole point of the cluster-aware split: every member of a
    near-dup cluster gets the SAME split label, and every document is
    assigned exactly once."""
    docs = table(spark, SF, "documents")
    out = sampling.cluster_split(docs).persist()
    assert out.count() == docs.count()
    straddlers = (
        out.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0
    out.unpersist()


def test_sp08_constructed_pair_always_co_splits(spark):
    """A planted near-dup pair whose doc-id hashes land in DIFFERENT
    sp05 splits must still co-locate under the cluster split — the
    exact leak sp05 allows and sp08 exists to close."""
    body = " ".join(f"w{i}" for i in range(40))
    # ids chosen so sp05's Knuth hash puts them in different splits
    from ntripmonitor_spark.operators.sampling import split_col

    rows = [(i, body + (" tail" if i == 8 else "")) for i in (3, 8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    doc_splits = docs.select(split_col(F.col("doc_id")).alias("s")).collect()
    out = sampling.cluster_split(docs).collect()
    assert len({r.split for r in out}) == 1  # co-located
    assert len({r.cluster_id for r in out}) == 1  # one cluster
    # the pair is only interesting if the per-doc split WOULD differ;
    # ids 3 and 8 are picked to make that true — assert it stays true
    assert len({r.s for r in doc_splits}) == 2


def test_dd12_keeps_exactly_one_best_member_per_cluster(spark):
    docs = table(spark, SF, "documents")
    out = dedup.survivor_by_quality(docs).persist()
    assert out.count() == docs.count()
    per_cluster = out.groupBy("cluster_id").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
        F.count(F.lit(1)).alias("n"),
        F.max("n_members").alias("nm"),
    )
    bad = per_cluster.filter(
        (F.col("n_keep") != 1) | (F.col("n") != F.col("nm"))
    ).count()
    assert bad == 0
    # the keeper really is the quality argmax (ties to lowest id)
    q = docs.select("doc_id", "n_chars")
    joined = out.join(q, "doc_id")
    best = joined.groupBy("cluster_id").agg(
        F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("n"))).alias("b")
    ).select("cluster_id", (-F.col("b.n")).alias("expect_keep"))
    mismatch = (
        joined.filter("keep")
        .join(best, "cluster_id")
        .filter(F.col("doc_id") != F.col("expect_keep"))
        .count()
    )
    assert mismatch == 0
    out.unpersist()


def test_dd12_prefers_quality_over_min_id(spark):
    """Constructed cluster where the highest-quality member has the
    HIGHEST id: dd06's min-id policy and dd12's quality policy must
    disagree, and dd12 must pick the long copy."""
    base = " ".join(f"tok{i}" for i in range(30))
    rows = [(1, base, len(base)), (2, base + " extra words here", len(base) + 17)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = {r.doc_id: r for r in dedup.survivor_by_quality(docs).collect()}
    assert out[2].keep and not out[1].keep
    assert out[1].cluster_id == out[2].cluster_id == 1  # min-id cluster label


def test_mx01_bounds_and_symmetry(spark):
    docs = table(spark, SF, "documents")
    out = dedup.source_overlap(docs).persist()
    # jaccard <= each containment, containments in (0, 1]
    bad = out.filter(
        (F.col("jaccard") > F.col("containment_a") + 1e-9)
        | (F.col("jaccard") > F.col("containment_b") + 1e-9)
        | (F.col("containment_a") > 1) | (F.col("containment_b") > 1)
        | (F.col("n_shared") <= 0)
    ).count()
    assert bad == 0
    # pair orientation is canonical: source_a < source_b, no dupes
    pairs = [(r.source_a, r.source_b) for r in out.select("source_a", "source_b").collect()]
    assert all(a < b for a, b in pairs)
    assert len(pairs) == len(set(pairs))
    out.unpersist()


def test_mx01_mirrored_source_has_full_containment(spark):
    """A source that is a verbatim subset of another must show
    containment 1.0 in the subset direction."""
    t1 = " ".join(f"a{i}" for i in range(20))
    t2 = " ".join(f"b{i}" for i in range(20))
    rows = [(1, t1, "big"), (2, t2, "big"), (3, t1, "mirror")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r = dedup.source_overlap(docs).collect()
    assert len(r) == 1 and r[0].source_a == "big" and r[0].source_b == "mirror"
    assert r[0].containment_b == 1.0 and r[0].containment_a < 1.0


def test_tx17_conservation_and_rates(spark):
    docs = table(spark, SF, "documents")
    out = text.vocab_coverage(docs).persist()
    total = out.agg(F.sum("n_tokens")).collect()[0][0]
    expect = docs.select(
        F.size(dedup.normalized_words(F.col("text"))).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total == expect  # every token counted exactly once
    bad = out.filter(
        (F.col("n_oov") > F.col("n_tokens"))
        | (F.col("n_oov_types") > F.col("n_oov"))
        | (F.col("oov_rate") < 0) | (F.col("oov_rate") > 1)
    ).count()
    assert bad == 0
    out.unpersist()


def test_tx17_small_vocab_marks_tail_oov(spark):
    """With vocab_size=1 only the single most frequent word is
    covered; every other token must count as OOV."""
    rows = [(1, "the the the rare", "s0"), (2, "the unique words", "s1")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in text.vocab_coverage(docs, vocab_size=1).collect()}
    assert out["s0"].n_oov == 1 and out["s0"].n_tokens == 4
    assert out["s1"].n_oov == 2 and out["s1"].n_oov_types == 2


def test_mm14_scene_deltas_match_planted_cuts(spark):
    """Constructed GIFs: deltas are exactly 255 at planted cuts and 0
    inside segments, and a corrupt payload quarantines as one null
    row instead of failing the stage."""
    import numpy as np

    from ntripmonitor_spark.functions import gif
    from ntripmonitor_spark.operators.multimodal import gif_scene_deltas

    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)

    def payload(cuts, n=6, w=5, h=4):
        color, idx = 0, []
        for f in range(n):
            if f in cuts:
                color ^= 1
            idx.append(np.full((h, w), color, dtype=np.uint8))
        return gif.encode_gif(np.stack(idx), palette)

    rows = [
        (1, bytearray(payload({2, 4}))),
        (2, bytearray(payload(set()))),
        (3, bytearray(b"GIF89a" + bytes(3))),  # corrupt
    ]
    docs = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = gif_scene_deltas(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    d1 = {r.frame_idx: r.delta for r in by_doc[1]}
    assert d1 == {1: 0.0, 2: 255.0, 3: 0.0, 4: 255.0, 5: 0.0}
    assert all(r.delta == 0.0 for r in by_doc[2]) and len(by_doc[2]) == 5
    assert len(by_doc[3]) == 1 and by_doc[3][0].frame_idx is None


def test_sp09_lsh_split_never_straddles_lsh_clusters(spark):
    """The LSH-edge variant keeps the same invariant as sp08: no
    near-dup cluster (as discovered by banding) straddles splits."""
    from ntripmonitor_spark.plans import REGISTRY

    out = REGISTRY["sp09_cluster_split_lsh"].fn(spark, SF).persist()
    straddlers = (
        out.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0
    out.unpersist()
