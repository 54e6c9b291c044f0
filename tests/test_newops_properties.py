"""Invariant checks for the round-4 operators — properties the oracle
comparison can't express (guarantees quantified over constructed
inputs, conservation laws over outputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntripmonitor_spark.operators import dedup, sampling, stats, timeseries
from ntripmonitor_spark.tables import table


def _cdc_chunks(text: str, avg_words: int = 8, min_words: int = 3) -> set[str]:
    """Pure-Python mirror of the operator: word-boundary CDC chunk
    hashes of one document."""
    import hashlib

    ws = [w for w in text.lower().split(" ") if w]
    bounds = sorted(
        {0, len(ws)}
        | {
            i
            for i in range(len(ws))
            if int(hashlib.md5(ws[i].encode()).hexdigest()[:7], 16) % avg_words == 0
        }
    )
    return {
        hashlib.md5(" ".join(ws[s:e]).encode()).hexdigest()
        for s, e in zip(bounds, bounds[1:])
        if e - s >= min_words
    }


def test_sd01_detects_repeats_at_any_alignment(spark):
    """Content-defined chunking's whole point: boundaries depend on
    local content only, so a verbatim repeat yields the same interior
    chunks in every carrier REGARDLESS of its word offset — the
    property fixed-stride sampling lacks (the first-cut stride design
    failed exactly this test). Place one repeat at 41 different word
    offsets across 82 docs and require every doc flagged."""
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
             "kilo lima mike november oscar papa quebec romeo sierra tango "
             "uniform victor whiskey xray yankee zulu one two three four").split()
    repeat = " ".join(words * 2)  # 60 words
    # sanity: the repeat's interior must carry ≥2 boundary words ≥3 apart
    import hashlib

    rws = repeat.split(" ")
    bs = [
        i for i in range(len(rws))
        if int(hashlib.md5(rws[i].encode()).hexdigest()[:7], 16) % 8 == 0
    ]
    assert len(bs) >= 2 and max(b - a for a, b in zip(bs, bs[1:])) >= 3, bs
    rows = []
    for off in range(41):
        fa = " ".join(f"fa{off}w{j}" for j in range(off))
        fb = " ".join(f"fb{off}w{j}" for j in range((off * 7) % 29))
        rows.append((2 * off, (fa + " " + repeat + f" taila{off} " + "pp " * 10).strip()))
        rows.append((2 * off + 1, (fb + " " + repeat + f" tailb{off} " + "qq " * 10).strip()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dup_hashes = {r.span_h for r in dedup.duplicate_spans(docs).collect()}
    assert dup_hashes, "no duplicated chunks found at all"
    missed = [
        doc_id for doc_id, text in rows if not (_cdc_chunks(text) & dup_hashes)
    ]
    assert not missed, f"missed docs: {missed}"


def test_mk01_probabilities_sum_to_one(spark, sf_dir):
    rows = timeseries.event_transitions(table(spark, sf_dir, "events")).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-6, (prev, total)


def test_hs01_fractions_and_counts_conserve(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    rows = stats.length_histogram(docs).collect()
    total = sum(r.n for r in rows)
    assert total == docs.count()
    by_lang: dict[str, float] = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0.0) + r.frac
    assert all(abs(v - 1.0) < 1e-6 for v in by_lang.values()), by_lang


def test_sp04_sample_size_is_min_k_stratum(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    sizes = {r.source: r.c for r in docs.groupBy("source").agg(F.count("*").alias("c")).collect()}
    got = sampling.stratified_ksample(docs, k=10).groupBy("source").agg(
        F.count("*").alias("c"), F.max("rk").alias("max_rk")
    ).collect()
    assert {r.source for r in got} == set(sizes)
    for r in got:
        expect = min(10, sizes[r.source])
        assert r.c == expect and r.max_rk == expect, (r.source, r.c, expect)


def test_ig01_target_docs_score_higher_on_average(spark, sf_dir):
    """The importance weight must actually discriminate: English docs
    (the target slice) must average a higher logw than non-English."""
    docs = table(spark, sf_dir, "documents")
    w = sampling.dsir_logweights(docs, F.col("lang") == "en")
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.is_t: r.m
        for r in joined.groupBy((F.col("lang") == "en").alias("is_t"))
        .agg(F.avg("logw").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means


def test_scd01_intervals_tile_each_keys_timeline(spark, sf_dir):
    """SCD2 conservation: per key, intervals are contiguous
    (valid_from of run i+1 == valid_to of run i), exactly one open
    (is_current) run exists, and it is the last one."""
    from ntripmonitor_spark.operators.joins import scd2_history

    hist = scd2_history(table(spark, sf_dir, "events"))
    w = F.lead("valid_from").over(
        __import__("pyspark.sql", fromlist=["Window"]).Window
        .partitionBy("user_id").orderBy("valid_from")
    )
    bad = (
        hist.withColumn("_next_from", w)
        .filter(F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("_next_from")))
        .count()
    )
    assert bad == 0, "gap or overlap between consecutive validity intervals"
    per_key = hist.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
        F.max(F.col("valid_to").isNull().cast("int")).alias("has_null_to"),
    )
    assert per_key.filter(F.col("n_open") != 1).count() == 0
    assert hist.filter(F.col("is_current") != F.col("valid_to").isNull()).count() == 0


def test_ss10_reconstruction_error_bounded_by_half_step(spark, sf_dir):
    """SQ8 bound: per-dim |reconstruction error| <= span/255/2, so
    micro_mse <= (max_span/510)^2 * 1e6 for every vector."""
    from ntripmonitor_spark.operators.simsearch import as_double_vec, sq8_quantize

    emb = table(spark, sf_dir, "embeddings")
    v = emb.select(as_double_vec(F.col("embedding")).alias("v"))
    spans = v.agg(
        *[(F.max(F.col("v")[i]) - F.min(F.col("v")[i])).alias(f"s{i}") for i in range(64)]
    ).first()
    max_span = max(spans)
    bound = (max_span / 510.0) ** 2 * 1e6 + 1e-9
    worst = sq8_quantize(emb).agg(F.max("micro_mse")).first()[0]
    assert worst <= bound, f"micro_mse {worst} exceeds half-step bound {bound}"


def test_sp05_assignment_stable_under_corpus_growth(spark, sf_dir):
    """Hash-split membership is a pure function of doc_id: computing
    the split on a half corpus and on the full corpus must agree on
    every shared doc (randomSplit fails exactly this)."""
    from ntripmonitor_spark.operators.sampling import hash_split

    docs = table(spark, sf_dir, "documents")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    a = {r["doc_id"]: r["split"] for r in hash_split(half).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_an03_locates_a_constructed_step(spark):
    """A flat-10 -> flat-100 step per user must be flagged exactly at
    the step (the only row with 10 trailing lows and 10 leading
    highs), and nowhere outside the transition zone."""
    import datetime

    rows = []
    for uid in (1, 2):
        for i in range(40):
            rows.append(
                (uid * 1000 + i, datetime.datetime(2026, 1, 1) + datetime.timedelta(minutes=i),
                 uid, "view", 10.0 if i < 20 else 100.0, "{}")
            )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    from ntripmonitor_spark.operators.timeseries import mean_shift_changepoints

    got = mean_shift_changepoints(ev, n=10, threshold=40.0).collect()
    # full 90-unit contrast occurs only where the trailing 10 are all
    # low and the leading 10 all high: exactly row i=20 per user
    flagged = {(r["user_id"], r["event_id"]) for r in got}
    assert (1, 1020) in flagged and (2, 2020) in flagged
    # transition zone rows (partial windows straddling the step) may
    # exceed 40 too, but nothing before i=11 or after i=29
    for uid, eid in flagged:
        assert 11 <= eid % 1000 <= 29


def test_tk01_token_count_conservation(spark, sf_dir):
    """BPE encode conservation: n_words <= n_tokens <= chars-per-word
    sum (merges only ever shrink, never below one token per word)."""
    from ntripmonitor_spark.operators.text import bpe_encode

    out = bpe_encode(table(spark, sf_dir, "documents"), n_merges=4)
    bad = out.filter(
        (F.col("n_tokens") < F.col("n_words"))
        | (F.col("n_tokens") > F.col("n_chars"))
    ).count()
    assert bad == 0


def test_mm05_window_count_and_range(spark, sf_dir):
    """Every payload yields exactly (n-32)//16+1 windows; 8-bit RMS
    stays inside [0, 255]."""
    from ntripmonitor_spark.operators.multimodal import audio_energy

    docs = table(spark, sf_dir, "documents")
    wins = audio_energy(docs).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_wins"), F.max("rms").alias("max_rms")
    )
    joined = wins.join(docs.select("doc_id", F.length("text").alias("n")), "doc_id")
    bad = joined.filter(
        (F.col("n_wins") != F.greatest((F.col("n") - 32) / 16 + 1, F.lit(0)).cast("int"))
        | (F.col("max_rms") < 0) | (F.col("max_rms") > 255)
    ).count()
    assert bad == 0


def test_incremental_lsh_matches_full_recompute(spark, sf_dir):
    """Production arrival path: signing batches one at a time and
    delta-deduping each against the accumulated signature table must
    yield EXACTLY the full-corpus LSH pairs — same pair set, same
    estimated Jaccard."""
    docs = table(spark, sf_dir, "documents")
    full = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }

    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    sigs = dedup.minhash_signatures(b0)
    got = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(b0).collect()
    }
    for batch in (b1, b2):
        pairs, new_sigs = dedup.minhash_lsh_delta(sigs, batch)
        for r in pairs.collect():
            got[(r["doc_a"], r["doc_b"])] = r["est_jaccard"]
        sigs = sigs.unionByName(new_sigs)
    assert got == full


def test_ks01_zero_for_identical_distributions(spark):
    """Two sources carrying the same value multiset: both ECDFs
    coincide everywhere, KS must be exactly 0; and KS is always in
    [0, 1]."""
    rows = [(i, "a" if i < 40 else "b", v)
            for i, v in enumerate(list(range(10, 50)) * 2)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r["source"]: r["ks_stat"] for r in stats.ks_drift(docs).collect()}
    assert out == {"a": 0.0, "b": 0.0}


def test_ks01_one_for_disjoint_distributions(spark, sf_dir):
    """Disjoint supports → KS = 1 (max gap where one ECDF is already 1
    and the other still 0); corpus table values stay in [0, 1]."""
    rows = [(i, "lo", i) for i in range(20)] + [(i + 20, "hi", 1000 + i) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r["source"]: r["ks_stat"] for r in stats.ks_drift(docs).collect()}
    assert out == {"lo": 1.0, "hi": 1.0}
    corpus = stats.ks_drift(table(spark, sf_dir, "documents")).collect()
    assert all(0.0 <= r["ks_stat"] <= 1.0 for r in corpus)


def test_kl01_zero_against_self_and_nonnegative(spark, sf_dir):
    """A single-source corpus IS the corpus distribution → KL = 0 and
    OOV consistent; on the real table KL ≥ 0 everywhere (Gibbs)."""
    from ntripmonitor_spark.operators import text as text_ops

    rows = [(i, "only", "the quick brown fox " * (i + 1)) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    one = text_ops.source_divergence(docs, vocab_size=3).collect()
    assert len(one) == 1 and one[0]["kl_bits"] == 0.0 and one[0]["oov_rate"] > 0.0
    corpus = text_ops.source_divergence(
        table(spark, sf_dir, "documents"), vocab_size=24
    ).collect()
    assert all(r["kl_bits"] >= 0.0 for r in corpus)


def test_dd10_finds_quote_jaccard_misses(spark):
    """The containment raison d'être: a short doc pasted verbatim into
    a much longer one has containment 1.0 (short → long) but a
    symmetric Jaccard far below dd02's 0.6 threshold — dd10 must flag
    the pair, dd02 must not."""
    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}a w{i}b w{i}c" for i in range(12))
    rows = [(1, quote), (2, f"{filler} {quote}"), (3, "totally unrelated text body here now")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hits = dedup.containment_pairs(docs, threshold=0.8).collect()
    assert [(r["doc_id"], r["container_id"], r["containment"]) for r in hits] == [(1, 2, 1.0)]
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.6).collect()
    assert jac == []


def test_qa02_rank_uniformity_and_tie_stability(spark):
    """percent_rank normalization: within a group the max rank is 1 and
    the min 0; equal values share one rank (no id-dependent ordering)."""
    rows = [(i, "s", v) for i, v in enumerate([5, 5, 7, 9, 9, 9, 11, 13])]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = stats.percentile_normalize(docs).collect()
    by_val = {}
    for r in out:
        by_val.setdefault(r["n_chars"], set()).add(r["pct_in_group"])
    assert all(len(s) == 1 for s in by_val.values()), "ties split ranks"
    ranks = sorted(r["pct_in_group"] for r in out)
    assert ranks[0] == 0.0 and ranks[-1] == 1.0


def test_er02_entities_partition_the_records(spark, sf_dir):
    """Entity clusters must PARTITION the record set (n_records sums
    to the table size), every canonical_name is present, and each
    entity id is a real record id (min-id survivorship)."""
    cust = table(spark, sf_dir, "customer")
    out = dedup.entity_clusters(cust, "c_custkey", "c_name").collect()
    assert sum(r["n_records"] for r in out) == cust.count()
    assert all(r["canonical_name"] is not None for r in out)
    ids = {r["c_custkey"] for r in cust.select("c_custkey").collect()}
    assert all(r["entity_id"] in ids for r in out)


def test_ss12_mips_order_equals_augmented_cosine_order(spark, sf_dir):
    """The point of the norm-augmentation reduction: per query, ranking
    by inner product must equal ranking by augmented cosine (all
    augmented corpus norms are M), so a cosine ANN index serves MIPS."""
    from ntripmonitor_spark.operators import simsearch

    out = simsearch.mips_topk(table(spark, sf_dir, "embeddings"), n_queries=5, k=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        by_ip = sorted(rows, key=lambda r: (-r["inner_product"], r["neighbor_id"]))
        by_ac = sorted(rows, key=lambda r: (-r["aug_cos"], r["neighbor_id"]))
        assert [r["neighbor_id"] for r in by_ip] == [r["neighbor_id"] for r in by_ac]


def test_dp01_t_sign_tracks_constructed_mean_shift(spark):
    """A source built 100 longer than the rest must get a large
    positive t; a matching source sits near 0."""
    rows = ([(i, "hi", 200 + (i % 5)) for i in range(40)]
            + [(100 + i, "base", 100 + (i % 5)) for i in range(80)])
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r["source"]: r["t_stat"] for r in stats.welch_t_drift(docs).collect()}
    assert out["hi"] > 10 and out["base"] < -10  # vs-rest is antisymmetric in sign
    # two sources drawn from the SAME distribution → |t| small
    rows2 = ([(i, "a", 100 + (i % 5)) for i in range(60)]
             + [(100 + i, "b", 100 + ((i + 2) % 5)) for i in range(60)])
    docs2 = spark.createDataFrame(rows2, "doc_id long, source string, n_chars long")
    out2 = {r["source"]: r["t_stat"] for r in stats.welch_t_drift(docs2).collect()}
    assert all(abs(t) < 3 for t in out2.values())


def test_mm06_blocking_is_lossless_and_finds_planted_neardup(spark):
    """A payload with a handful of flipped sample bytes must pair with
    its original (hamming ≤ 7 over 8 chunks always shares a chunk —
    blocking lossless), and the blocked result must equal the
    unblocked O(n²) definition on a random fixture."""
    import itertools

    from ntripmonitor_spark.operators import multimodal

    base = "abcdefgh" * 40
    variant = "zz" + base[2:]  # perturb the head: few sampled bytes differ
    rows = [(1, base), (2, variant), (3, "totally different payload text " * 11)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in multimodal.phash_neardup(docs, max_hamming=7).collect()}
    # brute force from the same signatures
    chunk_fields = ", ".join(f"c{j} int" for j in range(multimodal.AHASH_CHUNKS))
    sigs = {r["doc_id"]: r["ahash"]
            for r in multimodal.binary_payloads(docs)
            .mapInPandas(multimodal.ahash_batch, f"doc_id long, ahash string, {chunk_fields}")
            .collect()}
    want = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = sum(x != y for x, y in zip(sigs[a], sigs[b]))
        if h <= 7:
            want[(a, b)] = h
    assert got == want
    assert (1, 2) in got, "planted perceptual near-dup not found"


def test_mm06_16bit_blocking_equals_8bit_at_radius_3(spark, sf_dir):
    """Both blocking widths are lossless at radius 3, so they must
    return the identical pair set — the 16-bit mode is the corpus-scale
    setting (65k buckets instead of 256)."""
    from ntripmonitor_spark.operators import multimodal

    docs = table(spark, sf_dir, "documents")
    a = {(r["doc_a"], r["doc_b"], r["hamming"])
         for r in multimodal.phash_neardup(docs, max_hamming=3, chunk_bits=8).collect()}
    b = {(r["doc_a"], r["doc_b"], r["hamming"])
         for r in multimodal.phash_neardup(docs, max_hamming=3, chunk_bits=16).collect()}
    assert a == b


def test_sp06_equals_naive_greedy_on_tie_heavy_fixture(spark):
    """Degenerate all-one-quality corpus: every doc is a boundary doc,
    and the decomposition must still equal the naive greedy prefix
    (order by quality desc, doc_id asc, take while cum <= B)."""
    rows = [(i, f"s{i % 3}", 50, "tok " * (4 + i % 3)) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long, text string")
    got = {(r["doc_id"]) for r in sampling.token_budget_select(docs, 20).collect()}
    want = set()
    for s in ("s0", "s1", "s2"):
        cum = 0
        for i in sorted(i for i in range(60) if f"s{i % 3}" == s):
            t = len(("tok " * (4 + i % 3)).split())
            if cum + t <= 20:
                cum += t
                want.add(i)
    assert got == want
    assert sampling.token_budget_select(docs, 0).count() == 0


def test_an04_closed_form_equals_recursion(spark):
    """The windowed closed form must equal the textbook sequential
    recursion ewma_t = a*x_t + (1-a)*ewma_{t-1} (pandas adjust=False)
    to float tolerance on a constructed multi-key series."""
    import datetime as dt

    rows = []
    for k, base in (("a", 10.0), ("b", 100.0)):
        for i in range(40):
            rows.append((i, dt.datetime(2024, 1, 1 + i % 28, 12, 0), k, base + (i * 7 % 13)))
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = {
        (r["event_type"], str(r["day"])): r["ewma"]
        for r in timeseries.ewma_daily(ev, alpha=0.3).collect()
    }
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "event_type", "value"])
    pdf["day"] = pdf.ts.dt.floor("D")
    daily = pdf.groupby(["event_type", "day"], as_index=False).value.mean()
    for k, g in daily.groupby("event_type"):
        expect = g.sort_values("day").value.ewm(alpha=0.3, adjust=False).mean()
        for (_, day), e in zip(g.sort_values("day")[["event_type", "day"]].itertuples(index=False), expect):
            got = out[(k, str(day.date()))]
            assert abs(got - e) < 1e-4, f"{k} {day}: {got} vs {e}"


def test_dd11_one_bit_estimate_tracks_full_signature(spark, sf_dir):
    """On every LSH candidate pair the 1-bit estimate must be within
    the b-bit estimator's variance envelope of the full-signature
    estimate (9 perms -> sd ~ 0.33), and identical docs must score
    est = 1.0 with all 9 bits agreeing."""
    docs = table(spark, sf_dir, "documents")
    full = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    onebit = dedup.bbit_minhash_pairs(docs).collect()
    assert onebit, "no candidate pairs at this SF"
    for r in onebit:
        f = full[(r["doc_a"], r["doc_b"])]
        assert abs(r["est_jaccard_1bit"] - f) <= 1.0, "estimator unbounded"
        if f == 1.0:
            assert r["bits_agree"] == 9 and r["est_jaccard_1bit"] == 1.0
    # aggregate tracking: mean absolute gap bounded by ~2 sd of the
    # 9-bit agreement estimator
    gaps = [abs(r["est_jaccard_1bit"] - full[(r["doc_a"], r["doc_b"])]) for r in onebit]
    assert sum(gaps) / len(gaps) < 0.67, f"1-bit estimate not tracking: {gaps}"


def test_tx14_backoff_fires_only_off_fit_half(spark, sf_dir):
    """Every trigram of an even (fit-half) doc is in the model by
    construction -> n_backoff = 0; held-out odd docs must include at
    least one doc that actually backs off (else the fit/score split
    is not doing its job)."""
    from ntripmonitor_spark.operators.text import stupid_backoff_nll
    from ntripmonitor_spark.tables import table as load

    rows = stupid_backoff_nll(load(spark, sf_dir, "documents")).collect()
    even = [r for r in rows if r["doc_id"] % 2 == 0]
    odd = [r for r in rows if r["doc_id"] % 2 == 1]
    assert even and odd
    assert all(r["n_backoff"] == 0 for r in even)
    assert any(r["n_backoff"] > 0 for r in odd)
    assert all(r["avg_nll"] > 0 for r in rows)


def test_cu04_kept_slice_equals_funnel_survivors(spark, sf_dir):
    """The audit must agree with the funnel it explains: stage='kept'
    doc_ids == cu01's packed survivor ids, every input doc appears
    exactly once, and every 'duplicate' points at a kept-or-mix-dropped
    winner with a smaller id and identical text hash."""
    from ntripmonitor_spark.operators import curation
    from ntripmonitor_spark.tables import table as load

    docs = load(spark, sf_dir, "documents")
    audit = curation.drop_reasons(docs).collect()
    packed = {r["doc_id"] for r in curation.curation_funnel(docs).collect()}
    assert {r["doc_id"] for r in audit} == {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert {r["doc_id"] for r in audit if r["stage"] == "kept"} == packed
    by_id = {r["doc_id"]: r for r in audit}
    for r in audit:
        if r["stage"] == "duplicate":
            assert r["winner_id"] < r["doc_id"]
            assert by_id[r["winner_id"]]["stage"] in ("kept", "mix")


def test_sk02_estimates_track_exact_set_algebra(spark, sf_dir):
    """Sketch union/intersection estimates must land within the KMV
    error envelope (~1/sqrt(k) ~ 12.5%, allow 3x) of the EXACT distinct
    union/intersection, and obey the lattice bounds
    inter <= min(|A|,|B|) * (1+err), union >= max(|A|,|B|) * (1-err)."""
    from ntripmonitor_spark.operators.sketch import kmv_set_algebra
    from ntripmonitor_spark.tables import table as load

    ev = load(spark, sf_dir, "events")
    est = {(r["group_a"], r["group_b"]): r for r in kmv_set_algebra(ev).collect()}
    members = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        members.setdefault(r["event_type"], set()).add(r["user_id"])
    assert est, "no group pairs"
    for (a, b), r in est.items():
        exact_u = len(members[a] | members[b])
        exact_i = len(members[a] & members[b])
        assert abs(r["union_est"] - exact_u) / exact_u < 0.375, (a, b, r["union_est"], exact_u)
        if exact_i:
            assert abs(r["inter_est"] - exact_i) / exact_i < 0.5, (a, b, r["inter_est"], exact_i)


def test_ws01_sample_is_length_biased(spark, sf_dir):
    """The weighted draw must actually bias: mean n_chars of the
    selected 200 docs exceeds the corpus mean (A-ES with w = length),
    and the selection is reproducible run-to-run."""
    from ntripmonitor_spark.operators.sampling import weighted_sample_topk
    from ntripmonitor_spark.tables import table as load

    docs = load(spark, sf_dir, "documents")
    s1 = weighted_sample_topk(docs, k=200).collect()
    s2 = weighted_sample_topk(docs, k=200).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r["n_chars"] for r in s1) / len(s1)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_in02_finds_planted_phrase_at_any_offset(spark):
    """Positional phrase match must hit regardless of where the phrase
    sits in the doc, count repeats, and never fire on the scrambled
    or gapped variants bag-of-words retrieval would match."""
    from ntripmonitor_spark.operators.retrieval import phrase_search

    phrase = "red green blue"
    rows = [
        (1, "red green blue starts here"),
        (2, "pad pad red green blue"),
        (3, "a red green blue b red green blue c"),   # twice
        (4, "red blue green"),                         # scrambled
        (5, "red green pad blue"),                     # gapped
        (6, "nothing relevant"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(docs, phrase).collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_phrase_search_prebuilt_index(spark, sf_dir, tmp_path):
    """The serving shape the in02 docstring promises: materialize the
    positional posting relation ONCE as a term-clustered silver table,
    then answer multiple phrase queries probe-only — same answers as
    the standalone build-and-probe path, with the probe plan scanning
    the POSTING store (term predicate pushed) and never the corpus."""
    from ntripmonitor_spark.operators.retrieval import (
        build_posting_index, phrase_search, phrase_search_postings,
    )
    from ntripmonitor_spark.tables import table as load

    docs = load(spark, sf_dir, "documents")
    silver = str(tmp_path / "postings")
    (build_posting_index(docs)
     .repartition(8, "term").sortWithinPartitions("term")
     .write.parquet(silver))
    postings = spark.read.parquet(silver)

    def canon(df):
        return sorted((r["doc_id"], r["n_matches"]) for r in df.collect())

    for phrase in ("stream table hash", "the"):
        got = phrase_search_postings(postings, phrase)
        assert canon(got) == canon(phrase_search(docs, phrase))

    probe = phrase_search_postings(postings, "stream table hash")
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "documents.parquet" not in plan, "probe must not rescan the corpus"
    assert plan.count("Scan parquet") >= 1 and "PushedFilters: [IsNotNull(term), EqualTo(term," in plan, (
        f"term predicate not pushed to the posting scan\n{plan[:2000]}"
    )


def test_qa03_flags_planted_outlier_mean_std_would_mask(spark):
    """A single huge doc in an otherwise tight group: MAD flags it
    (and only it); the same doc dragging the MEAN demonstrates why the
    robust screen exists."""
    from ntripmonitor_spark.operators.stats import robust_outlier_screen

    rows = [(i, "x", "webA", 100 + (i % 7)) for i in range(40)]
    rows.append((99, "x", "webA", 100_000))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    r = robust_outlier_screen(docs).collect()[0]
    assert r["n_outliers"] == 1
    assert abs(r["median"] - 103) <= 3


def test_qa03_constant_group_reports_zero_not_null(spark):
    """A group where every doc has the same length has MAD = 0; the
    screen must report n_outliers = 0 (the oracle's CASE..ELSE 0 sum),
    not NULL (an all-NULL Spark sum)."""
    from ntripmonitor_spark.operators.stats import robust_outlier_screen

    rows = [(i, "x", "const", 500) for i in range(25)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    r = robust_outlier_screen(docs).collect()[0]
    assert r["mad"] == 0.0
    assert r["n_outliers"] == 0 and r["n_outliers"] is not None


def test_fn03_growth_conserves_users(spark, sf_dir):
    """Cumulative count on the last day must equal the total distinct
    user population, and n_new must sum to it too."""
    from ntripmonitor_spark.plans import REGISTRY
    from ntripmonitor_spark.tables import table as load

    rows = sorted(
        REGISTRY["fn03_user_growth"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    total = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert rows[-1]["n_cumulative"] == total
    assert sum(r["n_new"] for r in rows) == total
    assert all(r["n_active"] <= total for r in rows)


def test_sp07_epochs_permute_but_reproduce(spark, sf_dir):
    """Different epochs must order the corpus differently; the same
    epoch must reproduce exactly; every doc appears once per epoch
    with distinct positions."""
    from ntripmonitor_spark.operators.sampling import epoch_order
    from ntripmonitor_spark.tables import table as load

    docs = load(spark, sf_dir, "documents")
    e1 = {r["doc_id"]: r["pos"] for r in epoch_order(docs, epoch=1).collect()}
    e1b = {r["doc_id"]: r["pos"] for r in epoch_order(docs, epoch=1).collect()}
    e2 = {r["doc_id"]: r["pos"] for r in epoch_order(docs, epoch=2).collect()}
    assert e1 == e1b
    assert set(e1) == set(e2) and len(set(e1.values())) == len(e1)
    n_moved = sum(1 for d in e1 if e1[d] != e2[d])
    assert n_moved > len(e1) * 0.9, "epoch change barely permuted the order"


def test_an06_window_identity_equals_recursion_random_series(spark):
    """Property over pseudo-random series (deterministic LCG seeds,
    three shapes: pure noise, noise+shift, noise+ramp): the CUSUM
    window closed form S = C − min(0, run-min C) must equal the
    sequential recursion S_i = max(0, S_{i-1} + y_i) replayed in
    Python on the identical rounded bucket means — the identity an06
    rests on, quantified beyond the single hand-built case."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    series = {}
    for tname, seed, shift, ramp in (
        ("noise", 12345, 0.0, 0.0),
        ("shift", 67890, 12.0, 0.0),
        ("ramp", 24680, 0.0, 0.3),
    ):
        x = seed
        vals = []
        for h in range(60):
            x = (1103515245 * x + 12345) % (1 << 31)
            v = 50.0 + (x % 1000) / 100.0
            if shift and h >= 40:
                v += shift
            v += ramp * h
            v = round(v, 6)
            vals.append(v)
            rows.append((len(rows), base + datetime.timedelta(hours=h), 1, tname, v))
        series[tname] = vals
    out = {r["event_type"]: r for r in
           timeseries.cusum_changepoint(_events_df(spark, rows), slack_k=0.25).collect()}
    for tname, xs in series.items():
        mu = sum(xs) / len(xs)
        sigma = (sum((v - mu) ** 2 for v in xs) / (len(xs) - 1)) ** 0.5
        s, smax = 0.0, 0.0
        for v in xs:
            s = max(0.0, s + (v - mu - 0.25 * sigma))
            smax = max(smax, s)
        assert abs(out[tname]["s_max"] - smax) < 1e-5, tname
    # the planted shift is detected near its onset; pure noise peaks lower
    assert out["shift"]["s_max"] > 3 * out["noise"]["s_max"]
    bkt0 = int(base.timestamp() // 3600)
    assert abs(out["shift"]["cp_bkt"] - (bkt0 + 39)) <= 3


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, ts, u, et, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_doc_shingles_hashed_matches_string_path(spark, sf_dir):
    """The 8-byte shingle relation is set-identical (absent 64-bit
    collisions) to hashing the string-keyed relation after its dedup,
    in BOTH cluster modes — pins the round-8 restructure's semantics."""
    from pyspark.sql import functions as F

    from ntripmonitor_spark.operators.dedup import doc_shingles, doc_shingles_hashed
    from ntripmonitor_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    want = sorted(
        (r["doc_id"], r["h"])
        for r in doc_shingles(docs)
        .select("doc_id", F.xxhash64("shingle").alias("h"))
        .collect()
    )
    for cluster in (False, True):
        got = sorted(
            (r["doc_id"], r["shingle_h"])
            for r in doc_shingles_hashed(docs, cluster_by_hash=cluster).collect()
        )
        assert got == want, f"cluster_by_hash={cluster}"


def test_minhash_signatures_duplicate_insensitive(spark):
    """Repeating a shingle inside a doc cannot move any signature slot:
    MIN over duplicates == MIN over the distinct support (the round-8
    distinct-removal invariant), pinned against an independent Python
    recompute over the DISTINCT shingle set — a doc whose text repeats
    itself (every interior 3-gram emitted twice, plus seam grams) must
    produce exactly the set-defined signature."""
    import hashlib

    from ntripmonitor_spark.operators.dedup import minhash_signatures

    base = "red green blue cyan magenta yellow black white"
    doubled = base + " " + base  # interior 3-grams all appear twice
    docs = spark.createDataFrame([(1, doubled)], "doc_id long, text string")
    sig = minhash_signatures(docs).collect()[0]

    words = [w for w in doubled.lower().split(" ") if w]
    distinct_shingles = {
        " ".join(words[i:i + 3]) for i in range(len(words) - 2)
    }
    assert len(distinct_shingles) < 2 * len(words) - 4  # duplicates existed
    for i in range(9):
        expect = min(
            hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in distinct_shingles
        )
        assert sig[f"mh{i}"] == expect, i
