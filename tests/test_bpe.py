"""bp01: the distributed BPE merge loop must reproduce, exactly, the
merge table of a pure-Python reference BPE trainer (Sennrich et al.
2016 algorithm 1: count adjacent symbol pairs weighted by word
frequency, merge the argmax leftmost-first non-overlapping, repeat).
Iterative, so it has no SQL oracle — this test IS its correctness
gate, alongside the driver's rows-only check."""

from __future__ import annotations

from collections import Counter

from ntripmonitor_spark.operators.text import bpe_train


def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, str, str, int]]:
    words = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = a + b
        merges.append((rank, a, b, merged, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_matches_reference_trainer(spark):
    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "that hat is flat",
        "matter chatter the the the",
        "aaaa aaa aa a",  # overlap case: leftmost-first merging
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["n"])
        for r in bpe_train(docs, n_merges=6).collect()
    ]
    assert got == _ref_bpe(texts, 6)


def test_bpe_on_real_docs_is_deterministic(spark, sf_dir):
    from ntripmonitor_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    a = bpe_train(docs, n_merges=3).collect()
    b = bpe_train(docs, n_merges=3).collect()
    assert a == b
    assert len(a) == 3
    # counts must be non-increasing across ranks (greedy argmax)
    ns = [r["n"] for r in a]
    assert ns == sorted(ns, reverse=True)


def _ref_encode(texts: list[str], merges: list[tuple[str, str, str]]) -> list[list[str]]:
    out = []
    for t in texts:
        toks: list[str] = []
        for w in t.lower().split(" "):
            if not w:
                continue
            syms = list(w)
            for a, b, m in merges:
                nxt, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        nxt.append(m)
                        i += 2
                    else:
                        nxt.append(syms[i])
                        i += 1
                syms = nxt
            toks.extend(syms)
        out.append(toks)
    return out


def test_bpe_encode_matches_reference_tokenizer(spark):
    """tk01: the chained column-fold encode must emit, per document,
    exactly the token stream of the reference tokenizer applying the
    same trained merges (checked via count + md5 of the joined
    stream)."""
    import hashlib

    from ntripmonitor_spark.operators.text import bpe_encode

    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "that hat is flat",
        "matter chatter the the the",
        "aaaa aaa aa a",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bpe_encode(docs, n_merges=6).collect()}
    merges = [(m[1], m[2], m[3]) for m in _ref_bpe(texts, 6)]
    want = _ref_encode(texts, merges)
    for i, t in enumerate(texts):
        toks = want[i]
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["n_words"] == len([w for w in t.split(" ") if w])
        assert got[i]["tokens_md5"] == hashlib.md5("|".join(toks).encode()).hexdigest()


def test_sql_replace_fold_equals_spark_merge_fold(spark):
    """The bp01/tk01 oracles express Spark's leftmost-first
    non-overlapping merge fold as DuckDB replace() over a DOUBLE-space
    separated symbol string. Pin the equivalence on the adversarial
    shapes: overlapping runs ('a a a' + (a,a) -> 'aa a'), back-to-back
    non-overlapping occurrences ('l r l r' -> 'm m', the case a
    single-space encoding silently misses), merged-output re-eligibility
    ('aa a' + (aa,a)), and no-op sequences."""
    import duckdb

    from pyspark.sql import functions as F
    from ntripmonitor_spark.operators.text import _merge_fold

    cases = [
        (["a", "a", "a"], ("a", "a", "aa")),
        (["l", "r", "l", "r"], ("l", "r", "lr")),
        (["a", "a", "a", "a"], ("a", "a", "aa")),
        (["aa", "a", "b"], ("aa", "a", "aaa")),
        (["x", "l", "r", "l", "r", "y"], ("l", "r", "lr")),
        (["b", "c"], ("a", "a", "aa")),
        (["q"], ("q", "q", "qq")),
    ]
    con = duckdb.connect()
    for syms, (left, right, merged) in cases:
        df = spark.createDataFrame([(syms,)], "syms array<string>")
        want = df.select(
            _merge_fold(F.col("syms"), left, right, merged).alias("out")
        ).collect()[0]["out"]
        s = "  " + "  ".join(syms) + "  "
        got_s = con.execute(
            "SELECT replace(?, ' ' || ? || '  ' || ? || ' ', ' ' || ? || ' ')",
            [s, left, right, merged],
        ).fetchone()[0]
        got = [x for x in got_s.split("  ") if x]
        assert got == list(want), (syms, (left, right, merged), got, want)


def test_sql_replace_fold_exhaustive_small_sequences(spark):
    """Exhaustive equivalence of the SQL replace() encoding vs Spark's
    merge fold: EVERY symbol sequence up to length 5 over {a, b} (62
    sequences), against merges (a,b)->ab, (a,a)->aa, (b,a)->ba — one
    batched Spark job + a DuckDB loop, so no adversarial interleaving
    of runs/overlaps/boundaries can hide."""
    import itertools

    import duckdb
    from pyspark.sql import functions as F

    from ntripmonitor_spark.operators.text import _merge_fold

    seqs = [
        list(p)
        for n in range(1, 6)
        for p in itertools.product("ab", repeat=n)
    ]
    merges = [("a", "b", "ab"), ("a", "a", "aa"), ("b", "a", "ba")]
    rows = [(i, s) for i, s in enumerate(seqs)]
    df = spark.createDataFrame(rows, "i int, syms array<string>")
    cols = [
        _merge_fold(F.col("syms"), l, r, m).alias(f"m{j}")
        for j, (l, r, m) in enumerate(merges)
    ]
    want = {row["i"]: row for row in df.select("i", *cols).collect()}

    con = duckdb.connect()
    for i, syms in enumerate(seqs):
        s = "  " + "  ".join(syms) + "  "
        for j, (l, r, m) in enumerate(merges):
            got_s = con.execute(
                "SELECT replace(?, ' ' || ? || '  ' || ? || ' ', ' ' || ? || ' ')",
                [s, l, r, m],
            ).fetchone()[0]
            got = [x for x in got_s.split("  ") if x]
            assert got == list(want[i][f"m{j}"]), (syms, merges[j], got, want[i][f"m{j}"])
