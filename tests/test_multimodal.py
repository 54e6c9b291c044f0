"""Multimodal decode kernels: the deterministic stub (oracle-checked
via mm01) and the opt-in real-codec path, which runs only when PIL is
present in the container and is skip-marked otherwise (VERDICT r2 #9)."""

from __future__ import annotations

import pytest

from ntripmonitor_spark.operators import multimodal


def test_stub_is_default_even_with_codecs(spark):
    """The oracle-checked stub must stay the default kernel regardless
    of codec availability — real decode is opt-in only."""
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    row = multimodal.decode_metadata(docs).first()
    assert (row["width"], row["height"]) == (ord("a") % 64 + 1, ord("b") % 64 + 1)


def test_real_codec_rejected_without_pil(spark):
    if multimodal.REAL_CODECS_AVAILABLE:
        pytest.skip("PIL present; covered by test_real_codec_parity")
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(Exception, match="NotImplementedError|real image codec"):
        multimodal.decode_metadata(docs, real=True).collect()


def test_real_codec_parity(spark):
    """With PIL available: generated PNGs of known sizes must decode to
    those exact dimensions through the same mapInPandas plumbing the
    stub uses."""
    pytest.importorskip("PIL")
    import io

    import PIL.Image as Image

    sizes = [(3, 5), (17, 2), (64, 64)]
    payloads = []
    for i, (w, h) in enumerate(sizes):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (i, i, i)).save(buf, format="PNG")
        payloads.append((i, bytearray(buf.getvalue())))
    raw = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = raw.mapInPandas(multimodal.decode_batch_real,
                          schema=multimodal.DECODE_SCHEMA)
    got = {r["doc_id"]: (r["width"], r["height"]) for r in out.collect()}
    assert got == {i: s for i, s in enumerate(sizes)}


def test_patchify_conserves_bytes_and_tiles_grid(spark, sf_dir):
    """Per doc: the patch sums must total exactly the raster's byte sum
    (zero padding adds nothing), and the grid must be the full
    ceil(h/8) x ceil(w/8) rectangle with every patch present once."""
    from ntripmonitor_spark.tables import table as load

    docs = load(spark, sf_dir, "documents").limit(50)
    rows = multimodal.patchify(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, prs in by_doc.items():
        payload = texts[doc_id].encode()
        w, h = multimodal._decode_stub(payload)
        nr, nc = (h + 7) // 8, (w + 7) // 8
        assert {(r["patch_row"], r["patch_col"]) for r in prs} == {
            (i, j) for i in range(nr) for j in range(nc)
        }
        assert sum(r["patch_sum"] for r in prs) == sum(payload[: w * h])
        assert all(r["img_w"] == w and r["img_h"] == h for r in prs)
