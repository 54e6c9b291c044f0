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


# ---------------------------------------------------------------------------
# Built-in PNG codec: the real-decode path without PIL.
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_channel_counts():
    import numpy as np

    from ntripmonitor_spark.functions import png

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
        data = png.encode_png(arr)
        assert png.is_png(data)
        assert png.png_size(data) == (9, 13)
        back = png.decode_png(data)
        assert back.shape == (13, 9, ch)
        assert (back == arr).all()


def test_png_decoder_handles_all_five_filters():
    """The encoder emits filter 0 only, so filters 1-4 need crafted
    scanlines: forward-filter a known image per the spec, wrap in
    valid chunks, and require exact pixel recovery."""
    import struct
    import zlib

    import numpy as np

    from ntripmonitor_spark.functions import png

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    h, w, ch = arr.shape
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    flat = arr.reshape(h, stride).astype(int)
    raw = bytearray()
    for y, ftype in zip(range(h), [0, 1, 2, 3, 4]):
        prev = flat[y - 1] if y else np.zeros(stride, dtype=int)
        cur = flat[y]
        filt = np.zeros(stride, dtype=int)
        for x in range(stride):
            left = cur[x - ch] if x >= ch else 0
            upleft = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                filt[x] = cur[x]
            elif ftype == 1:
                filt[x] = cur[x] - left
            elif ftype == 2:
                filt[x] = cur[x] - prev[x]
            elif ftype == 3:
                filt[x] = cur[x] - ((left + prev[x]) >> 1)
            else:
                filt[x] = cur[x] - paeth(left, prev[x], upleft)
        raw.append(ftype)
        raw.extend((filt % 256).astype(np.uint8).tobytes())

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        png.PNG_MAGIC
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + png._chunk(b"IEND", b"")
    )
    back = png.decode_png(data)
    assert (back == arr).all()


def test_decode_metadata_real_path_on_png_payloads(spark):
    """decode_metadata(real=True) end-to-end through the Arrow-batched
    kernel on ACTUAL PNG bytes — no PIL required: widths/heights come
    from the real IHDR, not the stub arithmetic."""
    import numpy as np

    from ntripmonitor_spark.functions import png
    from ntripmonitor_spark.operators import multimodal

    rng = np.random.default_rng(3)
    rows = []
    want = {}
    for i, (hh, ww) in enumerate([(4, 6), (12, 3), (1, 1)]):
        data = png.encode_png(rng.integers(0, 256, (hh, ww, 3), dtype=np.uint8))
        rows.append((i, data.decode("latin-1")))
        want[i] = (ww, hh)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # binary_payloads casts text→binary; latin-1 round-trips bytes<->str
    docs = docs.select(
        "doc_id",
        __import__("pyspark.sql.functions", fromlist=["encode"])
        .encode("text", "iso-8859-1").cast("string").alias("text"),
    )
    out = {r["doc_id"]: r for r in multimodal.decode_metadata(docs, real=True).collect()}
    for i, (ww, hh) in want.items():
        assert (out[i]["width"], out[i]["height"]) == (ww, hh)


def test_pixel_features_real_decode_known_values(spark):
    """pixel_features on crafted PNGs with analytically known
    luminance: a constant gray image (mean = value, std = 0) and a
    half-black/half-white RGB image (mean = 127.5 of 0/255 Rec.601
    luminance, std = 127.5)."""
    import numpy as np

    from pyspark.sql import functions as F2

    from ntripmonitor_spark.functions import png
    from ntripmonitor_spark.operators import multimodal

    gray = np.full((8, 8, 1), 77, dtype=np.uint8)
    bw = np.zeros((4, 8, 3), dtype=np.uint8)
    bw[:, 4:, :] = 255
    rows = [(0, png.encode_png(gray).decode("latin-1")),
            (1, png.encode_png(bw).decode("latin-1"))]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F2.encode("text", "iso-8859-1").cast("string").alias("text")
    )
    out = {r["doc_id"]: r for r in multimodal.pixel_features(docs).collect()}
    assert out[0]["channels"] == 1 and out[0]["mean_lum"] == 77.0 and out[0]["std_lum"] == 0.0
    assert out[1]["channels"] == 3
    assert abs(out[1]["mean_lum"] - 127.5) < 1e-9
    assert abs(out[1]["std_lum"] - 127.5) < 1e-9


def test_phash_neardup_real_pixels(spark):
    """phash_neardup(real=True): the aHash is computed from DECODED
    8x8 luminance, not byte samples. A base image and a mildly noised
    copy must pair within radius 7; an inverted image must not pair
    with either. Downstream (blocking, candidate join, hamming) is the
    exact machinery the registered stub queries use."""
    import numpy as np

    from pyspark.sql import functions as F2

    from ntripmonitor_spark.functions import png
    from ntripmonitor_spark.operators import multimodal

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    noised = np.clip(base.astype(int) + rng.integers(-6, 7, base.shape), 0, 255).astype(np.uint8)
    inverted = (255 - base).astype(np.uint8)
    rows = [(i, png.encode_png(a).decode("latin-1"))
            for i, a in enumerate([base, noised, inverted])]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F2.encode("text", "iso-8859-1").cast("string").alias("text")
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in multimodal.phash_neardup(docs, max_hamming=7, real=True).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 7
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_resize_real_known_thumbnail(spark):
    """resize_real: nearest-neighbor 8x8 thumbnails of real PNGs; the
    checksum must equal the PNG of the analytically computed resample."""
    import hashlib

    import numpy as np

    from pyspark.sql import functions as F2

    from ntripmonitor_spark.functions import png
    from ntripmonitor_spark.operators import multimodal

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    ys = (np.arange(8) * 24) // 8
    xs = (np.arange(8) * 16) // 8
    want = hashlib.md5(png.encode_png(arr[ys][:, xs])).hexdigest()

    docs = spark.createDataFrame(
        [(1, png.encode_png(arr).decode("latin-1"))], "doc_id long, text string"
    ).select("doc_id", F2.encode("text", "iso-8859-1").cast("string").alias("text"))
    r = multimodal.resize_real(docs).collect()[0]
    assert (r["out_width"], r["out_height"]) == (8, 8)
    assert r["resized_checksum"] == want


def test_wav_energy_real_decode_known_rms(spark):
    """wav_energy on a stdlib-written RIFF/WAVE file with analytically
    known energy: a constant-amplitude 16-bit square wave (|sample| =
    1000 everywhere) has RMS exactly 1000 in every window; a silent
    file has RMS 0. Stereo averages to mono first."""
    import io
    import wave

    import numpy as np

    from pyspark.sql import functions as F2

    from ntripmonitor_spark.operators import multimodal

    def make_wav(samples: np.ndarray, n_ch: int = 1) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(n_ch)
            wv.setsampwidth(2)
            wv.setframerate(8000)
            wv.writeframes(samples.astype("<i2").tobytes())
        return buf.getvalue()

    n = multimodal.WIN_SAMPLES * 3
    square = np.where(np.arange(n) % 2 == 0, 1000, -1000)
    silent = np.zeros(n, dtype=int)
    # stereo: L = 2000, R = 0 -> mono average 1000 (exact int)
    stereo = np.zeros(2 * n, dtype=int)
    stereo[0::2] = 2000
    rows = [(0, make_wav(square).decode("latin-1")),
            (1, make_wav(silent).decode("latin-1")),
            (2, make_wav(stereo, n_ch=2).decode("latin-1"))]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F2.encode("text", "iso-8859-1").cast("string").alias("text")
    )
    out = multimodal.wav_energy(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(r["rms"] == 1000.0 for r in by_doc[0])
    assert all(r["rms"] == 0.0 for r in by_doc[1])
    assert all(r["rms"] == 1000.0 for r in by_doc[2])
    assert len(by_doc[0]) == len(by_doc[1]) == len(by_doc[2]) > 0


def test_gif_codec_roundtrip_and_real_frame_sampling(spark):
    """The GIF LZW decoder against the fixture encoder: exact pixel
    recovery across frames, then the Spark real frame-sampling kernel
    end-to-end with analytically known pixel sums."""
    import numpy as np

    from pyspark.sql import functions as F2

    from ntripmonitor_spark.functions import gif
    from ntripmonitor_spark.operators import multimodal

    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [10, 20, 30]],
                       dtype=np.uint8)
    rng = np.random.default_rng(13)
    frames = rng.integers(0, 4, size=(5, 6, 9), dtype=np.uint8)
    data = gif.encode_gif(frames, palette)
    assert gif.is_gif(data)
    decoded = gif.decode_gif(data)
    assert decoded.shape == (5, 6, 9, 3)
    want_rgb = palette[frames]
    assert (decoded == want_rgb).all()

    docs = spark.createDataFrame(
        [(7, data.decode("latin-1"))], "doc_id long, text string"
    ).select("doc_id", F2.encode("text", "iso-8859-1").cast("string").alias("text"))
    r = multimodal.gif_frame_sample(docs, every_k=2).collect()[0]
    assert r["n_frames"] == 5
    want_sums = [int(want_rgb[i].astype(np.int64).sum()) for i in (0, 2, 4)]
    assert list(r["frame_sums"]) == want_sums


def test_gif_lzw_decoder_handles_growing_dictionary_and_kwkwk():
    """The fixture encoder never grows the LZW dictionary, so compress
    a frame with a REAL in-test LZW encoder (string-table growth,
    width escalation, and the KwKwK self-reference via long runs) and
    require exact recovery."""
    import numpy as np

    from ntripmonitor_spark.functions.gif import _lzw_decode

    def lzw_encode(pixels, min_code):
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        table = {(i,): i for i in range(clear)}
        next_code = eoi + 1
        width = min_code + 1
        out_codes = [clear]
        seq = ()
        widths = []
        for p in pixels:
            cand = seq + (p,)
            if cand in table:
                seq = cand
                continue
            out_codes.append(table[seq])
            widths.append(width)
            table[cand] = next_code
            next_code += 1
            # the GIF width rule: codes grow when next_code exceeds width
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
            seq = (p,)
        out_codes.append(table[seq])
        widths.append(width)
        out_codes.append(eoi)
        widths.append(width)
        # pack: first code (clear) at initial width
        widths = [min_code + 1] + widths
        acc = nbits = 0
        data = bytearray()
        for code, wdt in zip(out_codes, widths):
            acc |= code << nbits
            nbits += wdt
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            data.append(acc & 0xFF)
        return bytes(data)

    rng = np.random.default_rng(17)
    # long runs (KwKwK) + enough variety to force width growth past 2^min
    pixels = np.concatenate([
        np.full(50, 1), np.full(37, 2),
        rng.integers(0, 4, 300), np.full(25, 3), np.tile([0, 1], 40),
    ]).astype(int).tolist()
    for min_code in (2, 3):
        stream = lzw_encode(pixels, min_code)
        got = _lzw_decode(min_code, stream, len(pixels))
        assert got == pixels, f"min_code={min_code}: mismatch"


def test_media_ingest_binaryfile_to_manifest(spark, tmp_path):
    """End-to-end media ingest: a directory tree of real PNG/GIF/WAV
    files (written by the fixture encoders/stdlib) plus one junk file,
    read through Spark's binaryFile source (recursive + glob) into the
    typed manifest with per-modality REAL metadata."""
    import io
    import wave

    import numpy as np

    from ntripmonitor_spark.functions import gif, png
    from ntripmonitor_spark.sources import media

    rng = np.random.default_rng(21)
    root = tmp_path / "drop"
    (root / "sub").mkdir(parents=True)

    (root / "a.png").write_bytes(
        png.encode_png(rng.integers(0, 256, (10, 20, 3), dtype=np.uint8)))
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    (root / "sub" / "b.gif").write_bytes(
        gif.encode_gif(rng.integers(0, 2, (3, 4, 5), dtype=np.uint8), pal))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1); wv.setsampwidth(2); wv.setframerate(16000)
        wv.writeframes(np.zeros(160, dtype="<i2").tobytes())
    (root / "sub" / "c.wav").write_bytes(buf.getvalue())
    (root / "junk.txt").write_bytes(b"not media at all")

    out = {r["path"].rsplit("/", 1)[-1]: r
           for r in media.ingest_media(spark, str(root)).collect()}
    assert out["a.png"]["modality"] == "image"
    assert (out["a.png"]["width"], out["a.png"]["height"]) == (20, 10)
    assert out["b.gif"]["modality"] == "video" and out["b.gif"]["n_frames"] == 3
    assert (out["b.gif"]["width"], out["b.gif"]["height"]) == (5, 4)
    assert out["c.wav"]["modality"] == "audio"
    assert out["c.wav"]["n_samples"] == 160 and out["c.wav"]["sample_rate"] == 16000
    assert out["junk.txt"]["modality"] == "other"

    only_png = media.ingest_media(spark, str(root), glob="*.png").collect()
    assert [r["path"].rsplit("/", 1)[-1] for r in only_png] == ["a.png"]


def test_media_stream_ingest_watched_drop_dir(spark, tmp_path):
    """Continuous media ingest: files landing in a watched directory
    across TWO stream runs each appear exactly once in the manifest
    sink (checkpointed file-source semantics — the second run picks up
    only the file added after the first)."""
    import io
    import wave

    import numpy as np

    from ntripmonitor_spark.functions import png
    from ntripmonitor_spark.sources import media

    drop = tmp_path / "drop"
    drop.mkdir()
    ckpt = str(tmp_path / "ckpt")
    rng = np.random.default_rng(31)
    (drop / "one.png").write_bytes(
        png.encode_png(rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)))

    sink = str(tmp_path / "manifest")

    def run_once():
        q = (
            media.media_manifest(media.stream_media(spark, str(drop)))
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1); wv.setsampwidth(2); wv.setframerate(8000)
        wv.writeframes(np.zeros(80, dtype="<i2").tobytes())
    (drop / "two.wav").write_bytes(buf.getvalue())
    run_once()

    rows = spark.read.parquet(sink).select("path", "modality").collect()
    names = sorted(r["path"].rsplit("/", 1)[-1] for r in rows)
    assert names == ["one.png", "two.wav"], names
    by = {r["path"].rsplit("/", 1)[-1]: r["modality"] for r in rows}
    assert by == {"one.png": "image", "two.wav": "audio"}


def test_real_kernels_quarantine_corrupt_rows(spark):
    """One corrupt payload in a batch must not kill the stage: the
    real-decode kernels emit a null-metadata row for it (the
    media.manifest_batch modality='corrupt' convention) while the
    valid rows decode normally."""
    import numpy as np

    from pyspark.sql import functions as F2

    from ntripmonitor_spark.functions import gif, png
    from ntripmonitor_spark.operators import multimodal

    rng = np.random.default_rng(11)
    good_png = png.encode_png(rng.integers(0, 256, (5, 4, 3), dtype=np.uint8))
    bad = b"\x89PNG\r\n\x1a\n" + bytes(4)  # magic + garbage
    rows = [(0, good_png.decode("latin-1")), (1, bad.decode("latin-1"))]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F2.encode("text", "iso-8859-1").cast("string").alias("text")
    )
    out = {r["doc_id"]: r for r in multimodal.pixel_features(docs).collect()}
    assert out[0]["width"] == 4 and out[0]["height"] == 5
    assert out[1]["width"] is None and out[1]["mean_lum"] is None

    sig = {r["doc_id"]: r for r in multimodal.phash_neardup(
        docs, max_hamming=7, real=True).collect()}
    assert sig == {}  # no pairs — and no stage failure

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    good_gif = gif.encode_gif(
        rng.integers(0, 2, (2, 3, 3), dtype=np.uint8), pal)
    rows = [(0, good_gif.decode("latin-1")), (1, "GIF89a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F2.encode("text", "iso-8859-1").cast("string").alias("text")
    )
    out = {r["doc_id"]: r for r in multimodal.gif_frame_sample(docs).collect()}
    assert out[0]["n_frames"] == 2
    assert out[1]["n_frames"] is None and out[1]["frame_sums"] is None


def test_gif_decoder_rejects_malformed_with_valueerror():
    """Malformed GIFs raise ValueError (never IndexError / numpy
    broadcast errors): truncated header, truncated sub-blocks, and a
    frame rectangle exceeding the logical screen."""
    import struct

    import numpy as np
    import pytest

    from ntripmonitor_spark.functions import gif

    with pytest.raises(ValueError):
        gif.decode_gif(b"GIF89a\x01\x00")  # truncated header
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    ok = gif.encode_gif(np.zeros((1, 2, 2), dtype=np.uint8), pal)
    with pytest.raises(ValueError):
        gif.decode_gif(ok[:20])  # truncated mid-stream
    # Rewrite the image descriptor so the frame overflows the screen:
    # find the 0x2C introducer and bump its width field.
    pos = ok.index(b"\x2c", 6)
    bad = bytearray(ok)
    bad[pos + 5:pos + 7] = struct.pack("<H", 9)  # w=9 on a 2x2 screen
    with pytest.raises(ValueError, match="exceeds"):
        gif.decode_gif(bytes(bad))
