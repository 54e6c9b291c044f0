"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
struct of metadata; decode / feature-extraction runs as an Arrow-batched
``mapInPandas`` stage (the only sanctioned Python hot path). The
oracle-checked registered queries use a deterministic stub decode (what
DuckDB can reproduce); the ``real=True`` path decodes PNG payloads for
real via the built-in stdlib codec (functions/png.py — full filter
support, fixture parity test) and uses PIL, when the container ships
it, for other formats. The Spark-side plumbing (schema, batch
iteration, partition behavior) is identical on every path.

At 100 TB: payloads stay columnar in parquet (binary column chunks),
metadata predicates prune row groups before any byte of payload is
decoded, and the mapInPandas stage size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, checksum string"
)

try:  # full-format image codec, if the container ships one
    import PIL.Image  # noqa: F401

    REAL_CODECS_AVAILABLE = True
except ImportError:  # pragma: no cover - container-dependent
    REAL_CODECS_AVAILABLE = False

# PNG always decodes for real: functions/png.py is a pure stdlib+NumPy
# implementation of the public PNG spec (bit depth 8, all five
# scanline filters), so the real-decode path no longer depends on the
# container shipping PIL — PIL widens coverage to JPEG/WebP/....
REAL_PNG_AVAILABLE = True


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake of an image-header decode: derive dimensions
    from the first two payload bytes. The stub is the DEFAULT even when
    PIL is present — it is what the DuckDB oracle reproduces; the real
    codec is the opt-in ``real=True`` path below."""
    if not payload:
        return (0, 0)
    w = payload[0] % 64 + 1
    h = (payload[1] % 64 + 1) if len(payload) > 1 else 1
    return (w, h)


def _decode_real(payload: bytes) -> tuple[int, int]:
    """Actual image-header decode: the built-in PNG codec for PNG
    payloads (stdlib-only, always available), PIL for everything else
    (lazy: reads the header, not the pixel data)."""
    if not payload:
        return (0, 0)

    from ntripmonitor_spark.functions import png

    if png.is_png(payload):
        return png.png_size(payload)
    if not REAL_CODECS_AVAILABLE:
        raise NotImplementedError(
            "non-PNG image codec requires PIL in the container"
        )
    import io

    import PIL.Image as Image

    with Image.open(io.BytesIO(payload)) as im:
        return im.size


def _make_decode_batch(decode):
    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            dims = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "checksum": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return decode_batch


#: mapInPandas kernel: one Arrow batch in, one metadata frame out.
decode_batch = _make_decode_batch(_decode_stub)
decode_batch_real = _make_decode_batch(_decode_real)


def binary_payloads(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal layout from the documents table: the
    UTF-8 text bytes stand in for an opaque media payload."""
    return docs.select("doc_id", F.col("text").cast("binary").alias("payload"))


def decode_metadata(docs: DataFrame, real: bool = False) -> DataFrame:
    """binary payload → typed metadata via Arrow-batched mapInPandas.

    ``real=True`` swaps the deterministic stub for an actual header
    decode (built-in PNG codec always; PIL for other formats when the
    container ships it; payloads must then be actual image bytes) —
    identical schema, batch shape, and partitioning either way."""
    kernel = decode_batch_real if real else decode_batch
    return binary_payloads(docs).mapInPandas(kernel, schema=DECODE_SCHEMA)


PIXEL_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, "
    "mean_lum double, std_lum double"
)


def pixel_feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL pixel-level feature extraction over PNG payloads: decode
    via the built-in codec, then per-image luminance mean/std (Rec.601
    weights on the color channels; alpha ignored). The batch shape a
    CLIP-embed stage takes, with an actual decode in the middle."""
    import numpy as np

    from ntripmonitor_spark.functions import png

    for pdf in batches:
        out = {"doc_id": pdf["doc_id"], "width": [], "height": [],
               "channels": [], "mean_lum": [], "std_lum": []}
        for payload in pdf["payload"]:
            # Per-row quarantine (cf. media.manifest_batch): one corrupt
            # payload must not kill the whole stage — emit a null-metadata
            # row the caller can filter on (width IS NULL).
            try:
                arr = png.decode_png(bytes(payload)).astype(np.float64)
            except Exception:
                for k in ("width", "height", "channels", "mean_lum", "std_lum"):
                    out[k].append(None)
                continue
            h, w, ch = arr.shape
            if ch >= 3:
                lum = arr[:, :, 0] * 0.299 + arr[:, :, 1] * 0.587 + arr[:, :, 2] * 0.114
            else:
                lum = arr[:, :, 0]
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(ch)
            out["mean_lum"].append(float(lum.mean()))
            out["std_lum"].append(float(lum.std()))
        yield pd.DataFrame(out)


def pixel_features(docs: DataFrame) -> DataFrame:
    """PNG payloads → real pixel-level features (see
    pixel_feature_batch); payloads must be valid PNG bytes."""
    return binary_payloads(docs).mapInPandas(
        pixel_feature_batch, schema=PIXEL_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Feature extraction / frame sampling / resize (stubbed codecs, real
# Arrow-batched numpy kernels — the exact shape a CLIP-embed or
# ffmpeg-sample stage would take).
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes int, bin0_ratio double, bin1_ratio double, "
    "bin2_ratio double, bin3_ratio double, mean_byte double"
)

FRAME_SCHEMA = "doc_id bigint, n_frames int, frame_sums array<int>"

RESIZE_SCHEMA = "doc_id bigint, out_width int, out_height int, resized_checksum string"

FRAME_BYTES = 16  # stub "frame" stride


def feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized 'feature extraction': 4-bin byte histogram ratios +
    mean byte value per payload (numpy over Arrow buffers; a real
    build swaps in an embedding model on the same batch shape)."""
    import numpy as np

    for pdf in batches:
        out = {"doc_id": pdf["doc_id"], "n_bytes": [], "bin0_ratio": [],
               "bin1_ratio": [], "bin2_ratio": [], "bin3_ratio": [], "mean_byte": []}
        for payload in pdf["payload"]:
            arr = np.frombuffer(payload, dtype=np.uint8)
            n = len(arr)
            counts = np.bincount(arr >> 6, minlength=4)
            out["n_bytes"].append(n)
            for k in range(4):
                out[f"bin{k}_ratio"].append(counts[k] / n if n else 0.0)
            out["mean_byte"].append(int(arr.sum()) / n if n else 0.0)
        yield pd.DataFrame(out)


def frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """'Frame sampling' stub: split the payload into FRAME_BYTES-sized
    frames and emit the per-frame byte sum (the stand-in for a sampled
    frame's signature)."""
    import numpy as np

    for pdf in batches:
        ids, nfr, sums = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n_frames = (len(arr) + FRAME_BYTES - 1) // FRAME_BYTES
            pad = n_frames * FRAME_BYTES - len(arr)
            frames = np.pad(arr, (0, pad)).reshape(n_frames, FRAME_BYTES)
            ids.append(doc_id)
            nfr.append(n_frames)
            sums.append([int(x) for x in frames.sum(axis=1)])
        yield pd.DataFrame({"doc_id": ids, "n_frames": nfr, "frame_sums": sums})


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """'Resize' stub: halve the decoded dimensions and checksum the
    'resized' payload (deterministic fake of the transform output)."""
    import hashlib

    for pdf in batches:
        ids, ws, hs, cks = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h = _decode_stub(payload)
            ids.append(doc_id)
            ws.append(w // 2 + 1)
            hs.append(h // 2 + 1)
            cks.append(hashlib.md5(payload + b"|resized").hexdigest())
        yield pd.DataFrame({"doc_id": ids, "out_width": ws, "out_height": hs, "resized_checksum": cks})


def extract_features(docs: DataFrame) -> DataFrame:
    return binary_payloads(docs).mapInPandas(feature_batch, schema=FEATURES_SCHEMA)


def sample_frames(docs: DataFrame) -> DataFrame:
    return binary_payloads(docs).mapInPandas(frame_sample_batch, schema=FRAME_SCHEMA)


def resize(docs: DataFrame) -> DataFrame:
    return binary_payloads(docs).mapInPandas(resize_batch, schema=RESIZE_SCHEMA)


def gif_frame_sample_batch(every_k: int = 2):
    """REAL frame sampling over animated-GIF payloads (the video
    modality's container-friendly stand-in): decode via the built-in
    LZW codec, keep every ``every_k``-th frame, emit the total frame
    count and each sampled frame's integer pixel sum — the exact shape
    an ffmpeg-sample stage produces, with an actual decode inside."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ntripmonitor_spark.functions import gif

        for pdf in batches:
            ids, nf, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ids.append(doc_id)
                # Per-row quarantine: a corrupt GIF yields a null row
                # (n_frames IS NULL) instead of failing the stage.
                try:
                    frames = gif.decode_gif(bytes(payload))
                except Exception:
                    nf.append(None)
                    sums.append(None)
                    continue
                sampled = frames[::every_k]
                nf.append(frames.shape[0])
                sums.append([int(f.sum()) for f in sampled.astype(np.int64)])
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "n_frames": pd.Series(nf, dtype="Int32"),
                 "frame_sums": sums}
            )

    return kernel


def gif_frame_sample(docs: DataFrame, every_k: int = 2) -> DataFrame:
    """Animated-GIF payloads → real sampled-frame statistics (see
    gif_frame_sample_batch)."""
    return binary_payloads(docs).mapInPandas(
        gif_frame_sample_batch(every_k), schema=FRAME_SCHEMA
    )


def resize_real_batch(target: tuple[int, int] = (8, 8)):
    """REAL resize kernel factory: decode PNG payloads via the
    built-in codec, nearest-neighbor resample to ``target`` (w, h),
    re-encode as PNG, and checksum the resized image bytes — the
    actual thumbnail/normalize stage of an image-curation pipeline,
    same Arrow batch shape as the stub."""
    tw, th = target

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from ntripmonitor_spark.functions import png

        for pdf in batches:
            ids, ws, hs, cks = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = png.decode_png(bytes(payload))
                h, w, _ch = arr.shape
                ys = (np.arange(th) * h) // th
                xs = (np.arange(tw) * w) // tw
                resized = arr[ys][:, xs]
                ids.append(doc_id)
                ws.append(tw)
                hs.append(th)
                cks.append(hashlib.md5(png.encode_png(resized)).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "out_width": ws, "out_height": hs,
                 "resized_checksum": cks}
            )

    return kernel


def resize_real(docs: DataFrame, target: tuple[int, int] = (8, 8)) -> DataFrame:
    """PNG payloads → real nearest-neighbor thumbnails (see
    resize_real_batch)."""
    return binary_payloads(docs).mapInPandas(
        resize_real_batch(target), schema=RESIZE_SCHEMA
    )


ENERGY_SCHEMA = "doc_id bigint, win_idx int, ssq bigint, rms double"

WIN_SAMPLES = 32  # stub "audio" analysis window (samples)
HOP_SAMPLES = 16  # 50% overlap, the standard STFT hop


def audio_energy_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """'Audio energy' stub: treat the payload as 8-bit PCM samples and
    emit per-window RMS over sliding WIN_SAMPLES windows with
    HOP_SAMPLES hop (only full windows — no padding). The
    sum-of-squares stays integer so the one float op (sqrt of an
    exact rational) is bit-identical in every engine; a real build
    swaps the frombuffer for an audio decode on the same batch shape.
    """
    import math

    import numpy as np

    for pdf in batches:
        ids, wi, ssqs, rmss = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n_wins = max(0, (len(arr) - WIN_SAMPLES) // HOP_SAMPLES + 1)
            if n_wins:
                sq = arr * arr
                starts = np.arange(n_wins) * HOP_SAMPLES
                windows = np.lib.stride_tricks.sliding_window_view(sq, WIN_SAMPLES)[starts]
                sums = windows.sum(axis=1)
                for w, s in enumerate(sums):
                    ids.append(doc_id)
                    wi.append(w)
                    ssqs.append(int(s))
                    rmss.append(round(math.sqrt(int(s) / float(WIN_SAMPLES)), 6))
        yield pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "win_idx": pd.Series(wi, dtype="int32"),
             "ssq": pd.Series(ssqs, dtype="int64"),
             "rms": pd.Series(rmss, dtype="float64")}
        )


def audio_energy(docs: DataFrame) -> DataFrame:
    """Windowed audio-energy extraction over the binary payload
    (Arrow-batched mapInPandas; deterministic fake PCM decode)."""
    return binary_payloads(docs).mapInPandas(audio_energy_batch, schema=ENERGY_SCHEMA)


def wav_energy_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The REAL audio decode the stub stands in for: parse the payload
    as a RIFF/WAVE container via the stdlib ``wave`` module (PCM 8/16
    bit, any channel count — channels averaged to mono), then the same
    integer sliding-window sum-of-squares as the stub kernel, so RMS
    stays an exact rational's sqrt. Same output schema; window indexes
    count PCM samples, not payload bytes."""
    import io
    import math
    import wave

    import numpy as np

    for pdf in batches:
        ids, wi, ssqs, rmss = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            with wave.open(io.BytesIO(bytes(payload))) as wv:
                n_ch = wv.getnchannels()
                width = wv.getsampwidth()
                frames = wv.readframes(wv.getnframes())
            if width == 1:  # unsigned 8-bit PCM, center at 0
                pcm = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
            elif width == 2:  # signed 16-bit little-endian
                pcm = np.frombuffer(frames, dtype="<i2").astype(np.int64)
            else:
                raise NotImplementedError(f"PCM width {width} unsupported (8/16-bit)")
            if n_ch > 1:  # average to mono (floor division keeps ints)
                pcm = pcm.reshape(-1, n_ch).sum(axis=1) // n_ch
            n_wins = max(0, (len(pcm) - WIN_SAMPLES) // HOP_SAMPLES + 1)
            if n_wins:
                sq = pcm * pcm
                starts = np.arange(n_wins) * HOP_SAMPLES
                windows = np.lib.stride_tricks.sliding_window_view(sq, WIN_SAMPLES)[starts]
                sums = windows.sum(axis=1)
                for w, s in enumerate(sums):
                    ids.append(doc_id)
                    wi.append(w)
                    ssqs.append(int(s))
                    rmss.append(round(math.sqrt(int(s) / float(WIN_SAMPLES)), 6))
        yield pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "win_idx": pd.Series(wi, dtype="int32"),
             "ssq": pd.Series(ssqs, dtype="int64"),
             "rms": pd.Series(rmss, dtype="float64")}
        )


def wav_energy(docs: DataFrame) -> DataFrame:
    """RIFF/WAVE payloads → real windowed PCM energy (see
    wav_energy_batch)."""
    return binary_payloads(docs).mapInPandas(wav_energy_batch, schema=ENERGY_SCHEMA)


AHASH_BITS = 64
AHASH_CHUNKS = 8  # 8-bit chunks; pigeonhole covers hamming <= 7


def ahash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Average-hash perceptual signature per payload: 64 evenly spaced
    samples of the decoded byte stream, bit i = sample_i > mean — the
    aHash family image near-dup signature, computed at the stub-codec
    boundary (a real deployment swaps the sampler for decoded 8×8
    grayscale pixels; everything downstream is unchanged). The mean is
    an exact multiple of 1/64 (integer sum over a power-of-two count),
    so the bit pattern is bit-identical across engines."""
    import numpy as np

    for pdf in batches:
        sigs = []
        chunk_cols: list[list[int]] = [[] for _ in range(AHASH_CHUNKS)]
        chunk_w = AHASH_BITS // AHASH_CHUNKS
        for b in pdf["payload"]:
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            n = len(arr)
            if n == 0:
                bits = "0" * AHASH_BITS
            else:
                idx = (np.arange(AHASH_BITS) * n) // AHASH_BITS
                s = arr[idx].astype(np.int64)
                mean = s.sum() / float(AHASH_BITS)
                bits = "".join("1" if x > mean else "0" for x in s)
            sigs.append(bits)
            for j in range(AHASH_CHUNKS):
                chunk_cols[j].append(int(bits[j * chunk_w:(j + 1) * chunk_w], 2))
        out = {"doc_id": pdf["doc_id"], "ahash": sigs}
        for j in range(AHASH_CHUNKS):
            out[f"c{j}"] = pd.Series(chunk_cols[j], dtype="int32")
        yield pd.DataFrame(out)


def ahash_real_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The REAL aHash the stub stands in for: decode the PNG payload,
    Rec.601 luminance, nearest-neighbor resample to 8×8, bit =
    pixel > mean — the actual image near-dup signature. Identical
    output schema to ahash_batch, so every downstream stage
    (chunk blocking, candidate join, hamming) is unchanged."""
    import numpy as np

    from ntripmonitor_spark.functions import png

    side = 8  # 8×8 grid = AHASH_BITS samples
    for pdf in batches:
        sigs = []
        chunk_cols: list[list[int]] = [[] for _ in range(AHASH_CHUNKS)]
        chunk_w = AHASH_BITS // AHASH_CHUNKS
        for b in pdf["payload"]:
            # Per-row quarantine: null signature/chunks on corrupt PNG
            # (null join keys fall out of the blocking equi-join).
            try:
                arr = png.decode_png(bytes(b)).astype(np.float64)
            except Exception:
                sigs.append(None)
                for j in range(AHASH_CHUNKS):
                    chunk_cols[j].append(None)
                continue
            h, w, ch = arr.shape
            if ch >= 3:
                lum = arr[:, :, 0] * 0.299 + arr[:, :, 1] * 0.587 + arr[:, :, 2] * 0.114
            else:
                lum = arr[:, :, 0]
            ys = (np.arange(side) * h) // side
            xs = (np.arange(side) * w) // side
            grid = lum[ys][:, xs].reshape(AHASH_BITS)
            mean = grid.sum() / float(AHASH_BITS)
            bits = "".join("1" if x > mean else "0" for x in grid)
            sigs.append(bits)
            for j in range(AHASH_CHUNKS):
                chunk_cols[j].append(int(bits[j * chunk_w:(j + 1) * chunk_w], 2))
        out = {"doc_id": pdf["doc_id"], "ahash": sigs}
        for j in range(AHASH_CHUNKS):
            # Nullable Int32: quarantined rows carry null chunk keys.
            out[f"c{j}"] = pd.Series(chunk_cols[j], dtype="Int32")
        yield pd.DataFrame(out)


def phash_neardup(docs: DataFrame, max_hamming: int = 7,
                  chunk_bits: int = 8, real: bool = False) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over binary payloads — the
    multimodal analog of dd04: signature via the Arrow-batched aHash
    kernel, candidate generation by identical 8-bit chunk (pigeonhole:
    hamming ≤ 7 over 8 chunks forces ≥ 1 equal chunk, so blocking is
    LOSSLESS for this threshold), exact hamming only on candidates.

    Scale shape: the corpus's payload bytes never shuffle — only the
    (doc_id, signature-chunk ints) relation rides the chunk self-join.
    Hamming is Σ bit_count(aᵢ ⊕ bᵢ) over the integer chunks — whole-
    stage-codegen'd integer ops, NOT a per-bit string fold (the
    first-cut 64×substr higher-order fold ran interpreted and, with
    correlated real-data signatures making blocking buckets hot, blew
    a minute-scale hole in the bench at sf0.1) — and the ≤ threshold
    filter runs BEFORE the pair-dedup exchange, so only qualifying
    pairs (not every blocked candidate) ever shuffle."""
    per_block = chunk_bits // (AHASH_BITS // AHASH_CHUNKS)  # 8-bit base chunks per block
    n_blocks = AHASH_CHUNKS // per_block
    if max_hamming >= n_blocks:
        raise ValueError(
            f"pigeonhole broken: radius {max_hamming} needs > {max_hamming} "
            f"blocks, got {n_blocks} ({chunk_bits}-bit blocks)"
        )
    chunk_fields = ", ".join(f"c{j} int" for j in range(AHASH_CHUNKS))
    kernel = ahash_real_batch if real else ahash_batch
    sig = (
        binary_payloads(docs)
        .mapInPandas(kernel, f"doc_id long, ahash string, {chunk_fields}")
        .drop("ahash")
        .persist()
    )

    def block_val(b: int):
        v = F.col(f"c{b * per_block}")
        for k in range(1, per_block):
            v = v * 256 + F.col(f"c{b * per_block + k}")
        return v

    chunks = F.array(
        *[
            F.struct(F.lit(b).alias("chunk_id"), block_val(b).alias("chunk"))
            for b in range(n_blocks)
        ]
    )
    ch = sig.select("doc_id", *[f"c{j}" for j in range(AHASH_CHUNKS)],
                    F.explode(chunks).alias("ck")).select(
        "doc_id", *[f"c{j}" for j in range(AHASH_CHUNKS)],
        F.col("ck.chunk_id").alias("chunk_id"), F.col("ck.chunk").alias("chunk"),
    )
    a = ch.alias("a")
    b = ch.alias("b")
    hamming = None
    for j in range(AHASH_CHUNKS):
        term = F.bit_count(F.col(f"a.c{j}").bitwiseXOR(F.col(f"b.c{j}")))
        hamming = term if hamming is None else hamming + term
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


PATCH = 8  # ViT-style square patch edge (stub scale)

PATCH_SCHEMA = (
    "doc_id bigint, img_w int, img_h int, patch_row int, patch_col int, patch_sum bigint"
)


def patchify_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """ViT-style patch grid over the stub-decoded 'image': the first
    w*h payload bytes form an h x w byte raster (zero-padded if the
    payload is short), tiled into 8x8 patches (both dims zero-padded up
    to a multiple of 8); each patch emits its byte sum — the stand-in
    for a patch embedding. Vectorized as one numpy block-sum reshape
    per payload; a real vision build swaps the raster for decoded
    pixels and the sum for a linear projection, batch shape unchanged.
    """
    import numpy as np

    for pdf in batches:
        ids, iws, ihs, prs, pcs, sums = [], [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h = _decode_stub(payload)
            if w == 0 or h == 0:
                continue
            arr = np.frombuffer(payload[: w * h], dtype=np.uint8).astype(np.int64)
            arr = np.pad(arr, (0, w * h - len(arr)))
            img = arr.reshape(h, w)
            ph = (h + PATCH - 1) // PATCH * PATCH
            pw = (w + PATCH - 1) // PATCH * PATCH
            img = np.pad(img, ((0, ph - h), (0, pw - w)))
            grid = img.reshape(ph // PATCH, PATCH, pw // PATCH, PATCH).sum(axis=(1, 3))
            nr, nc = grid.shape
            # vectorized emission — a Python loop per PATCH (not per
            # doc) dominated the kernel at 10x scale
            ids.append(np.full(nr * nc, doc_id, dtype=np.int64))
            iws.append(np.full(nr * nc, w, dtype=np.int32))
            ihs.append(np.full(nr * nc, h, dtype=np.int32))
            prs.append(np.repeat(np.arange(nr, dtype=np.int32), nc))
            pcs.append(np.tile(np.arange(nc, dtype=np.int32), nr))
            sums.append(grid.ravel())
        cat = (lambda xs: np.concatenate(xs) if xs else np.array([], dtype=np.int64))
        yield pd.DataFrame(
            {"doc_id": cat(ids), "img_w": cat(iws), "img_h": cat(ihs),
             "patch_row": cat(prs), "patch_col": cat(pcs), "patch_sum": cat(sums)}
        )


def patchify(docs: DataFrame) -> DataFrame:
    return binary_payloads(docs).mapInPandas(patchify_batch, schema=PATCH_SCHEMA)


# Magic-byte prefixes (hex, as `hex()` renders them in both engines).
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("52494646", "riff"),
    ("25504446", "pdf"),
    ("474946", "gif"),
)


def sniff_modality(payload_col) -> "F.Column":
    """Content-sniffed modality from magic bytes — the router in front
    of every mm* kernel: metadata lies (wrong extensions, vendor drops
    with no extension at all), the first bytes don't. Pure column
    expression over hex(prefix) — zero-shuffle, pushes into the scan
    projection, and at 100 TB reads only the column chunk header
    bytes it needs."""
    hexpfx = F.hex(payload_col)
    expr = F.lit("unknown")
    for magic, name in reversed(MAGIC_PREFIXES):
        expr = F.when(F.substring(hexpfx, 1, len(magic)) == magic, name).otherwise(expr)
    return expr


def modality_census(docs: DataFrame) -> DataFrame:
    """Per-modality census over a mixed binary drop: synthesizes a
    deterministic mixed-modality payload column (magic prefix by
    doc_id — the harness stand-in for a real mixed drop), sniffs, and
    reports (modality, n_docs, total_bytes). One scan, one bounded
    aggregate."""
    magic = F.lit("")
    for i, (m, _) in enumerate(MAGIC_PREFIXES[:4]):
        magic = F.when(F.col("doc_id") % 5 == i, F.lit(m)).otherwise(magic)
    payload = F.unhex(F.concat(magic, F.hex(F.col("text").cast("binary"))))
    staged = docs.select("doc_id", payload.alias("payload"))
    return (
        staged.select(sniff_modality(F.col("payload")).alias("modality"),
                      F.length("payload").alias("nb"))
        .groupBy("modality")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("nb").alias("total_bytes"))
    )


ENTROPY_SCHEMA = "doc_id bigint, n_bytes int, entropy_bits double"


def entropy_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Shannon entropy of the payload's byte distribution (bits/byte):
    the classic compressibility signal — ~0 for padding/constant
    fills, ~log2(alphabet) for text, ~8 for already-compressed or
    encrypted payloads (which a training pipeline usually wants to
    drop or route differently). One numpy bincount + dot per payload.
    Rounded to 6 decimals; the probability vector is exact rational
    (counts/n), so cross-engine differences are log2-ulp only."""
    import numpy as np

    for pdf in batches:
        ids, ns, ents = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            n = len(arr)
            ids.append(doc_id)
            ns.append(n)
            if n == 0:
                ents.append(0.0)
                continue
            counts = np.bincount(arr, minlength=256)
            p = counts[counts > 0] / n
            ents.append(round(float(-(p * np.log2(p)).sum()), 6))
        yield pd.DataFrame({"doc_id": ids, "n_bytes": ns, "entropy_bits": ents})


def byte_entropy(docs: DataFrame) -> DataFrame:
    return binary_payloads(docs).mapInPandas(entropy_batch, schema=ENTROPY_SCHEMA)


SCENE_SCHEMA = "doc_id bigint, frame_idx int, delta double"


def scene_delta_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL scene-change kernel over animated-GIF payloads: decode via
    the built-in LZW codec, compute the mean absolute RGB delta between
    each consecutive frame pair — the per-cut signal an ffmpeg
    scene-detect stage produces, with an actual decode inside. One
    output row per (doc, frame transition); corrupt payloads quarantine
    as a single null-metric row instead of failing the stage."""
    import numpy as np

    from ntripmonitor_spark.functions import gif

    for pdf in batches:
        ids, fidx, deltas = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            try:
                frames = gif.decode_gif(bytes(payload)).astype(np.int16)
            except Exception:
                ids.append(doc_id)
                fidx.append(None)
                deltas.append(None)
                continue
            d = np.abs(frames[1:] - frames[:-1]).mean(axis=(1, 2, 3))
            for f, dv in enumerate(d, start=1):
                ids.append(doc_id)
                fidx.append(f)
                deltas.append(round(float(dv), 6))
        yield pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "frame_idx": pd.Series(fidx, dtype="Int32"),
             "delta": pd.Series(deltas, dtype="float64")}
        )


def gif_scene_deltas(media: DataFrame) -> DataFrame:
    """(doc_id, payload) GIF rows → per-transition mean-RGB deltas
    (see scene_delta_batch)."""
    return media.mapInPandas(scene_delta_batch, schema=SCENE_SCHEMA)


SILENCE_THRESH = 64  # 8-bit sample below this counts as silence
SILENCE_SCHEMA = (
    "doc_id bigint, n_samples int, n_silent int, n_runs int,"
    " max_run_len int, max_run_start int"
)


def silence_runs_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Silence segmentation stub: payload as 8-bit PCM, a sample is
    'silent' when < SILENCE_THRESH; per doc emit the run-length
    summary (count/total of silent runs, the longest run and its
    earliest start). Pure integer outputs — bit-identical on every
    engine; a real build swaps frombuffer for an audio decode on the
    same batch shape (see wav_energy_batch)."""
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in
               ("doc_id", "n_samples", "n_silent", "n_runs",
                "max_run_len", "max_run_start")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            mask = arr < SILENCE_THRESH
            n = len(arr)
            n_silent = int(mask.sum())
            if n_silent == 0:
                runs = []
            else:
                edges = np.flatnonzero(
                    np.diff(np.concatenate(([0], mask.view(np.int8), [0])))
                )
                starts, ends = edges[::2], edges[1::2]
                runs = list(zip(starts.tolist(), (ends - starts).tolist()))
            out["doc_id"].append(doc_id)
            out["n_samples"].append(n)
            out["n_silent"].append(n_silent)
            out["n_runs"].append(len(runs))
            if runs:
                mx = max(ln for _, ln in runs)
                out["max_run_len"].append(mx)
                out["max_run_start"].append(min(s for s, ln in runs if ln == mx))
            else:
                out["max_run_len"].append(0)
                out["max_run_start"].append(None)
        yield pd.DataFrame(out)


def silence_runs(docs: DataFrame) -> DataFrame:
    """Per-doc silence-run segmentation over the binary payload
    (Arrow-batched mapInPandas) + a portable silence-share column.
    The gaps-and-islands computation is LOCAL per payload — zero
    shuffles beyond the scan; the oracle replays it relationally
    (position spine → run ids via i - row_number)."""
    from ntripmonitor_spark.functions.portable import quantize

    base = binary_payloads(docs).mapInPandas(
        silence_runs_batch, schema=SILENCE_SCHEMA
    )
    ratio = F.col("n_silent").cast("double") / F.col("n_samples").cast("double")
    return base.withColumn(
        "silence_ratio_ppm",
        F.when(F.col("n_samples") > 0, quantize(ratio, 6)),
    )
