"""Multimodal columns: images/audio/video as opaque binary + metadata.

Contract: a multimodal table carries ``content binary`` plus typed
metadata columns (mime, width/height or sample rate, …). Decode and
feature extraction run as Arrow-batched pandas functions over
``mapInPandas`` — the Spark-side plumbing (schema, batch shape,
partition sizing) is real, and the common still/audio formats decode
for REAL with stdlib+numpy codecs (llm/codecs.py, llm/jpeg.py):
24-bit BMP, full core-spec PNG, GIF, baseline AND
progressive JPEG (any subsampling, restart markers, spectral
selection + successive approximation), 16-bit PCM WAV, and
MJPEG-in-AVI video (llm/avi.py — per-frame JPEG decode + container
timing). Formats needing native libs (H.264/MP4, arithmetic-coded
JPEG …) fall back to the clearly-marked deterministic stub — swap it
for PIL/libav in production; the Spark surface does not change.

Scale notes: binary payloads dominate partition size — the reader
caps ``maxPartitionBytes`` thinking in payload bytes, and
``mapInPandas`` streams batches so a partition never fully
materializes in Python memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the decoded-image feature output.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder — deterministic fake in lieu of a codec library.

    Replace with a real decode (PIL.Image.open / torchaudio / pyav).
    The fake derives (width, height, 4-dim feature) from payload bytes
    so tests are deterministic end-to-end.
    """
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    head = payload[:16].ljust(16, b"\0")
    feature = [float(head[i]) / 255.0 for i in (0, 5, 10, 15)]
    return width, height, feature


def _decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """REAL decode for BMP, PNG, and sequential/progressive JPEG
    payloads (llm/codecs.py, llm/jpeg.py): true dimensions and a
    channel-statistics feature [mean R, mean G, mean B, grayscale
    std] in [0, 1]. Other formats — and variants the codecs don't
    handle (compressed BMP, arithmetic-coded JPEG, truncated
    bytes) — fall back to the
    stub: one bad payload in
    a 100 TB corpus must never fail the task. The codecs import stays
    inside the try for the same reason — a broken executor deploy
    degrades to the stub instead of failing the task."""
    try:
        from pipelines_spark.llm.codecs import decode_image_rgb, image_format

        if image_format(payload) is None:
            return _decode_stub(payload)
        px = decode_image_rgb(payload).astype("float64")
    except Exception:
        return _decode_stub(payload)
    h, w, _ = px.shape
    gray = px.mean(axis=2)
    feature = [
        float(px[:, :, 0].mean() / 255.0),
        float(px[:, :, 1].mean() / 255.0),
        float(px[:, :, 2].mean() / 255.0),
        float(gray.std() / 255.0),
    ]
    return w, h, feature


def attach_binary_metadata(
    df: DataFrame, content_col: str = "content", mime: str = "application/octet-stream"
) -> DataFrame:
    """Cheap JVM-side metadata: byte length + mime tag (no decode)."""
    return df.withColumns(
        {
            "n_bytes": F.length(F.col(content_col)).cast("long"),
            "mime": F.lit(mime),
        }
    )


def extract_image_features(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    content_col: str = "content",
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + featurize binary images via mapInPandas.

    Input: (id_col long, content binary, [mime string]). Output:
    IMAGE_FEATURES_SCHEMA. The decode is per-row Python by necessity
    (codec call); Arrow batching keeps transfer cost amortized.
    """
    has_mime = "mime" in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                width, height, feature = _decode_image(payload)
                rows.append(
                    {
                        "item_id": row[id_col],
                        "mime": row["mime"] if has_mime else None,
                        "n_bytes": len(payload),
                        "width": width,
                        "height": height,
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    cols = [id_col, content_col] + (["mime"] if has_mime else [])
    return df.select(*cols).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


#: Schema of the perceptual-hash output.
DHASH_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def _dhash64(px) -> int:
    """64-bit difference hash of an RGB array: grayscale → 9×8
    block-mean downscale → horizontal-gradient bits, packed row-major
    into a signed (two's-complement) 64-bit int. Block-mean pooling
    (not nearest-neighbor) so the hash is stable under the small
    rescale/recompress edits perceptual dedup exists to catch."""
    import numpy as np

    gray = px.astype("float64").mean(axis=2)
    h, w = gray.shape
    # mean-pool onto a 9x8 grid (cells as equal as integer bounds allow)
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 10).astype(int)
    cells = np.empty((8, 9))
    for r in range(8):
        for c in range(9):
            block = gray[ys[r] : max(ys[r + 1], ys[r] + 1),
                         xs[c] : max(xs[c + 1], xs[c] + 1)]
            cells[r, c] = block.mean()
    bits = (cells[:, :-1] < cells[:, 1:]).flatten()  # 8x8 row-major
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    content_col: str = "content",
) -> DataFrame:
    """Perceptual (difference) hash per image payload — the standard
    near-duplicate-image signature (cf. pHash/dHash in public image
    dedup tooling): re-encodes, mild recompression, and small edits
    keep the Hamming distance low while distinct images land ~32 bits
    apart. Decodable BMP/PNG/JPEG payloads hash for real;
    undecodable payloads yield a NULL hash (bad bytes are data, not
    errors — the 100 TB posture). Arrow-batched mapInPandas, map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from pipelines_spark.llm.codecs import decode_image_rgb, image_format
        except Exception:
            image_format = lambda _p: None  # noqa: E731

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                dh = None
                if image_format(payload) is not None:
                    try:
                        dh = _dhash64(decode_image_rgb(payload))
                    except Exception:
                        dh = None
                out.append({"item_id": row[id_col], "dhash": dh})
            yield pd.DataFrame(out, columns=["item_id", "dhash"])

    return df.select(F.col(id_col).alias("item_id"), content_col).mapInPandas(
        run, DHASH_SCHEMA
    )


def dhash_near_dup_pairs(
    hashes: DataFrame,
    *,
    max_hamming: int = 6,
    max_block_group: int | None = 10_000,
) -> DataFrame:
    """Image near-dup pairs within ``max_hamming`` of the 64-bit
    dhash, via the same pigeonhole block LSH as the text SimHash
    operator (llm/dedup.py::simhash_pairs): split into
    ``max_hamming + 1`` blocks, candidates from per-block equi-joins
    (a pair at distance ≤ d must agree on ≥1 block), verified with an
    exact JVM ``bit_count(xor)``. ``max_block_group`` drops
    pathologically hot (block_no, block_val) groups — e.g. the
    constant hash of single-color thumbnails — keeping the join from
    going quadratic; recall degrades gracefully through the other
    blocks. Input: (item_id, dhash) with NULL hashes ignored.
    Returns (id_a, id_b, hamming)."""
    nblocks = max_hamming + 1
    width = 64 // nblocks
    hs = hashes.filter(F.col("dhash").isNotNull())
    blocks = hs.select(
        "item_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_no"),
                        F.shiftright("dhash", b * width)
                        .bitwiseAND(
                            F.lit((1 << width) - 1)
                            if b < nblocks - 1
                            else F.lit(-1)  # top block keeps sign bits
                        )
                        .alias("block_val"),
                    )
                    for b in range(nblocks)
                ]
            )
        ).alias("blk"),
    ).select("item_id", "dhash", "blk.block_no", "blk.block_val")
    if max_block_group is not None:
        counts = blocks.groupBy("block_no", "block_val").agg(
            F.count(F.lit(1)).alias("_n")
        )
        blocks = (
            blocks.join(counts, ["block_no", "block_val"])
            .filter(F.col("_n") <= max_block_group)
            .drop("_n")
        )
    cands = (
        blocks.alias("l")
        .join(
            blocks.alias("r"),
            (F.col("l.block_no") == F.col("r.block_no"))
            & (F.col("l.block_val") == F.col("r.block_val"))
            & (F.col("l.item_id") < F.col("r.item_id")),
        )
        .select(
            F.col("l.item_id").alias("id_a"),
            F.col("r.item_id").alias("id_b"),
            F.col("l.dhash").alias("h_a"),
            F.col("r.dhash").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("hamming", F.expr("bit_count(h_a ^ h_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    content_col: str = "content",
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame index (the exploded (item, frame_no) shape and
    downstream partitioning contract; byte-derived frame count for
    non-container payloads). For real per-frame DECODE of MJPEG/AVI
    video use :func:`extract_video_frames`."""
    n_frames = (F.length(F.col(content_col)) % 100 + 1).alias("n_frames")
    frames = df.select(F.col(id_col), F.col(content_col), n_frames).select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_no"),
    )
    return frames


#: Schema of the decoded-video-frame feature output.
VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("ts_ms", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_video_frames(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    content_col: str = "content",
    every_n: int = 10,
) -> DataFrame:
    """REAL frame sampling + decode for MJPEG-in-AVI payloads
    (llm/avi.py + llm/jpeg.py — baseline and progressive frames):
    every ``every_n``-th frame decodes to its true dimensions, a
    container-timing timestamp, and the same channel-statistics
    feature as :func:`extract_image_features`. Payloads that are not
    AVI (or whose codec needs native libs — H.264/MP4) fall back to
    the deterministic stub rows with NULL timing, so one undecodable
    payload in a 100 TB corpus never fails the task. Arrow-batched
    ``mapInPandas``; frames stream per batch, bounding executor
    memory by batch payload bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in VIDEO_FRAMES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                item = row[id_col]
                try:
                    from pipelines_spark.llm.avi import parse_avi
                    from pipelines_spark.llm.jpeg import decode_jpeg

                    vid = parse_avi(payload)
                    for frame_no in range(0, len(vid.frames), every_n):
                        try:
                            px = decode_jpeg(vid.frames[frame_no]).astype("float64")
                            h, w, _ = px.shape
                            gray = px.mean(axis=2)
                            feature = [
                                float(px[:, :, 0].mean() / 255.0),
                                float(px[:, :, 1].mean() / 255.0),
                                float(px[:, :, 2].mean() / 255.0),
                                float(gray.std() / 255.0),
                            ]
                        except Exception:  # one bad frame ≠ bad video
                            w = h = None
                            feature = None
                        rows.append(
                            {
                                "item_id": item,
                                "frame_no": frame_no,
                                "ts_ms": frame_no * vid.usec_per_frame / 1000.0,
                                "width": w,
                                "height": h,
                                "feature": feature,
                            }
                        )
                except Exception:
                    # non-AVI / native-codec payloads: stub fallback,
                    # same deterministic shape as sample_frames
                    n_frames = len(payload) % 100 + 1
                    for frame_no in range(0, n_frames, every_n):
                        w, h, feature = _decode_stub(payload)
                        rows.append(
                            {
                                "item_id": item,
                                "frame_no": frame_no,
                                "ts_ms": None,
                                "width": w,
                                "height": h,
                                "feature": feature,
                            }
                        )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(F.col(id_col).alias("item_id"), content_col).mapInPandas(
        run, VIDEO_FRAMES_SCHEMA
    )


#: Schema of the windowed-audio feature output.
AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("window_no", T.IntegerType(), False),
        T.StructField("start_ms", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("rms", T.FloatType(), True),
    ]
)

#: Schema of the STFT spectrogram output: one row per analysis frame.
SPECTROGRAM_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("start_ms", T.DoubleType(), False),
        T.StructField("band_energy", T.ArrayType(T.FloatType()), True),
        T.StructField("peak_band", T.IntegerType(), True),
        T.StructField("peak_freq_hz", T.DoubleType(), True),
    ]
)


def audio_spectrogram(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    content_col: str = "content",
    frame_len: int = 512,
    hop: int = 256,
    n_bands: int = 16,
) -> DataFrame:
    """Short-time Fourier transform over PCM-WAV payloads: one output
    row per analysis frame with ``n_bands`` log-power band energies,
    plus the dominant FFT band and its frequency in Hz — the
    feature-extraction step of an audio-training-data pipeline
    (cf. the reference's camera-frame AI labeling shape,
    pipelines/rj_escritorio/flooding_detection/tasks.py:196-320,
    applied to the audio modality).

    Real DSP, no native libs: stdlib WAV decode (llm/codecs.py), Hann
    window, ``numpy.fft.rfft`` per frame, power folded into equal-width
    bands as ``log10(1+p)``. Runs as an Arrow-batched ``mapInPandas``
    kernel — frames explode rows (UDTF shape) but stream per batch, so
    executor memory is bounded by batch payload bytes, not corpus
    size. Non-WAV / undecodable payloads yield zero rows rather than
    failing the task (the 100 TB posture: bad payloads are data, not
    errors)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pipelines_spark.llm.codecs import decode_wav

        window = np.hanning(frame_len)
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                if payload[:4] != b"RIFF":
                    continue
                try:
                    samples, rate = decode_wav(payload)
                except Exception:
                    continue
                n_frames = max(0, (len(samples) - frame_len) // hop + 1)
                bins_per_band = (frame_len // 2 + 1) // n_bands
                for f_no in range(n_frames):
                    chunk = samples[f_no * hop : f_no * hop + frame_len]
                    spec = np.abs(np.fft.rfft(chunk * window)) ** 2
                    usable = spec[: bins_per_band * n_bands]
                    bands = np.log10(
                        1.0 + usable.reshape(n_bands, bins_per_band).sum(axis=1)
                    )
                    peak = int(np.argmax(spec))
                    out.append(
                        {
                            "item_id": row[id_col],
                            "frame_no": f_no,
                            "start_ms": f_no * hop * 1000.0 / rate,
                            "band_energy": bands.astype("float32").tolist(),
                            "peak_band": peak,
                            "peak_freq_hz": peak * rate / float(frame_len),
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in SPECTROGRAM_SCHEMA.fields]
            )

    return df.select(id_col, content_col).mapInPandas(run, SPECTROGRAM_SCHEMA)


#: Schema of the resize output: same id + transformed payload +
#: refreshed metadata (the binary column stays opaque downstream).
RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def extract_audio_features(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    content_col: str = "content",
    sample_rate_col: str = "sample_rate",
    window_ms: int = 1000,
) -> DataFrame:
    """Windowed audio feature extraction via mapInPandas: one output
    row per ``window_ms`` window (UDTF shape — rows explode).

    RIFF/WAV payloads get a REAL decode (stdlib ``wave``,
    llm/codecs.py): the sample rate comes from the header and the
    per-window value is a true RMS over normalized PCM samples. Raw
    (headerless) payloads keep the deterministic byte-level fallback.
    The window fan-out, the (id, window_no) output key, and the Arrow
    batch contract are identical either way.
    """
    import numpy as np

    def run(batches) -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                samples = None
                # NULL sample_rate surfaces as NaN in a float column;
                # it must not crash rows whose rate comes from the
                # WAV header anyway
                raw_rate = row[sample_rate_col]
                rate = (
                    16000
                    if raw_rate is None or pd.isna(raw_rate)
                    else int(raw_rate) or 16000
                )
                if payload[:4] == b"RIFF":
                    # non-WAV RIFF (WebP/AVI), non-16-bit PCM, or a
                    # truncated header falls back to the byte path —
                    # a bad payload must never fail the task
                    try:
                        from pipelines_spark.llm.codecs import decode_wav

                        samples, rate = decode_wav(payload)
                    except Exception:
                        samples = None
                samples_per_window = max(rate * window_ms // 1000, 1)
                n_samples_total = (
                    len(samples) if samples is not None else len(payload) // 2
                )
                w = 0
                for start in range(0, n_samples_total, samples_per_window):
                    if samples is not None:
                        chunk = samples[start : start + samples_per_window]
                        rms = (
                            float(np.sqrt(np.mean(chunk**2)))
                            if len(chunk)
                            else None
                        )
                    else:
                        raw = payload[start * 2 : (start + samples_per_window) * 2]
                        # fallback for headerless payloads: mean
                        # absolute byte value (deterministic)
                        rms = (sum(raw) / len(raw) / 255.0) if raw else None
                    out.append(
                        {
                            "item_id": row[id_col],
                            "window_no": w,
                            "start_ms": w * window_ms,
                            "n_samples": min(samples_per_window, n_samples_total - start),
                            "rms": rms,
                        }
                    )
                    w += 1
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return df.select(id_col, content_col, sample_rate_col).mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


def resize_images(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    content_col: str = "content",
    target: tuple[int, int] = (64, 64),
) -> DataFrame:
    """Binary→binary image resize via mapInPandas (map shape: one row
    out per row in, payload transformed, metadata refreshed).

    BMP and PNG payloads get a REAL nearest-neighbor resize,
    re-encoded in the source format (llm/codecs.py). Formats needing
    PIL keep the deterministic truncate/pad stub — size-correct so
    downstream partition-sizing logic is still exercised; swap for
    PIL ``Image.resize`` in production.
    """
    w, h = target

    def run(batches) -> "Iterator[pd.DataFrame]":
        # import once per task, inside a guard: a broken executor
        # deploy degrades every row to the stub, never fails the task
        try:
            from pipelines_spark.llm.codecs import (
                decode_image_rgb,
                encode_image,
                image_format,
                resize_nearest,
            )
        except Exception:
            image_format = lambda _payload: None  # noqa: E731

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row[content_col]) if row[content_col] is not None else b""
                resized = None
                fmt = image_format(payload)
                if fmt is not None:
                    try:
                        small = resize_nearest(decode_image_rgb(payload), (w, h))
                        resized = encode_image(small, fmt)
                    except Exception:
                        resized = None  # unsupported variant → stub
                if resized is None:
                    resized = payload[: w * h].ljust(w * h, b"\0")
                out.append(
                    {"item_id": row[id_col], "content": resized, "width": w, "height": h}
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZED_IMAGE_SCHEMA.fields]
            )

    return df.select(id_col, content_col).mapInPandas(run, RESIZED_IMAGE_SCHEMA)
