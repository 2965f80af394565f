"""Multimodal-column queries: REAL image decode plus the mapInPandas
decode/feature plumbing, all oracle-checked.

``mm_features`` decodes genuine PPM (P6) image payloads — header parse +
raster extraction via the dependency-free codec in operators/multimodal.py —
and reports true pixel statistics. The payloads are synthesized
deterministically from ``doc_id`` (pixel i of asset a has value
``(a*7 + i) % 256``), so the DuckDB oracle derives the expected statistics
from the generative formula WITHOUT decoding — an independent check of the
whole decode path.

``mm_byte_features`` / ``mm_frames`` keep the format-agnostic byte plumbing
(fold/fan-out shapes) over printable-ASCII payloads, where DuckDB reproduces
the byte arithmetic with ``ascii(substr(...))``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from giranking_spark.operators.multimodal import (
    FEATURE_DIM,
    audio_features,
    audio_fingerprint,
    encode_avi,
    encode_ppm,
    encode_wav,
    extract_features,
    image_ahash,
    image_features,
    pack_assets,
    resize_images,
    sample_frames,
    video_frame_features,
)
from giranking_spark.sources.tables import load_table

FRAME_BYTES = 64

# printable-ASCII payload: byte i == ascii(char i) on both engines
_ASCII_SQL = "regexp_replace(text, '[^ -~]', '', 'g')"


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ascii_text = F.regexp_replace(F.col("text"), "[^ -~]", "")
    return pack_assets(d, "doc_id", F.encode(ascii_text, "UTF-8"), mime="text/plain")


def _spread(df):
    """Partition-parallelize an expensive per-row Python synthesis stage:
    AQE coalesces the small parquet scan feeding these fixtures to ONE
    partition, which would run the whole Arrow encode pass on a single
    core — measured 7.9 s of mm_webp_features' 9.1 s at sf0.1. One tiny
    id-row exchange buys full-width encode parallelism (the same rule a
    production pipeline applies before any expensive per-row stage fed by
    a small dimension scan)."""
    width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(width)


def _synth_ppm_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PPM image per document: w=4+id%5, h=3+id%4, pixel byte
    i = (id*7 + i) % 256. Payload generation is Arrow-batched test fodder;
    the DECODE side is the operator under test."""
    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 4 + a % 5, 3 + a % 4
                rgb = bytes((a * 7 + i) % 256 for i in range(w * h * 3))
                payloads.append(encode_ppm(w, h, rgb))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="image/x-portable-pixmap")


def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode: PPM header parse + raster pixel statistics
    (operators/multimodal.py decode_ppm), Arrow-batched via mapInPandas."""
    return image_features(_synth_ppm_assets(spark, sf_dir)).select(
        "asset_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def q_mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-agnostic byte plumbing (mapInPandas fold), exploded to scalar
    rows (asset_id, bucket, feat) for exact cross-engine comparison."""
    feats = extract_features(_assets(spark, sf_dir))
    return feats.select(
        "asset_id", F.posexplode("features").alias("bucket", "feat")
    ).select("asset_id", "bucket", F.round("feat", 6).alias("feat"))


def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fan-out frame sampling (one input row → many frames)."""
    return sample_frames(_assets(spark, sf_dir), every_n_bytes=FRAME_BYTES)


RESIZE_W, RESIZE_H = 3, 2


def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize over decoded PPM rasters; the oracle
    derives the expected resized-pixel means from the generative formula at
    the mapped coordinates — decode + index-mapping + gather all checked."""
    r = resize_images(_synth_ppm_assets(spark, sf_dir), RESIZE_W, RESIZE_H)
    return r.select(
        "asset_id", "width", "height", "out_w", "out_h",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


WAV_RATE = 8000


def _synth_wav_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mono 16-bit PCM WAV per document: n = 50 + id%50
    samples, sample i = ((id*13 + i*31) % 65536) - 32768. The ENCODE side is
    test fodder; decode_wav + audio_features are the operators under test."""
    import numpy as np

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                n = 50 + a % 50
                pcm = ((a * 13 + np.arange(n) * 31) % 65536) - 32768
                payloads.append(encode_wav(WAV_RATE, pcm))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="audio/wav")


def q_mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: RIFF/PCM parse + sample statistics (duration, rms,
    zero crossings), Arrow-batched. The oracle derives expectations from the
    generative sample formula without decoding."""
    r = audio_features(_synth_wav_assets(spark, sf_dir))
    return r.select(
        "asset_id", "sample_rate", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        "zero_crossings",
    )


def _synth_avi_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uncompressed AVI per document: w=3+id%3, h=2+id%2,
    2+id%3 frames, frame f pixel byte i = (id*7 + f*101 + i) % 256."""
    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h, nf = 3 + a % 3, 2 + a % 2, 2 + a % 3
                frames = [
                    bytes((a * 7 + f * 101 + i) % 256 for i in range(w * h * 3))
                    for f in range(nf)
                ]
                payloads.append(encode_avi(w, h, frames))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="video/x-msvideo")


def q_mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame extraction: RIFF/AVI walk + per-frame raster decode
    (bottom-up BGR un-rastering shared with the BMP codec); one output row
    per frame. Oracle derives per-frame means from the generative formula."""
    r = video_frame_features(_synth_avi_assets(spark, sf_dir))
    return r.select(
        "asset_id", "frame_idx", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def _synth_jpeg_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic baseline-JPEG image per document: a grid of
    nbx = 1 + id%3 by nby = 1 + id%2 8x8 blocks, block k constant-colored
    r = (id*7 + k*13)%256, g = (id*11 + k*17)%256, b = (id*13 + k*19)%256,
    encoded with ALL-ONES quant tables at 4:4:4.  Under that construction
    baseline JPEG is exact through the DCT (DC-only blocks, quant 1), so
    the only lossy step is the BT.601 integer rounding — a closed-form map
    the oracle replicates (operators/jpeg.py module docstring)."""
    import numpy as np

    from giranking_spark.operators.jpeg import encode_jpeg

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ones = np.ones(64, dtype=np.int64)
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                nbx, nby = 1 + a % 3, 1 + a % 2
                img = np.zeros((8 * nby, 8 * nbx, 3), dtype=np.uint8)
                for by in range(nby):
                    for bx in range(nbx):
                        k = by * nbx + bx
                        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = [
                            (a * 7 + k * 13) % 256,
                            (a * 11 + k * 17) % 256,
                            (a * 13 + k * 19) % 256,
                        ]
                payloads.append(encode_jpeg(img, ones, ones))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="image/jpeg")


def q_mm_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode: marker walk + Huffman + dequant + IDCT + BT.601
    (operators/jpeg.py), dispatched through the same decode_pixels /
    image_features mapInPandas stage as PPM/BMP.  The oracle never touches
    JPEG machinery — it predicts the decoded pixels from the generative
    formula plus the closed-form color-rounding map, so a green row
    certifies the entire decode chain."""
    return image_features(_synth_jpeg_assets(spark, sf_dir)).select(
        "asset_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def _synth_png_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PNG image per document: w = 4 + id%6, h = 3 + id%5,
    pixel byte i = (id*11 + i*3) % 256, scanline y filtered with type
    (id + y) % 5 — the corpus collectively exercises all five PNG filter
    reconstructions (None/Sub/Up/Average/Paeth).  PNG is lossless, so the
    oracle predicts decoded pixels straight from this formula."""
    import numpy as np

    from giranking_spark.operators.png import encode_png

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 4 + a % 6, 3 + a % 5
                rgb = bytes((a * 11 + i * 3) % 256 for i in range(w * h * 3))
                filters = [(a + y) % 5 for y in range(h)]
                payloads.append(encode_png(w, h, rgb, filters))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="image/png")


def q_mm_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode: chunk walk + CRC check + zlib inflate + per-row
    filter reconstruction (operators/png.py), through the same
    decode_pixels / image_features mapInPandas stage as PPM/BMP/JPEG.
    Lossless format, so the oracle is the generative formula verbatim — a
    green row certifies the whole inflate + un-filter chain bit-exactly."""
    return image_features(_synth_png_assets(spark, sf_dir)).select(
        "asset_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def _synth_webp_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic lossless-WebP image per document: w = 3 + id%6,
    h = 2 + id%5, pixel byte i = (id*13 + i*7) % 256, encoded as a
    transform-free VP8L stream (operators/webp.py).  VP8L is lossless, so
    the oracle predicts decoded pixels straight from this formula."""
    import numpy as np

    from giranking_spark.operators.webp import encode_webp_lossless

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 3 + a % 6, 2 + a % 5
                img = np.frombuffer(
                    bytes((a * 13 + i * 7) % 256 for i in range(w * h * 3)),
                    dtype=np.uint8,
                ).reshape(h, w, 3)
                payloads.append(encode_webp_lossless(img))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="image/webp")


def q_mm_webp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossless-WebP decode: RIFF walk + VP8L bitstream (canonical
    prefix codes, LZ77/cache/transform machinery — operators/webp.py),
    through the same decode_pixels / image_features mapInPandas stage as
    the other codecs.  Lossless format, so the oracle is the generative
    formula verbatim — a green row certifies the whole prefix-decode chain
    bit-exactly."""
    return image_features(_synth_webp_assets(spark, sf_dir)).select(
        "asset_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


GIF_COLORS = 16


def _synth_gif_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GIF image per document: a 16-color palette with entry
    j = ((id*5 + j*7)%256, (id*3 + j*11)%256, (id*7 + j*13)%256),
    w = 5 + id%6, h = 4 + id%5, pixel p indexed (id + p*3) % 16.  GIF is
    lossless over its palette, so index -> palette entry is a closed-form
    map the oracle evaluates directly."""
    import numpy as np

    from giranking_spark.operators.gif import encode_gif

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                pal = bytes(
                    b
                    for j in range(GIF_COLORS)
                    for b in (
                        (a * 5 + j * 7) % 256,
                        (a * 3 + j * 11) % 256,
                        (a * 7 + j * 13) % 256,
                    )
                )
                w, h = 5 + a % 6, 4 + a % 5
                idx = bytes((a + p * 3) % GIF_COLORS for p in range(w * h))
                payloads.append(encode_gif(w, h, pal, idx))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="image/gif")


def q_mm_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode: header/extension walk + variable-width LZW +
    palette resolution (operators/gif.py), through the shared decode_pixels
    / image_features mapInPandas stage.  Lossless, so the oracle evaluates
    the palette formula at each pixel's index — a green row certifies the
    whole LZW + palette chain bit-exactly."""
    return image_features(_synth_gif_assets(spark, sf_dir)).select(
        "asset_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


def _synth_tiff_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic TIFF image per document: w = 6 + id%5, h = 4 + id%4,
    pixel byte i = (id*17 + i*5) % 256, PackBits compression for odd ids
    and 2-row strips — exercises raw + RLE strip assembly.  Lossless, so
    the oracle is the formula verbatim."""
    from giranking_spark.operators.tiff import encode_tiff

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h = 6 + a % 5, 4 + a % 4
                rgb = bytes((a * 17 + i * 5) % 256 for i in range(w * h * 3))
                payloads.append(
                    encode_tiff(w, h, rgb, packbits=bool(a % 2), rows_per_strip=2)
                )
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="image/tiff")


def q_mm_tiff_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode: IFD tag walk + raw/PackBits strip assembly
    (operators/tiff.py) through the shared decode_pixels / image_features
    stage; the corpus alternates compressions so both paths are certified
    by the one oracle row set."""
    return image_features(_synth_tiff_assets(spark, sf_dir)).select(
        "asset_id",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


MM_BASES = 16       # near-dup fodder: assets with equal doc_id % MM_BASES
                    # share a base image (variants perturb one pixel)
AHASH_GRID = 6      # 36-bit aHash
AHASH_BANDS = 4
AHASH_MAX_HAMMING = 3


def _synth_neardup_ppm_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic near-duplicate image corpus: base b = id % MM_BASES
    fixes dims (w = 4 + b%5, h = 3 + b%4) and the raster formula
    byte i = (b·97 + i·((b·53) % 101 + 3) + pert·[i = 0]) % 256 with
    pert = id // MM_BASES — same-base assets are identical up to one
    perturbed byte. The per-base spatial frequency (b·53 % 101 + 3) makes
    distinct bases' hashes far apart (verified: at sf0.01 the pair set is
    EXACTLY the within-base ground truth, zero accidental pairs), so the
    query's output is the planted near-dup structure the pHash must
    recover."""
    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                b, pert = a % MM_BASES, a // MM_BASES
                w, h = 4 + b % 5, 3 + b % 4
                freq = (b * 53) % 101 + 3
                rgb = bytes(
                    (b * 97 + i * freq + (pert if i == 0 else 0)) % 256
                    for i in range(w * h * 3)
                )
                payloads.append(encode_ppm(w, h, rgb))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="image/x-portable-pixmap")


def q_mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs: REAL decode → aHash perceptual fingerprint
    (operators/multimodal.py:image_ahash) → pigeonhole-banded hamming join
    (operators/dedup.py:banded_hamming_pairs). The oracle re-derives every
    hash bit from the generative formula WITHOUT decoding and brute-forces
    all pairs — a green row certifies decode + downsample + integer
    thresholding + the banded join's exact recall, end to end."""
    from giranking_spark.operators.dedup import banded_hamming_pairs

    sigs = image_ahash(
        _synth_neardup_ppm_assets(spark, sf_dir), grid=AHASH_GRID
    )
    return banded_hamming_pairs(
        sigs,
        bits=AHASH_GRID * AHASH_GRID,
        bands=AHASH_BANDS,
        max_hamming=AHASH_MAX_HAMMING,
        id_col="asset_id",
        sig_col="ahash",
    )


AFP_FRAMES = 33          # -> 32-bit energy-delta fingerprint
AFP_BANDS = 4
AFP_MAX_HAMMING = 3
AFP_MULT = 2654435761    # Knuth multiplicative constant — decorrelates the
                         # fodder's sample values across bases so distinct
                         # bases' fingerprints are far apart (verified: the
                         # sf0.01 pair set is EXACTLY the within-base truth)


def _synth_neardup_wav_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic near-duplicate audio corpus: base b = id % MM_BASES
    fixes n = 200 + b%100 samples with
    sample i = ((b·13 + i·31 + pert·[i = 0]) · AFP_MULT) % 65536 − 32768,
    pert = id // MM_BASES — same-base clips differ in one sample."""
    import numpy as np

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                b, pert = a % MM_BASES, a // MM_BASES
                n = 200 + b % 100
                i = np.arange(n, dtype=np.int64)
                raw = b * 13 + i * 31 + np.where(i == 0, pert, 0)
                pcm = ((raw * AFP_MULT) % 65536) - 32768
                payloads.append(encode_wav(WAV_RATE, pcm))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="audio/wav")


def q_mm_audio_fp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs: REAL WAV decode → integer energy-delta
    fingerprint (operators/multimodal.py:audio_fingerprint) → the same
    pigeonhole-banded hamming join as image pHash — the hamming machinery
    generalizing across modalities. The oracle re-derives every fingerprint
    bit from the generative formula without decoding."""
    from giranking_spark.operators.dedup import banded_hamming_pairs

    sigs = audio_fingerprint(
        _synth_neardup_wav_assets(spark, sf_dir), frames=AFP_FRAMES
    )
    return banded_hamming_pairs(
        sigs,
        bits=AFP_FRAMES - 1,
        bands=AFP_BANDS,
        max_hamming=AFP_MAX_HAMMING,
        id_col="asset_id",
        sig_col="afp",
    )


QUERIES = {
    "mm_jpeg_features": q_mm_jpeg_features,
    "mm_png_features": q_mm_png_features,
    "mm_webp_features": q_mm_webp_features,
    "mm_gif_features": q_mm_gif_features,
    "mm_tiff_features": q_mm_tiff_features,
    "mm_phash_pairs": q_mm_phash_pairs,
    "mm_audio_fp_pairs": q_mm_audio_fp_pairs,
    "mm_features": q_mm_features,
    "mm_video_frames": q_mm_video_frames,
    "mm_resize": q_mm_resize,
    "mm_audio_features": q_mm_audio_features,
    "mm_byte_features": q_mm_byte_features,
    "mm_frames": q_mm_frames,
}

#: source-pixel byte index feeding aHash cell (gx, gy), channel c — the
#: nearest-neighbor map resize_images/image_ahash use, spelled in SQL
_AHASH_BYTE = (
    f"((((gy.i * h) // {AHASH_GRID}) * w + ((gx.i * w) // {AHASH_GRID})) * 3 + c.i)"
)

def _dbl(x: float) -> str:
    """Render a Python double so DuckDB parses it directly as DOUBLE (a bare
    many-digit literal becomes DECIMAL, whose double conversion is not
    guaranteed correctly-rounded)."""
    s = repr(float(x))
    return s if "e" in s else s + "e0"


def _jpeg_features_sql() -> str:
    """Expected decoded-pixel means WITHOUT decoding: generative block
    colors -> BT.601 forward rounding -> inverse rounding, floor(x+0.5)
    clamp on both steps — the identical constants (operators/jpeg.py YCC)
    and association order as the codec, so doubles match bit-for-bit."""
    from giranking_spark.operators.jpeg import YCC

    c = {k: _dbl(v) for k, v in YCC.items()}
    clamp = "least(greatest(floor({x} + 0.5), 0), 255)"
    y = clamp.format(x=f"(({c['yr']} * r + {c['yg']} * g) + {c['yb']} * b)")
    cb = clamp.format(
        x=f"((({c['cbr']} * r + {c['cbg']} * g) + {c['cbb']} * b) + 128.0)"
    )
    cr = clamp.format(
        x=f"((({c['crr']} * r + {c['crg']} * g) + {c['crb']} * b) + 128.0)"
    )
    dr = clamp.format(x=f"(y + {c['rcr']} * (cr - 128.0))")
    dg = clamp.format(
        x=f"((y + {c['gcb']} * (cb - 128.0)) + {c['gcr']} * (cr - 128.0))"
    )
    db = clamp.format(x=f"(y + {c['bcb']} * (cb - 128.0))")
    return (
        "WITH dims AS (SELECT doc_id AS asset_id, 1 + doc_id % 3 AS nbx, "
        "1 + doc_id % 2 AS nby FROM documents), "
        "blk AS (SELECT asset_id, nbx, nby, "
        "(asset_id * 7 + t.k * 13) % 256 AS r, "
        "(asset_id * 11 + t.k * 17) % 256 AS g, "
        "(asset_id * 13 + t.k * 19) % 256 AS b "
        "FROM dims, unnest(generate_series(0, nbx * nby - 1)) AS t(k)), "
        f"ycc AS (SELECT asset_id, nbx, nby, {y} AS y, {cb} AS cb, {cr} AS cr "
        "FROM blk), "
        f"dec AS (SELECT asset_id, nbx, nby, {dr}::BIGINT AS dr, "
        f"{dg}::BIGINT AS dg, {db}::BIGINT AS db FROM ycc) "
        "SELECT asset_id, (8 * nbx)::BIGINT AS width, "
        "(8 * nby)::BIGINT AS height, "
        "round(sum(dr)::DOUBLE / (nbx * nby), 6) AS mean_r, "
        "round(sum(dg)::DOUBLE / (nbx * nby), 6) AS mean_g, "
        "round(sum(db)::DOUBLE / (nbx * nby), 6) AS mean_b "
        "FROM dec GROUP BY asset_id, nbx, nby"
    )


ORACLES = {
    "mm_jpeg_features": _jpeg_features_sql(),
    # TIFF is lossless: the oracle is the generative formula verbatim
    "mm_tiff_features": (
        "WITH dims AS (SELECT doc_id AS asset_id, 6 + doc_id % 5 AS w, "
        "4 + doc_id % 4 AS h FROM documents), "
        "px AS (SELECT asset_id, w, h, i, (asset_id * 17 + i * 5) % 256 AS v "
        "FROM dims, unnest(generate_series(0, w * h * 3 - 1)) AS t(i)) "
        "SELECT asset_id, w AS width, h AS height, "
        "round(avg(CASE WHEN i % 3 = 0 THEN v END), 6) AS mean_r, "
        "round(avg(CASE WHEN i % 3 = 1 THEN v END), 6) AS mean_g, "
        "round(avg(CASE WHEN i % 3 = 2 THEN v END), 6) AS mean_b "
        "FROM px GROUP BY asset_id, w, h"
    ),
    # GIF is lossless over its palette: index j = (id + p*3) % 16 resolves
    # to the palette formula directly — certifies LZW + palette end to end
    "mm_gif_features": (
        "WITH dims AS (SELECT doc_id AS asset_id, 5 + doc_id % 6 AS w, "
        "4 + doc_id % 5 AS h FROM documents), "
        "px AS (SELECT asset_id, w, h, "
        f"(asset_id + t.p * 3) % {GIF_COLORS} AS j "
        "FROM dims, unnest(generate_series(0, w * h - 1)) AS t(p)) "
        "SELECT asset_id, w AS width, h AS height, "
        "round(avg((asset_id * 5 + j * 7) % 256), 6) AS mean_r, "
        "round(avg((asset_id * 3 + j * 11) % 256), 6) AS mean_g, "
        "round(avg((asset_id * 7 + j * 13) % 256), 6) AS mean_b "
        "FROM px GROUP BY asset_id, w, h"
    ),
    # PNG is lossless: expected stats come straight from the generative
    # formula — a match certifies inflate + all five filter reconstructions
    "mm_png_features": (
        "WITH dims AS (SELECT doc_id AS asset_id, 4 + doc_id % 6 AS w, "
        "3 + doc_id % 5 AS h FROM documents), "
        "px AS (SELECT asset_id, w, h, i, (asset_id * 11 + i * 3) % 256 AS v "
        "FROM dims, unnest(generate_series(0, w * h * 3 - 1)) AS t(i)) "
        "SELECT asset_id, w AS width, h AS height, "
        "round(avg(CASE WHEN i % 3 = 0 THEN v END), 6) AS mean_r, "
        "round(avg(CASE WHEN i % 3 = 1 THEN v END), 6) AS mean_g, "
        "round(avg(CASE WHEN i % 3 = 2 THEN v END), 6) AS mean_b "
        "FROM px GROUP BY asset_id, w, h"
    ),
    # fingerprint bits re-derived from the WAV generative formula (integer
    # throughout); brute-force all-pairs proves the banded join's recall
    "mm_audio_fp_pairs": (
        f"WITH p AS (SELECT doc_id AS id, doc_id % {MM_BASES} AS b, "
        f"doc_id // {MM_BASES} AS pert FROM documents), "
        "d AS (SELECT id, b, pert, 200 + b % 100 AS n FROM p), "
        "sm AS (SELECT id, n, i, "
        f"(((b * 13 + i * 31 + CASE WHEN i = 0 THEN pert ELSE 0 END) "
        f"* {AFP_MULT}) % 65536) - 32768 AS v "
        "FROM d, unnest(generate_series(0, n - 1)) AS t(i)), "
        f"fr AS (SELECT id, (i * {AFP_FRAMES}) // n AS f, sum(v * v) AS e "
        f"FROM sm GROUP BY id, (i * {AFP_FRAMES}) // n), "
        "bits AS (SELECT lo.id, "
        "sum(CASE WHEN hi.e > lo.e THEN (1::BIGINT << lo.f) ELSE 0 END)::BIGINT "
        "AS afp FROM fr lo JOIN fr hi ON lo.id = hi.id AND hi.f = lo.f + 1 "
        "GROUP BY lo.id) "
        "SELECT a.id AS id_a, b.id AS id_b, "
        "CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming "
        "FROM bits a JOIN bits b ON a.id < b.id "
        f"WHERE bit_count(xor(a.afp, b.afp)) <= {AFP_MAX_HAMMING}"
    ),
    # WebP (VP8L) is lossless: the oracle is the generative formula
    # verbatim — certifies the whole RIFF + prefix-decode chain
    "mm_webp_features": (
        "WITH dims AS (SELECT doc_id AS asset_id, 3 + doc_id % 6 AS w, "
        "2 + doc_id % 5 AS h FROM documents), "
        "px AS (SELECT asset_id, w, h, i, (asset_id * 13 + i * 7) % 256 AS v "
        "FROM dims, unnest(generate_series(0, w * h * 3 - 1)) AS t(i)) "
        "SELECT asset_id, w AS width, h AS height, "
        "round(avg(CASE WHEN i % 3 = 0 THEN v END), 6) AS mean_r, "
        "round(avg(CASE WHEN i % 3 = 1 THEN v END), 6) AS mean_g, "
        "round(avg(CASE WHEN i % 3 = 2 THEN v END), 6) AS mean_b "
        "FROM px GROUP BY asset_id, w, h"
    ),
    # every hash bit re-derived from the generative formula (no decoding);
    # brute-force all-pairs proves the banded join's exact recall
    "mm_phash_pairs": (
        f"WITH p AS (SELECT doc_id AS id, doc_id % {MM_BASES} AS b, "
        f"doc_id // {MM_BASES} AS pert FROM documents), "
        "d AS (SELECT id, b, pert, 4 + b % 5 AS w, 3 + b % 4 AS h FROM p), "
        f"px AS (SELECT id, gy.i AS gy, gx.i AS gx, "
        f"(b * 97 + {_AHASH_BYTE} * ((b * 53) % 101 + 3) + "
        f"CASE WHEN {_AHASH_BYTE} = 0 THEN pert ELSE 0 END) % 256 AS v "
        f"FROM d, unnest(generate_series(0, {AHASH_GRID - 1})) AS gy(i), "
        f"unnest(generate_series(0, {AHASH_GRID - 1})) AS gx(i), "
        "unnest(generate_series(0, 2)) AS c(i)), "
        "g AS (SELECT id, gy, gx, sum(v) AS gray FROM px GROUP BY id, gy, gx), "
        "t AS (SELECT id, sum(gray) AS total FROM g GROUP BY id), "
        "bits AS (SELECT g.id, sum(CASE WHEN gray * "
        f"{AHASH_GRID * AHASH_GRID} > total "
        f"THEN (1::BIGINT << (gy * {AHASH_GRID} + gx)) ELSE 0 END)::BIGINT "
        "AS ahash FROM g JOIN t ON g.id = t.id GROUP BY g.id) "
        "SELECT a.id AS id_a, b.id AS id_b, "
        "CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming "
        "FROM bits a JOIN bits b ON a.id < b.id "
        f"WHERE bit_count(xor(a.ahash, b.ahash)) <= {AHASH_MAX_HAMMING}"
    ),
    # expected pixel stats derived from the GENERATIVE formula — the oracle
    # never decodes, so a match certifies the PPM parse + raster math
    "mm_features": (
        "WITH dims AS (SELECT doc_id AS asset_id, 4 + doc_id % 5 AS w, "
        "3 + doc_id % 4 AS h FROM documents), "
        "px AS (SELECT asset_id, w, h, i, (asset_id * 7 + i) % 256 AS v "
        "FROM dims, unnest(generate_series(0, w * h * 3 - 1)) AS t(i)) "
        "SELECT asset_id, w AS width, h AS height, "
        "round(avg(CASE WHEN i % 3 = 0 THEN v END), 6) AS mean_r, "
        "round(avg(CASE WHEN i % 3 = 1 THEN v END), 6) AS mean_g, "
        "round(avg(CASE WHEN i % 3 = 2 THEN v END), 6) AS mean_b "
        "FROM px GROUP BY asset_id, w, h"
    ),
    "mm_resize": (
        "WITH dims AS (SELECT doc_id AS asset_id, 4 + doc_id % 5 AS w, "
        "3 + doc_id % 4 AS h FROM documents), "
        "px AS (SELECT asset_id, w, h, c.i AS c, "
        "(asset_id * 7 + (((y2.i * h) // 2) * w + ((x2.i * w) // 3)) * 3 + c.i) % 256 AS v "
        "FROM dims, unnest(generate_series(0, 1)) AS y2(i), "
        "unnest(generate_series(0, 2)) AS x2(i), "
        "unnest(generate_series(0, 2)) AS c(i)) "
        "SELECT asset_id, w AS width, h AS height, 3::BIGINT AS out_w, 2::BIGINT AS out_h, "
        "round(avg(CASE WHEN c = 0 THEN v END), 6) AS mean_r, "
        "round(avg(CASE WHEN c = 1 THEN v END), 6) AS mean_g, "
        "round(avg(CASE WHEN c = 2 THEN v END), 6) AS mean_b "
        "FROM px GROUP BY asset_id, w, h"
    ),
    "mm_audio_features": (
        "WITH dims AS (SELECT doc_id AS asset_id, 50 + doc_id % 50 AS n FROM documents), "
        "sm AS (SELECT asset_id, n, i, "
        "((asset_id * 13 + i * 31) % 65536) - 32768 AS v, "
        "((asset_id * 13 + (i - 1) * 31) % 65536) - 32768 AS pv "
        "FROM dims, unnest(generate_series(0, n - 1)) AS t(i)) "
        "SELECT asset_id, 8000::BIGINT AS sample_rate, n AS n_samples, "
        "round(n / 8000.0, 6) AS duration_s, "
        "round(sqrt(sum(v * v)::DOUBLE / n), 6) AS rms, "
        "CAST(count(CASE WHEN i >= 1 AND v * pv < 0 THEN 1 END) AS BIGINT) "
        "AS zero_crossings "
        "FROM sm GROUP BY asset_id, n"
    ),
    "mm_video_frames": (
        "WITH dims AS (SELECT doc_id AS asset_id, 3 + doc_id % 3 AS w, "
        "2 + doc_id % 2 AS h, 2 + doc_id % 3 AS nf FROM documents), "
        "px AS (SELECT asset_id, w, h, f.i AS frame_idx, t.i AS i, "
        "(asset_id * 7 + f.i * 101 + t.i) % 256 AS v "
        "FROM dims, unnest(generate_series(0, nf - 1)) AS f(i), "
        "unnest(generate_series(0, w * h * 3 - 1)) AS t(i)) "
        "SELECT asset_id, frame_idx, w AS width, h AS height, "
        "round(avg(CASE WHEN i % 3 = 0 THEN v END), 6) AS mean_r, "
        "round(avg(CASE WHEN i % 3 = 1 THEN v END), 6) AS mean_g, "
        "round(avg(CASE WHEN i % 3 = 2 THEN v END), 6) AS mean_b "
        "FROM px GROUP BY asset_id, frame_idx, w, h"
    ),
    "mm_byte_features": (
        f"WITH s AS (SELECT doc_id, {_ASCII_SQL} AS a FROM documents), "
        f"b AS (SELECT doc_id, (i - 1) % {FEATURE_DIM} AS bucket, "
        "ascii(substr(a, i, 1)) AS v "
        "FROM s, unnest(generate_series(1, length(a))) AS t(i)), "
        "agg AS (SELECT doc_id, bucket, sum(v) AS sv FROM b GROUP BY 1, 2), "
        "tot AS (SELECT doc_id, greatest(sum(sv), 1) AS total FROM agg GROUP BY 1), "
        f"grid AS (SELECT doc_id, gs.bucket FROM s, "
        f"unnest(generate_series(0, {FEATURE_DIM - 1})) AS gs(bucket)) "
        "SELECT g.doc_id AS asset_id, g.bucket, "
        "round(coalesce(sv, 0) / coalesce(total, 1), 6) AS feat "
        "FROM grid g LEFT JOIN agg ON g.doc_id = agg.doc_id AND g.bucket = agg.bucket "
        "LEFT JOIN tot ON g.doc_id = tot.doc_id"
    ),
    "mm_frames": (
        f"WITH s AS (SELECT doc_id, {_ASCII_SQL} AS a FROM documents), "
        "b AS (SELECT doc_id, "
        f"((i - 1) // {FRAME_BYTES}) * {FRAME_BYTES} AS frame_offset, "
        "ascii(substr(a, i, 1)) AS v "
        "FROM s, unnest(generate_series(1, length(a))) AS t(i)) "
        "SELECT doc_id AS asset_id, frame_offset, "
        "CAST(sum(v) % 997 AS BIGINT) AS frame_sig "
        "FROM b GROUP BY 1, 2 "
        "UNION ALL "
        "SELECT doc_id, 0, 0 FROM s WHERE length(a) = 0"
    ),
}


# ---------------------------------------------------------------------------
# EXIF metadata extraction (TIFF-structured APP1 inside JPEG)


def _synth_exif_jpeg_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JPEG fixture of _synth_jpeg_assets with a deterministic EXIF
    APP1 spliced after SOI — every field a closed-form function of the
    asset id, so the oracle can predict the parse without touching bytes:
    make 'Maker'||id%5, model 'Model'||id%7, orientation 1+id%8,
    datetime 2024:01:<1+id%28> 12:<id%60>:00, pixel dims = the encoded
    image's true dims (8*(1+id%3) x 8*(1+id%2)), iso 100*(1+id%16)."""
    import numpy as np

    from giranking_spark.operators.exif import encode_exif_app1, splice_app1
    from giranking_spark.operators.jpeg import encode_jpeg

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ones = np.ones(64, dtype=np.int64)
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                nbx, nby = 1 + a % 3, 1 + a % 2
                img = np.full((8 * nby, 8 * nbx, 3), a % 256, dtype=np.uint8)
                app1 = encode_exif_app1(
                    make=f"Maker{a % 5}",
                    model=f"Model{a % 7}",
                    orientation=1 + a % 8,
                    datetime=f"2024:01:{1 + a % 28:02d} 12:{a % 60:02d}:00",
                    pixel_x=8 * nbx,
                    pixel_y=8 * nby,
                    iso=100 * (1 + a % 16),
                )
                payloads.append(splice_app1(encode_jpeg(img, ones, ones), app1))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="image/jpeg")


def q_mm_exif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL EXIF extraction: JPEG marker walk to the Exif APP1 + byte-order
    -aware IFD walk (IFD0 + Exif sub-IFD) in one Arrow mapInPandas pass —
    the crawl-side image-metadata step (camera, orientation, capture time,
    dimensions, ISO). The oracle predicts every field from the generative
    formula, certifying write→splice→walk→decode end to end."""
    from giranking_spark.operators.exif import parse_exif

    assets = _synth_exif_jpeg_assets(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("asset_id", "make", "model", "orientation", "datetime",
                "pixel_x", "pixel_y", "iso")
        for pdf in batches:
            out = {k: [] for k in cols}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                meta = parse_exif(bytes(payload))
                out["asset_id"].append(int(asset_id))
                for k in cols[1:]:
                    out[k].append(meta[k])
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(
        run,
        "asset_id long, make string, model string, orientation long, "
        "datetime string, pixel_x long, pixel_y long, iso long",
    )


QUERIES["mm_exif_meta"] = q_mm_exif_meta
ORACLES["mm_exif_meta"] = (
    "SELECT doc_id AS asset_id, "
    "'Maker' || (doc_id % 5)::VARCHAR AS make, "
    "'Model' || (doc_id % 7)::VARCHAR AS model, "
    "(1 + doc_id % 8)::BIGINT AS orientation, "
    "'2024:01:' || lpad((1 + doc_id % 28)::VARCHAR, 2, '0') || ' 12:' || "
    "lpad((doc_id % 60)::VARCHAR, 2, '0') || ':00' AS datetime, "
    "(8 * (1 + doc_id % 3))::BIGINT AS pixel_x, "
    "(8 * (1 + doc_id % 2))::BIGINT AS pixel_y, "
    "(100 * (1 + doc_id % 16))::BIGINT AS iso "
    "FROM documents"
)


def q_mm_webp_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only WebP scan — the decode-free fast path for queries that
    need dimensions/alpha/version but not pixels: the RIFF magic, VP8L
    signature and the 32-bit packed header (14b w-1, 14b h-1, alpha hint,
    3b version, LSB-first) are unpacked with pure JVM byte arithmetic
    (substring/hex/conv on the binary column — whole-stage codegen, zero
    Python, zero decode). At 100 TB this reads 25 header bytes per asset
    instead of running a bitstream decoder; the oracle recomputes every
    field from the generative formula."""
    assets = _synth_webp_assets(spark, sf_dir)

    def b(i: int):  # payload byte at 0-based offset i, as int
        return F.conv(
            F.hex(F.expr(f"substring(payload, {i + 1}, 1)")), 16, 10
        ).cast("int")

    hdr_ok = (
        (F.hex(F.expr("substring(payload, 1, 4)")) == "52494646")
        & (F.hex(F.expr("substring(payload, 9, 4)")) == "57454250")
        & (F.hex(F.expr("substring(payload, 13, 4)")) == "5650384C")
        & (b(20) == 0x2F)
    )
    width = F.lit(1) + b(21) + (b(22) % 64) * 256
    height = (
        F.lit(1) + (b(22) / 64).cast("int") + b(23) * 4 + (b(24) % 16) * 1024
    )
    return assets.select(
        "asset_id",
        hdr_ok.alias("header_ok"),
        width.cast("long").alias("width"),
        height.cast("long").alias("height"),
        (((b(24) / 16).cast("int") % 2) == 1).alias("has_alpha"),
        (b(24) / 32).cast("long").alias("version"),
    )


QUERIES["mm_webp_meta"] = q_mm_webp_meta
ORACLES["mm_webp_meta"] = (
    "SELECT doc_id AS asset_id, TRUE AS header_ok, "
    "(3 + doc_id % 6)::BIGINT AS width, (2 + doc_id % 5)::BIGINT AS height, "
    "FALSE AS has_alpha, 0::BIGINT AS version FROM documents"
)


def q_mm_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level per-channel intensity histogram from REAL PNG decode
    (chunk walk + inflate + filter reconstruction), the standard image-QC
    readout (exposure/clipping screens before multimodal training): per
    (channel, bin), total pixel count and how many assets populate the
    bin. Exact integers end to end; the oracle regenerates every pixel
    from the generative formula and must agree exactly."""
    from giranking_spark.operators.multimodal import image_histograms

    h = image_histograms(_synth_png_assets(spark, sf_dir), bins=8)
    return h.groupBy(
        F.col("channel").cast("long").alias("channel"),
        F.col("bin").cast("long").alias("bin"),
    ).agg(
        F.sum("cnt").cast("long").alias("n_px"),
        F.countDistinct("asset_id").cast("long").alias("n_assets"),
    )


QUERIES["mm_image_histogram"] = q_mm_image_histogram
ORACLES["mm_image_histogram"] = (
    "WITH dims AS (SELECT doc_id AS asset_id, 4 + doc_id % 6 AS w, "
    "3 + doc_id % 5 AS h FROM documents), "
    "px AS (SELECT asset_id, i % 3 AS channel, "
    "((asset_id * 11 + i * 3) % 256) // 32 AS bin "
    "FROM dims, unnest(generate_series(0, w * h * 3 - 1)) AS t(i)) "
    "SELECT channel::BIGINT AS channel, bin::BIGINT AS bin, "
    "count(*)::BIGINT AS n_px, "
    "count(DISTINCT asset_id)::BIGINT AS n_assets "
    "FROM px GROUP BY 1, 2"
)


def q_mm_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only WAV scan — the audio twin of q_mm_webp_meta: RIFF
    magic + the canonical 44-byte fmt/data header unpacked with pure JVM
    byte arithmetic (channels, sample rate, bit depth, sample count from
    the data-chunk size), zero Python and zero PCM decode. The oracle
    recomputes every field from the generative formula."""
    assets = _synth_wav_assets(spark, sf_dir)

    def b(i: int):  # payload byte at 0-based offset i, as int
        return F.conv(
            F.hex(F.expr(f"substring(payload, {i + 1}, 1)")), 16, 10
        ).cast("long")

    hdr_ok = (
        (F.hex(F.expr("substring(payload, 1, 4)")) == "52494646")
        & (F.hex(F.expr("substring(payload, 9, 8)")) == "57415645666D7420")
    )
    u16 = lambda i: b(i) + b(i + 1) * 256  # noqa: E731
    u32 = lambda i: u16(i) + u16(i + 2) * 65536  # noqa: E731
    data_size = u32(40)
    return assets.select(
        "asset_id",
        hdr_ok.alias("header_ok"),
        u16(22).alias("channels"),
        u32(24).alias("sample_rate"),
        u16(34).alias("bits"),
        (data_size / 2).cast("long").alias("n_samples"),
    )


QUERIES["mm_wav_meta"] = q_mm_wav_meta
ORACLES["mm_wav_meta"] = (
    "SELECT doc_id AS asset_id, TRUE AS header_ok, 1::BIGINT AS channels, "
    f"{WAV_RATE}::BIGINT AS sample_rate, 16::BIGINT AS bits, "
    "(50 + doc_id % 50)::BIGINT AS n_samples FROM documents"
)


def _synth_lossy_webp_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic header-grade lossy-VP8 WebP per document (the crawl
    corpus' dominant image format): every frame-header field derives from
    doc_id, so the oracles recompute each one arithmetically. The payload
    carries a real RFC 6386 frame tag + start code + bool-coded header
    partition (operators/webp.py:encode_webp_lossy_header) — no
    coefficient data (header fast-path fixtures, not displayable
    images)."""
    from giranking_spark.operators.webp import encode_webp_lossy_header

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                payloads.append(
                    encode_webp_lossy_header(
                        17 + a % 30,
                        11 + a % 23,
                        version=a % 4,
                        show_frame=1 - a % 2,
                        horiz_scale=a % 4,
                        vert_scale=(a // 4) % 4,
                        filter_type=a % 2,
                        filter_level=a % 64,
                        sharpness=a % 8,
                        log2_partitions=a % 4,
                        y_ac_qi=(a * 37) % 128,
                        y_dc_delta=(a % 31) - 15 if a % 3 == 0 else None,
                        uv_ac_delta=(a % 29) - 14 if a % 5 == 0 else None,
                        refresh_entropy_probs=a % 2,
                    )
                )
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="image/webp")


def q_mm_webp_lossy_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free lossy-VP8 WebP scan — the lossy twin of q_mm_webp_meta:
    container magic, ``VP8 `` fourcc, the 3-byte frame tag (keyframe bit,
    version, show_frame, first-partition size), keyframe start code and
    the 14-bit scale-tagged dimensions all sit at FIXED byte offsets
    (RFC 6386 §9.1), so pure JVM byte arithmetic unpacks them —
    whole-stage codegen, zero Python, zero arithmetic decode. At 100 TB a
    dims/version audit over a crawl's lossy WebPs reads 30 header bytes
    per asset. ``part_size_ok`` cross-checks the frame tag against the
    RIFF chunk length (header-only fixtures: partition == remainder)."""
    assets = _synth_lossy_webp_assets(spark, sf_dir)

    def b(i: int):  # payload byte at 0-based offset i, as int
        return F.conv(
            F.hex(F.expr(f"substring(payload, {i + 1}, 1)")), 16, 10
        ).cast("long")

    u16 = lambda i: b(i) + b(i + 1) * 256  # noqa: E731
    u32 = lambda i: u16(i) + u16(i + 2) * 65536  # noqa: E731
    hdr_ok = (
        (F.hex(F.expr("substring(payload, 1, 4)")) == "52494646")
        & (F.hex(F.expr("substring(payload, 9, 4)")) == "57454250")
        & (F.hex(F.expr("substring(payload, 13, 4)")) == "56503820")
        & (b(20) % 2 == 0)  # keyframe bit
        & (F.hex(F.expr("substring(payload, 24, 3)")) == "9D012A")
    )
    tag = b(20) + b(21) * 256 + b(22) * 65536
    wcode = u16(26)
    hcode = u16(28)
    return assets.select(
        "asset_id",
        hdr_ok.alias("header_ok"),
        ((tag / 2).cast("long") % 8).alias("version"),
        ((tag / 16).cast("long") % 2).alias("show_frame"),
        (wcode % 16384).alias("width"),
        (wcode / 16384).cast("long").alias("horiz_scale"),
        (hcode % 16384).alias("height"),
        (hcode / 16384).cast("long").alias("vert_scale"),
        ((tag / 32).cast("long") == u32(16) - 10).alias("part_size_ok"),
    )


QUERIES["mm_webp_lossy_meta"] = q_mm_webp_lossy_meta
ORACLES["mm_webp_lossy_meta"] = (
    "SELECT doc_id AS asset_id, TRUE AS header_ok, "
    "(doc_id % 4)::BIGINT AS version, "
    "(1 - doc_id % 2)::BIGINT AS show_frame, "
    "(17 + doc_id % 30)::BIGINT AS width, "
    "(doc_id % 4)::BIGINT AS horiz_scale, "
    "(11 + doc_id % 23)::BIGINT AS height, "
    "((doc_id // 4) % 4)::BIGINT AS vert_scale, "
    "TRUE AS part_size_ok FROM documents"
)


def q_mm_webp_lossy_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bool-decoded lossy-VP8 frame header (RFC 6386 §9.2-§9.6): loop
    filter type/level/sharpness, DCT partition count, and the quantizer
    indices (y_ac_qi + the five per-plane deltas) — the quality/filter
    audit a multimodal training pipeline runs before committing decode
    budget to a crawl. These fields sit behind the spec's boolean
    arithmetic coder at uniform probability, so decoding is a real
    arithmetic decode (operators/webp.py:_BoolDecoder) in ONE Arrow batch
    pass (mapInPandas); everything downstream of the ~30 decoded bytes is
    JVM-side. The oracle recomputes each field from the generative
    formula."""
    from giranking_spark.operators.webp import decode_webp_lossy_header

    assets = _synth_lossy_webp_assets(spark, sf_dir)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for a, payload in zip(pdf["asset_id"], pdf["payload"]):
                h = decode_webp_lossy_header(bytes(payload))
                rows.append(
                    (
                        int(a),
                        h["filter_type"],
                        h["filter_level"],
                        h["sharpness"],
                        h["n_dct_partitions"],
                        h["y_ac_qi"],
                        h["y_dc_delta"],
                        h["uv_ac_delta"],
                        h["refresh_entropy_probs"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "filter_type", "filter_level", "sharpness",
                    "n_dct_partitions", "y_ac_qi", "y_dc_delta",
                    "uv_ac_delta", "refresh_entropy_probs",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        parse,
        "asset_id long, filter_type long, filter_level long, sharpness long, "
        "n_dct_partitions long, y_ac_qi long, y_dc_delta long, "
        "uv_ac_delta long, refresh_entropy_probs long",
    )


QUERIES["mm_webp_lossy_header"] = q_mm_webp_lossy_header
ORACLES["mm_webp_lossy_header"] = (
    "SELECT doc_id AS asset_id, "
    "(doc_id % 2)::BIGINT AS filter_type, "
    "(doc_id % 64)::BIGINT AS filter_level, "
    "(doc_id % 8)::BIGINT AS sharpness, "
    "CAST(power(2, doc_id % 4) AS BIGINT) AS n_dct_partitions, "
    "((doc_id * 37) % 128)::BIGINT AS y_ac_qi, "
    "(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 31) - 15 ELSE 0 END)::BIGINT "
    "AS y_dc_delta, "
    "(CASE WHEN doc_id % 5 = 0 THEN (doc_id % 29) - 14 ELSE 0 END)::BIGINT "
    "AS uv_ac_delta, "
    "(doc_id % 2)::BIGINT AS refresh_entropy_probs FROM documents"
)


def _synth_avi_meta_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uncompressed AVI per document with VARIED frame rate
    (the plain _synth_avi_assets pins fps=10): w = 3 + id%3, h = 2 + id%2,
    nf = 2 + id%3 frames, fps = 5 + id%26 — every avih field derives from
    doc_id so the metadata oracle recomputes each one arithmetically."""
    from giranking_spark.operators.multimodal import encode_avi

    ids = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for a in pdf["asset_id"]:
                a = int(a)
                w, h, nf = 3 + a % 3, 2 + a % 2, 2 + a % 3
                frames = [
                    bytes((a * 7 + f * 101 + i) % 256 for i in range(w * h * 3))
                    for f in range(nf)
                ]
                payloads.append(encode_avi(w, h, frames, fps=5 + a % 26))
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "payload": payloads})

    raw = _spread(ids).mapInPandas(gen, "asset_id long, payload binary")
    return pack_assets(raw, "asset_id", F.col("payload"), mime="video/x-msvideo")


def q_mm_avi_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free AVI metadata scan — the video twin of q_mm_wav_meta:
    RIFF/'AVI '/LIST-hdrl magic plus the AVIMAINHEADER (avih) at its fixed
    container offset (frame period µs, total frames, stream count, frame
    dims, per-frame buffer size), all unpacked with pure JVM byte
    arithmetic — whole-stage codegen, zero Python, zero raster decode. At
    100 TB a fps/dims/duration audit over a video corpus reads 72 header
    bytes per asset instead of demuxing frames. The oracle recomputes
    every field (including the 4-byte-aligned DIB stride that sizes the
    frame buffer) from the generative formula."""
    assets = _synth_avi_meta_assets(spark, sf_dir)

    def b(i: int):  # payload byte at 0-based offset i, as int
        return F.conv(
            F.hex(F.expr(f"substring(payload, {i + 1}, 1)")), 16, 10
        ).cast("long")

    u16 = lambda i: b(i) + b(i + 1) * 256  # noqa: E731
    u32 = lambda i: u16(i) + u16(i + 2) * 65536  # noqa: E731
    hdr_ok = (
        (F.hex(F.expr("substring(payload, 1, 4)")) == "52494646")
        & (F.hex(F.expr("substring(payload, 9, 8)")) == "415649204C495354")
        & (F.hex(F.expr("substring(payload, 21, 8)")) == "6864726C61766968")
    )
    return assets.select(
        "asset_id",
        hdr_ok.alias("header_ok"),
        u32(32).alias("micro_per_frame"),
        u32(48).alias("total_frames"),
        u32(56).alias("n_streams"),
        u32(60).alias("buf_size"),
        u32(64).alias("width"),
        u32(68).alias("height"),
        (u32(32) * u32(48)).alias("duration_us"),
    )


QUERIES["mm_avi_meta"] = q_mm_avi_meta
ORACLES["mm_avi_meta"] = (
    "WITH p AS (SELECT doc_id AS asset_id, 3 + doc_id % 3 AS w, "
    "2 + doc_id % 2 AS h, 2 + doc_id % 3 AS nf, 5 + doc_id % 26 AS fps "
    "FROM documents) "
    "SELECT asset_id, TRUE AS header_ok, "
    "(1000000 // fps)::BIGINT AS micro_per_frame, "
    "nf::BIGINT AS total_frames, 1::BIGINT AS n_streams, "
    "(((w * 3 + 3) // 4) * 4 * h)::BIGINT AS buf_size, "
    "w::BIGINT AS width, h::BIGINT AS height, "
    "((1000000 // fps) * nf)::BIGINT AS duration_us FROM p"
)


def q_mm_format_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-format dispatch over a MIXED asset column — the first
    stage of any real multimodal ingest: doc_id rotates through four
    fixture builders (lossless WebP / lossy WebP / AVI / WAV), and pure
    JVM magic-byte tests classify each payload (RIFF fourcc at offset 8,
    then VP8L/VP8 chunk discrimination) — zero Python, zero decode, the
    routing layer that decides which decoder family a 100 TB corpus pays
    for per asset. The oracle recomputes the expected class from the
    doc_id rotation, so a misrouted magic test cannot hide."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("asset_id")
    )
    w_lossless = _synth_webp_assets(spark, sf_dir).select(
        "asset_id", "payload"
    ).join(docs.filter(F.col("asset_id") % 4 == 0), "asset_id")
    w_lossy = _synth_lossy_webp_assets(spark, sf_dir).select(
        "asset_id", "payload"
    ).join(docs.filter(F.col("asset_id") % 4 == 1), "asset_id")
    avi = _synth_avi_meta_assets(spark, sf_dir).select(
        "asset_id", "payload"
    ).join(docs.filter(F.col("asset_id") % 4 == 2), "asset_id")
    wav = _synth_wav_assets(spark, sf_dir).select(
        "asset_id", "payload"
    ).join(docs.filter(F.col("asset_id") % 4 == 3), "asset_id")
    mixed = w_lossless.unionByName(w_lossy).unionByName(avi).unionByName(wav)
    riff = F.hex(F.expr("substring(payload, 1, 4)")) == "52494646"
    kind4 = F.hex(F.expr("substring(payload, 9, 4)"))
    chunk4 = F.hex(F.expr("substring(payload, 13, 4)"))
    detected = (
        F.when(~riff, F.lit("unknown"))
        .when((kind4 == "57454250") & (chunk4 == "5650384C"), F.lit("webp-vp8l"))
        .when((kind4 == "57454250") & (chunk4 == "56503820"), F.lit("webp-vp8"))
        .when(kind4 == "41564920", F.lit("avi"))
        .when(kind4 == "57415645", F.lit("wav"))
        .otherwise(F.lit("riff-other"))
    )
    return mixed.select(
        "asset_id",
        detected.alias("detected"),
        F.length("payload").cast("long").alias("n_bytes").isNotNull().alias(
            "has_payload"
        ),
    )


QUERIES["mm_format_detect"] = q_mm_format_detect
ORACLES["mm_format_detect"] = (
    "SELECT doc_id AS asset_id, "
    "CASE doc_id % 4 WHEN 0 THEN 'webp-vp8l' WHEN 1 THEN 'webp-vp8' "
    "WHEN 2 THEN 'avi' ELSE 'wav' END AS detected, "
    "TRUE AS has_payload FROM documents"
)


def q_mm_png_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG filter-type census from a REAL chunk walk + inflate (the filter
    byte leading each decompressed scanline, PNG spec §4.5.4) — the
    compression-forensics readout that fingerprints which encoder family
    produced a corpus's assets. The fixture encoder assigns scanline y of
    asset a filter (a + y) % 5, so the oracle recomputes the census from
    that formula and any parse that misreads actual bytes cannot agree."""
    from giranking_spark.operators.multimodal import png_filter_profile

    prof = png_filter_profile(_synth_png_assets(spark, sf_dir))
    return prof.groupBy("filter_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("asset_id").cast("long").alias("n_assets"),
    )


QUERIES["mm_png_filters"] = q_mm_png_filters
ORACLES["mm_png_filters"] = (
    "WITH dims AS (SELECT doc_id AS asset_id, 3 + doc_id % 5 AS h "
    "FROM documents), "
    "rows_ AS (SELECT asset_id, (asset_id + y) % 5 AS filter_type "
    "FROM dims, unnest(generate_series(0, h - 1)) AS t(y)) "
    "SELECT filter_type::BIGINT AS filter_type, count(*)::BIGINT AS n_rows, "
    "count(DISTINCT asset_id)::BIGINT AS n_assets FROM rows_ GROUP BY 1"
)
