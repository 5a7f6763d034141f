"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns + typed metadata, processed by Arrow-
batched UDFs over `mapInPandas` — the schema, partitioning, UDF signature
and batch shape are the real production design; only the codec boundary is
synthetic in this container:

- our crawl's image payloads use the deterministic stand-in codec from
  crawl/synthweb.py (decode IS implemented and exercised end-to-end);
- real-world codecs (libjpeg/PIL, ffmpeg) are gated behind import-tries and
  raise NotImplementedError with a clear message when absent.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..crawl.synthweb import average_phash, decode_image

IMAGE_STATS_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("mean_px", T.DoubleType()),
    T.StructField("std_px", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])


def decode_real_image(buf: bytes) -> np.ndarray:
    """Real-codec decode path — STUB in this container (no PIL/libjpeg).
    The engine never calls it on the synthetic corpus; swap it in for the
    stand-in decoder when the cluster image has imaging libs."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires PIL/libjpeg, absent in this "
            "container; synthetic corpus uses crawl.synthweb.decode_image"
        ) from e
    import io
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(buf)).convert("L"))


def image_stats(pages: DataFrame, bytes_col: str = "bytes",
                id_col: str = "image_id") -> DataFrame:
    """Decode + feature-extract per image: dims, pixel moments, phash.
    One Arrow batch in, one out; numpy per image inside the batch (the
    decode itself is inherently per-payload, like fetch)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, fmts, means, stds, phs = [], [], [], [], [], [], []
            for iid, buf in zip(pdf[id_col], pdf[bytes_col]):
                pix, fmt = decode_image(bytes(buf))
                ids.append(iid)
                hs.append(pix.shape[0])
                ws.append(pix.shape[1])
                fmts.append(fmt)
                means.append(float(pix.mean()))
                stds.append(float(pix.std()))
                phs.append(average_phash(pix))
            yield pd.DataFrame({
                "image_id": ids,
                "w": pd.array(ws, dtype="Int32"),
                "h": pd.array(hs, dtype="Int32"),
                "fmt": fmts,
                "mean_px": means,
                "std_px": stds,
                "phash": pd.array(phs, dtype="Int64"),
            })

    return pages.select(id_col, bytes_col).mapInPandas(
        stats, IMAGE_STATS_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("thumb", T.BinaryType()),
    T.StructField("tw", T.IntegerType()),
    T.StructField("th", T.IntegerType()),
])


def image_resize(pages: DataFrame, target: int = 8,
                 bytes_col: str = "bytes", id_col: str = "image_id") -> DataFrame:
    """Block-mean resize to target×target (the frame-sample/thumbnail shape;
    real bilinear/ffmpeg paths plug into the same batch signature)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "thumb": [], "tw": [], "th": []}
            for iid, buf in zip(pdf[id_col], pdf[bytes_col]):
                pix, _ = decode_image(bytes(buf))
                ys = np.linspace(0, pix.shape[0], target + 1).astype(int)
                xs = np.linspace(0, pix.shape[1], target + 1).astype(int)
                thumb = np.array([
                    [pix[ys[i]:max(ys[i] + 1, ys[i + 1]),
                         xs[j]:max(xs[j] + 1, xs[j + 1])].mean()
                     for j in range(target)] for i in range(target)
                ], dtype=np.uint8)
                out["image_id"].append(iid)
                out["thumb"].append(thumb.tobytes())
                out["tw"].append(target)
                out["th"].append(target)
            yield pd.DataFrame({
                "image_id": out["image_id"], "thumb": out["thumb"],
                "tw": pd.array(out["tw"], dtype="Int32"),
                "th": pd.array(out["th"], dtype="Int32")})

    return pages.select(id_col, bytes_col).mapInPandas(resize, RESIZE_SCHEMA)


def phash_hamming_neardup(pages: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate *images* by perceptual-hash Hamming distance — same
    banded-bucket shape as pipeline.dedup.simhash_neardup_pairs but over
    the crawl's phash column (input_hint schema)."""
    bands = pages.select(
        F.col("image_id"), F.col("phash"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band_no"),
                     F.shiftright("phash", i * 16).bitwiseAND(F.lit(0xFFFF))
                     .alias("bkt"))
            for i in range(4)])).alias("bb"),
    ).select("image_id", "phash", "bb.band_no", "bb.bkt").distinct()
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.bkt") == F.col("b.bkt"))
               & (F.col("a.image_id") < F.col("b.image_id")))
        .select(F.col("a.image_id").alias("img_a"),
                F.col("b.image_id").alias("img_b"),
                F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
                .alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
