"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct; all
transforms are ``mapInPandas`` stages with real Spark plumbing (schema,
batching, partition behavior).  The mini-raster decode path is REAL; codecs
that need external libraries (JPEG/PNG via PIL, audio/video) are STUBBED with
a clearly marked NotImplementedError or a deterministic fake, per the
environment constraints — swap the kernel, keep the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark.format import miniraster as mr

MEDIA_META_SCHEMA = "mime string, n_bytes bigint, kind string"


def classify_media(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Cheap magic-byte sniffing -> media metadata struct (native exprs).

    Prefixes are compared on the BINARY column directly — casting the blob
    to string first would let invalid-UTF8 payload bytes mangle the prefix
    before ``substring`` sees it."""
    return df.withColumn(
        "media_kind",
        F.when(
            F.substring(F.col(bytes_col), 1, 4) == F.lit(b"MRST"), F.lit("miniraster")
        )
        .when(F.substring(F.col(bytes_col), 1, 3) == F.lit(b"ID3"), F.lit("audio"))
        .otherwise(F.lit("unknown")),
    ).withColumn("media_bytes", F.length(F.col(bytes_col)))


def decode_resize(
    df: DataFrame, out_h: int, out_w: int, bytes_col: str = "bytes", id_col: str = "image_id"
) -> DataFrame:
    """Decode + nearest-neighbour resize to (out_h, out_w); emits the resized
    pixels as array<double> plus shape metadata.  Real for mini-raster blobs;
    other formats raise the stub error."""
    schema = f"{id_col} string, out_h int, out_w int, pixels array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                blob = bytes(blob)
                if blob[:4] != mr.MAGIC:
                    # STUB: external-codec formats (JPEG/PNG/...) need PIL —
                    # not available in this container
                    raise NotImplementedError(
                        "non-miniraster decode requires an image codec library"
                    )
                arr = mr.decode_full(blob, band=0).astype(np.float64)
                ys = (np.arange(out_h) * arr.shape[0] / out_h).astype(int)
                xs = (np.arange(out_w) * arr.shape[1] / out_w).astype(int)
                out.append(
                    {
                        id_col: rid,
                        "out_h": out_h,
                        "out_w": out_w,
                        "pixels": arr[np.ix_(ys, xs)].ravel().tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=schema)


def frame_sample(
    df: DataFrame, every_n: int = 10, bytes_col: str = "bytes", id_col: str = "image_id"
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame.

    STUB KERNEL: no video codec in this container, so frames are
    deterministic fakes (tile rows of the mini-raster stand in for frames);
    the Spark-side shape — explode-to-frames schema, per-frame ordering,
    batch iteration — is real and tested."""
    schema = f"{id_col} string, frame_no int, frame_mean double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                blob = bytes(blob)
                meta = mr.parse_header(blob[: mr.header_len_from_prefix(blob[:8])])
                n_frames = meta.tiles_y  # fake: one "frame" per tile row
                for fno in range(0, n_frames, every_n) or [0]:
                    strip = mr.read_window(
                        blob, meta, 0, fno * meta.tile_h, meta.width, meta.tile_h
                    )
                    out.append(
                        {id_col: rid, "frame_no": fno, "frame_mean": float(strip.mean())}
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=schema)
