"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct; all
transforms are ``mapInPandas`` stages with real Spark plumbing (schema,
batching, partition behavior).  Decode kernels dispatch through a
PLUGGABLE registry (``register_media_decoder``): mini-raster is builtin and
REAL; JPEG/PNG register automatically when PIL is importable (absent in
this container — declared stub), and any external codec can be injected
the same way — swap the kernel, keep the plan.  Rows with no registered
decoder become quarantine rows (status column), not task failures — the
same R12 containment policy as the raster decode kernels.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from rasteret_spark.format import container
from rasteret_spark.format import miniraster as mr
from rasteret_spark.operators.decode import _err_status

MEDIA_META_SCHEMA = "mime string, n_bytes bigint, kind string"

# blob -> 2-D float array; keyed by sniffed media kind.  The registry
# snapshot ships to executors by closure capture at plan-build time.
_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {
    "miniraster": lambda blob: mr.decode_full(blob, band=0)
}


def register_media_decoder(kind: str, fn: Callable[[bytes], np.ndarray]) -> None:
    """Inject/override the decode kernel for a sniffed media kind (e.g.
    "jpeg").  The callable must be picklable — it runs on executors."""
    _DECODERS[kind] = fn


# SINGLE source of truth for magic-byte -> media kind: both the Python
# ``sniff_kind`` (used by the decode kernels) and the native ``classify_media``
# when-chain are generated from this table, so a new kind registered here is
# seen consistently by both, and prefix edits cannot drift between them.
# Order matters: first match wins (longer/rarer prefixes first).
MEDIA_MAGIC: tuple[tuple[bytes, str], ...] = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (mr.MAGIC, "miniraster"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"ID3", "audio"),
)


def register_media_magic(prefix: bytes, kind: str) -> None:
    """Register a magic-byte prefix for a media kind — extends BOTH
    ``sniff_kind`` and future ``classify_media`` plans (existing built
    plans captured the table at build time)."""
    global MEDIA_MAGIC
    MEDIA_MAGIC = ((bytes(prefix), kind), *MEDIA_MAGIC)


def _sniff(blob: bytes, magic: tuple[tuple[bytes, str], ...]) -> str:
    for prefix, kind in magic:
        if blob[: len(prefix)] == prefix:
            return kind
    return "unknown"


def sniff_kind(blob: bytes) -> str:
    return _sniff(blob, MEDIA_MAGIC)


try:  # pragma: no cover - PIL absent in this container (declared stub)
    import io

    from PIL import Image as _PILImage

    def _pil_decode(blob: bytes) -> np.ndarray:
        return np.asarray(_PILImage.open(io.BytesIO(blob)).convert("L"), dtype=np.float64)

    _DECODERS.setdefault("jpeg", _pil_decode)
    _DECODERS.setdefault("png", _pil_decode)
except ImportError:
    pass


def classify_media(
    df: DataFrame, bytes_col: str = "bytes",
    magic: tuple[tuple[bytes, str], ...] | None = None,
) -> DataFrame:
    """Cheap magic-byte sniffing -> media metadata struct (native exprs).

    Prefixes are compared on the BINARY column directly — casting the blob
    to string first would let invalid-UTF8 payload bytes mangle the prefix
    before ``substring`` sees it.  The when-chain is GENERATED from the same
    ``MEDIA_MAGIC`` table ``sniff_kind`` consults, in the same order — the
    two classifiers cannot drift.

    ``magic`` pins an explicit prefix-table snapshot into the plan; by
    default the module table is snapshotted AT BUILD TIME (a registration
    after the plan is built never silently alters it — pass the new
    snapshot explicitly to opt in)."""
    magic = MEDIA_MAGIC if magic is None else tuple(magic)
    expr = None
    for prefix, kind in magic:
        cond = F.substring(F.col(bytes_col), 1, len(prefix)) == F.lit(prefix)
        expr = F.when(cond, F.lit(kind)) if expr is None else expr.when(cond, F.lit(kind))
    expr = F.lit("unknown") if expr is None else expr.otherwise(F.lit("unknown"))
    return df.withColumn("media_kind", expr).withColumn(
        "media_bytes", F.length(F.col(bytes_col))
    )


def decode_resize(
    df: DataFrame, out_h: int, out_w: int, bytes_col: str = "bytes",
    id_col: str = "image_id",
    decoders: dict[str, Callable[[bytes], np.ndarray]] | None = None,
    magic: tuple[tuple[bytes, str], ...] | None = None,
) -> DataFrame:
    """Decode + nearest-neighbour resize to (out_h, out_w); emits the resized
    pixels as array<double> plus shape metadata and a status column.  Decode
    dispatches through the registry; a kind with no registered decoder (or a
    kernel failure) yields a quarantine row — never a task failure."""
    schema = (
        f"{id_col} string, out_h int, out_w int, pixels array<double>, status string"
    )
    # explicit snapshots beat module globals: both registries are pinned
    # into the plan AT BUILD TIME (late registrations cannot retroactively
    # change a built plan; inject updated snapshots to opt in)
    decoders = dict(_DECODERS) if decoders is None else dict(decoders)
    magic = MEDIA_MAGIC if magic is None else tuple(magic)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    blob = bytes(blob)
                    kind = _sniff(blob, magic)
                    fn = decoders.get(kind)
                    if fn is None:
                        raise NotImplementedError(
                            f"no decoder registered for {kind!r} — external "
                            "formats need an image codec library (register "
                            "one via register_media_decoder)"
                        )
                    arr = np.asarray(fn(blob), dtype=np.float64)
                    ys = (np.arange(out_h) * arr.shape[0] / out_h).astype(int)
                    xs = (np.arange(out_w) * arr.shape[1] / out_w).astype(int)
                    out.append(
                        {
                            id_col: rid,
                            "out_h": out_h,
                            "out_w": out_w,
                            "pixels": arr[np.ix_(ys, xs)].ravel().tolist(),
                            "status": "ok",
                        }
                    )
                except Exception as e:  # quarantine row, not a task failure
                    out.append(
                        {
                            id_col: rid, "out_h": out_h, "out_w": out_w,
                            "pixels": None, "status": _err_status(e),
                        }
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=schema)


FEATURE_DIM = 22  # 6 z-space stats + 4x4 coarse z-mean grid


def extract_features(
    df: DataFrame, bytes_col: str = "bytes", id_col: str = "image_id",
    decoders: dict[str, Callable[[bytes], np.ndarray]] | None = None,
    magic: tuple[tuple[bytes, str], ...] | None = None,
) -> DataFrame:
    """Deterministic fixed-dim feature vector per media row — the
    feature-extract stage of a training-data pipeline (decode -> descriptor
    -> ANN/dedup over the descriptor).  Decode dispatches through the same
    pluggable registry as ``decode_resize``; failures quarantine.

    Descriptor (FEATURE_DIM=22): z-scored quantiles [p10,p25,p50,p75,p90],
    gradient energy, and a 4x4 coarse grid of z-means — every component is
    O(1) magnitude in z-space so no single term dominates the cosine, and
    raw mean/std are deliberately excluded (they'd make unrelated images
    near-parallel).  Rotation-variant by design: dedup wants exact layout
    similarity, not invariance."""
    schema = f"{id_col} string, features array<double>, status string"
    decoders = dict(_DECODERS) if decoders is None else dict(decoders)
    magic = MEDIA_MAGIC if magic is None else tuple(magic)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    blob = bytes(blob)
                    kind = _sniff(blob, magic)
                    fn = decoders.get(kind)
                    if fn is None:
                        raise NotImplementedError(
                            f"no decoder registered for {kind!r}"
                        )
                    arr = np.asarray(fn(blob), dtype=np.float64)
                    mu = float(arr.mean())
                    sd = float(arr.std()) or 1.0
                    z = (arr - mu) / sd
                    q = np.percentile(z, [10, 25, 50, 75, 90])
                    grad = float(np.abs(np.diff(z, axis=0)).mean()
                                 + np.abs(np.diff(z, axis=1)).mean())
                    h, w = arr.shape
                    ys = (np.arange(4 + 1) * h) // 4
                    xs = (np.arange(4 + 1) * w) // 4
                    # images thinner than the 4x4 grid produce empty slices;
                    # an empty mean is NaN, which would poison every cosine
                    # downstream while still reading status='ok' — use 0.0
                    # (the z-space global mean) for degenerate cells
                    cells = [
                        float(c.mean()) if c.size else 0.0
                        for i in range(4) for j in range(4)
                        for c in [z[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]]
                    ]
                    feats = [*q.tolist(), grad, *cells]
                    out.append({id_col: rid, "features": feats, "status": "ok"})
                except Exception as e:
                    out.append({id_col: rid, "features": None,
                                "status": _err_status(e)})
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
                meta = container.parse_any(blob)
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
