"""Container dispatch: one parse/decode surface over every blob format the
engine reads (mini-raster and tiled/stripped (Geo)TIFF/BigTIFF).

Every blob-touching operator routes through these two helpers, so adding a
container is a one-module change — the reference's analogous seam is the
format branch in its COG reader (`src/rasteret/fetch/cog.py:843-966`)."""

from __future__ import annotations

import numpy as np

from rasteret_spark.format import miniraster as mr
from rasteret_spark.format import tiff


def parse_any(blob) -> mr.MiniRasterMeta:
    """Parse a blob's header into the engine meta, whatever the container.

    ``blob`` may be real bytes OR any bytes-like supporting contiguous
    slicing (e.g. ``sources.fetch.RangedBlob``) — the parse then costs a
    handful of ranged reads, never a download."""
    if isinstance(blob, (bytearray, memoryview)):
        blob = bytes(blob)
    if tiff.sniff(bytes(blob[:4])) is not None:
        return tiff.to_engine_meta(
            tiff.parse_tiff(lambda off, size: bytes(blob[off : off + size]))
        )
    need = mr.header_len_from_prefix(bytes(blob[:8]))
    return mr.parse_header(bytes(blob[:need]))


def decode_full_any(blob: bytes, band: int | None = None) -> np.ndarray:
    """Whole-image decode, any container.  Chunky (interleaved) TIFFs come
    back (h, w, spp) / one channel — layouts the planar engine meta cannot
    carry but a full decode can still serve."""
    blob = bytes(blob)
    if tiff.sniff(blob[:4]) is not None:
        return tiff.decode_full(blob, band=band)
    return mr.decode_full(blob, band=band)
