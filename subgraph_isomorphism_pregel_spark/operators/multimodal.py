"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns; decode/feature-extraction run
as Arrow-batched pandas UDFs over mapInPandas. PNG HEADER decode is REAL:
width/height come from parsing the IHDR chunk with stdlib ``struct`` (CRC32
verified), no imaging library needed. Pixel-level decode of other formats is
STUBBED: a clearly marked deterministic fake (metadata derived from the
bytes themselves) with ``real_decode=True`` raising NotImplementedError for
non-PNG payloads (PIL/ffmpeg not present in this environment). The
Spark-side plumbing — schema, partitioning, UDF signature, batch shape — is
real and tested.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _parse_png_ihdr(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a structurally valid PNG IHDR, else None.

    Validates the 8-byte signature, the IHDR chunk length (13), type, and
    its CRC32 (over type+data, per the PNG spec) — a truncated or corrupted
    header falls back to the caller's fake dims rather than returning
    garbage."""
    if len(b) < 33 or b[:8] != _PNG_SIG:
        return None
    (length,) = struct.unpack(">I", b[8:12])
    if length != 13 or b[12:16] != b"IHDR":
        return None
    (crc,) = struct.unpack(">I", b[29:33])
    if zlib.crc32(b[12:29]) & 0xFFFFFFFF != crc:
        return None
    width, height = struct.unpack(">II", b[16:24])
    return width, height


def synth_png(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic minimal PNGs (signature + IHDR + IEND, 45 bytes) with
    width = 1 + id % 512, height = 1 + 7*id % 512 — test/demo payloads
    whose header is REAL (valid chunk CRCs) so the IHDR parse path is
    exercised without an imaging library. Arrow-batched mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col].values:
                mid = int(mid)
                ihdr_data = struct.pack(
                    ">IIBBBBB", 1 + mid % 512, 1 + (mid * 7) % 512, 8, 2, 0, 0, 0
                )
                ihdr = b"IHDR" + ihdr_data
                iend = b"IEND"
                payload = (
                    _PNG_SIG
                    + struct.pack(">I", 13) + ihdr
                    + struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
                    + struct.pack(">I", 0) + iend
                    + struct.pack(">I", zlib.crc32(iend) & 0xFFFFFFFF)
                )
                rows.append({"media_id": mid, "payload": payload})
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, "media_id long, payload binary")

MEDIA_META_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, width int, height int, format string"
)


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test/demo helper: (media_id, payload binary) from a text table."""
    return docs.select(
        F.col(id_col).alias("media_id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_media_meta(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """payload binary -> typed metadata via Arrow-batched mapInPandas.

    PNG payloads with a structurally valid header get their REAL
    width/height parsed from the IHDR chunk (stdlib struct + CRC check, no
    imaging library). Other formats fall back to the deterministic fake
    (width/height from the first two bytes of sha256(payload)); format
    comes from a magic-byte sniff either way. real_decode=True is the hook
    where PIL/ffmpeg pixel decode would go — those libs are not available
    here, so it raises for any non-PNG payload."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                b = bytes(payload)
                digest = hashlib.sha256(b).digest()
                fmt = "png" if b[:4] == b"\x89PNG" else ("jpg" if b[:2] == b"\xff\xd8" else "raw")
                dims = _parse_png_ihdr(b) if fmt == "png" else None
                if dims is None:
                    if real_decode:
                        raise NotImplementedError(
                            "real pixel decode requires PIL/ffmpeg, not present "
                            "in this env (only PNG headers parse natively)"
                        )
                    dims = (1 + digest[0], 1 + digest[1])
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(b),
                        "sha256": digest.hex(),
                        "width": dims[0],
                        "height": dims[1],
                        "format": fmt,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(meta, MEDIA_META_SCHEMA)


def frame_sample(media: DataFrame, frame_bytes: int = 64, stride: int = 2) -> DataFrame:
    """Chunk each payload into fixed-size 'frames' and keep every `stride`-th
    one — the plumbing shape of video frame sampling (explode with typed
    binary output), done JVM-side with array expressions."""
    frames = F.expr(
        f"transform(sequence(0, greatest(ceil(length(payload)/{frame_bytes})-1, 0)),"
        f" i -> struct(i as frame_no, substring(payload, i*{frame_bytes}+1, {frame_bytes}) as frame))"
    )
    return (
        media.select("media_id", F.explode(frames).alias("f"))
        .select("media_id", F.col("f.frame_no").cast("int").alias("frame_no"), F.col("f.frame"))
        .where(F.col("frame_no") % stride == 0)
    )
