"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns; decode/feature-extraction run
as Arrow-batched pandas UDFs over mapInPandas. PNG/JPEG/GIF HEADER decode is
REAL (stdlib ``struct`` parses of IHDR/SOFn/LSD, CRC32-verified for PNG), and
PIXEL-level decode is REAL for the two formats that need only byte
reinterpretation: 24-bit uncompressed BMP (``decode_bmp_stats`` /
``resize_bmp_nearest`` — stride/bottom-up handling, exact integer channel
aggregates, nearest-neighbor resize) and 16-bit PCM WAV
(``extract_audio_features``). Pixel decode of COMPRESSED formats
(PNG/JPEG/GIF image data) is STUBBED: a clearly marked deterministic fake
with ``real_decode=True`` raising NotImplementedError (PIL/ffmpeg not
present in this environment). The Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested throughout.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# SOFn markers that carry frame dimensions (JPEG spec B.2.2). C4/C8/CC are
# DHT/JPG/DAC — same 0xC range but NOT frame headers.
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


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


def _parse_jpeg_sof(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a JPEG SOFn frame header, else None.

    Walks the marker-segment stream from SOI: each segment is 0xFF <code>
    <len:2 incl itself> <payload>; the first SOFn payload carries
    precision(1) height(2) width(2) big-endian (JPEG spec B.2.2). Stops at
    SOS/EOI or any structural violation — a truncated or non-JPEG buffer
    falls back to the caller's fake dims rather than returning garbage."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        code = b[i + 1]
        if code == 0xD9 or code == 0xDA:  # EOI / SOS: no frame header seen
            return None
        (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
        if seg_len < 2 or i + 2 + seg_len > len(b):
            return None
        if code in _JPEG_SOF_MARKERS:
            if seg_len < 7:
                return None
            height, width = struct.unpack(">HH", b[i + 5 : i + 9])
            return width, height
        i += 2 + seg_len
    return None


_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _parse_gif_lsd(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a GIF logical screen descriptor, else None.

    Validates the 6-byte version signature (GIF87a/GIF89a) and that the
    7-byte LSD is present (GIF89a spec §17-18: canvas width and height as
    little-endian u16 right after the signature). Zero dimensions are
    structurally invalid — fall back to the caller's fake dims."""
    if len(b) < 13 or b[:6] not in _GIF_SIGS:
        return None
    width, height = struct.unpack("<HH", b[6:10])
    if width == 0 or height == 0:
        return None
    return width, height


def _parse_wav(b: bytes) -> tuple[int, int, int, int, int, int] | None:
    """(channels, sample_rate, bits_per_sample, block_align, data_off,
    data_size) from a RIFF/WAVE buffer, else None.

    Walks the RIFF chunk list: validates 'RIFF'<size>'WAVE', then scans
    chunks (<id:4><size:4 LE><payload>) for 'fmt ' (PCM layout: format,
    channels, rate, byte-rate, block-align, bits — RIFF spec / WAVEFORMATEX)
    and 'data' (recording the payload offset so sample decode can slice the
    raw PCM stream). Both chunks must be present and structurally sound."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    fmt = None
    data_off = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        if i + 8 + size > len(b):
            return None
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack("<HHIIHH", b[i + 8 : i + 24])
        elif cid == b"data":
            data_off, data_size = i + 8, size
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    _, channels, sample_rate, _, block_align, bits = fmt
    if channels == 0 or block_align == 0:
        return None
    return channels, sample_rate, bits, block_align, data_off, data_size


def _parse_wav_header(b: bytes) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits_per_sample, n_samples) — the metadata
    view of _parse_wav (n_samples counts FRAMES: data size / block align)."""
    p = _parse_wav(b)
    if p is None:
        return None
    channels, sample_rate, bits, block_align, _, data_size = p
    return channels, sample_rate, bits, data_size // block_align


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

def synth_jpeg(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic minimal JPEGs (SOI + JFIF APP0 + 1-component SOF0 +
    EOI, 35 bytes) with width = 1 + 3*id % 1024, height = 1 + 5*id % 1024 —
    the SOF0 frame header is REAL (well-formed marker segments) so the
    dimension parse is exercised without an imaging library."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
            ">HH", 1, 1
        ) + b"\x00\x00"
        for pdf in batches:
            rows = []
            for mid in pdf[id_col].values:
                mid = int(mid)
                w, h = 1 + (3 * mid) % 1024, 1 + (5 * mid) % 1024
                sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
                rows.append(
                    {"media_id": mid, "payload": b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"}
                )
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, "media_id long, payload binary")


def synth_gif(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic minimal GIFs (GIF89a signature + logical screen
    descriptor + trailer, 14 bytes) with width = 1 + 11*id % 4096,
    height = 1 + 13*id % 4096 — the LSD is REAL (spec-shaped little-endian
    u16 canvas dims) so the parse path is exercised without an imaging
    library. Arrow-batched mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col].values:
                mid = int(mid)
                w, h = 1 + (11 * mid) % 4096, 1 + (13 * mid) % 4096
                payload = (
                    b"GIF89a"
                    + struct.pack("<HH", w, h)
                    + b"\x00\x00\x00"  # packed fields, bg color, aspect
                    + b"\x3b"  # trailer
                )
                rows.append({"media_id": mid, "payload": payload})
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, "media_id long, payload binary")


def synth_wav(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic minimal PCM WAVs (44-byte RIFF header + real samples)
    with channels = 1 + id % 2, sample_rate = 8000 * (1 + id % 4), 16-bit,
    n_samples = 16 + id % 241 — the RIFF/fmt/data chunk structure is REAL
    so the header walk is exercised without an audio library, and the data
    chunk carries an int16-LE sawtooth-family waveform
    (value[i] = (id*31 + i*17) % 2001 - 1000 over the flat interleaved
    stream) so SAMPLE decode (extract_audio_features) has a closed form an
    independent oracle can recompute."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col].values:
                mid = int(mid)
                channels = 1 + mid % 2
                rate = 8000 * (1 + mid % 4)
                n_samples = 16 + mid % 241
                block_align = channels * 2
                idx = np.arange(n_samples * channels, dtype=np.int64)
                data = (((mid * 31 + idx * 17) % 2001) - 1000).astype("<i2").tobytes()
                fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block_align, block_align, 16)
                body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack(
                    "<I", len(data)
                ) + data
                rows.append(
                    {"media_id": mid, "payload": b"RIFF" + struct.pack("<I", len(body)) + body}
                )
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, "media_id long, payload binary")


def _parse_bmp(b: bytes) -> tuple[int, int, int] | None:
    """(width, signed_height, pixel_data_offset) from a 24-bit uncompressed
    BMP (BITMAPINFOHEADER or later), else None.

    Validates the 'BM' magic, header size, planes==1, bpp==24, BI_RGB
    compression. Negative height means top-down row order (per the spec);
    positive means the usual bottom-up. Truncated / non-BMP buffers return
    None rather than garbage."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    (off,) = struct.unpack("<I", b[10:14])
    hsz, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", b[14:34])
    if hsz < 40 or planes != 1 or bpp != 24 or comp != 0:
        return None
    if w <= 0 or h == 0 or off < 54 or off > len(b):
        return None
    return w, h, off


def _bmp_pixels(b: bytes) -> np.ndarray | None:
    """(H, W, 3) uint8 array in TOP-DOWN row order, channels BGR as stored,
    decoded from a 24-bit uncompressed BMP — pure struct + numpy byte
    reinterpretation (stride = row bytes padded to 4, bottom-up flip when
    height > 0). None for non-BMP / truncated payloads."""
    parsed = _parse_bmp(b)
    if parsed is None:
        return None
    w, h, off = parsed
    top_down = h < 0
    hh = -h if top_down else h
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(b) < off + stride * hh:
        return None
    arr = np.frombuffer(b, dtype=np.uint8, count=stride * hh, offset=off).reshape(
        hh, stride
    )[:, :row_bytes]
    if not top_down:
        arr = arr[::-1]
    return arr.reshape(hh, w, 3)


def synth_bmp(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 24-bit uncompressed BMPs (full pixel data, bottom-up
    rows, 4-byte row padding) from integer ids — the REAL-pixel-decode test
    payload. Dimensions and per-channel gradients are closed-form in the id
    so an independent oracle can re-enumerate every pixel:

        W = 8 + id % 9          (8..16 — W*3 mod 4 varies, so padding varies)
        H = 4 + (id * 3) % 7    (4..10)
        r(x, y) = (id   + 3*x +  7*y) % 256     (x, y TOP-DOWN coordinates)
        g(x, y) = (2*id + 5*x + 11*y) % 256
        b(x, y) = (id   + x*y)        % 256

    Pixel rows are built with vectorized numpy (no per-pixel Python) and
    stored bottom-up BGR per the BMP spec, so a decoder that mishandles the
    flip or the padding fails the position-weighted oracle sums."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col].values:
                mid = int(mid)
                w = 8 + mid % 9
                h = 4 + (mid * 3) % 7
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)[:, None]
                r = ((mid + 3 * x + 7 * y) % 256).astype(np.uint8)
                g = ((2 * mid + 5 * x + 11 * y) % 256).astype(np.uint8)
                bl = ((mid + x * y) % 256).astype(np.uint8)
                bgr = np.stack(
                    [np.broadcast_to(bl, (h, w)), g, np.broadcast_to(r, (h, w))],
                    axis=-1,
                )
                row_bytes = w * 3
                pad = (-row_bytes) % 4
                padded = np.zeros((h, row_bytes + pad), dtype=np.uint8)
                padded[:, :row_bytes] = bgr.reshape(h, row_bytes)
                data = padded[::-1].tobytes()
                info = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
                )
                payload = (
                    struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
                    + info
                    + data
                )
                rows.append({"media_id": mid, "payload": payload})
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(gen, "media_id long, payload binary")


BMP_STATS_SCHEMA = (
    "media_id long, width int, height int, n_pixels long, "
    "sum_r long, sum_g long, sum_b long, wsum_r long, wsum_g long, wsum_b long"
)


def decode_bmp_stats(media: DataFrame) -> DataFrame:
    """REAL image PIXEL decode: 24-bit uncompressed BMP payload -> exact
    per-channel integer statistics via one Arrow-batched mapInPandas pass,
    numpy over the raw pixel rows — no imaging library, no per-pixel Python.

    Emits, per image: width, height, n_pixels, plain channel sums
    (sum_r/g/b) and POSITION-WEIGHTED sums wsum_c = sum over pixels of
    (y*W + x) * c with (x, y) in top-down coordinates. The weighted sums are
    the honesty device: plain sums are invariant to row order, but a decoder
    that forgets the bottom-up flip, miscomputes the 4-byte row stride, or
    swallows padding bytes breaks wsum (and padding breaks n_pixels/sums
    too). All aggregates are int64-exact, so the DuckDB oracle re-enumerates
    every pixel from the generator formula and must match bit-for-bit.
    Non-BMP / truncated payloads yield typed nulls.

    100 TB shape: per-row work is a bounded numpy reduction over one
    payload; no shuffle at all (narrow map), so the operator scales with
    scan bandwidth like any columnar projection."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                px = _bmp_pixels(bytes(payload))
                if px is None:
                    rows.append(
                        {
                            "media_id": int(mid),
                            "width": None,
                            "height": None,
                            "n_pixels": None,
                            "sum_r": None,
                            "sum_g": None,
                            "sum_b": None,
                            "wsum_r": None,
                            "wsum_g": None,
                            "wsum_b": None,
                        }
                    )
                    continue
                h, w = px.shape[0], px.shape[1]
                ch = px.astype(np.int64)
                weight = np.arange(h, dtype=np.int64)[:, None] * w + np.arange(
                    w, dtype=np.int64
                )
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "n_pixels": h * w,
                        "sum_r": int(ch[..., 2].sum()),
                        "sum_g": int(ch[..., 1].sum()),
                        "sum_b": int(ch[..., 0].sum()),
                        "wsum_r": int((weight * ch[..., 2]).sum()),
                        "wsum_g": int((weight * ch[..., 1]).sum()),
                        "wsum_b": int((weight * ch[..., 0]).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(stats, BMP_STATS_SCHEMA)


def resize_bmp_nearest(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """REAL image resize: nearest-neighbor downsample of a decoded 24-bit
    BMP to out_w x out_h, emitted as a deterministic CSV of RGB ints (the
    engine-portable array convention used by quantize_embeddings).

    Sample grid: source pixel (sx, sy) = (floor(i*W/out_w), floor(j*H/out_h))
    for output (i, j); thumb_csv concatenates r,g,b per sampled pixel in
    row-major (j, i) order. Pure numpy fancy-indexing per payload; narrow
    map, no shuffle. Non-BMP payloads yield a null thumb."""
    if out_w < 1 or out_h < 1:
        raise ValueError("output dims must be >= 1")

    def thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                px = _bmp_pixels(bytes(payload))
                if px is None:
                    rows.append({"media_id": int(mid), "thumb_csv": None})
                    continue
                h, w = px.shape[0], px.shape[1]
                xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
                ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
                samp = px[np.ix_(ys, xs)][..., ::-1]  # BGR -> RGB
                rows.append(
                    {
                        "media_id": int(mid),
                        "thumb_csv": ",".join(
                            str(int(v)) for v in samp.reshape(-1)
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(thumb, "media_id long, thumb_csv string")


MEDIA_META_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, width int, height int, format string"
)

AUDIO_META_SCHEMA = (
    "media_id long, n_bytes long, channels int, sample_rate int, "
    "bits_per_sample int, n_samples long, duration_ms double"
)


def extract_audio_meta(media: DataFrame) -> DataFrame:
    """payload binary -> audio metadata via Arrow-batched mapInPandas.

    RIFF/WAVE payloads get their REAL channel count / sample rate / bit
    depth / sample count parsed from the chunk structure with stdlib
    struct (no audio library); non-WAV payloads yield nulls for the typed
    fields. duration_ms = n_samples * 1000.0 / sample_rate (IEEE double)."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                b = bytes(payload)
                parsed = _parse_wav_header(b)
                if parsed is None:
                    rows.append(
                        {
                            "media_id": int(mid),
                            "n_bytes": len(b),
                            "channels": None,
                            "sample_rate": None,
                            "bits_per_sample": None,
                            "n_samples": None,
                            "duration_ms": None,
                        }
                    )
                else:
                    channels, rate, bits, n_samples = parsed
                    rows.append(
                        {
                            "media_id": int(mid),
                            "n_bytes": len(b),
                            "channels": channels,
                            "sample_rate": rate,
                            "bits_per_sample": bits,
                            "n_samples": n_samples,
                            "duration_ms": n_samples * 1000.0 / rate,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(meta, AUDIO_META_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, channels int, sample_rate int, n_values long, "
    "sum_sq long, peak_abs int, zero_crossings long, rms double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL PCM sample decode: binary WAV payload -> waveform features via
    one Arrow-batched mapInPandas pass, numpy over the raw int16 stream —
    no audio library, no per-sample Python.

    For 16-bit PCM RIFF/WAVE payloads the data chunk is reinterpreted as a
    flat ``<i2`` array (channel-interleaved stream, n_values = frames x
    channels) and reduced to exact integer aggregates — sum of squared
    amplitudes, peak |amplitude|, strict zero crossings (sign products < 0
    between consecutive stream values) — plus rms = sqrt(sum_sq/n_values)
    in IEEE double. Non-WAV or non-16-bit payloads yield typed nulls.

    This is the "feature-extract" stage of the multimodal pipeline
    (SURVEY-plus scope) done for real: unlike image pixel decode (PIL/ffmpeg
    absent in this env), PCM needs only byte reinterpretation, so the whole
    path — header walk, sample decode, reduction — is genuine and gated
    with a closed-form oracle over synth_wav's waveform."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                b = bytes(payload)
                parsed = _parse_wav(b)
                if parsed is None or parsed[2] != 16:
                    rows.append(
                        {
                            "media_id": int(mid),
                            "channels": None,
                            "sample_rate": None,
                            "n_values": None,
                            "sum_sq": None,
                            "peak_abs": None,
                            "zero_crossings": None,
                            "rms": None,
                        }
                    )
                    continue
                channels, rate, _bits, _ba, off, size = parsed
                s = np.frombuffer(b, dtype="<i2", count=size // 2, offset=off).astype(
                    np.int64
                )
                n = int(s.size)
                sum_sq = int((s * s).sum())
                rows.append(
                    {
                        "media_id": int(mid),
                        "channels": channels,
                        "sample_rate": rate,
                        "n_values": n,
                        "sum_sq": sum_sq,
                        "peak_abs": int(np.abs(s).max()) if n else 0,
                        "zero_crossings": int((s[:-1] * s[1:] < 0).sum()) if n > 1 else 0,
                        "rms": float(np.sqrt(sum_sq / n)) if n else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test/demo helper: (media_id, payload binary) from a text table."""
    return docs.select(
        F.col(id_col).alias("media_id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_media_meta(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """payload binary -> typed metadata via Arrow-batched mapInPandas.

    PNG payloads with a structurally valid header get their REAL
    width/height parsed from the IHDR chunk (stdlib struct + CRC check),
    JPEG payloads from the SOFn frame header (marker-segment walk), and
    GIF payloads from the logical screen descriptor — no imaging library
    in any case. Other formats fall back to the
    deterministic fake (width/height from the first two bytes of
    sha256(payload)); format comes from a magic-byte sniff either way.
    real_decode=True is the hook where PIL/ffmpeg pixel decode would go —
    those libs are not available here, so it raises for any payload whose
    header does not parse natively."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                b = bytes(payload)
                digest = hashlib.sha256(b).digest()
                if b[:4] == b"\x89PNG":
                    fmt, dims = "png", _parse_png_ihdr(b)
                elif b[:2] == b"\xff\xd8":
                    fmt, dims = "jpg", _parse_jpeg_sof(b)
                elif b[:6] in _GIF_SIGS:
                    fmt, dims = "gif", _parse_gif_lsd(b)
                else:
                    fmt, dims = "raw", None
                if dims is None:
                    if real_decode:
                        raise NotImplementedError(
                            "real pixel decode requires PIL/ffmpeg, not present "
                            "in this env (only PNG/JPEG/GIF headers parse natively)"
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
