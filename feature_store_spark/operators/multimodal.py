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
) -> DataFrame:
    """Build a media table with an opaque binary payload column.
    (Here the payload is synthesized from text bytes — the container
    has no real media; the column type and plan shape are the real
    thing.)"""
    return docs.select(
        F.col(id_col),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(payload_col), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """Real image decode: (width, height, format) via PIL when it is
    installed (gated like HAS_XGBOOST/HAS_GCC in scoring.py); raises
    NotImplementedError in environments without an image library."""
    if not HAS_PIL:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decoding requires PIL/cv2; this environment has "
            "neither — extract_media_meta(real_decode=False) uses the "
            "documented deterministic fake instead"
        )
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height, (im.format or "unknown").lower()


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

    ``real_decode`` defaults to ``HAS_PIL``: with PIL installed the
    batches run :func:`decode_image` on every payload; without it the
    documented deterministic fake keeps the plan testable.
    """
    if real_decode is None:
        real_decode = HAS_PIL
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
