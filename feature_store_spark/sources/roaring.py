"""RoaringBitmap (de)serialization + Delta Lake deletion-vector
framing — pure Python, built from the PUBLIC specs only:

- the Roaring interchange format ("RoaringFormatSpec",
  https://github.com/RoaringBitmap/RoaringFormatSpec): cookie header,
  descriptive header, optional offset header, then array / bitmap /
  run containers, all little-endian;
- Delta Lake's 64-bit "RoaringBitmapArray" portable serialization and
  deletion-vector file layout (PROTOCOL.md "Deletion Vectors"):
  ``<magic 1681511377 LE> <n bitmaps i64 LE> (<key i32 LE>
  <32-bit roaring>)*`` framed in ``.bin`` files as
  ``<version byte 1> ... <dataSize i32 BE> <data> <crc32 i32 BE>``,
  plus the Z85 text encoding used for inline DVs and DV-file UUIDs.

Scale note: deletion vectors are METADATA (per-file row ordinals, KBs
to a few MBs for realistic delete ratios); decoding them on the
driver and shipping the positions through a broadcast anti-join is
the same physics as Iceberg positional deletes. The engine never
materializes a bitmap per ROW — one bitmap per data file.

Reader supports all three container types and both cookie layouts;
the writer emits the no-run layout (array/bitmap containers), which
every Roaring implementation accepts.
"""

from __future__ import annotations

import struct
import zlib

SERIAL_COOKIE = 12346  # with run containers
SERIAL_COOKIE_NO_RUN = 12347
NO_OFFSET_THRESHOLD = 4
DV_MAGIC = 1681511377

# ---------------------------------------------------------------- Z85

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: 4 bytes -> 5 chars, big-endian base-85."""
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            d = _Z85_DECODE.get(c)
            if d is None:
                # a corrupted deletionVector descriptor surfaces here
                # at scan time — name the failure instead of a bare
                # KeyError from deep inside the codec (review r10h)
                raise ValueError(
                    f"z85: invalid character {c!r} in encoded input"
                )
            v = v * 85 + d
        if v >= 1 << 32:
            raise ValueError(
                "z85: non-canonical 5-char group (decodes above 2^32)"
            )
        out += v.to_bytes(4, "big")
    return bytes(out)


def _parse_roaring_header(
    buf: bytes, pos: int, unpack=struct.unpack_from
) -> tuple[int, bytes, bool, int]:
    """(n_containers, run_flags, has_offsets, next_pos) — the ONE
    cookie/header rule shared by both decoder twins. The cookie reads
    UNSIGNED (review r10h: ``'<i'`` made ``cookie >> 16`` negative at
    >= 32769 containers, so the run-format decoder silently returned
    ZERO values — a deletion vector that size would have resurrected
    every deleted row)."""
    (cookie,) = unpack("<I", buf, pos)
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = ((cookie >> 16) & 0xFFFF) + 1
        pos += 4
        nbitset = (n + 7) // 8
        run_flags = buf[pos : pos + nbitset]
        pos += nbitset
        has_offsets = n >= NO_OFFSET_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (n,) = unpack("<I", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    return n, run_flags, has_offsets, pos


# ------------------------------------------- 32-bit roaring bitmaps


def serialize_roaring32(values: list[int]) -> bytes:
    """Serialize sorted-or-not u32 values as one standard 32-bit
    RoaringBitmap (no-run layout: array containers <= 4096 entries,
    bitmap containers above)."""
    containers: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if not 0 <= v < (1 << 32):
            raise ValueError(f"u32 out of range: {v}")
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<ii", SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (always present in the no-run layout)
    off = len(out) + 4 * len(keys)
    offsets = []
    for k in keys:
        offsets.append(off)
        n = len(containers[k])
        off += 2 * n if n <= 4096 else 8192
    for o in offsets:
        out += struct.pack("<I", o)
    for k in keys:
        lows = containers[k]
        if len(lows) <= 4096:
            out += struct.pack(f"<{len(lows)}H", *lows)
        else:
            bits = bytearray(8192)
            for low in lows:
                bits[low >> 3] |= 1 << (low & 7)
            out += bits
    return bytes(out)


def deserialize_roaring32(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Parse one 32-bit RoaringBitmap at ``pos``; returns (sorted
    values, next position). Handles both cookies and all three
    container types."""
    n, run_flags, has_offsets, pos = _parse_roaring_header(buf, pos)
    keys, cards = [], []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c + 1)
    if has_offsets:
        pos += 4 * n  # containers follow in order; offsets redundant
    values: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        card = cards[i]
        if run_flags[i >> 3] & (1 << (i & 7)):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + length + 1))
        elif card <= 4096:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + low for low in lows)
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(bits):
                if byte:
                    for bit in range(8):
                        if byte & (1 << bit):
                            values.append(base + (byte_i << 3) + bit)
    return values, pos


# ----------------------------- Delta's 64-bit RoaringBitmapArray


def serialize_rbm_array(values: list[int]) -> bytes:
    """Delta's portable RoaringBitmapArray (64-bit values as
    (high-32 key, 32-bit bitmap) pairs), WITH the leading magic."""
    by_high: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if v < 0:
            raise ValueError(f"negative position: {v}")
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray()
    out += struct.pack("<i", DV_MAGIC)
    out += struct.pack("<q", len(by_high))
    for high in sorted(by_high):
        out += struct.pack("<i", high)
        out += serialize_roaring32(by_high[high])
    return bytes(out)


def _parse_rbm_preamble(data: bytes, pos: int = 0) -> tuple[int, int]:
    """(n_keys, next_pos): optional DV magic + count, the shared
    preamble of both rbm-array decoder twins."""
    if len(data) >= pos + 4:
        (magic,) = struct.unpack_from("<i", data, pos)
        if magic == DV_MAGIC:
            pos += 4
    (n,) = struct.unpack_from("<q", data, pos)
    return n, pos + 8


def deserialize_rbm_array(data: bytes) -> list[int]:
    """Inverse of :func:`serialize_rbm_array`; tolerates input with or
    without the leading magic (inline DVs carry it)."""
    n, pos = _parse_rbm_preamble(data)
    values: list[int] = []
    for _ in range(n):
        (high,) = struct.unpack_from("<i", data, pos)
        pos += 4
        lows, pos = deserialize_roaring32(data, pos)
        base = high << 32
        values.extend(base + low for low in lows)
    return values


def deserialize_roaring32_np(buf: bytes, pos: int = 0):
    """Vectorized twin of :func:`deserialize_roaring32`: returns
    (sorted uint32 numpy array, next position). Containers decode as
    array slices / unpacked bitsets instead of per-value Python loops
    — the difference between milliseconds and seconds once deletion
    vectors reach 10⁵–10⁶ positions."""
    import numpy as np

    n, run_flags, has_offsets, pos = _parse_roaring_header(buf, pos)
    keys = np.frombuffer(buf, dtype="<u2", count=2 * n, offset=pos)
    cards = keys[1::2].astype(np.int64) + 1
    keys = keys[0::2].astype(np.int64)
    pos += 4 * n
    if has_offsets:
        pos += 4 * n
    chunks = []
    for i in range(n):
        base = keys[i] << 16
        card = int(cards[i])
        if run_flags[i >> 3] & (1 << (i & 7)):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(
                buf, dtype="<u2", count=2 * n_runs, offset=pos
            ).astype(np.int64)
            pos += 4 * n_runs
            starts, lens = runs[0::2], runs[1::2] + 1
            lows = np.concatenate(
                [np.arange(s, s + ln) for s, ln in zip(starts, lens)]
            ) if n_runs else np.empty(0, np.int64)
        elif card <= 4096:
            lows = np.frombuffer(
                buf, dtype="<u2", count=card, offset=pos
            ).astype(np.int64)
            pos += 2 * card
        else:
            bits = np.frombuffer(buf, dtype=np.uint8, count=8192,
                                 offset=pos)
            pos += 8192
            lows = np.nonzero(
                np.unpackbits(bits, bitorder="little")
            )[0].astype(np.int64)
        chunks.append(base + lows)
    if not chunks:
        return np.empty(0, np.int64), pos
    return np.concatenate(chunks), pos


def deserialize_rbm_array_np(data: bytes):
    """Vectorized twin of :func:`deserialize_rbm_array`: sorted int64
    numpy array of positions (magic tolerated, as inline DVs carry
    it)."""
    import numpy as np

    n, pos = _parse_rbm_preamble(data)
    chunks = []
    for _ in range(n):
        (high,) = struct.unpack_from("<i", data, pos)
        pos += 4
        lows, pos = deserialize_roaring32_np(data, pos)
        chunks.append((np.int64(high) << 32) + lows)
    if not chunks:
        return np.empty(0, np.int64)
    return np.concatenate(chunks)


def dv_file_path(table_root: str, descriptor: dict) -> str:
    """Resolve a deletion-vector descriptor of storageType ``u``
    (relative, Z85-encoded UUID with optional prefix) or ``p``
    (absolute) to its ``.bin`` path — the ONE implementation both the
    scan-time loader and VACUUM's referenced-set builder share, so a
    prefix/tail edge case can't diverge between 'what we read' and
    'what we keep'."""
    import os
    import uuid as _uuid

    st = descriptor["storageType"]
    if st == "u":
        enc = descriptor["pathOrInlineDv"]
        prefix, tail = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=z85_decode(tail))
        fname = f"deletion_vector_{u}.bin"
        return (
            os.path.join(table_root, prefix, fname)
            if prefix
            else os.path.join(table_root, fname)
        )
    if st == "p":
        p = descriptor["pathOrInlineDv"]
        return p[7:] if p.startswith("file://") else p
    raise NotImplementedError(f"deletionVector storageType {st!r}")


# ------------------------------------------------ DV file framing


def write_dv_file(path: str, dvs: list[list[int]]) -> list[tuple[int, int, int]]:
    """Write one deletion-vector ``.bin`` file holding ``dvs`` (one
    positions-list per data file). Returns per-DV
    ``(offset, sizeInBytes, cardinality)`` for the add actions."""
    descs = []
    with open(path, "wb") as f:
        f.write(b"\x01")  # format version
        off = 1
        for values in dvs:
            data = serialize_rbm_array(values)
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            descs.append((off, len(data), len(set(values))))
            off += 4 + len(data) + 4
    return descs


def read_dv_from_file(
    path: str, offset: int, size_in_bytes: int, as_numpy: bool = False
):
    """Read + checksum-verify one DV blob from a ``.bin`` file.
    ``as_numpy=True`` returns a sorted int64 array via the vectorized
    decoder (the scan-time path for large DVs)."""
    with open(path, "rb") as f:
        f.seek(offset)
        hdr = f.read(4)
        if len(hdr) != 4:
            raise ValueError(f"{path}@{offset}: truncated DV header")
        (sz,) = struct.unpack(">i", hdr)
        data = f.read(sz)
        crc_raw = f.read(4)
    if size_in_bytes not in (sz,):
        raise ValueError(
            f"{path}@{offset}: descriptor sizeInBytes {size_in_bytes} "
            f"!= stored dataSize {sz}"
        )
    if len(data) != sz:
        raise ValueError(
            f"{path}@{offset}: truncated DV data ({len(data)} of "
            f"{sz} bytes)"
        )
    # the CRC footer is MANDATORY in the .bin framing: a file missing
    # exactly its last 4 bytes is the corruption case the checksum
    # exists to catch, not a license to skip it (review r10h)
    if len(crc_raw) != 4:
        raise ValueError(
            f"{path}@{offset}: truncated DV checksum footer"
        )
    (crc,) = struct.unpack(">I", crc_raw)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError(f"{path}@{offset}: DV checksum mismatch")
    if as_numpy:
        return deserialize_rbm_array_np(data)
    return deserialize_rbm_array(data)
