"""Z85 + 64-bit RoaringBitmapArray codec for Delta deletion vectors.

Hand-built from PUBLIC specs only — no external libraries:

- Z85 text encoding (ZeroMQ spec 32, the variant the Delta protocol
  names for deletion-vector paths and inline payloads): 4 bytes ↔ 5
  chars over an 85-character alphabet, big-endian base-85.
- 32-bit Roaring bitmap "portable" serialization
  (github.com/RoaringBitmap/RoaringFormatSpec): cookie 12346
  (no run containers, followed by a u32 container count and an offset
  header) or 12347 (run containers present; container count embedded
  in the cookie, a run-flag bitset follows, offsets only when count ≥
  4); per-container descriptive header of (u16 key, u16 card-1);
  array containers (≤4096 sorted u16s), bitmap containers (8 KiB
  bitset), run containers (u16 n_runs then (start, len-1) pairs).
- The 64-bit RoaringBitmapArray "portable" wrapper used by Delta
  (delta.io PROTOCOL.md §Deletion Vector Format): magic 1681511377
  (u32 LE), u64 LE bitmap count, then that many standard 32-bit
  bitmaps back-to-back — the index of each is the high-32 key.
- The deletion-vector .bin file layout (same spec section): 1-byte
  format version (1); each DV at its descriptor offset as
  <u32 BE dataSize><dataSize bytes of bitmap><u32 BE CRC-32 of them>.

The reference snapshot has NO deletion-vector read path (its Delta
reader refuses such tables), so this module is a capability superset;
it exists because real Delta tables increasingly carry DVs.

Everything here is driver/executor-agnostic pure bytes→ints logic; the
distributed application lives in sources/datalake.read_delta.
"""
from __future__ import annotations

import struct
import zlib

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: every 4 bytes → 5 chars. Inputs that aren't a
    multiple of 4 are zero-padded (the Delta Base85Codec convention —
    the descriptor's sizeInBytes recovers the true length on decode)."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, length: int | None = None) -> bytes:
    """Inverse of :func:`z85_encode` (input length % 5 == 0);
    `length` truncates zero padding added on encode."""
    if len(text) % 5:
        raise ValueError("Z85 input length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i:i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}")
        out += v.to_bytes(4, "big")
    return bytes(out if length is None else out[:length])


_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096
_MAGIC_PORTABLE = 1681511377


def _deserialize_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard 32-bit roaring bitmap at buf[pos:] → (sorted
    values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        n_flag_bytes = (n + 7) // 8
        run_flags = buf[pos:pos + n_flag_bytes]
        pos += n_flag_bytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
    else:
        raise ValueError(f"bad roaring cookie {cookie}")

    keys_cards = []
    for _ in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))

    has_run = (cookie & 0xFFFF) == _SERIAL_COOKIE
    if not has_run or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offset header (read sequentially instead)

    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = has_run and bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, len_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                # stored length = run end minus start: (5,3) → 5,6,7,8
                values.extend(range(base + start, base + start + len_m1 + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            bits = buf[pos:pos + 8192]
            pos += 8192
            for word_i in range(1024):
                (w,) = struct.unpack_from("<Q", bits, word_i * 8)
                while w:
                    b = w & -w
                    values.append(base + word_i * 64 + b.bit_length() - 1)
                    w ^= b
    return values, pos


def _serialize_rb32(values: list[int]) -> bytes:
    """Standard 32-bit portable serialization (no run containers —
    cookie 12346), for fixtures and round-trip tests."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    n = len(by_key)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", key, len(vals) - 1)
        for key, vals in sorted(by_key.items()))
    bodies = []
    for _key, vals in sorted(by_key.items()):
        if len(vals) <= _ARRAY_MAX:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            bodies.append(bytes(bits))
    offsets = []
    off = len(head) + len(desc) + 4 * n
    for b in bodies:
        offsets.append(off)
        off += len(b)
    return head + desc + struct.pack(f"<{n}I", *offsets) + b"".join(bodies)


def rbm_array_deserialize(buf: bytes) -> list[int]:
    """Delta's 64-bit RoaringBitmapArray portable format → sorted
    int64 positions."""
    (magic,) = struct.unpack_from("<I", buf, 0)
    if magic != _MAGIC_PORTABLE:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", buf, 4)
    pos = 12
    out: list[int] = []
    for high in range(n_bitmaps):
        vals, pos = _deserialize_rb32(buf, pos)
        out.extend((high << 32) | v for v in vals)
    return out


def rbm_array_serialize(positions: list[int]) -> bytes:
    """Inverse of :func:`rbm_array_deserialize` (fixture writer)."""
    by_high: dict[int, list[int]] = {}
    for p in sorted(positions):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n = (max(by_high) + 1) if by_high else 0
    parts = [struct.pack("<Iq", _MAGIC_PORTABLE, n)]
    for high in range(n):
        parts.append(_serialize_rb32(by_high.get(high, [])))
    return b"".join(parts)


def dv_file_blob(payloads: list[bytes]) -> tuple[bytes, list[int]]:
    """Assemble a deletion-vector .bin file (format version 1) from
    serialized bitmaps; returns (blob, per-payload offsets)."""
    blob = bytearray(b"\x01")
    offsets = []
    for data in payloads:
        offsets.append(len(blob))
        blob += struct.pack(">i", len(data))
        blob += data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return bytes(blob), offsets


def dv_read_at(blob: bytes, offset: int) -> list[int]:
    """Read one DV from a .bin blob at `offset` (dataSize framing +
    CRC-32 verification), returning deleted row positions."""
    if not blob or blob[0] != 1:
        raise ValueError("unsupported deletion-vector file version")
    (size,) = struct.unpack_from(">i", blob, offset)
    data = blob[offset + 4:offset + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, offset + 4 + size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("deletion-vector checksum mismatch")
    return rbm_array_deserialize(data)
