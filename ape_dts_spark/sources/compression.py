"""From-scratch snappy and LZ4 codecs for Kafka record-batch compression.

Kafka's record-batch v2 attribute bits name four codecs (reference:
`kafka_extractor.rs:38-86` consumes whatever the broker hands back; the
Rust client links native codec libs). This sandbox has no snappy/lz4
wheels, so — same pattern as the repo's CRC32C, zlib-framed PNG, and Avro
codecs — the block formats are implemented from their public
specifications:

- snappy block format: google/snappy `format_description.txt` (varint
  preamble + literal/copy1/copy2/copy4 tags).
- snappy-java stream framing: xerial/snappy-java `SnappyOutputStream`
  (magic ``\\x82SNAPPY\\x00`` + two big-endian version ints + chunks of
  [4-byte BE length][raw snappy block]) — this is what the Java Kafka
  producer actually emits for snappy-compressed batches.
- LZ4 block format: lz4/lz4 `lz4_Block_format.md` (token nibbles,
  255-extension lengths, 2-byte LE match offsets, end-of-block rules).
- LZ4 frame format v1.6.x: `lz4_Frame_format.md` (magic 0x184D2204,
  FLG/BD descriptor, xxHash32 header checksum, 0x00000000 end mark) —
  the Java producer's ``KafkaLZ4BlockOutputStream`` writes this frame.
- xxHash32: Cyan4973/xxHash `xxhash_spec.md` (needed by the LZ4 frame's
  header-checksum byte and optional block/content checksums).

The compressors are greedy hash-table matchers — spec-conformant, not
ratio-optimal — used to generate fixtures (writer-as-fixture-generator);
the decompressors run distributed inside the segment parser's Arrow
batches. zstd remains an honest NotImplementedError in the caller: its
FSE/Huffman entropy stage is not reasonably hand-buildable.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# xxHash32 (public spec: Cyan4973/xxHash xxhash_spec.md)
# ---------------------------------------------------------------------------

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxhash32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            for _ in range(1):
                v1 = (_rotl32((v1 + int.from_bytes(data[i : i + 4], "little") * _P2) & _M32, 13) * _P1) & _M32
                v2 = (_rotl32((v2 + int.from_bytes(data[i + 4 : i + 8], "little") * _P2) & _M32, 13) * _P1) & _M32
                v3 = (_rotl32((v3 + int.from_bytes(data[i + 8 : i + 12], "little") * _P2) & _M32, 13) * _P1) & _M32
                v4 = (_rotl32((v4 + int.from_bytes(data[i + 12 : i + 16], "little") * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i <= n - 4:
        h = (h + int.from_bytes(data[i : i + 4], "little") * _P3) & _M32
        h = (_rotl32(h, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M32
        h = (_rotl32(h, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------------
# snappy block format
# ---------------------------------------------------------------------------


def _w_uvarint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _r_uvarint(data: bytes, i: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        b = data[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _snappy_emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit)
    if n == 0:
        return
    if n <= 60:
        out.append((n - 1) << 2)
    else:
        nb = (n - 1).bit_length() + 7 >> 3
        out.append((59 + nb) << 2)
        out += (n - 1).to_bytes(nb, "little")
    out += lit


def snappy_compress(data: bytes) -> bytes:
    """Greedy hash-table snappy compressor: literals + type-2 copies
    (2-byte LE offsets), matches split at the 64-byte copy-length cap."""
    out = bytearray()
    _w_uvarint(out, len(data))
    n = len(data)
    if n < 4:
        _snappy_emit_literal(out, data)
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            # extend the match
            mlen = 4
            while i + mlen < n and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            _snappy_emit_literal(out, data[lit_start:i])
            off = i - cand
            rem = mlen
            while rem > 0:
                step = min(rem, 64)
                if step < 4:  # copies shorter than 4 aren't emitted; fold
                    break  # remainder back into the next literal run
                out.append(((step - 1) << 2) | 2)
                out += struct.pack("<H", off)
                rem -= step
            i += mlen - rem
            lit_start = i
        else:
            i += 1
    _snappy_emit_literal(out, data[lit_start:])
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    expect, i = _r_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while i < n:
        tag = data[i]
        kind = tag & 3
        if kind == 0:  # literal
            l = tag >> 2
            i += 1
            if l >= 60:
                nb = l - 59
                l = int.from_bytes(data[i : i + nb], "little")
                i += nb
            length = l + 1
            out += data[i : i + length]
            i += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[i + 1]
            i += 2
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            off = struct.unpack_from("<H", data, i + 1)[0]
            i += 3
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            off = struct.unpack_from("<I", data, i + 1)[0]
            i += 5
        if off == 0 or off > len(out):
            raise ValueError("snappy copy offset out of range")
        start = len(out) - off
        for k in range(length):  # byte-wise: offsets < length overlap
            out.append(out[start + k])
    if len(out) != expect:
        raise ValueError(
            f"snappy length mismatch: preamble {expect}, got {len(out)}"
        )
    return bytes(out)


# snappy-java stream framing (what the Java Kafka producer writes)
_SNAPPY_JAVA_MAGIC = b"\x82SNAPPY\x00"


def snappy_java_frame(data: bytes, block_size: int = 32 * 1024) -> bytes:
    out = bytearray(_SNAPPY_JAVA_MAGIC)
    out += struct.pack(">ii", 1, 1)  # version, min compatible version
    for i in range(0, len(data), block_size):
        block = snappy_compress(data[i : i + block_size])
        out += struct.pack(">i", len(block))
        out += block
    return bytes(out)


def snappy_java_unframe(data: bytes) -> bytes:
    """Decode snappy-java stream framing; raw block input (older clients
    compressed the batch as one bare block) is auto-detected by magic."""
    if not data.startswith(_SNAPPY_JAVA_MAGIC):
        return snappy_decompress(data)
    i = len(_SNAPPY_JAVA_MAGIC) + 8  # skip the two version ints
    out = bytearray()
    while i < len(data):
        (blen,) = struct.unpack_from(">i", data, i)
        i += 4
        out += snappy_decompress(data[i : i + blen])
        i += blen
    return bytes(out)


# ---------------------------------------------------------------------------
# LZ4 block + frame formats
# ---------------------------------------------------------------------------


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy LZ4 block compressor honoring the end-of-block rules: the
    last 5 bytes are always literals and no match starts within the last
    12 bytes (lz4_Block_format.md)."""
    n = len(data)
    out = bytearray()

    def emit(lit: bytes, mlen: int = 0, moff: int = 0) -> None:
        nonlocal out
        ll = len(lit)
        token_l = 15 if ll >= 15 else ll
        token_m = 0 if mlen == 0 else (15 if mlen - 4 >= 15 else mlen - 4)
        out.append((token_l << 4) | token_m)
        if ll >= 15:
            rem = ll - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out += lit
        if mlen:
            out += struct.pack("<H", moff)
            if mlen - 4 >= 15:
                rem = mlen - 4 - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    if n < 13:  # too short for any legal match
        emit(data)
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    mflimit = n - 12  # last legal match START (ends >= 5 bytes before EOF)
    while i <= mflimit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF:
            mlen = 4
            limit = n - 5  # matches may not consume the last 5 bytes
            while i + mlen < limit and data[cand + mlen] == data[i + mlen]:
                mlen += 1
            emit(data[lit_start:i], mlen, i - cand)
            i += mlen
            lit_start = i
        else:
            i += 1
    emit(data[lit_start:])
    return bytes(out)


def lz4_block_decompress(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        token = data[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                b = data[i]
                i += 1
                ll += b
                if b != 255:
                    break
        out += data[i : i + ll]
        i += ll
        if i >= n:
            break  # final sequence is literals-only
        off = struct.unpack_from("<H", data, i)[0]
        i += 2
        if off == 0 or off > len(out):
            raise ValueError("lz4 match offset out of range")
        mlen = (token & 0xF) + 4
        if token & 0xF == 15:
            while True:
                b = data[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - off
        for k in range(mlen):  # byte-wise: overlap is the RLE idiom
            out.append(out[start + k])
    return bytes(out)


_LZ4_MAGIC = 0x184D2204


def lz4_frame_compress(data: bytes, block_size: int = 64 * 1024) -> bytes:
    """Minimal LZ4 frame (version 01, independent blocks, no checksums
    beyond the mandatory header checksum byte) — the shape
    KafkaLZ4BlockOutputStream emits."""
    flg = (1 << 6) | (1 << 5)  # version=01, block-independence
    bd = 4 << 4  # block max size code 4 = 64 KB
    desc = bytes([flg, bd])
    out = bytearray(struct.pack("<I", _LZ4_MAGIC))
    out += desc
    out.append((xxhash32(desc) >> 8) & 0xFF)
    for i in range(0, len(data), block_size):
        raw = data[i : i + block_size]
        comp = lz4_block_compress(raw)
        if len(comp) < len(raw):
            out += struct.pack("<I", len(comp))
            out += comp
        else:  # high bit: block stored uncompressed
            out += struct.pack("<I", len(raw) | 0x80000000)
            out += raw
    out += struct.pack("<I", 0)  # end mark
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _LZ4_MAGIC:
        raise ValueError(f"not an LZ4 frame (magic {magic:#x})")
    flg, bd = data[4], data[5]
    if (flg >> 6) != 1:
        raise ValueError(f"unsupported LZ4 frame version {flg >> 6}")
    block_checksum = bool(flg & 0x10)
    content_size = bool(flg & 0x08)
    content_checksum = bool(flg & 0x04)
    if flg & 0x01:
        # DictID shifts the descriptor by 4 bytes; no dictionary support, and
        # silently ignoring the bit would misdiagnose as a checksum mismatch.
        raise ValueError("LZ4 dictionary frames unsupported (FLG DictID bit set)")
    i = 6
    desc_end = 6 + (8 if content_size else 0)
    hc = data[desc_end]
    calc = (xxhash32(data[4:desc_end]) >> 8) & 0xFF
    if hc != calc:
        raise ValueError("LZ4 frame header checksum mismatch")
    i = desc_end + 1
    out = bytearray()
    while True:
        (bsize,) = struct.unpack_from("<I", data, i)
        i += 4
        if bsize == 0:
            break
        uncompressed = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        block = data[i : i + bsize]
        i += bsize
        if block_checksum:
            (bc,) = struct.unpack_from("<I", data, i)
            i += 4
            if bc != xxhash32(block):
                raise ValueError("LZ4 block checksum mismatch")
        out += block if uncompressed else lz4_block_decompress(block)
    if content_checksum:
        (cc,) = struct.unpack_from("<I", data, i)
        if cc != xxhash32(bytes(out)):
            raise ValueError("LZ4 content checksum mismatch")
    return bytes(out)
