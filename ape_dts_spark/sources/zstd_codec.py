"""From-scratch Zstandard (RFC 8878) frame decoder + a store/RLE writer.

Why this exists: MySQL 8.0.20+ ``binlog_transaction_compression`` produces
TRANSACTION_PAYLOAD events whose ONLY defined algorithm is zstd (reference:
the TransactionPayload path of
`dt-connector/src/extractor/mysql/mysql_cdc_extractor.rs`, which links the
zstd crate), and zstd is the Kafka producer codec the broker docs recommend
(attribute bits value 4, `kafka_extractor.rs:38-86` consumes it via librdkafka).
This container has no zstd wheel, so — same pattern as the repo's snappy,
LZ4, CRC32C and JPEG work — the format is implemented from its public
specification (RFC 8878 / facebook/zstd `zstd_compression_format.md`):

- frame header: magic 0xFD2FB528, descriptor (FCS field size, single-segment,
  checksum, dictionary-ID), window descriptor, skippable frames
  (0x184D2A50..5F), multi-frame concatenation;
- blocks: Raw / RLE / Compressed (21-bit size, last-block bit);
- literals: Raw / RLE / Huffman-compressed / Treeless (repeat tree),
  1-stream and 4-stream (jump table), Huffman tree description in both the
  direct 4-bit-pair form and the FSE-compressed-weights form (two
  interleaved FSE states over a backward bitstream);
- sequences: LL/OF/ML code tables with extra bits, FSE table modes
  Predefined / RLE / FSE_Compressed / Repeat, interleaved-state backward
  bitstream, three-slot repeat-offset history with the literals_length==0
  special case, overlapping match copy;
- content checksum: xxHash64 (from the public xxhash_spec.md), low 32 bits;
- dictionaries (RFC 8878 §5): magic 0xEC30A437, entropy-table seeding
  (Huffman literals + OF/ML/LL FSE as the first block's 'previous' tables),
  stored repeat-offset history, and content as the virtual match window —
  gated against ``zstd --train`` + ``zstd -D`` CLI vectors, including the
  ``--no-dictID`` form.

The encoder side is intentionally minimal — spec-conformant Raw/RLE-block
frames (a legal zstd stream any decoder accepts; compression ratio is not
the point) — used as the in-repo fixture writer. Decoder correctness is
gated in pytest against byte vectors produced by the REAL reference
``zstd`` CLI at several levels (which exercises the Huffman/FSE/4-stream
paths this writer does not emit), plus structural RFC vectors.
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F

# ---------------------------------------------------------------------------
# xxHash64 (public spec: Cyan4973/xxHash xxhash_spec.md) — zstd's
# Content_Checksum is the low 32 bits of XXH64(content, seed=0)
# ---------------------------------------------------------------------------

_P64_1 = 11400714785074694791
_P64_2 = 14029467366897019727
_P64_3 = 1609587929392839161
_P64_4 = 9650029242287828579
_P64_5 = 2870177450012600261
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_round(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P64_2) & _M64, 31) * _P64_1) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        while i <= n - 32:
            v1 = _xxh64_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xxh64_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xxh64_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xxh64_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xxh64_round(0, v)) * _P64_1 + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _xxh64_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Backward bitstream (RFC 8878 §3.1.1.3.2.1): bits are written LSB-first and
# read back from the END; the last byte carries a 1-sentinel above the data.
# Reads past the start pad with zero bits and flag overflow — the documented
# termination signal for the interleaved-FSE Huffman-weights stream.
# ---------------------------------------------------------------------------


class _BackBits:
    __slots__ = ("buf", "bits")

    def __init__(self, buf: bytes):
        if not buf or buf[-1] == 0:
            raise ValueError("zstd: corrupt backward bitstream (no sentinel bit)")
        self.buf = buf
        self.bits = (len(buf) - 1) * 8 + buf[-1].bit_length() - 1

    def _bits_at(self, pos: int, n: int) -> int:
        # value of bits [pos, pos+n), LSB = bit pos; negative pos zero-pads
        if pos >= 0:
            lo = pos >> 3
            hi = (pos + n + 7) >> 3
            chunk = int.from_bytes(self.buf[lo:hi], "little")
            return (chunk >> (pos & 7)) & ((1 << n) - 1)
        avail = n + pos
        if avail <= 0:
            return 0
        chunk = int.from_bytes(self.buf[0 : (avail + 7) >> 3], "little")
        return (chunk & ((1 << avail) - 1)) << (-pos)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.bits -= n
        return self._bits_at(self.bits, n)

    def peek(self, n: int) -> int:
        return self._bits_at(self.bits - n, n)

    def consume(self, n: int) -> None:
        self.bits -= n

    @property
    def overflowed(self) -> bool:
        return self.bits < 0


# ---------------------------------------------------------------------------
# Forward bitstream (FSE table descriptions are read front-to-back)
# ---------------------------------------------------------------------------


class _FwdBits:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # bit position from start, LSB-first within each byte

    def read(self, n: int) -> int:
        p = self.pos
        lo = p >> 3
        hi = (p + n + 7) >> 3
        chunk = int.from_bytes(self.buf[lo:hi], "little")
        self.pos = p + n
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def rewind(self, n: int) -> None:
        self.pos -= n

    def byte_align_pos(self) -> int:
        return (self.pos + 7) >> 3


# ---------------------------------------------------------------------------
# FSE (RFC 8878 §4.1): table description + decoding table construction
# ---------------------------------------------------------------------------


class _FseTable:
    __slots__ = ("accuracy_log", "symbol", "num_bits", "new_state_base")

    def __init__(self, accuracy_log, symbol, num_bits, new_state_base):
        self.accuracy_log = accuracy_log
        self.symbol = symbol
        self.num_bits = num_bits
        self.new_state_base = new_state_base


def _fse_read_distribution(bits: _FwdBits, max_accuracy_log: int):
    """Read an FSE table description: accuracy log + normalized counts (with
    the less-than-one -1 code and the 2-bit zero-run repeat flags)."""
    accuracy_log = bits.read(4) + 5
    if accuracy_log > max_accuracy_log:
        raise ValueError(f"zstd: FSE accuracy log {accuracy_log} > max {max_accuracy_log}")
    remaining = (1 << accuracy_log) + 1
    freqs: list[int] = []
    while remaining > 1 and len(freqs) < 256:
        nb = remaining.bit_length()  # bits to code values in [0, remaining]
        val = bits.read(nb)
        lower_mask = (1 << (nb - 1)) - 1
        threshold = (1 << nb) - 1 - remaining
        if (val & lower_mask) < threshold:
            bits.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        proba = val - 1
        freqs.append(proba)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            while True:
                repeat = bits.read(2)
                freqs.extend([0] * repeat)
                if repeat != 3:
                    break
    if remaining != 1:
        raise ValueError("zstd: corrupt FSE table description (counts overshoot)")
    return accuracy_log, freqs


def _fse_build_table(accuracy_log: int, freqs: list[int]) -> _FseTable:
    size = 1 << accuracy_log
    symbol = [0] * size
    high_threshold = size - 1
    state_desc = [0] * len(freqs)
    for s, f in enumerate(freqs):
        if f == -1:  # less-than-one: one cell at the table top, max bits
            symbol[high_threshold] = s
            high_threshold -= 1
            state_desc[s] = 1
        else:
            state_desc[s] = f
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, f in enumerate(freqs):
        if f <= 0:
            continue
        for _ in range(f):
            symbol[pos] = s
            pos = (pos + step) & mask
            while pos > high_threshold:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: corrupt FSE distribution (spread did not wrap)")
    num_bits = [0] * size
    new_state_base = [0] * size
    for i in range(size):
        s = symbol[i]
        nsd = state_desc[s]
        state_desc[s] += 1
        nb = accuracy_log - (nsd.bit_length() - 1)
        num_bits[i] = nb
        new_state_base[i] = (nsd << nb) - size
    return _FseTable(accuracy_log, symbol, num_bits, new_state_base)


def _fse_rle_table(sym: int) -> _FseTable:
    # accuracy log 0: a single state always yielding `sym`, 0 update bits
    return _FseTable(0, [sym], [0], [0])


# ---------------------------------------------------------------------------
# Huffman literals (RFC 8878 §4.2)
# ---------------------------------------------------------------------------


class _HufTable:
    __slots__ = ("table_log", "symbol", "num_bits")

    def __init__(self, table_log, symbol, num_bits):
        self.table_log = table_log
        self.symbol = symbol
        self.num_bits = num_bits


def _huf_from_weights(weights: list[int]) -> _HufTable:
    """weights[] are the EXPLICIT weights; the final symbol's weight is
    derived to complete the next power of two (RFC 8878 §4.2.1.1)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: corrupt Huffman weights (all zero)")
    table_log = total.bit_length()  # exponent of next power of two > total
    if table_log > 11:
        raise ValueError(f"zstd: Huffman table log {table_log} > 11")
    rest = (1 << table_log) - total
    last_weight = rest.bit_length()
    if (1 << (last_weight - 1)) != rest:
        raise ValueError("zstd: corrupt Huffman weights (remainder not a power of 2)")
    all_w = weights + [last_weight]
    size = 1 << table_log
    symbol = [0] * size
    num_bits = [0] * size
    pos = 0
    for w in range(1, table_log + 1):  # ascending weight, ascending symbol
        span = 1 << (w - 1)
        nb = table_log + 1 - w
        for s, sw in enumerate(all_w):
            if sw != w:
                continue
            for k in range(pos, pos + span):
                symbol[k] = s
                num_bits[k] = nb
            pos += span
    if pos != size:
        raise ValueError("zstd: corrupt Huffman weights (table underfilled)")
    return _HufTable(table_log, symbol, num_bits)


def _huf_read_tree(src: bytes):
    """Parse a Huffman tree description; returns (table, bytes consumed)."""
    header = src[0]
    if header >= 128:  # direct: 4-bit weight pairs
        n = header - 127
        nbytes = (n + 1) >> 1
        weights = []
        for i in range(n):
            b = src[1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        return _huf_from_weights(weights), 1 + nbytes
    # FSE-compressed weights: two interleaved states over a backward stream
    comp = src[1 : 1 + header]
    fwd = _FwdBits(comp)
    accuracy_log, freqs = _fse_read_distribution(fwd, 6)
    table = _fse_build_table(accuracy_log, freqs)
    stream = _BackBits(comp[fwd.byte_align_pos() :])
    s1 = stream.read(accuracy_log)
    s2 = stream.read(accuracy_log)
    weights: list[int] = []
    # the stream is exhausted exactly when a state UPDATE overdraws; the
    # other state then flushes its final symbol (RFC 8878 §4.1.2 note)
    while True:
        weights.append(table.symbol[s1])
        s1 = table.new_state_base[s1] + stream.read(table.num_bits[s1])
        if stream.overflowed:
            weights.append(table.symbol[s2])
            break
        weights.append(table.symbol[s2])
        s2 = table.new_state_base[s2] + stream.read(table.num_bits[s2])
        if stream.overflowed:
            weights.append(table.symbol[s1])
            break
        if len(weights) > 255:
            raise ValueError("zstd: Huffman weight stream does not terminate")
    return _huf_from_weights(weights), 1 + header


def _huf_decode_stream(table: _HufTable, buf: bytes, count: int) -> bytearray:
    out = bytearray(count)
    bits = _BackBits(buf)
    tl = table.table_log
    symbol, num_bits = table.symbol, table.num_bits
    for i in range(count):
        idx = bits.peek(tl)
        out[i] = symbol[idx]
        bits.consume(num_bits[idx])
    # a valid stream ends with exactly 0 bits left: overdraw means truncated
    # input decoded zero-padded garbage, leftovers mean symbol-count mismatch
    if bits.overflowed or bits.bits != 0:
        raise ValueError("zstd: Huffman literal stream length mismatch")
    return out


def _decode_literals_huf(table: _HufTable, src: bytes, regen: int, four: bool) -> bytes:
    if not four:
        return bytes(_huf_decode_stream(table, src, regen))
    if len(src) < 6:
        raise ValueError("zstd: 4-stream literals too short for jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", src, 0)
    body = src[6:]
    if s1 + s2 + s3 > len(body):
        raise ValueError("zstd: 4-stream jump table exceeds section")
    c123 = (regen + 3) >> 2
    c4 = regen - 3 * c123
    if c4 < 0:
        raise ValueError("zstd: corrupt 4-stream literal sizes")
    out = bytearray()
    offs = [0, s1, s1 + s2, s1 + s2 + s3, len(body)]
    for k in range(4):
        out += _huf_decode_stream(table, body[offs[k] : offs[k + 1]], c123 if k < 3 else c4)
    return bytes(out)


# ---------------------------------------------------------------------------
# Sequence code tables (RFC 8878 §3.1.1.3.2.1.1)
# ---------------------------------------------------------------------------

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

# predefined distributions (RFC 8878 tables; accuracy logs 6 / 5 / 6)
_LL_DEFAULT = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
]
_OF_DEFAULT = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1,
]
_ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2] + [1] * 37 + [-1] * 7
_PREDEF_LL = _fse_build_table(6, _LL_DEFAULT)
_PREDEF_OF = _fse_build_table(5, _OF_DEFAULT)
_PREDEF_ML = _fse_build_table(6, _ML_DEFAULT)
_MAX_AL = {"ll": 9, "of": 8, "ml": 9}


# ---------------------------------------------------------------------------
# Frame decoding
# ---------------------------------------------------------------------------


class _FrameCtx:
    """Cross-block state within one frame: the last Huffman table (Treeless
    literals), the last LL/OF/ML FSE tables (Repeat mode) and the three-slot
    repeat-offset history (persists across blocks, RFC 8878 §3.1.1.4).
    A dictionary seeds all three (RFC 8878 §5: its entropy tables act as the
    'previous' tables for the first block, its stored offsets replace the
    {1, 4, 8} default history)."""

    def __init__(self, dictionary: "ZstdDictionary | None" = None):
        if dictionary is None:
            self.huf: _HufTable | None = None
            self.fse: dict[str, _FseTable | None] = {"ll": None, "of": None, "ml": None}
            self.rep = [1, 4, 8]
        else:
            self.huf = dictionary.huf
            self.fse = dict(dictionary.fse)
            self.rep = list(dictionary.rep)


ZSTD_DICT_MAGIC = 0xEC30A437


class ZstdDictionary:
    """A parsed zstd dictionary (RFC 8878 §5): entropy tables + repeat
    offsets + raw content (the virtual 'past' matches may copy from)."""

    __slots__ = ("dict_id", "huf", "fse", "rep", "content")

    def __init__(self, dict_id, huf, fse, rep, content):
        self.dict_id = dict_id
        self.huf = huf
        self.fse = fse
        self.rep = rep
        self.content = content


def zstd_parse_dictionary(data: bytes) -> ZstdDictionary:
    """Parse a zstd dictionary blob (e.g. the output of ``zstd --train``):
    magic, Dictionary_ID, entropy tables (Huffman literals, then FSE tables
    for offsets / match lengths / literals lengths), three little-endian
    repeat offsets, then the content."""
    if len(data) < 8:
        raise ValueError("zstd: dictionary too short")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != ZSTD_DICT_MAGIC:
        raise ValueError(f"zstd: bad dictionary magic {magic:#010x}")
    (dict_id,) = struct.unpack_from("<I", data, 4)
    pos = 8
    huf, consumed = _huf_read_tree(data[pos:])
    pos += consumed
    fse: dict[str, _FseTable] = {}
    for kind in ("of", "ml", "ll"):  # RFC 8878 §5 table order
        fwd = _FwdBits(data[pos:])
        accuracy_log, freqs = _fse_read_distribution(fwd, _MAX_AL[kind])
        fse[kind] = _fse_build_table(accuracy_log, freqs)
        pos += fwd.byte_align_pos()
    rep = list(struct.unpack_from("<III", data, pos))
    pos += 12
    content = bytes(data[pos:])
    for r in rep:
        if r == 0 or r > len(content):
            raise ValueError("zstd: dictionary repeat offset out of range")
    return ZstdDictionary(dict_id, huf, fse, rep, content)


def _read_seq_table(kind: str, mode: int, src: bytes, pos: int, ctx: _FrameCtx, predef):
    if mode == 0:
        ctx.fse[kind] = predef
        return predef, pos
    if mode == 1:  # RLE: one byte = the only symbol
        t = _fse_rle_table(src[pos])
        ctx.fse[kind] = t
        return t, pos + 1
    if mode == 2:
        fwd = _FwdBits(src[pos:])
        accuracy_log, freqs = _fse_read_distribution(fwd, _MAX_AL[kind])
        t = _fse_build_table(accuracy_log, freqs)
        ctx.fse[kind] = t
        return t, pos + fwd.byte_align_pos()
    prev = ctx.fse[kind]
    if prev is None:
        raise ValueError(f"zstd: {kind} Repeat mode with no previous table")
    return prev, pos


def _decode_block(
    src: bytes, ctx: _FrameCtx, window: bytearray, frame_start: int = 0
) -> None:
    """Decode one Compressed block; appends regenerated bytes to window.
    ``frame_start`` is the window offset where the current frame began —
    matches must not reach into a previous frame's output (RFC 8878 §3.1:
    the window is per-frame)."""
    # ---- literals section -------------------------------------------------
    h0 = src[0]
    lit_type = h0 & 3
    size_format = (h0 >> 2) & 3
    pos = 0
    if lit_type in (0, 1):  # Raw / RLE
        if size_format in (0, 2):
            regen = h0 >> 3
            pos = 1
        elif size_format == 1:
            regen = (h0 >> 4) | (src[1] << 4)
            pos = 2
        else:
            regen = (h0 >> 4) | (src[1] << 4) | (src[2] << 12)
            pos = 3
        if lit_type == 0:
            literals = bytes(src[pos : pos + regen])
            pos += regen
        else:
            literals = bytes([src[pos]]) * regen
            pos += 1
    else:  # Compressed / Treeless
        if size_format in (0, 1):
            h = int.from_bytes(src[0:3], "little")
            regen = (h >> 4) & 0x3FF
            comp = (h >> 14) & 0x3FF
            pos = 3
        elif size_format == 2:
            h = int.from_bytes(src[0:4], "little")
            regen = (h >> 4) & 0x3FFF
            comp = (h >> 18) & 0x3FFF
            pos = 4
        else:
            h = int.from_bytes(src[0:5], "little")
            regen = (h >> 4) & 0x3FFFF
            comp = (h >> 22) & 0x3FFFF
            pos = 5
        # RFC 8878 §3.1.1.3.1.1: Size_Format 00 means a single stream for
        # BOTH Compressed and Treeless literals; 01/10/11 mean 4 streams
        four = size_format != 0
        section = src[pos : pos + comp]
        pos += comp
        if lit_type == 2:
            table, consumed = _huf_read_tree(section)
            ctx.huf = table
            section = section[consumed:]
        elif ctx.huf is None:
            raise ValueError("zstd: Treeless literals with no previous Huffman table")
        else:
            table = ctx.huf
        literals = _decode_literals_huf(table, section, regen, four)
    # ---- sequences section ------------------------------------------------
    b0 = src[pos]
    pos += 1
    if b0 == 0:
        window += literals
        return
    if b0 < 128:
        n_seq = b0
    elif b0 < 255:
        n_seq = ((b0 - 128) << 8) + src[pos]
        pos += 1
    else:
        n_seq = src[pos] + (src[pos + 1] << 8) + 0x7F00
        pos += 2
    modes = src[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence-mode bits set")
    ll_t, pos = _read_seq_table("ll", (modes >> 6) & 3, src, pos, ctx, _PREDEF_LL)
    of_t, pos = _read_seq_table("of", (modes >> 4) & 3, src, pos, ctx, _PREDEF_OF)
    ml_t, pos = _read_seq_table("ml", (modes >> 2) & 3, src, pos, ctx, _PREDEF_ML)
    bits = _BackBits(src[pos:])
    ll_s = bits.read(ll_t.accuracy_log)
    of_s = bits.read(of_t.accuracy_log)
    ml_s = bits.read(ml_t.accuracy_log)
    rep = ctx.rep
    lit_pos = 0
    for i in range(n_seq):
        of_code = of_t.symbol[of_s]
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_t.symbol[ml_s]
        ml = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = ll_t.symbol[ll_s]
        ll = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        if offset_value > 3:
            offset = offset_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            else:
                offset = rep[0] - 1 if idx == 3 else rep[idx]
                if idx != 1:
                    rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if offset == 0:
            raise ValueError("zstd: zero match offset")
        window += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(window) - frame_start:
            raise ValueError("zstd: match offset beyond frame start")
        if offset >= ml:
            start = len(window) - offset
            window += window[start : start + ml]
        else:  # overlapping copy: byte-at-a-time semantics
            for _ in range(ml):
                window.append(window[-offset])
        if i + 1 < n_seq:
            ll_s = ll_t.new_state_base[ll_s] + bits.read(ll_t.num_bits[ll_s])
            ml_s = ml_t.new_state_base[ml_s] + bits.read(ml_t.num_bits[ml_s])
            of_s = of_t.new_state_base[of_s] + bits.read(of_t.num_bits[of_s])
    if bits.overflowed:
        raise ValueError("zstd: sequence bitstream overread")
    window += literals[lit_pos:]


def zstd_decompress(data: bytes, dictionary: ZstdDictionary | None = None) -> bytes:
    """Decode a (possibly multi-frame) zstd stream; verifies frame magic,
    reserved bits and, when present, the xxh64 content checksum.
    ``dictionary`` (from :func:`zstd_parse_dictionary`) seeds entropy
    tables, repeat offsets and the match window for frames that declare a
    Dictionary_ID — and is also applied to did=0 frames when provided
    (``zstd -D --no-dictID`` emits those)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        if n - i < 4:
            raise ValueError("zstd: truncated frame magic")
        (magic,) = struct.unpack_from("<I", data, i)
        i += 4
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            if n - i < 4:
                raise ValueError("zstd: truncated skippable frame header")
            (skip,) = struct.unpack_from("<I", data, i)
            i += 4
            if i + skip > n:
                raise ValueError("zstd: skippable frame exceeds input")
            i += skip
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError(f"zstd: bad magic {magic:#010x}")
        fhd = data[i]
        i += 1
        if fhd & 0x08:
            raise ValueError("zstd: reserved frame-header bit set")
        single_segment = bool(fhd & 0x20)
        checksum = bool(fhd & 0x04)
        dict_flag = fhd & 0x03
        fcs_flag = fhd >> 6
        if not single_segment:
            i += 1  # window descriptor: only bounds memory, not parsing
        if dict_flag:
            did_len = (0, 1, 2, 4)[dict_flag]
            did = int.from_bytes(data[i : i + did_len], "little")
            i += did_len
            if did:
                if dictionary is None:
                    raise ValueError(
                        f"zstd: frame requires dictionary {did} — pass the "
                        "parsed dictionary (zstd_parse_dictionary)"
                    )
                if dictionary.dict_id != did:
                    raise ValueError(
                        f"zstd: frame requires dictionary {did}, "
                        f"got {dictionary.dict_id}"
                    )
        fcs = None
        if fcs_flag == 0:
            if single_segment:
                fcs = data[i]
                i += 1
        elif fcs_flag == 1:
            fcs = int.from_bytes(data[i : i + 2], "little") + 256
            i += 2
        elif fcs_flag == 2:
            fcs = int.from_bytes(data[i : i + 4], "little")
            i += 4
        else:
            fcs = int.from_bytes(data[i : i + 8], "little")
            i += 8
        ctx = _FrameCtx(dictionary)
        if dictionary is not None:
            # dictionary content is the virtual past: decode into a local
            # window prefixed with it so matches can reach into it
            # (frame_start=0 bounds offsets by prefix+frame, per RFC 8878 §5)
            win = bytearray(dictionary.content)
            base, frame_start = len(win), 0
        else:
            win = out
            base = frame_start = len(out)
        while True:
            bh = int.from_bytes(data[i : i + 3], "little")
            i += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # Raw
                win += data[i : i + bsize]
                i += bsize
            elif btype == 1:  # RLE: bsize = regenerated count, 1 content byte
                win += data[i : i + 1] * bsize
                i += 1
            elif btype == 2:
                _decode_block(data[i : i + bsize], ctx, win, frame_start)
                i += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if last:
                break
        content = bytes(win[base:])
        if dictionary is not None:
            out += content
        if fcs is not None and len(content) != fcs:
            raise ValueError(
                f"zstd: frame content size mismatch (header {fcs}, got {len(content)})"
            )
        if checksum:
            (want,) = struct.unpack_from("<I", data, i)
            i += 4
            got = xxhash64(content) & 0xFFFFFFFF
            if got != want:
                raise ValueError("zstd: content checksum mismatch")
    return bytes(out)


# ---------------------------------------------------------------------------
# Minimal spec-conformant writer (Raw/RLE blocks) — the in-repo fixture
# generator; any conforming zstd decoder accepts its output.
# ---------------------------------------------------------------------------

_BLOCK_MAX = 128 * 1024


def zstd_compress(data: bytes, checksum: bool = True) -> bytes:
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    # frame header: single-segment + 8-byte FCS (flag 3) keeps the header
    # branch-free for any content length; checksum bit per arg
    fhd = (3 << 6) | 0x20 | (0x04 if checksum else 0)
    out.append(fhd)
    out += struct.pack("<Q", len(data))
    if not data:
        out += (1 | (0 << 1) | (0 << 3)).to_bytes(3, "little")  # last empty Raw
    chunks = range(0, len(data), _BLOCK_MAX)
    for off in chunks:
        chunk = data[off : off + _BLOCK_MAX]
        last = 1 if off + _BLOCK_MAX >= len(data) else 0
        if len(chunk) > 1 and chunk.count(chunk[0]) == len(chunk):
            out += (last | (1 << 1) | (len(chunk) << 3)).to_bytes(3, "little")
            out.append(chunk[0])
        else:
            out += (last | (0 << 1) | (len(chunk) << 3)).to_bytes(3, "little")
            out += chunk
    if checksum:
        out += struct.pack("<I", xxhash64(data) & 0xFFFFFFFF)
    return bytes(out)
