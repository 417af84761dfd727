"""Reference-layout CPC serialization: the FM85 entropy-compressed wire
format (cpc/compression.rs, cpc/serialization.rs, cpc/sketch.rs:457-640).

The resident sketch here is the bit matrix (sketches/cpc.py rationale);
the wire format is defined over the reference's (sliding window,
surprising-value pairs) decomposition, so encode first derives that
decomposition from the matrix — exactly inverting build_bit_matrix
(cpc/sketch.rs:418-452):

  matrix[row] = ((1 << offset) - 1)        # "early zone" default ones
                | (window[row] << offset)  # the 8-bit sliding window
                ^ surprise_bits            # pairs flip either zone

Flavors (cpc/mod.rs:59-92) select what is stored:
  EMPTY    — preamble only.
  SPARSE   — no window; ALL set bits as sorted pairs.
  HYBRID   — ditto (decode re-splits cols < 8 back into the window,
             compression.rs:376-411).
  PINNED   — window = cols [0,8); pairs = set bits with col >= 8,
             stored col-shifted by -8 (compression.rs:127-144).
  SLIDING  — window = cols [offset, offset+8); pairs = zero bits below
             offset + set bits at/above offset+8, with the
             rotate-then-permute column transform keyed by pseudo-phase
             (compression.rs:147-175).

Pair streams are delta-coded: column deltas via the 65-symbol
length-limited unary code, row deltas via Golomb (unary hi + base-bit
lo) with base bits chosen from k and the pair count
(compression.rs:275-348, 789-800). Window bytes use the 22
pseudo-phase-selected high-entropy byte codes. All tables live in
cpc_compression_tables.py (published characterization data).

Bit packing matches the reference exactly: codes fill a little-endian
u32 word stream LSB-first (maybe_flush_bitbuf semantics); the encoder
here packs vectorized via offset cumsum into an overlapping u64
accumulator, which is bit-identical to the sequential reference packing
because every bit is written by exactly one code.
"""

from __future__ import annotations

import struct

import numpy as np

from datasketches_rust_spark.hashing import compute_seed_hash
from datasketches_rust_spark.sketches import cpc_compression_tables as T
from datasketches_rust_spark.sketches import serde
from datasketches_rust_spark.sketches.cpc import (CpcSketch, DEFAULT_SEED,
                                                  MAX_LG_K, MIN_LG_K,
                                                  determine_correct_offset,
                                                  determine_flavor)

FAMILY_CPC_REF = 16          # codec/family.rs CPC id
SERIAL_VERSION = 1
FLAG_COMPRESSED = 1          # serialization.rs:19-22 (bit positions)
FLAG_HAS_HIP = 2
FLAG_HAS_TABLE = 3
FLAG_HAS_WINDOW = 4


def determine_pseudo_phase(lg_k: int, num_coupons: int) -> int:
    """compression.rs:641-673 — selects byte-code tables (and, in
    SLIDING flavor, the column permutation)."""
    k = 1 << lg_k
    c = num_coupons
    if 1000 * c < 2375 * k:
        if 4 * c < 3 * k:
            return 16
        if 10 * c < 11 * k:
            return 17
        if 100 * c < 132 * k:
            return 18
        if 3 * c < 5 * k:
            return 19
        if 1000 * c < 1965 * k:
            return 20
        if 1000 * c < 2275 * k:
            return 21
        return 6
    return (c >> (lg_k - 4)) & 15


def _golomb_base_bits(k_plus_pairs: int, count: int) -> int:
    """compression.rs:789-800."""
    if count <= 0:
        return 0
    q = (k_plus_pairs - count) // count
    return 0 if q == 0 else int(q).bit_length() - 1


# ---------------------------------------------------------------------------
# bit packing (encode) / bit reading (decode)
# ---------------------------------------------------------------------------

def _pack_codes(vals: np.ndarray, lens: np.ndarray, pad_bits: int
                ) -> np.ndarray:
    """Pack variable-length codes LSB-first into little-endian u32 words —
    bit-identical to the reference's sequential bitbuf flushes. Codes may
    be up to 48 bits (unary runs), so each lands in at most two u64
    windows; bits are disjoint across codes, so scattering with
    bitwise_or.at into an overlapping u64-per-u32-boundary accumulator
    reproduces the stream exactly."""
    vals = np.asarray(vals, dtype=np.uint64)
    lens = np.asarray(lens, dtype=np.int64)
    offs = np.zeros(lens.size, dtype=np.int64)
    if lens.size:
        np.cumsum(lens[:-1], out=offs[1:])
    total_bits = int(lens.sum()) + pad_bits
    nwords = (total_bits + 31) // 32
    acc = np.zeros(nwords + 2, dtype=np.uint64)  # acc[i] = bits [32i,32i+64)
    w = (offs >> 5).astype(np.int64)
    sh = (offs & 31).astype(np.uint64)
    lo = vals << sh                                  # <= 31+48 < 80? no:
    # codes longer than 33 bits can spill past the u64 window — split any
    # such code into two (the unary tail is zeros, value fits low bits)
    assert int((lens + (offs & 31)).max(initial=0)) < 64, \
        "code crosses u64 window; split upstream"
    np.bitwise_or.at(acc, w, lo)
    out = (acc[:nwords] & np.uint64(0xFFFFFFFF))
    out[1:] |= acc[:nwords - 1] >> np.uint64(32)
    # bits from acc[i-1] high half belong to word i
    return out.astype("<u4")


class _BitReader:
    """Sequential LSB-first reader over the u32 word stream
    (maybe_fill_bitbuf / read_unary semantics)."""

    __slots__ = ("words", "idx", "buf", "bits")

    def __init__(self, words: np.ndarray):
        self.words = words
        self.idx = 0
        self.buf = 0
        self.bits = 0

    def _fill(self, need: int) -> None:
        while self.bits < need:
            w = int(self.words[self.idx]) if self.idx < len(self.words) else 0
            self.buf |= w << self.bits
            self.idx += 1
            self.bits += 32

    def take(self, n: int) -> int:
        self._fill(n)
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.bits -= n
        return v

    def peek12_consume(self, table: np.ndarray) -> int:
        """12-bit peek through a decode table; consumes the code length.
        Returns the symbol."""
        self._fill(12)
        entry = int(table[self.buf & 0xFFF])
        ln = entry >> 8
        self.buf >>= ln
        self.bits -= ln
        return entry & 0xFF

    def read_unary(self) -> int:
        total = 0
        while True:
            self._fill(8)
            peek8 = self.buf & 0xFF
            if peek8:
                tz = (peek8 & -peek8).bit_length() - 1
                self.buf >>= tz + 1
                self.bits -= tz + 1
                return total + tz
            total += 8
            self.buf >>= 8
            self.bits -= 8


# ---------------------------------------------------------------------------
# window / pair stream codecs
# ---------------------------------------------------------------------------

def _compress_window(window: np.ndarray, lg_k: int,
                     num_coupons: int) -> np.ndarray:
    table = T.ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE[
        determine_pseudo_phase(lg_k, num_coupons)]
    infos = table[window]
    return _pack_codes(infos & np.uint16(0xFFF), infos >> np.uint16(12),
                       pad_bits=11)


def _uncompress_window(words: np.ndarray, lg_k: int,
                       num_coupons: int) -> np.ndarray:
    table = T.DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE[
        determine_pseudo_phase(lg_k, num_coupons)]
    rd = _BitReader(words)
    k = 1 << lg_k
    out = np.empty(k, dtype=np.uint8)
    for i in range(k):
        out[i] = rd.peek12_consume(table)
    return out


def _compress_pairs(pairs: np.ndarray, lg_k: int) -> tuple[np.ndarray, int]:
    """(words, num_pairs). ``pairs`` sorted ascending row_col u32
    (compression.rs low_level_compress_pairs)."""
    k = 1 << lg_k
    num_pairs = int(pairs.size)
    bb = _golomb_base_bits(k + num_pairs, num_pairs)
    rows = (pairs >> np.uint32(6)).astype(np.int64)
    cols = (pairs & np.uint32(63)).astype(np.int64)
    y_delta = np.diff(rows, prepend=0)
    prev_cols = np.concatenate([[0], cols[:-1] + 1])
    x_delta = np.where(y_delta > 0, cols, cols - prev_cols)
    assert (x_delta >= 0).all() and (y_delta >= 0).all()

    xinfo = T.LENGTH_LIMITED_UNARY_ENCODING_TABLE65[x_delta]
    g_hi = (y_delta >> bb).astype(np.int64)
    g_lo = (y_delta & ((1 << bb) - 1)).astype(np.uint64)
    # interleave per pair: x code, unary(g_hi) = 1 << g_hi, lo bits
    if num_pairs and int(g_hi.max()) >= 32:
        # pathological long unary runs: chunk into 16-zero-bit codes the
        # way write_unary does (compression.rs:676-699)
        vals, lens = [], []
        for i in range(num_pairs):
            vals.append(int(xinfo[i]) & 0xFFF)
            lens.append(int(xinfo[i]) >> 12)
            q = int(g_hi[i])
            while q >= 16:
                vals.append(0)
                lens.append(16)
                q -= 16
            vals.append(1 << q)
            lens.append(q + 1)
            vals.append(int(g_lo[i]))
            lens.append(bb)
        vals = np.array(vals, dtype=np.uint64)
        lens = np.array(lens, dtype=np.int64)
    else:
        vals = np.empty(3 * num_pairs, dtype=np.uint64)
        lens = np.empty(3 * num_pairs, dtype=np.int64)
        vals[0::3] = (xinfo & np.uint16(0xFFF)).astype(np.uint64)
        lens[0::3] = (xinfo >> np.uint16(12)).astype(np.int64)
        vals[1::3] = np.uint64(1) << g_hi.astype(np.uint64)
        lens[1::3] = g_hi + 1
        vals[2::3] = g_lo
        lens[2::3] = bb
    return _pack_codes(vals, lens, pad_bits=max(0, 10 - bb)), num_pairs


def _uncompress_pairs(words: np.ndarray, num_pairs: int,
                      lg_k: int) -> np.ndarray:
    k = 1 << lg_k
    bb = _golomb_base_bits(k + num_pairs, num_pairs)
    rd = _BitReader(words)
    pairs = np.empty(num_pairs, dtype=np.uint32)
    pred_row, pred_col = 0, 0
    for i in range(num_pairs):
        x_delta = rd.peek12_consume(T.LENGTH_LIMITED_UNARY_DECODING_TABLE65)
        g_hi = rd.read_unary()
        g_lo = rd.take(bb) if bb else 0
        y_delta = (g_hi << bb) | g_lo
        if y_delta > 0:
            pred_col = 0
        row = pred_row + y_delta
        col = pred_col + x_delta
        pairs[i] = (row << 6) | col
        pred_row, pred_col = row, col + 1
    return pairs


# ---------------------------------------------------------------------------
# matrix <-> (window, pairs) decomposition
# ---------------------------------------------------------------------------

def _set_bits_rowcol(matrix: np.ndarray, col_lo: int = 0,
                     col_hi: int = 64) -> np.ndarray:
    """Sorted row_col u32 of set bits with col in [col_lo, col_hi)."""
    k = matrix.size
    cols = np.arange(64, dtype=np.uint64)
    bits = ((matrix[:, None] >> cols[None, :]) & np.uint64(1)).astype(bool)
    if col_lo > 0:
        bits[:, :col_lo] = False
    if col_hi < 64:
        bits[:, col_hi:] = False
    r, c = np.nonzero(bits)
    return ((r.astype(np.uint32) << np.uint32(6))
            | c.astype(np.uint32))  # already sorted (row-major nonzero)


def _decompose(sk: CpcSketch) -> tuple[np.ndarray | None, np.ndarray, int]:
    """(window bytes | None, wire-ready sorted pairs, first_interesting_col)
    per the flavor rules in the module docstring."""
    flavor = sk.flavor()
    m = sk.matrix
    if flavor == "EMPTY":
        return None, np.empty(0, dtype=np.uint32), 0
    if flavor in ("SPARSE", "HYBRID"):
        return None, _set_bits_rowcol(m), 0
    if flavor == "PINNED":
        window = (m & np.uint64(0xFF)).astype(np.uint8)
        pairs = _set_bits_rowcol(m, col_lo=8)
        return window, (pairs - np.uint32(8)), 0
    # SLIDING
    offset = sk.window_offset()
    window = ((m >> np.uint64(offset)) & np.uint64(0xFF)).astype(np.uint8)
    default = np.uint64((1 << offset) - 1)
    # surprises: zeros in the early zone, ones in the late zone
    early = _set_bits_rowcol(~m & default, col_hi=offset) if offset else \
        np.empty(0, dtype=np.uint32)
    late = _set_bits_rowcol(m, col_lo=offset + 8)
    pairs = np.concatenate([early, late]).astype(np.uint32)
    # first_interesting_column (sketch.rs:374-388): lowest column any
    # surprise occupies, clamped to the offset
    if pairs.size:
        fic = min(int((pairs & np.uint32(63)).min()), offset)
    else:
        fic = offset
    # rotate-then-permute the columns (compression.rs:147-175)
    perm = T.COLUMN_PERMUTATIONS_FOR_ENCODING[
        determine_pseudo_phase(sk.lg_k, sk.num_coupons)]
    rows = pairs >> np.uint32(6)
    cols = (pairs & np.uint32(63)).astype(np.int64)
    cols = (cols + 56 - offset) & 63
    cols = perm[cols].astype(np.uint32)
    pairs = (rows << np.uint32(6)) | cols
    pairs.sort()
    return window, pairs, fic


def _rebuild_matrix(lg_k: int, num_coupons: int,
                    window: np.ndarray | None,
                    pairs: np.ndarray) -> np.ndarray:
    """build_bit_matrix (cpc/sketch.rs:418-452)."""
    k = 1 << lg_k
    offset = determine_correct_offset(lg_k, num_coupons)
    matrix = np.full(k, (1 << offset) - 1, dtype=np.uint64)
    if window is not None and window.size:
        matrix |= window.astype(np.uint64) << np.uint64(offset)
    if pairs.size:
        rows = (pairs >> np.uint32(6)).astype(np.int64)
        bits = np.uint64(1) << (pairs & np.uint32(63)).astype(np.uint64)
        np.bitwise_xor.at(matrix, rows, bits)
    return matrix


# ---------------------------------------------------------------------------
# top-level encode / decode
# ---------------------------------------------------------------------------

def encode_cpc(sk: CpcSketch) -> bytes:
    """Reference wire bytes (cpc/sketch.rs:457-513 field order)."""
    window, pairs, fic = _decompose(sk)
    flavor = sk.flavor()
    table_words = np.empty(0, dtype="<u4")
    num_entries = 0
    if pairs.size:
        table_words, num_entries = _compress_pairs(pairs, sk.lg_k)
    window_words = np.empty(0, dtype="<u4")
    if window is not None:
        window_words = _compress_window(window, sk.lg_k, sk.num_coupons)
    has_hip = not sk.merge_flag
    has_table = table_words.size > 0
    has_window = window_words.size > 0
    preamble_ints = _make_preamble_ints(sk.num_coupons, has_hip, has_table,
                                        has_window)
    flags = ((1 << FLAG_COMPRESSED)
             | ((1 if has_hip else 0) << FLAG_HAS_HIP)
             | ((1 if has_table else 0) << FLAG_HAS_TABLE)
             | ((1 if has_window else 0) << FLAG_HAS_WINDOW))
    out = bytearray()
    out += struct.pack("<BBBBBBH", preamble_ints, SERIAL_VERSION,
                       FAMILY_CPC_REF, sk.lg_k, fic, flags,
                       compute_seed_hash(sk.seed))
    if sk.num_coupons > 0:
        out += struct.pack("<I", sk.num_coupons)
        if has_table and has_window:
            out += struct.pack("<I", num_entries)
            if has_hip:
                out += struct.pack("<dd", sk.kxp, sk.hip_est_accum)
        if has_table:
            out += struct.pack("<I", table_words.size)
        if has_window:
            out += struct.pack("<I", window_words.size)
        if has_hip and not (has_table and has_window):
            out += struct.pack("<dd", sk.kxp, sk.hip_est_accum)
        out += window_words.tobytes()
        out += table_words.tobytes()
    return bytes(out)


def _make_preamble_ints(num_coupons: int, has_hip: bool, has_table: bool,
                        has_window: bool) -> int:
    """serialization.rs:24-47."""
    n = 2
    if num_coupons > 0:
        n += 1
        if has_hip:
            n += 4
        if has_table:
            n += 1
            if has_window:
                n += 1
        if has_window:
            n += 1
    return n


def decode_cpc(buf: bytes, seed: int = DEFAULT_SEED) -> CpcSketch:
    """Reference wire bytes -> matrix-resident CpcSketch
    (cpc/sketch.rs:517-640 + compression.rs uncompress paths)."""
    if len(buf) < 8:
        raise serde.SketchDecodeError("cpc preamble truncated")
    (preamble_ints, version, family, lg_k, _fic, flags,
     seed_hash) = struct.unpack_from("<BBBBBBH", buf, 0)
    if family != FAMILY_CPC_REF:
        raise serde.SketchDecodeError(f"family {family} is not CPC")
    if version != SERIAL_VERSION:
        raise serde.SketchDecodeError(f"cpc serial version {version}")
    if not (MIN_LG_K <= lg_k <= MAX_LG_K):
        raise serde.SketchDecodeError(f"lg_k {lg_k} out of range")
    if seed_hash != compute_seed_hash(seed):
        raise serde.SketchDecodeError("seed hash mismatch")
    if not (flags & (1 << FLAG_COMPRESSED)):
        raise serde.SketchDecodeError("uncompressed cpc not supported")
    has_hip = bool(flags & (1 << FLAG_HAS_HIP))
    has_table = bool(flags & (1 << FLAG_HAS_TABLE))
    has_window = bool(flags & (1 << FLAG_HAS_WINDOW))

    off = 8
    num_coupons = 0
    num_entries = 0
    table_len = window_len = 0
    kxp, hip = float(1 << lg_k), 0.0
    if has_table or has_window:
        serde.need(buf, off, 4)
        (num_coupons,) = struct.unpack_from("<I", buf, off)
        off += 4
        if has_table and has_window:
            serde.need(buf, off, 4)
            (num_entries,) = struct.unpack_from("<I", buf, off)
            off += 4
            if has_hip:
                serde.need(buf, off, 16)
                kxp, hip = struct.unpack_from("<dd", buf, off)
                off += 16
        if has_table:
            serde.need(buf, off, 4)
            (table_len,) = struct.unpack_from("<I", buf, off)
            off += 4
        if has_window:
            serde.need(buf, off, 4)
            (window_len,) = struct.unpack_from("<I", buf, off)
            off += 4
        if has_hip and not (has_table and has_window):
            serde.need(buf, off, 16)
            kxp, hip = struct.unpack_from("<dd", buf, off)
            off += 16
        if not has_window:
            num_entries = num_coupons
    expect = _make_preamble_ints(num_coupons, has_hip, has_table, has_window)
    if preamble_ints != expect:
        raise serde.SketchDecodeError(
            f"preamble ints {preamble_ints} != expected {expect}")

    serde.need(buf, off, 4 * (window_len + table_len))
    window_words = np.frombuffer(buf, "<u4", window_len, off)
    off += 4 * window_len
    table_words = np.frombuffer(buf, "<u4", table_len, off)

    flavor = determine_flavor(lg_k, num_coupons)
    window = None
    pairs = np.empty(0, dtype=np.uint32)
    if flavor in ("SPARSE", "HYBRID"):
        pairs = _uncompress_pairs(table_words, num_entries, lg_k)
        # hybrid: pairs with col < 8 belong to the (implicit) window —
        # the rebuild places all of them as XOR bits over a zero default,
        # which is identical, so no split is needed here
    elif flavor in ("PINNED", "SLIDING"):
        window = _uncompress_window(window_words, lg_k, num_coupons)
        if num_entries:
            pairs = _uncompress_pairs(table_words, num_entries, lg_k)
            if flavor == "PINNED":
                if int((pairs & np.uint32(63)).max(initial=0)) >= 56:
                    raise serde.SketchDecodeError("pinned pair col >= 56")
                pairs = pairs + np.uint32(8)
            else:
                perm = T.COLUMN_PERMUTATIONS_FOR_DECODING[
                    determine_pseudo_phase(lg_k, num_coupons)]
                offset = determine_correct_offset(lg_k, num_coupons)
                rows = pairs >> np.uint32(6)
                cols = perm[(pairs & np.uint32(63)).astype(np.int64)] \
                    .astype(np.int64)
                cols = (cols + offset + 8) & 63
                pairs = (rows << np.uint32(6)) | cols.astype(np.uint32)

    matrix = _rebuild_matrix(lg_k, num_coupons, window, pairs)
    sk = CpcSketch(lg_k=lg_k, seed=seed, matrix=matrix,
                   num_coupons=num_coupons, merge_flag=not has_hip,
                   kxp=kxp, hip_est_accum=hip)
    if not sk.validate():
        raise serde.SketchDecodeError(
            "decoded matrix bit count != num_coupons")
    return sk
