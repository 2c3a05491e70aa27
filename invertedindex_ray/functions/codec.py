"""Posting-list compression codecs: variable-byte encoding, d-gap transform,
and skip pointers — vectorized numpy implementations.

Byte format matches the reference exactly where formats overlap:

- **Variable-byte** (/root/reference/src/main/java/it/unipi/utils/
  EncodingUtils.java:14-81): big-endian base-128 digit groups, the *last*
  byte of each value has its high bit set (+128); ``0`` encodes to ``0x80``.
  Extended here to unsigned 64-bit values (the reference caps at int32;
  our doc ids are int64 to survive 10^12-doc corpora and hash-mode ids).
- **d-gaps** (indexer/BinaryIndexer.java:188-202): first doc id absolute,
  subsequent values are deltas from the previous doc id.
- **Skip pointers** (models/LexiconTermBinaryIndexing.java:60-107,
  utils/Constants.java:39-41): for df > threshold, block size
  ``ceil(sqrt(df))``; one entry per block *after the first* holding the
  first (absolute) doc id of that block plus cumulative VB byte offsets of
  the doc-id and frequency streams at the block boundary. The reference
  packs entries as 20 B (int32 id + 2×int64); ours are 24 B big-endian
  (int64 id + 2×int64) because ids are int64. Entries are prepended to the
  doc-id stream in the reference file layout; we store them in a separate
  ``skips`` column of the segment table, which is the same information.
"""

from __future__ import annotations

import numpy as np

SKIP_ENTRY_BYTES = 24  # int64 doc_id + int64 doc_byte_off + int64 tf_byte_off
_POW128 = np.array([128 ** k for k in range(9)], dtype=np.uint64)


def vb_encoded_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte length (EncodingUtils.getEncodingLength, but
    exact integer math — verified equal to the reference's float formula
    over all boundaries)."""
    v = values.astype(np.uint64, copy=False)
    n = np.ones(len(v), dtype=np.int64)
    for k in range(1, 9):
        n += (v >= _POW128[k]).astype(np.int64)
    return n


def vb_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode an array of non-negative ints to one VB byte stream.

    Returns ``(bytestream: uint8[], end_offsets: int64[])`` where
    ``end_offsets[i]`` is the byte offset one past value i (so value i
    occupies ``bytestream[end[i-1]:end[i]]``).
    """
    v = values.astype(np.uint64, copy=False)
    if len(v) == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nbytes = vb_encoded_lengths(v)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    if total == len(v):
        # all single-byte (values < 128): one vectorized pass
        out = v.astype(np.uint8)
        out |= 0x80
        return out, ends
    # one flat pass: byte i belongs to value vid[i] and sits shift[i] 7-bit
    # digits from that value's end — no per-round boolean masking
    vid = np.repeat(np.arange(len(v), dtype=np.int64), nbytes)
    shift = ((ends[vid] - 1 - np.arange(total, dtype=np.int64)) * 7).astype(np.uint64)
    out = ((v[vid] >> shift) & np.uint64(0x7F)).astype(np.uint8)
    out[ends - 1] |= 0x80
    return out, ends


def vb_decode(stream: np.ndarray | bytes) -> np.ndarray:
    """Decode a VB byte stream back to a uint64 array (vectorized)."""
    b = np.frombuffer(stream, dtype=np.uint8) if isinstance(stream, (bytes, bytearray, memoryview)) else stream
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b & 0x80) + 1
    n_vals = len(ends)
    if len(b) == n_vals:
        # all single-byte: strip the terminal bit in one pass
        return (b & np.uint8(0x7F)).astype(np.uint64)
    starts = np.empty(n_vals, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1]
    lengths = ends - starts
    payload = (b & 0x7F).astype(np.uint64)
    # one flat pass: contribution of byte i = payload << 7*(digits from its
    # value's end); per-value sum via add.reduceat — no per-round masking
    vid = np.repeat(np.arange(n_vals, dtype=np.int64), lengths)
    shift = ((ends[vid] - 1 - np.arange(len(b), dtype=np.int64)) * 7).astype(np.uint64)
    return np.add.reduceat(payload << shift, starts)


def dgap_encode(doc_ids: np.ndarray) -> np.ndarray:
    """First value absolute, rest deltas (BinaryIndexer.java:188-202)."""
    ids = doc_ids.astype(np.int64, copy=False)
    if len(ids) == 0:
        return ids
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return gaps


def dgap_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.int64, copy=False))


def build_skips(
    doc_ids: np.ndarray,
    doc_byte_ends: np.ndarray,
    tf_byte_ends: np.ndarray,
    threshold: int = 1024,
) -> bytes:
    """Skip-pointer blob for one posting list.

    ``doc_ids`` are the *absolute* ids (sorted); ``*_byte_ends`` are the
    per-posting cumulative VB byte offsets (from :func:`vb_encode` of the
    gapped ids / tfs). Mirrors LexiconTermBinaryIndexing.writeToDisk
    (:60-107): block size = ceil(sqrt(df)); one entry per block after the
    first: (absolute first doc id of block i+1, byte offset of the doc-id
    stream at the end of block i, same for the tf stream).

    Returns b"" when df <= threshold.
    """
    df = len(doc_ids)
    if df <= threshold:
        return b""
    block = int(np.ceil(np.sqrt(df)))
    n_blocks = int(np.ceil(df / block))
    n_entries = n_blocks - 1
    if n_entries <= 0:
        return b""
    boundary = np.arange(1, n_entries + 1) * block  # first index of each later block
    entry_ids = doc_ids[boundary].astype(">i8")
    entry_doc_off = doc_byte_ends[boundary - 1].astype(">i8")
    entry_tf_off = tf_byte_ends[boundary - 1].astype(">i8")
    out = np.empty((n_entries, 3), dtype=">i8")
    out[:, 0] = entry_ids
    out[:, 1] = entry_doc_off
    out[:, 2] = entry_tf_off
    return out.tobytes()


def parse_skips(blob: bytes) -> np.ndarray:
    """Return an (n, 3) int64 array of (doc_id, doc_byte_off, tf_byte_off)."""
    if not blob:
        return np.empty((0, 3), dtype=np.int64)
    return np.frombuffer(blob, dtype=">i8").astype(np.int64).reshape(-1, 3)


def encode_posting_list(
    doc_ids: np.ndarray, tfs: np.ndarray, skip_threshold: int = 1024
) -> tuple[bytes, bytes, bytes]:
    """Compress one sorted posting list -> (doc_ids_vb, tfs_vb, skips)."""
    gaps = dgap_encode(doc_ids)
    doc_stream, doc_ends = vb_encode(gaps)
    tf_stream, tf_ends = vb_encode(tfs)
    skips = build_skips(doc_ids, doc_ends, tf_ends, skip_threshold)
    return doc_stream.tobytes(), tf_stream.tobytes(), skips


def decode_posting_list(
    doc_ids_vb: bytes, tfs_vb: bytes, stream_codec: str = "vb"
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_posting_list` (ignores skips);
    ``stream_codec`` selects the on-disk codec the blobs were written
    with (IndexConfig.codec)."""
    gaps = decode_stream(doc_ids_vb, stream_codec)
    ids = dgap_decode(gaps)
    tfs = decode_stream(tfs_vb, stream_codec)
    return ids, tfs


# --------------------------------------------------------- Elias gamma/delta

def _bit_lengths(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 values >= 1."""
    v = x.astype(np.uint64).copy()
    lens = np.zeros(len(v), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = (v >> np.uint64(shift)) > 0
        lens[big] += shift
        v[big] >>= np.uint64(shift)
    return lens + 1


def _scatter_binary(bits: np.ndarray, at: np.ndarray, x: np.ndarray,
                    lens: np.ndarray, drop_msb: bool = False) -> None:
    """Write each value's binary form (MSB first, optionally without its
    leading 1 bit) into the flat bit array at per-value offsets — one
    vectorized masked scatter per bit position (<= 64 passes), no
    per-value Python loop."""
    width = lens - 1 if drop_msb else lens
    for p in range(int(width.max()) if len(width) else 0):
        m = width > p
        shift = (width[m] - 1 - p).astype(np.uint64)
        bits[at[m] + p] = ((x[m] >> shift) & np.uint64(1)).astype(np.uint8)


def elias_gamma_encode(values: np.ndarray) -> tuple[bytes, int]:
    """Elias gamma code (Elias, IEEE-IT 1975) for values >= 1: N-1 zero
    bits then the N-bit binary form. Returns (packed bytes, total bits)
    — gamma beats VB below ~5-bit gaps (dense posting lists), the
    classic alternative codec. Encoding is fully vectorized (bit-length
    by shifts, one masked scatter per bit position)."""
    x = np.asarray(values, dtype=np.uint64)
    if len(x) == 0:
        return b"", 0
    if (x < 1).any():
        raise ValueError("elias gamma encodes values >= 1 only")
    lens = _bit_lengths(x)
    starts = np.concatenate(([0], np.cumsum(2 * lens - 1)[:-1]))
    total = int((2 * lens - 1).sum())
    bits = np.zeros(total, dtype=np.uint8)
    # unary prefix is zeros (already zeroed); binary part at offset len-1
    _scatter_binary(bits, starts + lens - 1, x, lens)
    return np.packbits(bits).tobytes(), total


_ASSEMBLE_CHUNK = 1 << 18  # codes per chunk — bounds transient arrays


def _assemble_msb_first(bits: np.ndarray, firsts: np.ndarray,
                        lens: np.ndarray) -> np.ndarray:
    """Vectorized big-endian integer assembly: value i is the ``lens[i]``
    bits of ``bits`` starting at ``firsts[i]``, MSB first. Gather +
    reduceat — no per-bit Python loop. Processed in bounded chunks of
    codes: the temporaries are ~32 B per encoded BIT, so one whole-list
    pass over a high-df term's list (which always decodes whole under
    gamma/delta — no skips) would allocate GBs; chunking keeps the peak
    at O(chunk) with identical output."""
    n = len(firsts)
    if not n:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(n, dtype=np.uint64)
    for c0 in range(0, n, _ASSEMBLE_CHUNK):
        c1 = min(c0 + _ASSEMBLE_CHUNK, n)
        f, l = firsts[c0:c1], lens[c0:c1]
        total = int(l.sum())
        seg_starts = np.zeros(c1 - c0, dtype=np.int64)
        np.cumsum(l[:-1], out=seg_starts[1:])
        within = np.arange(total, dtype=np.int64) - np.repeat(seg_starts, l)
        idx = np.repeat(f, l) + within
        weights = np.uint64(1) << (np.repeat(l, l) - 1 - within).astype(np.uint64)
        terms = bits[idx].astype(np.uint64) * weights
        out[c0:c1] = np.add.reduceat(terms, seg_starts)
    return out


def elias_gamma_decode(blob: bytes, total_bits: int) -> np.ndarray:
    """Inverse of :func:`elias_gamma_encode`. The boundary scan is a
    per-code loop (codes are variable-width and self-delimiting — the
    same sequential dependency every gamma decoder has), but it touches
    only the code BOUNDARIES; the binary bodies are assembled afterwards
    in one vectorized gather+reduceat pass (_assemble_msb_first)."""
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))[:total_bits]
    firsts: list[int] = []
    lens: list[int] = []
    pos = 0
    n = len(bits)
    set_positions = np.flatnonzero(bits)
    si = 0
    n_set = len(set_positions)
    while pos < n:
        while si < n_set and set_positions[si] < pos:
            si += 1
        if si >= n_set:
            break
        first_one = int(set_positions[si])
        length = first_one - pos + 1
        firsts.append(first_one)
        lens.append(length)
        pos = first_one + length
    return _assemble_msb_first(
        bits,
        np.asarray(firsts, dtype=np.int64),
        np.asarray(lens, dtype=np.int64),
    )


def elias_delta_encode(values: np.ndarray) -> tuple[bytes, int]:
    """Elias delta: gamma(bit_length(x)) then x's binary form without its
    leading 1 — asymptotically shorter than gamma for large values."""
    x = np.asarray(values, dtype=np.uint64)
    if len(x) == 0:
        return b"", 0
    if (x < 1).any():
        raise ValueError("elias delta encodes values >= 1 only")
    lens = _bit_lengths(x)
    llens = _bit_lengths(lens.astype(np.uint64))
    widths = (2 * llens - 1) + (lens - 1)
    starts = np.concatenate(([0], np.cumsum(widths)[:-1]))
    total = int(widths.sum())
    bits = np.zeros(total, dtype=np.uint8)
    # gamma(lens): binary part at start + llens-1
    _scatter_binary(bits, starts + llens - 1, lens.astype(np.uint64), llens)
    # x without MSB at start + 2*llens-1
    _scatter_binary(bits, starts + 2 * llens - 1, x, lens, drop_msb=True)
    return np.packbits(bits).tobytes(), total


def elias_delta_decode(blob: bytes, total_bits: int) -> np.ndarray:
    """Inverse of :func:`elias_delta_encode`. The boundary scan decodes
    each code's tiny gamma(length) header inline (<= 6 bits for 64-bit
    values); the value bodies — the bulk of the stream — are assembled
    in one vectorized pass, re-attaching the implicit leading 1 bit."""
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))[:total_bits]
    body_starts: list[int] = []
    body_lens: list[int] = []
    pos = 0
    n = len(bits)
    set_positions = np.flatnonzero(bits)
    si = 0
    n_set = len(set_positions)
    while pos < n:
        while si < n_set and set_positions[si] < pos:
            si += 1
        if si >= n_set:
            break
        first_one = int(set_positions[si])
        llen = first_one - pos + 1
        length = 0
        for b in bits[first_one:first_one + llen]:
            length = (length << 1) | int(b)
        body_starts.append(first_one + llen)
        body_lens.append(length - 1)  # stored without the leading 1
        pos = first_one + llen + length - 1
    starts = np.asarray(body_starts, dtype=np.int64)
    lens = np.asarray(body_lens, dtype=np.int64)
    vals = np.zeros(len(starts), dtype=np.uint64)
    has_body = lens > 0
    if has_body.any():
        vals[has_body] = _assemble_msb_first(bits, starts[has_body], lens[has_body])
    return vals + (np.uint64(1) << lens.astype(np.uint64))

# ------------------------------------------------- codec-dispatch helpers

#: On-disk posting-stream codecs an index can be built with
#: (IndexConfig.codec). "vb" is the reference's layout
#: (EncodingUtils.java:14-76); gamma/delta are the classic bit-aligned
#: alternatives (Elias, IEEE-IT 1975) — denser on small d-gaps, at the
#: cost of skip-pointer support (skips store BYTE offsets, so bit-aligned
#: streams decode whole lists; see stages/segment.py).
STREAM_CODECS = ("vb", "gamma", "delta")


def encode_stream(values: np.ndarray, stream_codec: str = "vb") -> bytes:
    """One posting-stream blob under ``stream_codec``. VB blobs are the
    raw byte stream (layout identical to rounds 1-4). Gamma/delta blobs
    are self-describing: a little-endian uint32 total-bit count, then the
    packed bits; values are shifted +1 on the wire because Elias codes
    encode >= 1 only and dense doc ids / first gaps can be 0."""
    import struct

    v = np.asarray(values, dtype=np.int64)
    if stream_codec == "vb":
        stream, _ends = vb_encode(v)
        return stream.tobytes()
    if stream_codec == "gamma":
        blob, bits = elias_gamma_encode(v.astype(np.uint64) + np.uint64(1))
    elif stream_codec == "delta":
        blob, bits = elias_delta_encode(v.astype(np.uint64) + np.uint64(1))
    else:
        raise ValueError(f"unknown stream codec {stream_codec!r} "
                         f"(one of {STREAM_CODECS})")
    return struct.pack("<I", bits) + blob


def decode_stream(blob: bytes, stream_codec: str = "vb") -> np.ndarray:
    """Inverse of :func:`encode_stream`."""
    import struct

    if stream_codec == "vb":
        return vb_decode(blob).astype(np.int64)
    if not blob:
        return np.empty(0, dtype=np.int64)
    (bits,) = struct.unpack("<I", blob[:4])
    body = blob[4:]
    if stream_codec == "gamma":
        vals = elias_gamma_decode(body, bits)
    elif stream_codec == "delta":
        vals = elias_delta_decode(body, bits)
    else:
        raise ValueError(f"unknown stream codec {stream_codec!r} "
                         f"(one of {STREAM_CODECS})")
    return vals.astype(np.int64) - 1

