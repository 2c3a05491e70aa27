"""Codec tests: golden VB bytes vs the reference format, round-trips
(hypothesis), d-gaps, skip-pointer layout and offsets."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invertedindex_ray.functions import codec


class TestVBGoldenBytes:
    # hand-computed vectors matching EncodingUtils.java:14-27 semantics:
    # big-endian 7-bit groups, final byte +128, 0 -> 0x80
    GOLDEN = [
        (0, [0x80]),
        (1, [0x81]),
        (5, [0x85]),
        (127, [0xFF]),
        (128, [0x01, 0x80]),
        (129, [0x01, 0x81]),
        (777, [0x06, 0x89]),
        (16383, [0x7F, 0xFF]),
        (16384, [0x01, 0x00, 0x80]),
        (2097151, [0x7F, 0x7F, 0xFF]),
        (2097152, [0x01, 0x00, 0x00, 0x80]),
        (2**31 - 1, [0x07, 0x7F, 0x7F, 0x7F, 0xFF]),
        # 64-bit extension (beyond the reference's int32 cap)
        (2**62, [0x40, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x80]),
    ]

    @pytest.mark.parametrize("value,expected", GOLDEN, ids=[str(v) for v, _ in GOLDEN])
    def test_single_value(self, value, expected):
        stream, ends = codec.vb_encode(np.array([value], dtype=np.uint64))
        assert list(stream) == expected
        assert ends.tolist() == [len(expected)]

    def test_multi_value_stream(self):
        vals = np.array([0, 1, 128, 777], dtype=np.uint64)
        stream, ends = codec.vb_encode(vals)
        assert list(stream) == [0x80, 0x81, 0x01, 0x80, 0x06, 0x89]
        assert ends.tolist() == [1, 2, 4, 6]

    def test_lengths_match_reference_formula(self):
        import math

        vals = [1, 127, 128, 16383, 16384, 2097151, 2097152, 268435455,
                268435456, 2**31 - 1]
        arr = np.array(vals, dtype=np.uint64)
        ours = codec.vb_encoded_lengths(arr)
        # EncodingUtils.getEncodingLength: (int)(log(n)/log(128)) + 1
        ref = [int(math.log(n) / math.log(128)) + 1 for n in vals]
        assert ours.tolist() == ref


class TestRoundTrip:
    @given(
        st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200)
    )
    @settings(max_examples=200, deadline=None)
    def test_vb_roundtrip(self, values):
        arr = np.array(values, dtype=np.uint64)
        stream, ends = codec.vb_encode(arr)
        out = codec.vb_decode(stream)
        assert out.tolist() == values
        if len(values):
            assert int(ends[-1]) == len(stream)

    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_posting_list_roundtrip(self, ids):
        ids = np.array(sorted(ids), dtype=np.int64)
        tfs = (ids % 7 + 1).astype(np.int64)
        d, t, s = codec.encode_posting_list(ids, tfs, skip_threshold=16)
        rid, rtf = codec.decode_posting_list(d, t)
        assert rid.tolist() == ids.tolist()
        assert rtf.tolist() == tfs.tolist()


class TestDgaps:
    def test_basic(self):
        ids = np.array([3, 5, 20, 21], dtype=np.int64)
        gaps = codec.dgap_encode(ids)
        assert gaps.tolist() == [3, 2, 15, 1]
        assert codec.dgap_decode(gaps).tolist() == ids.tolist()

    def test_first_absolute(self):
        assert codec.dgap_encode(np.array([100], dtype=np.int64)).tolist() == [100]


class TestSkips:
    def _build(self, df, threshold=1024):
        ids = np.arange(df, dtype=np.int64) * 3 + 1  # sorted, gaps of 3
        tfs = np.ones(df, dtype=np.int64)
        d, t, s = codec.encode_posting_list(ids, tfs, skip_threshold=threshold)
        return ids, d, t, s

    def test_no_skips_at_or_below_threshold(self):
        _, _, _, s = self._build(1024)
        assert s == b""

    def test_skip_layout_sqrt_blocks(self):
        df = 2000
        ids, d, t, s = self._build(df)
        block = int(np.ceil(np.sqrt(df)))  # 45
        n_blocks = int(np.ceil(df / block))  # 45
        entries = codec.parse_skips(s)
        assert len(entries) == n_blocks - 1
        # entry i holds the absolute first doc id of block i+1
        # (LexiconTermBinaryIndexing.java:81-88)
        for i, (skip_id, doc_off, tf_off) in enumerate(entries):
            idx = block * (i + 1)
            assert skip_id == ids[idx]

    def test_skip_offsets_land_on_block_starts(self):
        df = 3000
        ids, dstream, tstream, s = self._build(df)
        block = int(np.ceil(np.sqrt(df)))
        entries = codec.parse_skips(s)
        for i, (skip_id, doc_off, tf_off) in enumerate(entries):
            # decoding the stream from the recorded offset must yield the
            # gap sequence of block i+1 (first decoded value is the gap
            # from the previous block's last id — the reference overwrites
            # it with skip_id, PostingListInterface.java:160-167)
            tail = codec.vb_decode(np.frombuffer(dstream, dtype=np.uint8)[doc_off:])
            idx = block * (i + 1)
            expected_gap = ids[idx] - ids[idx - 1]
            assert int(tail[0]) == expected_gap

    def test_skips_in_segment_build_threshold_default(self):
        # df just above threshold gets skips
        _, _, _, s = self._build(1025)
        assert len(s) > 0
        assert len(s) % codec.SKIP_ENTRY_BYTES == 0


class TestEliasCodes:
    """Golden bit vectors from Elias (1975) plus round-trips. Bit strings
    read MSB-first within the packed byte stream."""

    @staticmethod
    def _bitstr(blob: bytes, nbits: int) -> str:
        bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))[:nbits]
        return "".join(str(int(b)) for b in bits)

    def test_gamma_golden(self):
        golden = {1: "1", 2: "010", 3: "011", 4: "00100", 5: "00101",
                  9: "0001001", 16: "000010000"}
        for v, bitstr in golden.items():
            blob, n = codec.elias_gamma_encode(np.array([v]))
            assert self._bitstr(blob, n) == bitstr, v
        blob, n = codec.elias_gamma_encode(np.array([1, 2, 3, 4]))
        assert self._bitstr(blob, n) == "1" + "010" + "011" + "00100"

    def test_delta_golden(self):
        golden = {1: "1", 2: "0100", 3: "0101", 4: "01100", 5: "01101",
                  8: "00100000", 9: "00100001"}
        for v, bitstr in golden.items():
            blob, n = codec.elias_delta_encode(np.array([v]))
            assert self._bitstr(blob, n) == bitstr, v

    @given(st.lists(st.integers(min_value=1, max_value=2**40), max_size=200))
    @settings(max_examples=40, deadline=None)
    def test_gamma_roundtrip(self, vals):
        blob, n = codec.elias_gamma_encode(np.array(vals, dtype=np.uint64))
        out = codec.elias_gamma_decode(blob, n)
        assert out.tolist() == vals

    @given(st.lists(st.integers(min_value=1, max_value=2**40), max_size=200))
    @settings(max_examples=40, deadline=None)
    def test_delta_roundtrip(self, vals):
        blob, n = codec.elias_delta_encode(np.array(vals, dtype=np.uint64))
        out = codec.elias_delta_decode(blob, n)
        assert out.tolist() == vals

    def test_rejects_zero_and_empty_ok(self):
        for enc in (codec.elias_gamma_encode, codec.elias_delta_encode):
            assert enc(np.array([], dtype=np.uint64)) == (b"", 0)
            with pytest.raises(ValueError):
                enc(np.array([0]))

    def test_gamma_beats_vb_on_small_gaps(self):
        """The reason the codec exists: dense posting lists (gaps of a
        few bits) compress below VB's 1-byte-per-value floor."""
        gaps = np.ones(1000, dtype=np.uint64)  # gap=1: gamma is 1 bit
        blob, n = codec.elias_gamma_encode(gaps)
        vb, _ = codec.vb_encode(gaps.astype(np.int64))
        assert len(blob) < len(vb.tobytes())
