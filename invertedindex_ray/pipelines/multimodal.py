"""Multimodal-column plumbing: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by actor-pool
map_batches stages.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic STUB (`FakeImageDecoder`) — but the Ray-side
plumbing is real: binary columns flow zero-copy through Arrow batches, the
decoder is per-actor state initialised once, batch sizes are small because
rows are wide, and outputs are fixed-width feature vectors. Swapping in a
real decoder (PIL/ffmpeg) changes only ``_decode_one``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _pages(sf_dir: str):
    from invertedindex_ray.sources.pages import read_pages_from_documents

    return read_pages_from_documents(sf_dir)


def binary_metadata(sf_dir: str):
    """(url, n_bytes, kind): typed metadata over the opaque binary column.
    SQL-checkable: the synthesized html is ``<html><body>{text}</body></html>``
    so n_bytes == 26 + octet_length(text)."""

    def f(batch: pa.Table) -> pa.Table:
        html = batch["html"].to_pylist()
        n = np.fromiter((len(h or b"") for h in html), dtype=np.int64, count=len(html))
        kind = ["text/html"] * len(html)
        return pa.table(
            {
                "url": batch["url"].combine_chunks()
                if isinstance(batch["url"], pa.ChunkedArray)
                else batch["url"],
                "n_bytes": pa.array(n, type=pa.int64()),
                "kind": pa.array(kind, type=pa.string()),
            }
        )

    return _pages(sf_dir).map_batches(f, batch_format="pyarrow")


class FakeImageDecoder:
    """STUB decode/feature-extract stage standing in for a real image
    pipeline (no PIL/libjpeg in this container).

    Real-world shape this models: ``__init__`` loads the model/codec once
    per actor; ``__call__`` decodes a SMALL batch of large binary payloads
    and emits fixed-width features. The stub derives deterministic
    pseudo-metadata and an 8-float feature from the payload digest, so the
    schema, batching and actor lifecycle are fully testable.
    """

    FEATURE_DIM = 8

    def __init__(self) -> None:
        # stands in for: self.model = load_model(...); self.codec = ...
        self.ready = True

    def _decode_one(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if not self.ready:  # pragma: no cover - actor init contract
            raise NotImplementedError("decoder not initialised")
        digest = hashlib.sha256(payload).digest()
        width = 64 + digest[0]  # deterministic fake dimensions
        height = 64 + digest[1]
        feat = (
            np.frombuffer(digest[: self.FEATURE_DIM * 4], dtype=np.uint32).astype(
                np.float64
            )
            / np.float64(2**32)
        )
        return width, height, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["html"].to_pylist()
        widths, heights, feats = [], [], []
        for p in payloads:
            w, h, f = self._decode_one(p or b"")
            widths.append(w)
            heights.append(h)
            feats.append(f.tolist())
        return pa.table(
            {
                "url": batch["url"].combine_chunks()
                if isinstance(batch["url"], pa.ChunkedArray)
                else batch["url"],
                "width": pa.array(np.asarray(widths, dtype=np.int32), type=pa.int32()),
                "height": pa.array(np.asarray(heights, dtype=np.int32), type=pa.int32()),
                "feature": pa.array(feats, type=pa.list_(pa.float64())),
            }
        )


def decode_features(sf_dir: str, *, concurrency: int = 2, batch_size: int = 64):
    """Actor-pool decode stage over the binary column. Small batch size on
    purpose: wide binary rows × concurrency must fit worker heaps."""
    return _pages(sf_dir).map_batches(
        FakeImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
