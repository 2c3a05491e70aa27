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
        widths, heights = [], []
        feats = np.empty((len(payloads), self.FEATURE_DIM), dtype=np.float64)
        for i, p in enumerate(payloads):
            w, h, f = self._decode_one(p or b"")
            widths.append(w)
            heights.append(h)
            feats[i] = f
        cols = {
            "url": batch["url"].combine_chunks()
            if isinstance(batch["url"], pa.ChunkedArray)
            else batch["url"],
            "width": pa.array(np.asarray(widths, dtype=np.int32), type=pa.int32()),
            "height": pa.array(np.asarray(heights, dtype=np.int32), type=pa.int32()),
        }
        # fixed-width features as scalar columns (f0..f7): SQL-checkable
        # and friendlier to downstream Arrow kernels than list cells
        for j in range(self.FEATURE_DIM):
            cols[f"f{j}"] = pa.array(feats[:, j], type=pa.float64())
        return pa.table(cols)


def decode_features(sf_dir: str, *, concurrency: int = 2, batch_size: int = 64):
    """Actor-pool decode stage over the binary column. Small batch size on
    purpose: wide binary rows × concurrency must fit worker heaps."""
    return _pages(sf_dir).map_batches(
        FakeImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FakeImageResizer:
    """STUB resize stage (actor pool): consumes the decoder's fake
    dimensions and emits aspect-preserving integer-resized dims, capped at
    ``max_side``. Integer arithmetic only, so the SQL oracle mirrors it
    exactly; a real implementation would transform the pixel buffer here."""

    def __init__(self, max_side: int = 128) -> None:
        self.max_side = max_side
        self.decoder = FakeImageDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["html"].to_pylist()
        out_w, out_h, new_w, new_h = [], [], [], []
        m = self.max_side
        for p in payloads:
            w, h, _ = self.decoder._decode_one(p or b"")
            if max(w, h) <= m:
                nw, nh = w, h
            else:
                side = max(w, h)
                nw, nh = max(1, w * m // side), max(1, h * m // side)
            out_w.append(w)
            out_h.append(h)
            new_w.append(nw)
            new_h.append(nh)
        return pa.table(
            {
                "url": batch["url"].combine_chunks()
                if isinstance(batch["url"], pa.ChunkedArray)
                else batch["url"],
                "width": pa.array(np.asarray(out_w, dtype=np.int32), type=pa.int32()),
                "height": pa.array(np.asarray(out_h, dtype=np.int32), type=pa.int32()),
                "new_width": pa.array(np.asarray(new_w, dtype=np.int32), type=pa.int32()),
                "new_height": pa.array(np.asarray(new_h, dtype=np.int32), type=pa.int32()),
            }
        )


def resize_images(sf_dir: str, *, max_side: int = 128, concurrency: int = 2,
                  batch_size: int = 64):
    """Actor-pool resize over the binary column (stub kernel, real
    plumbing — see FakeImageResizer)."""
    return _pages(sf_dir).map_batches(
        FakeImageResizer,
        fn_constructor_args=(max_side,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(sf_dir: str, *, frame_bytes: int = 16, stride: int = 4):
    """(url, frame_idx, byte_offset): video-style frame sampling over the
    opaque payload — treat every ``frame_bytes`` bytes as one frame and
    keep every ``stride``-th frame. Pure arithmetic on payload length
    (deterministic, SQL-checkable); a real video pipeline would seek and
    decode those offsets per actor."""

    def f(batch: pa.Table) -> pa.Table:
        html = batch["html"].to_pylist()
        urls = batch["url"].to_pylist()
        out_u, out_i, out_o = [], [], []
        for u, p in zip(urls, html):
            n_frames = len(p or b"") // frame_bytes
            for idx in range(0, n_frames, stride):
                out_u.append(u)
                out_i.append(idx)
                out_o.append(idx * frame_bytes)
        return pa.table(
            {
                "url": pa.array(out_u, type=pa.string()),
                "frame_idx": pa.array(np.asarray(out_i, dtype=np.int64), type=pa.int64()),
                "byte_offset": pa.array(np.asarray(out_o, dtype=np.int64), type=pa.int64()),
            }
        )

    return _pages(sf_dir).map_batches(f, batch_format="pyarrow")
