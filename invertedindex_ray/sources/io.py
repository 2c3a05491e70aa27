"""Shared parquet-read entry point for every pipeline.

Why this exists: the corpus parquet files carry ``b'pandas'`` schema
metadata (written via pandas), and ``pa.Schema.__hash__`` raises
``unhashable type: 'dict'`` whenever metadata is present (pyarrow 16).
Ray Data hashes block schemas to dedupe them every time a map_batches
task concatenates multiple input blocks into one batch, so every
pipeline over the raw tables logged ``Failed to hash the schemas`` and
follow-up ``RefBundle with a different schema`` warnings (VERDICT r4
"What's wrong" #3). Passing an explicit metadata-free schema — read
from the FOOTER only, types untouched — keeps every downstream block
schema clean and hashable. No data-path behavior changes.
"""

from __future__ import annotations

import os

import pyarrow as pa


def _footer_schema(path) -> pa.Schema:
    """File (or first part file of a directory / list of files) schema
    from the parquet footer, with all metadata stripped — no data
    read."""
    import pyarrow.parquet as pq

    if isinstance(path, (list, tuple)):
        if not path:
            raise FileNotFoundError("empty parquet path list")
        path = path[0]
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not parts:
            # hive-partitioned layout (key=value subdirs): the partition
            # column is not in any file footer, so an explicit schema
            # would silently drop it — caller falls back to a plain read
            return None
        path = os.path.join(path, parts[0])
    sch = pq.read_schema(path)
    sch = sch.remove_metadata()
    # nested fields can carry their own metadata; rebuild flat fields
    return pa.schema(
        [sch.field(i).remove_metadata() for i in range(len(sch.names))]
    )


def read_parquet_clean(path, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` with a metadata-free explicit schema.

    ``columns`` projects the schema the same way it projects the read;
    all other kwargs (``filter=``, ``override_num_blocks=``, ...) pass
    through unchanged.
    """
    import ray.data as rd

    sch = _footer_schema(path)
    if sch is None:  # partitioned layout: plain read (see _footer_schema)
        return rd.read_parquet(path, columns=columns, **kwargs)
    if columns is not None:
        columns = list(columns)
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=sch, **kwargs)
