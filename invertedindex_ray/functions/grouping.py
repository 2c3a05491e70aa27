"""Distributed grouping utilities shared by every keyed reduction in
the engine.

Two execution findings drive this module (measured in round 3, see
SURVEY.md):

1. Ray Data's ``groupby(key).aggregate(...)`` / per-key ``map_groups``
   dispatch per GROUP in Python (~2 ms each): 76-83 s for a Min over
   458 k near-unique keys vs 1.8 s for the hash-partition + one
   vectorized numpy pass per partition shape implemented here.
2. Ray's groupby/map_groups emit schema-less EMPTY blocks for barren
   partitions, which crash downstream Acero hash joins (the round-2
   dedup_minhash_lsh failure); every helper here returns typed blocks.

Public API (pipelines import the underscored aliases via
``pipelines.dedup`` for historical reasons — same objects):

- :func:`normalize_schema` / :func:`materialized_nonempty` /
  :func:`rd_empty` — typed-empty-block hygiene around joins.
- :func:`grouped_partitions` — aggregate-shaped keyed reduction.
- :func:`keyed_partitions` — drop-in for ``groupby().map_groups`` with
  unchanged per-group functions.
- :func:`pair_join_partitions` — data-derived hash-join fan-out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from invertedindex_ray.functions.hashing import mix64 as _mix64


def normalize_schema(ds, schema: pa.Schema):
    """Cast every non-empty block of ``ds`` to typed Arrow ``schema``.
    NOTE: map_batches never invokes the fn on EMPTY blocks (they pass
    through untouched), so this alone cannot fix schema-less empties —
    pair it with :func:`materialized_nonempty` before a join."""
    names = schema.names

    def norm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or set(names) - set(batch.schema.names):
            return schema.empty_table()
        return pa.table(
            {n: batch[n].cast(schema.field(n).type) for n in names}
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def materialized_nonempty(ds, schema: pa.Schema):
    """Materialize ``ds`` and rebuild it WITHOUT its empty blocks.

    Ray's ``groupby().map_groups`` / hash aggregate emit column-less
    empty pandas blocks ("PandasBlockSchema(names=[])") for partitions
    that produce zero groups, and map_batches passes empty blocks through
    without calling the fn — so one of those schema-less empties can reach
    an Acero hash-join partition builder, where the join key becomes
    unresolvable (``ArrowInvalid: No match ... FieldRef.Name(doc_a)``;
    the round-2 dedup_minhash_lsh crash, deterministic at 16 join
    partitions). Dropping empties is pure block-METADATA work on the
    driver (O(#blocks), no rows fetched); every surviving block is typed
    Arrow (the caller normalizes first). Returns ``(dataset, n_rows)``
    so the join fan-out can be derived from data size, never cluster
    size."""
    import ray
    import ray.data as rd

    mat = ds.materialize()
    refs, n = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
                n += meta.num_rows
    if not refs:  # keep downstream schema stable on a fully-empty result
        refs = [ray.put(schema.empty_table())]
    return rd.from_arrow_refs(refs), n


def rd_empty(schema: pa.Schema):
    """A one-block dataset holding a typed empty table."""
    import ray.data as rd

    return rd.from_arrow(schema.empty_table())


def parquet_num_rows(path: str) -> int:
    """Row count from parquet FOOTERS only (no data read) — works for a
    single file or a directory of part files (the only layout that
    exists at 100 TB; a ParquetFile() call on a directory raises)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def pair_join_partitions(n_rows: int) -> int:
    """Hash-join fan-out derived from DATA SIZE (left-side row count) —
    never from the cluster: a cluster-size-dependent plan made the same
    input crash on one machine and pass on another (VERDICT r2 #2).
    Fixed floor of 2, one extra partition per 100k rows, capped at 64
    (slim join rows mean the cap holds even at multi-billion-row
    inputs)."""
    return int(max(2, min(64, 1 + n_rows // 100_000)))


# one keyed-reduction task holds its whole partition as a DataFrame;
# ~2M slim rows ~= 100-400 MB of pandas heap, comfortably inside a
# worker even at concurrency x 32
_ROWS_PER_REDUCTION_TASK = 2_000_000


def reduction_partitions(n_rows: int, rows_per_task: int | None = None,
                          floor: int = 32) -> int:
    """Keyed-reduction fan-out derived from the (estimated) number of
    keyed rows entering the reduction — never a constant: each
    :func:`grouped_partitions` partition is reduced by ONE task holding
    its whole slice, so a fixed fan-out means per-task memory grows
    linearly with input (the VERDICT r4 scale-killer; every call site
    used a hard-coded ``& 31``). Power of two (the partition key is a
    mask over a mixed 64-bit hash), floor 32 (every small-SF oracle
    keeps its exact round-4 partitioning), doubling whenever a
    partition would exceed ``rows_per_task`` rows, capped at 2**16
    tasks. ``n_rows`` may be a footer count times a coarse expansion
    factor — only the growth matters, not precision."""
    if rows_per_task is None:
        rows_per_task = _ROWS_PER_REDUCTION_TASK
    n = int(floor)
    while n_rows > n * rows_per_task and n < 65536:
        n *= 2
    return n


def table_partitions(path: str, expand: int = 1) -> int:
    """:func:`reduction_partitions` sized from a parquet FOOTER row
    count times a coarse per-row expansion factor for reductions whose
    keyed rows explode from the input (e.g. ``expand~=64`` for
    term-keyed token partials over documents, ``1`` for doc- or
    user-keyed rows). Footer-only — no data is read."""
    return reduction_partitions(parquet_num_rows(path) * expand)


def grouped_partitions(ds, part_fn, group_fn, schema: pa.Schema,
                        n_partitions: int = 32):
    """High-cardinality groupby replacement: tag every row with a hash
    PARTITION (``part_fn(batch)`` returns the RAW per-row uint64 hash;
    the mask to ``n_partitions`` is applied HERE, so the fan-out and
    the mask can never disagree), then run ONE vectorized
    ``group_fn(partition_df) -> DataFrame`` per partition via
    ``groupby("_p").map_groups``.

    Ray's ``groupby(key).aggregate(...)`` walks rows/groups in Python:
    measured 76-83 s for a Min over 458 k rows with ~unique keys (both
    shuffle strategies), vs 1.8 s for this shape — the per-group
    overhead is the killer when the key is near-unique (content hashes,
    doc ids, vocabulary terms). Here the grouped key has exactly
    ``n_partitions`` distinct values, so Ray does one map_groups call
    per partition and ``group_fn`` reduces its whole partition with
    numpy (lexsort/unique/bincount/reduceat). All rows of one original
    key land in one partition, so any per-key reduction stays exact.
    ``n_partitions`` bounds per-task memory: derive it from the input
    row count with :func:`reduction_partitions` (power of two required;
    the small-SF floor of 32 keeps every oracle's exact partitioning)."""
    if n_partitions & (n_partitions - 1):
        raise ValueError(f"n_partitions must be a power of two, got {n_partitions}")
    mask = np.uint64(n_partitions - 1)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = np.asarray(part_fn(batch)).astype(np.uint64, copy=False)
        return batch.append_column(
            "_p", pa.array((h & mask).astype(np.int32), type=pa.int32())
        )

    # the leading typed-empty block pins the output schema even when the
    # input is fully empty (map_batches skips empty blocks, so
    # _normalize_schema alone cannot type them)
    return rd_empty(schema).union(
        normalize_schema(
            ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_p")
            .map_groups(group_fn, batch_format="pandas"),
            schema,
        )
    )


def keyed_partitions(ds, key_cols, group_fn, schema: pa.Schema,
                      n_partitions: int = 32):
    """Drop-in replacement for
    ``ds.groupby(key_cols).map_groups(group_fn, batch_format="pyarrow")``
    when the key is high-cardinality (user ids, (user, bucket) pairs):
    rows are hash-partitioned on the INT key columns, and inside each
    partition task the rows are lexsorted by the keys and ``group_fn``
    is called once per group SLICE — identical per-group semantics (all
    rows of a key are colocated and group_fn still sees one whole group
    as an Arrow table), but one Ray task per partition instead of Ray's
    per-group dispatch (~2 ms/group of scheduling + conversion, the
    measured bottleneck at per-doc/per-user cardinalities; a direct
    Python call per slice is ~100x cheaper). See
    :func:`grouped_partitions` for the aggregate-shaped sibling."""

    def part(batch: pa.Table) -> np.ndarray:
        acc = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in key_cols:
            col = batch[c].to_numpy(zero_copy_only=False).astype(np.uint64)
            acc = _mix64(acc ^ col)
        return acc  # grouped_partitions applies the n_partitions mask

    def run(g: pd.DataFrame) -> pd.DataFrame:
        t = pa.Table.from_pandas(g, preserve_index=False)
        keys = [t[c].to_numpy(zero_copy_only=False) for c in key_cols]
        order = np.lexsort(keys[::-1])
        t = t.take(pa.array(order, type=pa.int64()))
        keys = [k[order] for k in keys]
        n = len(order)
        new = np.ones(n, dtype=bool)
        if n:
            change = np.zeros(n - 1, dtype=bool)
            for k in keys:
                change |= k[1:] != k[:-1]
            new[1:] = change
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        outs = [
            group_fn(t.slice(int(s), int(e - s))) for s, e in zip(starts, ends)
        ]
        outs = [o for o in outs if o.num_rows]
        if not outs:
            return schema.empty_table().to_pandas()
        return pa.concat_tables(outs).to_pandas()

    return grouped_partitions(ds, part, run, schema,
                              n_partitions=n_partitions)


