"""Windowed aggregates over the ``events`` stream table.

The reference is batch-only (SURVEY.md §2: no streaming/windows), but a
training-data pipeline needs event windowing; these are the Ray-Data-first
forms:

- tumbling window = truncate the timestamp to the window start inside
  ``map_batches`` (embarrassingly parallel), then ONE small groupby over
  (window, key) — the partial-combine pattern keeps the shuffle at one row
  per (window, key, event_type) per batch.
- sessionization = ``groupby(user_id).map_groups`` with a vectorized
  gap-split inside each group (per-key state never leaves one task).

Both have exact DuckDB oracles (driver contract).
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import numpy as np
import pyarrow as pa

_HOUR_US = 3_600_000_000


def _events(sf_dir: str, columns):
    import ray.data as rd

    return _rpq(f"{sf_dir}/events.parquet", columns=columns)



def _merge_window_partials(ds, n_partitions: int = 32):
    """(window_start, event_type)-keyed merge of per-batch partials via
    the hash-partitioned vectorized reduction (windows x event-types is
    a near-unique key set at scale — see dedup._grouped_partitions).
    Partials are summed in (key, n_p, sum) sorted order so the float
    result is deterministic across block arrivals."""
    import pandas as pd
    import pyarrow as pa

    from invertedindex_ray.pipelines.dedup import _grouped_partitions

    schema = pa.schema(
        [
            ("window_start", pa.int64()),
            ("event_type", pa.string()),
            ("n_events", pa.int64()),
            ("sum_value", pa.float64()),
        ]
    )

    def sum_per_key(g: pd.DataFrame) -> pd.DataFrame:
        w = g["window_start"].to_numpy()
        et, uet = pd.factorize(g["event_type"].to_numpy(), sort=False)
        n = g["n_p"].to_numpy()
        sv = g["sum_value_p"].to_numpy()
        order = np.lexsort((sv, n, et, w))
        w, et, n, sv = w[order], et[order], n[order], sv[order]
        first = np.ones(len(w), dtype=bool)
        if len(w):
            first[1:] = (w[1:] != w[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(first)
        return pd.DataFrame(
            {
                "window_start": w[starts],
                "event_type": uet[et[starts]],
                "n_events": np.add.reduceat(n, starts) if len(n) else [],
                "sum_value": np.add.reduceat(sv, starts) if len(sv) else [],
            }
        )

    from invertedindex_ray.functions.hashing import mix64

    # window_start is a multiple of the window width (low bits zero) —
    # mix before masking or every row lands in partition 0
    return _grouped_partitions(
        ds,
        lambda b: mix64(
            b["window_start"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ),
        sum_per_key,
        schema,
        n_partitions=n_partitions,
    )


def tumbling_counts(sf_dir: str, window_hours: int = 1):
    """Per (hour-window, event_type): event count + sum(value),
    pre-aggregated per batch before the groupby."""
    w_us = window_hours * _HOUR_US

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // w_us) * w_us
        et = batch["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        d = pc.dictionary_encode(et)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch["value"].to_numpy(zero_copy_only=False)
        key = win * np.int64(len(d.dictionary)) + codes
        uniq, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv)
        sv = np.bincount(inv, weights=val)
        return pa.table(
            {
                "window_start": pa.array(uniq // len(d.dictionary), type=pa.int64()),
                "event_type": d.dictionary.take(
                    pa.array(uniq % len(d.dictionary), type=pa.int64())
                ),
                "n_p": pa.array(n.astype(np.int64), type=pa.int64()),
                "sum_value_p": pa.array(sv, type=pa.float64()),
            }
        )

    from invertedindex_ray.functions.grouping import table_partitions

    agg = _merge_window_partials(
        _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        # keyed rows are per-batch (window, type) partials
        n_partitions=table_partitions(f"{sf_dir}/events.parquet") ,
    )

    def finish(batch: pa.Table) -> pa.Table:
        from invertedindex_ray.functions.rounding import round_half_up

        sv = batch["sum_value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "window_start": batch["window_start"].cast(pa.timestamp("us")),
                "event_type": batch["event_type"].combine_chunks()
                if isinstance(batch["event_type"], pa.ChunkedArray)
                else batch["event_type"],
                "n_events": batch["n_events"].cast(pa.int64()),
                "sum_value_r": pa.array(round_half_up(sv, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def hopping_counts(sf_dir: str, window_hours: int = 1, hop_minutes: int = 30):
    """Overlapping (hopping) windows: every event lands in
    ``window/hop`` windows; per (window_start, event_type) count +
    sum(value). The replication factor is bounded (window/hop), applied
    map-side and combined per batch BEFORE the one small groupby — the
    shuffle stays one row per (window, type) per batch, not per event.
    Exact DuckDB mirror (integer µs arithmetic)."""
    w_us = window_hours * _HOUR_US
    hop_us = hop_minutes * 60_000_000
    n_hops = w_us // hop_us
    assert w_us % hop_us == 0

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (ts // hop_us) * hop_us
        # replicate: window starts base, base-hop, ..., base-(n-1)*hop
        wins = (base[None, :] - (np.arange(n_hops, dtype=np.int64) * hop_us)[:, None]).ravel()
        et = batch["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        d = pc.dictionary_encode(et)
        codes = np.tile(
            d.indices.to_numpy(zero_copy_only=False).astype(np.int64), n_hops
        )
        val = np.tile(batch["value"].to_numpy(zero_copy_only=False), n_hops)
        nv = len(d.dictionary)
        key = wins * np.int64(nv) + codes
        uniq, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv)
        sv = np.bincount(inv, weights=val)
        return pa.table(
            {
                "window_start": pa.array(uniq // nv, type=pa.int64()),
                "event_type": d.dictionary.take(pa.array(uniq % nv, type=pa.int64())),
                "n_p": pa.array(n.astype(np.int64), type=pa.int64()),
                "sum_value_p": pa.array(sv, type=pa.float64()),
            }
        )

    from invertedindex_ray.functions.grouping import table_partitions

    agg = _merge_window_partials(
        _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        # keyed rows are per-batch (window, type) partials
        n_partitions=table_partitions(f"{sf_dir}/events.parquet") ,
    )

    def finish(batch: pa.Table) -> pa.Table:
        from invertedindex_ray.functions.rounding import round_half_up

        sv = batch["sum_value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "window_start": batch["window_start"].cast(pa.timestamp("us")),
                "event_type": batch["event_type"].combine_chunks()
                if isinstance(batch["event_type"], pa.ChunkedArray)
                else batch["event_type"],
                "n_events": batch["n_events"].cast(pa.int64()),
                "sum_value_r": pa.array(round_half_up(sv, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sessionize(sf_dir: str, gap_minutes: int = 30, *, max_group_rows: int | None = None):
    """Per-user sessions: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Output one row per session:
    (user_id, session_start, session_end, n_events).

    groupby(user_id).map_groups keeps all of a user's events in one task;
    the split is a vectorized diff, the reference pattern for keyed
    streaming state in a batch engine."""
    gap_us = gap_minutes * 60_000_000
    from invertedindex_ray.pipelines.relational import (
        MAX_GROUP_ROWS,
        guard_group_rows,
    )

    bound = MAX_GROUP_ROWS if max_group_rows is None else max_group_rows

    def split(group: pa.Table) -> pa.Table:
        guard_group_rows(
            "sessionize", group["user_id"][0].as_py(), group.num_rows, bound
        )
        ts = np.sort(group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        uid = int(group["user_id"][0].as_py())
        new = np.empty(len(ts), dtype=bool)
        new[0] = True
        np.greater(ts[1:] - ts[:-1], gap_us, out=new[1:])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ts))
        return pa.table(
            {
                "user_id": pa.array(np.full(len(starts), uid), type=pa.int64()),
                "session_start": pa.array(ts[starts], type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "session_end": pa.array(ts[ends - 1], type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array((ends - starts).astype(np.int64), type=pa.int64()),
            }
        )

    from invertedindex_ray.functions.grouping import (
        table_partitions as _tp,
    )
    from invertedindex_ray.pipelines.dedup import _keyed_partitions

    return _keyed_partitions(
        _events(sf_dir, ["ts", "user_id"]),
        ["user_id"],
        split,
        pa.schema([("user_id", pa.int64()),
                   ("session_start", pa.timestamp("us")),
                   ("session_end", pa.timestamp("us")),
                   ("n_events", pa.int64())]),
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    )


def window_distinct_users(sf_dir: str, window_hours: int = 1):
    """(window_start, n_users): EXACT distinct active users per tumbling
    hour window — the per-window cardinality every engagement dashboard
    needs (the approximate twin is sketches.hll_distinct_terms' shape).

    Scale shape: per-batch dedupe emits slim (window, user) pairs
    (16 B/row); one reduction hash-partitioned by ``user`` colocates all
    of a user's rows, dedupes exactly, and emits per-window PARTIAL
    counts (a user contributes to a window from exactly one partition);
    the final per-window sum moves <= n_partitions rows per window.
    No corpus-sized state anywhere."""
    import pandas as pd

    from invertedindex_ray.functions.grouping import grouped_partitions
    from invertedindex_ray.functions.hashing import mix64

    w_us = window_hours * _HOUR_US

    pair_schema = pa.schema([("window_start", pa.int64()), ("user_id", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // w_us) * w_us
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(np.stack((win, uid), axis=1), axis=0)
        return pa.table(
            {
                "window_start": pa.array(pairs[:, 0], type=pa.int64()),
                "user_id": pa.array(pairs[:, 1], type=pa.int64()),
            }
        )

    partial_counts_schema = pa.schema(
        [("window_start", pa.int64()), ("n_p", pa.int64())]
    )

    def dedupe_count(g: pd.DataFrame) -> pd.DataFrame:
        w = g["window_start"].to_numpy()
        u = g["user_id"].to_numpy()
        pairs = np.unique(np.stack((w, u), axis=1), axis=0)
        wins, n = np.unique(pairs[:, 0], return_counts=True)
        return pd.DataFrame(
            {"window_start": wins.astype(np.int64), "n_p": n.astype(np.int64)}
        )

    from invertedindex_ray.functions.grouping import table_partitions

    _np_ev = table_partitions(f"{sf_dir}/events.parquet")
    partials = grouped_partitions(
        _events(sf_dir, ["ts", "user_id"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        lambda b: mix64(
            b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ),
        dedupe_count,
        partial_counts_schema,
        n_partitions=_np_ev,
    )

    out_schema = pa.schema(
        [("window_start", pa.timestamp("us")), ("n_users", pa.int64())]
    )

    def sum_windows(g: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        codes, wins = _pd.factorize(g["window_start"].to_numpy(), sort=False)
        n = np.bincount(codes, weights=g["n_p"].to_numpy()).astype(np.int64)
        return _pd.DataFrame({"window_start": wins, "n_users": n})

    final = grouped_partitions(
        partials,
        # window_start is a multiple of w_us (divisible by 1024), so a
        # bare low-bit mask is constant zero — mix first or the final
        # sum serializes into one partition
        lambda b: mix64(
            b["window_start"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ),
        sum_windows,
        pa.schema([("window_start", pa.int64()), ("n_users", pa.int64())]),
        n_partitions=_np_ev,
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "window_start": batch["window_start"].cast(pa.timestamp("us")),
                "n_users": batch["n_users"].cast(pa.int64()),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")
