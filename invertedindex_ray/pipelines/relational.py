"""Relational / streaming-hygiene operators the survey listed as absent
from the reference but essential to a production data pipeline: JSON
property extraction, deterministic sampling, and late-event marking.

All three are embarrassingly parallel map_batches stages (no shuffle
except the per-user grouping in late_events) with exact DuckDB mirrors.
"""

from __future__ import annotations

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

import json

import numpy as np
import pyarrow as pa

from invertedindex_ray.functions.hashing import md5_hash63


def _events(sf_dir: str, columns):
    import ray.data as rd

    return _rpq(f"{sf_dir}/events.parquet", columns=columns)


#: Per-key group row bound for the one-key-per-task operators (as-of
#: join, range join, sessionize, late-event marking). ~40 B/row means the
#: default bounds a single whale key at ~200 MB of task heap.
MAX_GROUP_ROWS = 5_000_000


def guard_group_rows(op: str, key, n_rows: int, max_rows: int) -> None:
    """The per-key operators assume one key's rows fit one task (the
    sessionization contract). A whale key silently OOM-killing a worker
    at 100 TB is not acceptable — fail LOUDLY with the key, the size and
    the remediations (VERDICT r2 #6) instead."""
    if n_rows > max_rows:
        raise ValueError(
            f"{op}: key {key!r} has {n_rows} rows, above the per-task "
            f"bound of {max_rows}. One key's rows must fit one task. "
            "Remediations: switch to the result-identical skew-proof "
            "twin in pipelines/skewsafe.py (partitions by (user, "
            "time-bucket), no per-key bound), pre-filter/sample the "
            "whale key, or raise max_group_rows if worker heap allows."
        )


def json_props(sf_dir: str):
    """(event_id, k): parse the events table's JSON ``props`` column and
    extract the integer ``k`` property (null-safe). Per-row json.loads in
    a map_batches task — the standard semi-structured extraction stage;
    SQL mirror: json_extract(props, '$.k')."""

    def f(batch: pa.Table) -> pa.Table:
        vals = []
        for p in batch["props"].to_pylist():
            try:
                v = json.loads(p).get("k") if p else None
            except (ValueError, TypeError):
                v = None
            vals.append(int(v) if v is not None else None)
        ids = batch["event_id"]
        return pa.table(
            {
                "event_id": ids.combine_chunks()
                if isinstance(ids, pa.ChunkedArray)
                else ids,
                "k": pa.array(vals, type=pa.int64()),
            }
        )

    return _events(sf_dir, ["event_id", "props"]).map_batches(
        f, batch_format="pyarrow"
    )


def sample_docs(sf_dir: str, *, rate_permille: int = 100):
    """Deterministic hash sampling of the documents table: keep a doc iff
    md5_hash63(doc_id) % 1000 < rate_permille — stable across runs and
    cluster sizes (the reproducible-subset primitive for experiments /
    holdouts). SQL mirror: (md5_number_lower(doc_id) >> 1) % 1000."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = md5_hash63([str(int(i)) for i in ids]).astype(np.uint64)
        keep = (h % np.uint64(1000)) < rate_permille
        return batch.filter(pa.array(keep))

    import ray.data as rd

    return (
        _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
        .map_batches(f, batch_format="pyarrow")
    )


def late_events(
    sf_dir: str, *, lateness_minutes: int = 60, max_group_rows: int = MAX_GROUP_ROWS
):
    """(event_id, user_id, is_late 0/1): streaming late-data marking in batch
    form — per user, replay events in ARRIVAL order (event_id) and flag
    any event whose timestamp is more than ``lateness_minutes`` behind
    the running max event time (the per-key watermark). The per-user
    state never leaves one task (groupby.map_groups); SQL mirror is a
    running max window."""
    late_us = lateness_minutes * 60_000_000

    def flag(group: pa.Table) -> pa.Table:
        guard_group_rows(
            "late_events",
            group["user_id"][0].as_py(),
            group.num_rows,
            max_group_rows,
        )
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(eid, kind="stable")
        eid, ts = eid[order], ts[order]
        wm = np.maximum.accumulate(ts)
        is_late = ts < (wm - late_us)
        uid = int(group["user_id"][0].as_py())
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "user_id": pa.array(np.full(len(eid), uid), type=pa.int64()),
                # int64 0/1 rather than bool: driver value-hash parity
                "is_late": pa.array(is_late.astype(np.int64), type=pa.int64()),
            }
        )

    from invertedindex_ray.functions.grouping import (
        table_partitions as _tp,
    )
    from invertedindex_ray.pipelines.dedup import _keyed_partitions

    return _keyed_partitions(
        _events(sf_dir, ["event_id", "ts", "user_id"]),
        ["user_id"],
        flag,
        pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                   ("is_late", pa.int64())]),
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    )


def asof_join_events(
    sf_dir: str,
    *,
    left_type: str = "purchase",
    right_type: str = "click",
    max_group_rows: int = MAX_GROUP_ROWS,
):
    """As-of join (the classic event-attribution query): for every
    ``left_type`` event, attach the value of the latest ``right_type``
    event of the same user with right.ts <= left.ts — an operator Ray
    Data has no primitive for. Expressed as ONE groupby(user_id) shuffle
    + a vectorized per-group merge (sort right side by ts, searchsorted
    the left timestamps); the partitioning assumption is that one user's
    events fit one task, the same contract as sessionization.

    Right-side ties at the same (user, ts) are collapsed to max(value)
    first, making the result deterministic (and identical to DuckDB's
    native ASOF JOIN over the same pre-aggregated side).

    Output: (event_id, user_id, prior_value — NULL when no prior event).
    """

    def merge(group: pa.Table) -> pa.Table:
        guard_group_rows(
            "asof_join_events",
            group["user_id"][0].as_py(),
            group.num_rows,
            max_group_rows,
        )
        et = np.asarray(group["event_type"].to_pylist(), dtype=object)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = group["value"].to_numpy(zero_copy_only=False)
        uid = int(group["user_id"][0].as_py())

        lmask = et == left_type
        if not lmask.any():
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "prior_value": pa.array([], type=pa.float64()),
                }
            )
        rmask = et == right_type
        l_eid, l_ts = eid[lmask], ts[lmask]
        r_ts, r_val = ts[rmask], val[rmask]
        # collapse right-side ts ties to max(value), sort by ts
        order = np.argsort(r_ts, kind="stable")
        r_ts, r_val = r_ts[order], r_val[order]
        if len(r_ts):
            uniq_ts, start = np.unique(r_ts, return_index=True)
            ends = np.append(start[1:], len(r_ts))
            r_val = np.array(
                [r_val[s:e].max() for s, e in zip(start, ends)], dtype=np.float64
            )
            r_ts = uniq_ts
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        prior = [float(r_val[i]) if i >= 0 else None for i in idx]
        return pa.table(
            {
                "event_id": pa.array(l_eid, type=pa.int64()),
                "user_id": pa.array(np.full(len(l_eid), uid), type=pa.int64()),
                "prior_value": pa.array(prior, type=pa.float64()),
            }
        )

    from invertedindex_ray.functions.grouping import (
        table_partitions as _tp,
    )
    from invertedindex_ray.pipelines.dedup import _keyed_partitions

    return _keyed_partitions(
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"]),
        ["user_id"],
        merge,
        pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                   ("prior_value", pa.float64())]),
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    )


def range_join_counts(
    sf_dir: str,
    *,
    left_type: str = "purchase",
    right_type: str = "error",
    window_minutes: int = 5,
    max_group_rows: int = MAX_GROUP_ROWS,
):
    """Range (interval) join: for every ``left_type`` event, count the
    same user's ``right_type`` events in (left.ts, left.ts + window] —
    the other join shape Ray Data lacks a primitive for. Same partitioning
    contract as the as-of join (one user per task); inside a group the
    interval counts are two vectorized searchsorteds, not an O(n*m) loop.

    Output: (event_id, user_id, n_right)."""
    w_us = window_minutes * 60_000_000

    def merge(group: pa.Table) -> pa.Table:
        guard_group_rows(
            "range_join_counts",
            group["user_id"][0].as_py(),
            group.num_rows,
            max_group_rows,
        )
        et = np.asarray(group["event_type"].to_pylist(), dtype=object)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = int(group["user_id"][0].as_py())
        lmask = et == left_type
        if not lmask.any():
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "n_right": pa.array([], type=pa.int64()),
                }
            )
        l_eid, l_ts = eid[lmask], ts[lmask]
        r_ts = np.sort(ts[et == right_type])
        lo = np.searchsorted(r_ts, l_ts, side="right")        # > left.ts
        hi = np.searchsorted(r_ts, l_ts + w_us, side="right")  # <= ts + w
        return pa.table(
            {
                "event_id": pa.array(l_eid, type=pa.int64()),
                "user_id": pa.array(np.full(len(l_eid), uid), type=pa.int64()),
                "n_right": pa.array((hi - lo).astype(np.int64), type=pa.int64()),
            }
        )

    from invertedindex_ray.functions.grouping import (
        table_partitions as _tp,
    )
    from invertedindex_ray.pipelines.dedup import _keyed_partitions

    return _keyed_partitions(
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]),
        ["user_id"],
        merge,
        pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                   ("n_right", pa.int64())]),
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    )


def event_value_quantiles(
    sf_dir: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    *,
    max_group_rows: int = 5_000_000,
):
    """(event_type, q, value_q): EXACT discrete quantiles of ``value``
    per event type (quantile_disc semantics: sorted value at index
    ceil(q*n)-1 — no interpolation, so the oracle matches bit-for-bit).

    Scale shape: one keyed reduction with all of a type's rows in one
    partition (event types are a small enum, but a single type can
    still be a whale — the guard fails LOUDLY above ``max_group_rows``;
    the at-scale alternative for true heavy-hitter keys is a quantile
    sketch, which would be approximate and lose the SQL mirror).
    ``value`` is a double, so the int-histogram collapse that makes
    textstats.length_quantiles unbounded does not apply here."""
    import math

    import pandas as pd

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        table_partitions,
    )
    from invertedindex_ray.functions.hashing import hash_strings

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("q", pa.float64()),
            ("value_q", pa.float64()),
        ]
    )
    q_list = [float(q) for q in qs]

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].to_numpy()
        v = g["value"].to_numpy()
        order = np.lexsort((v, et))
        et, v = et[order], v[order]
        first = np.ones(len(et), dtype=bool)
        first[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(et))
        out_t, out_q, out_v = [], [], []
        for s, e in zip(starts, ends):
            n = int(e - s)
            guard_group_rows("event_value_quantiles", et[s], n, max_group_rows)
            for q in q_list:
                out_t.append(et[s])
                out_q.append(q)
                out_v.append(v[s + max(0, math.ceil(q * n) - 1)])
        return pd.DataFrame(
            {
                "event_type": pd.Series(out_t, dtype=object),
                "q": pd.Series(out_q, dtype=np.float64),
                "value_q": pd.Series(out_v, dtype=np.float64),
            }
        )

    return grouped_partitions(
        _events(sf_dir, ["event_type", "value"]),
        lambda b: hash_strings(b["event_type"].to_pylist()),
        quantiles,
        out_schema,
        n_partitions=table_partitions(f"{sf_dir}/events.parquet"),
    )


def value_quantile_sample(
    sf_dir: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    *,
    k: int = 1024,
):
    """(event_type, q, value_q, n_sample): APPROXIMATE per-type value
    quantiles from a deterministic bottom-k sample — the scale twin of
    :func:`event_value_quantiles` for whale event types: instead of one
    task holding a type's every row, each task keeps only its k
    smallest-PRIORITY rows (priority = md5 of event_id — a fixed random
    permutation, so the k winners are a uniform sample) and partials
    merge by keeping the global bottom-k. Quantile-rank error is
    O(1/sqrt(k)); memory is O(k) per type everywhere.

    Because the priority is a deterministic hash, the sample — and
    therefore the estimate — is exactly reproducible and fully
    SQL-mirrorable (row_number() OVER (ORDER BY md5) <= k), unlike a
    random-sample sketch: the oracle checks this approximate operator
    bit-for-bit."""
    import math

    import pandas as pd

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        table_partitions,
    )
    from invertedindex_ray.functions.hashing import hash_strings, md5_hash63

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("p", pa.int64()),
            ("value", pa.float64()),
        ]
    )

    def bottom_k(et: np.ndarray, p: np.ndarray, v: np.ndarray):
        order = np.lexsort((p, et))
        et, p, v = et[order], p[order], v[order]
        first = np.ones(len(et), dtype=bool)
        first[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(et)))
        rank = np.arange(len(et), dtype=np.int64) - np.repeat(starts, lens)
        keep = rank < k
        return et[keep], p[keep], v[keep]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        p = md5_hash63([str(int(i)) for i in ids])
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        et, p, v = bottom_k(et, p, v)
        return pa.table(
            {
                "event_type": pa.array(et, type=pa.string()),
                "p": pa.array(p, type=pa.int64()),
                "value": pa.array(v, type=pa.float64()),
            }
        )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("q", pa.float64()),
            ("value_q", pa.float64()),
            ("n_sample", pa.int64()),
        ]
    )
    q_list = [float(q) for q in qs]

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        et, p, v = bottom_k(
            g["event_type"].to_numpy(),
            g["p"].to_numpy(),
            g["value"].to_numpy(),
        )
        order = np.lexsort((v, et))
        et, v = et[order], v[order]
        first = np.ones(len(et), dtype=bool)
        first[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(et))
        out_t, out_q, out_v, out_n = [], [], [], []
        for s, e in zip(starts, ends):
            n = int(e - s)
            for q in q_list:
                out_t.append(et[s])
                out_q.append(q)
                out_v.append(v[s + max(0, math.ceil(q * n) - 1)])
                out_n.append(n)
        return pd.DataFrame(
            {
                "event_type": pd.Series(out_t, dtype=object),
                "q": pd.Series(out_q, dtype=np.float64),
                "value_q": pd.Series(out_v, dtype=np.float64),
                "n_sample": pd.Series(out_n, dtype=np.int64),
            }
        )

    return grouped_partitions(
        _events(sf_dir, ["event_id", "event_type", "value"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        lambda b: hash_strings(b["event_type"].to_pylist()),
        finish,
        out_schema,
        n_partitions=table_partitions(f"{sf_dir}/events.parquet"),
    )


# ------------------------------------------------------------ funnel


def funnel_counts(
    sf_dir: str,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
):
    """(step, step_name, n_users): strict-sequence funnel — how many
    users reached each step, where step i counts users with an event of
    type ``steps[i]`` STRICTLY AFTER their first-reach time of step
    i-1 (first-reach chaining, the standard product-analytics funnel).

    Scale shape: rows slim to (user_id, step_idx, ts) at the read and
    only step-typed events survive the batch filter; one user-hash
    keyed reduction computes every user's chained first-reach times
    vectorized (lexsort + min-reduceat per step — no per-user Python
    loop), emitting one (step, n_p) partial row per partition; the
    final sum over <= n_partitions * n_steps rows happens on the
    driver. No broadcast, no whale-key exposure (a user's funnel state
    is O(n_steps))."""
    import pandas as pd

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        table_partitions,
    )

    step_list = [str(s) for s in steps]
    n_steps = len(step_list)
    if len(set(step_list)) != n_steps:
        raise ValueError(
            f"funnel_counts: repeated event type in steps {step_list!r}. "
            "Each step must be a distinct type — a repeat-step funnel "
            "(view -> view -> click) needs per-occurrence chaining this "
            "operator does not implement; it would otherwise silently "
            "return zero counts."
        )
    if n_steps == 0:
        return pa.table(
            {"step": pa.array([], type=pa.int64()),
             "step_name": pa.array([], type=pa.string()),
             "n_users": pa.array([], type=pa.int64())}
        )
    idx_of = {s: i for i, s in enumerate(step_list)}

    slim_schema = pa.schema(
        [("user_id", pa.int64()), ("step_idx", pa.int64()), ("ts", pa.int64())]
    )

    def slim(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return slim_schema.empty_table()
        et = batch["event_type"].to_pylist()
        sidx = np.fromiter(
            (idx_of.get(t, -1) for t in et), dtype=np.int64, count=len(et)
        )
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False).view("int64")
        )  # microseconds since epoch; NaT views as int64 min
        # NULL timestamps never qualify (SQL min()/> semantics), so they
        # drop instead of becoming the -2^63 sentinel
        keep = (sidx >= 0) & (ts != np.iinfo(np.int64).min)
        return pa.table(
            {
                "user_id": pa.array(uid[keep], type=pa.int64()),
                "step_idx": pa.array(sidx[keep], type=pa.int64()),
                "ts": pa.array(ts[keep], type=pa.int64()),
            }
        )

    part_schema = pa.schema([("step", pa.int64()), ("n_p", pa.int64())])

    def per_user_chain(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        sidx = g["step_idx"].to_numpy()
        ts = g["ts"].to_numpy()
        users = np.unique(uid)
        pos = {u: i for i, u in enumerate(users)}
        uix = np.fromiter((pos[u] for u in uid), dtype=np.int64, count=len(uid))
        # reach[i] = first-reach micros of the current step per user
        reach = np.full(len(users), np.iinfo(np.int64).min, dtype=np.int64)
        counts = np.zeros(n_steps, dtype=np.int64)
        alive = np.zeros(len(users), dtype=bool)
        for i in range(n_steps):
            m = sidx == i
            if i == 0:
                cand = m
                floor = np.full(len(uid), np.iinfo(np.int64).min, dtype=np.int64)
            else:
                floor = reach[uix]
                cand = m & alive[uix] & (ts > floor)
            nxt = np.full(len(users), np.iinfo(np.int64).max, dtype=np.int64)
            if cand.any():
                np.minimum.at(nxt, uix[cand], ts[cand])
            got = nxt < np.iinfo(np.int64).max
            alive = got
            reach = nxt
            counts[i] = int(got.sum())
        return pd.DataFrame(
            {
                "step": np.arange(1, n_steps + 1, dtype=np.int64),
                "n_p": counts,
            }
        )

    parts = grouped_partitions(
        _events(sf_dir, ["user_id", "event_type", "ts"]).map_batches(
            slim, batch_format="pyarrow"
        ),
        lambda b: b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
        per_user_chain,
        part_schema,
        n_partitions=table_partitions(f"{sf_dir}/events.parquet"),
    )
    # <= partitions x n_steps rows: a bounded driver-side sum
    agg = np.zeros(n_steps, dtype=np.int64)
    for r in parts.take_all():
        agg[int(r["step"]) - 1] += int(r["n_p"])
    return pa.table(
        {
            "step": pa.array(np.arange(1, n_steps + 1, dtype=np.int64)),
            "step_name": pa.array(step_list, type=pa.string()),
            "n_users": pa.array(agg, type=pa.int64()),
        }
    )


# ------------------------------------------------------- retention


def retention_cohorts(sf_dir: str):
    """(cohort_day, day_offset, n_users): classic retention triangle —
    users grouped by their first-activity calendar day (UTC), counted
    once per distinct (user, active day) at each day offset from the
    cohort day.

    Scale shape: two keyed reductions, both on slim rows. Reduction 1
    (user-hash): a user's rows colocate, so the partition computes the
    user's cohort day AND distinct active days together, emitting exact
    per-partition (cohort_day, day_offset, n_p) partials (each user
    lives in exactly one partition, so partials add). Reduction 2
    ((cohort, offset)-hash): sums the <= n_partitions copies of each
    key. Output cardinality is O(#days^2), never O(users)."""
    import pandas as pd

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        table_partitions,
    )

    US_PER_DAY = 86_400_000_000

    slim_schema = pa.schema([("user_id", pa.int64()), ("day", pa.int64())])

    def slim(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return slim_schema.empty_table()
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        raw = batch["ts"].to_numpy(zero_copy_only=False).view("int64")
        # NULL timestamps (NaT -> int64 min) drop: a NULL day belongs to
        # no cohort (SQL WHERE ts IS NOT NULL, pinned in the oracle)
        ok = raw != np.iinfo(np.int64).min
        uid, raw = uid[ok], raw[ok]
        day = raw // US_PER_DAY
        # per-batch (user, day) pre-dedupe: shrinks the shuffle to at
        # most one row per user-day per batch
        key = np.stack([uid, day], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {
                "user_id": pa.array(uniq[:, 0], type=pa.int64()),
                "day": pa.array(uniq[:, 1], type=pa.int64()),
            }
        )

    part_schema = pa.schema(
        [("cohort", pa.int64()), ("day_offset", pa.int64()), ("n_p", pa.int64())]
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        day = g["day"].to_numpy()
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        first = np.ones(len(uid), dtype=bool)
        if len(uid):
            first[1:] = uid[1:] != uid[:-1]
        # drop duplicate (user, day) rows surviving across batches
        dup = np.zeros(len(uid), dtype=bool)
        if len(uid):
            dup[1:] = (uid[1:] == uid[:-1]) & (day[1:] == day[:-1])
        uid, day, first = uid[~dup], day[~dup], first[~dup]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(uid)))
        cohort = np.repeat(day[starts], lens)
        off = day - cohort
        key = np.stack([cohort, off], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pd.DataFrame(
            {
                "cohort": uniq[:, 0].astype(np.int64),
                "day_offset": uniq[:, 1].astype(np.int64),
                "n_p": cnt.astype(np.int64),
            }
        )

    _np_ev = table_partitions(f"{sf_dir}/events.parquet")
    parts = grouped_partitions(
        _events(sf_dir, ["user_id", "ts"]).map_batches(
            slim, batch_format="pyarrow"
        ),
        lambda b: b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
        per_user,
        part_schema,
        n_partitions=_np_ev,
    )

    def sum_key(g: pd.DataFrame) -> pd.DataFrame:
        c = g["cohort"].to_numpy()
        o = g["day_offset"].to_numpy()
        n = g["n_p"].to_numpy()
        key = np.stack([c, o], axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        tot = np.bincount(inv, weights=n).astype(np.int64)
        return pd.DataFrame(
            {
                "cohort_day": uniq[:, 0].astype(np.int64),
                "day_offset": uniq[:, 1].astype(np.int64),
                "n_users": tot,
            }
        )

    mid_schema = pa.schema(
        [
            ("cohort_day", pa.int64()),
            ("day_offset", pa.int64()),
            ("n_users", pa.int64()),
        ]
    )
    summed = grouped_partitions(
        parts,
        lambda b: (
            b["cohort"].to_numpy(zero_copy_only=False).astype(np.uint64) * 31
            + b["day_offset"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ),
        sum_key,
        mid_schema,
        n_partitions=_np_ev,
    )

    def to_ts(batch: pa.Table) -> pa.Table:
        # midnight-UTC timestamp (the windows ops' convention — DATE
        # round-trips as object dtype, timestamp[us] stays comparable)
        days = batch["cohort_day"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_day": pa.array(
                    days * US_PER_DAY, type=pa.int64()
                ).cast(pa.timestamp("us")),
                "day_offset": batch["day_offset"],
                "n_users": batch["n_users"],
            }
        )

    return summed.map_batches(to_ts, batch_format="pyarrow")


# ----------------------------------------------------- transitions


def event_transitions(sf_dir: str):
    """(prev_type, next_type, n): first-order Markov transition counts
    over each user's time-ordered event stream (ties broken by
    event_id, NULL timestamps dropped) — the session-flow diagnostic
    behind funnel design ("what actually follows a view?").

    Scale shape: one user-hash keyed reduction — a user's events
    colocate, so each partition lexsorts its rows once by (user, ts,
    event_id), takes adjacent pairs within user runs, and collapses
    them to per-partition (prev, next, n_p) partials (<= #types^2
    rows); the driver sums <= partitions x #types^2 integers. No
    per-user Python loop, no whale-key exposure beyond the
    one-partition-per-32nd-of-events bound shared with funnel_counts."""
    import pandas as pd

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        table_partitions,
    )

    slim_schema = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.int64()),
         ("event_id", pa.int64()), ("event_type", pa.string())]
    )

    def slim(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return slim_schema.empty_table()
        ts = batch["ts"].to_numpy(zero_copy_only=False).view("int64")
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        # NaT drops; NULL event types drop too (a NULL type forms its
        # own lag() group in SQL and factorize's -1 code would decode
        # into the wrong pair — the oracle pins both IS NOT NULL)
        keep = (ts != np.iinfo(np.int64).min) & np.asarray(
            [t is not None for t in et], dtype=bool
        )
        return pa.table(
            {
                "user_id": pa.array(
                    batch["user_id"].to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "ts": pa.array(ts[keep], type=pa.int64()),
                "event_id": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False)[keep],
                    type=pa.int64(),
                ),
                "event_type": pa.array(et[keep], type=pa.string()),
            }
        )

    part_schema = pa.schema(
        [("prev_type", pa.string()), ("next_type", pa.string()),
         ("n_p", pa.int64())]
    )

    def pairs_per_user(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        if len(uid) < 2:
            return pd.DataFrame(
                {"prev_type": [], "next_type": [], "n_p": []}
            ).astype({"prev_type": object, "next_type": object, "n_p": np.int64})
        same_user = uid[1:] == uid[:-1]
        prev = et[:-1][same_user]
        nxt = et[1:][same_user]
        codes_p, types_p = pd.factorize(prev, sort=False)
        codes_n, types_n = pd.factorize(nxt, sort=False)
        key = codes_p.astype(np.int64) * len(types_n) + codes_n
        uniq, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame(
            {
                "prev_type": types_p[uniq // len(types_n)],
                "next_type": types_n[uniq % len(types_n)],
                "n_p": cnt.astype(np.int64),
            }
        )

    parts = grouped_partitions(
        _events(sf_dir, ["user_id", "ts", "event_id", "event_type"]).map_batches(
            slim, batch_format="pyarrow"
        ),
        lambda b: b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
        pairs_per_user,
        part_schema,
        n_partitions=table_partitions(f"{sf_dir}/events.parquet"),
    )
    # <= partitions x #types^2 rows: bounded driver-side sum
    agg: dict = {}
    for r in parts.take_all():
        key = (r["prev_type"], r["next_type"])
        agg[key] = agg.get(key, 0) + int(r["n_p"])
    keys = sorted(agg)
    return pa.table(
        {
            "prev_type": pa.array([k[0] for k in keys], type=pa.string()),
            "next_type": pa.array([k[1] for k in keys], type=pa.string()),
            "n": pa.array([agg[k] for k in keys], type=pa.int64()),
        }
    )
