"""Skew-proof twins of the per-key streaming operators.

The plain operators in :mod:`relational` / :mod:`windows` hold ALL of a
user's events in one task (the classic sessionization contract) and fail
loudly on whale keys. These variants remove the contract entirely: the
shuffle key is ``(user_id, time_bucket)``, so a single task never holds
more than one bucket of one user's events — a key with a billion events
spread over time is processed by thousands of independent tasks. The
price is one extra SMALL shuffle over per-bucket summary rows (one or
two rows per non-empty (user, bucket), independent of event count),
which stitches state across bucket boundaries:

- :func:`range_join_counts_scalable` — rights whose window spills into
  the previous bucket are map-side REPLICATED to it (bounded by
  window/bucket ratio), so one (user, bucket) groupby is exact. No
  summary pass at all.
- :func:`sessionize_scalable` — per-bucket sessions; only each bucket's
  FIRST and LAST session can merge across a boundary, so the stitch
  pass merges <= 2 rows per bucket per user.
- :func:`asof_join_events_scalable` — per-bucket local as-of; left
  events with no local prior right take the carry (latest right of any
  earlier bucket), computed from one summary row per bucket.
- :func:`late_events_scalable` — per-bucket local watermark (running
  max in arrival order); the cross-bucket carry is the prefix max of
  per-bucket summaries. Arrival order = event_id order, and bucketing
  is BY ARRIVAL (event_id ranges), so the watermark prefix is exact.

All four are result-identical to their plain twins (asserted by tests
and shared SQL oracles); the partitioning assumption they rely on is
only that one (user, bucket) slice fits a task — tune ``bucket_*``
for the key's event rate.

Execution note: every per-key stage runs through
:func:`invertedindex_ray.pipelines.dedup._keyed_partitions` — the
group functions keep exact per-group semantics, but are dispatched per
group SLICE inside one Ray task per hash partition instead of Ray's
per-group map_groups machinery (~2 ms/group, the measured bottleneck
at per-user cardinalities).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from invertedindex_ray.functions.grouping import table_partitions as _tp
from invertedindex_ray.pipelines.dedup import _keyed_partitions
from invertedindex_ray.pipelines.relational import _events


# ------------------------------------------------------------ range join


def range_join_counts_scalable(
    sf_dir: str,
    *,
    left_type: str = "purchase",
    right_type: str = "error",
    window_minutes: int = 5,
    bucket_hours: int = 24,
):
    """Exact skew-proof range join: count same-user ``right_type`` events
    in (left.ts, left.ts + window] with ONE (user, bucket) shuffle.

    A right event at ts is replicated to bucket(ts) and — iff it falls
    within ``window`` of the bucket's start — to the previous bucket,
    where it can complete windows of that bucket's left events. With
    window << bucket the replication factor is window/bucket (~0.3 %
    at the defaults); correctness requires only window <= bucket."""
    w_us = window_minutes * 60_000_000
    b_us = bucket_hours * 3_600_000_000
    if w_us > b_us:
        raise ValueError("window must not exceed the bucket size")

    def shard(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        keep = (et == left_type) | (et == right_type)
        eid, ts, uid, et = eid[keep], ts[keep], uid[keep], et[keep]
        bucket = ts // b_us
        is_left = et == left_type
        # duplicate early rights into the previous bucket
        dup = (~is_left) & (ts - bucket * b_us <= w_us)
        out_eid = np.concatenate((eid, eid[dup]))
        out_ts = np.concatenate((ts, ts[dup]))
        out_uid = np.concatenate((uid, uid[dup]))
        out_b = np.concatenate((bucket, bucket[dup] - 1))
        out_l = np.concatenate((is_left, np.zeros(int(dup.sum()), dtype=bool)))
        return pa.table(
            {
                "user_id": pa.array(out_uid, type=pa.int64()),
                "bucket": pa.array(out_b.astype(np.int64), type=pa.int64()),
                "event_id": pa.array(out_eid, type=pa.int64()),
                "ts": pa.array(out_ts, type=pa.int64()),
                "is_left": pa.array(out_l),
            }
        )

    def count_in_bucket(group: pa.Table) -> pa.Table:
        b = int(group["bucket"][0].as_py())
        uid = int(group["user_id"][0].as_py())
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        is_left = group["is_left"].to_numpy(zero_copy_only=False)
        # only lefts NATIVE to this bucket emit rows (replicated rights
        # are never lefts, so no double-emission is possible)
        lmask = is_left & (ts // b_us == b)
        if not lmask.any():
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "n_right": pa.array([], type=pa.int64()),
                }
            )
        l_eid, l_ts = eid[lmask], ts[lmask]
        r_ts = np.sort(ts[~is_left])
        lo = np.searchsorted(r_ts, l_ts, side="right")
        hi = np.searchsorted(r_ts, l_ts + w_us, side="right")
        return pa.table(
            {
                "event_id": pa.array(l_eid, type=pa.int64()),
                "user_id": pa.array(np.full(len(l_eid), uid), type=pa.int64()),
                "n_right": pa.array((hi - lo).astype(np.int64), type=pa.int64()),
            }
        )

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("n_right", pa.int64())]
    )
    return _keyed_partitions(
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]).map_batches(
            shard, batch_format="pyarrow"
        ),
        ["user_id", "bucket"],
        count_in_bucket,
        out_schema,
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    )


# ------------------------------------------------------------ sessionize


def sessionize_scalable(
    sf_dir: str, gap_minutes: int = 30, *, bucket_hours: int = 24
):
    """Exact skew-proof sessionization in one (user, bucket) shuffle plus
    one boundary-stitch shuffle over <= 2 summary rows per bucket.

    Within a bucket, sessions are the plain vectorized gap split. Across
    a boundary only the LAST session of bucket i can merge with the
    FIRST session of the next non-empty bucket (any interior session is
    separated from the boundary by a gap on both sides), so the stitch
    pass chain-merges the per-user boundary sessions — O(#non-empty
    buckets) rows per user, independent of event count. Requires
    gap <= bucket (a whole empty bucket between events always splits)."""
    gap_us = gap_minutes * 60_000_000
    b_us = bucket_hours * 3_600_000_000
    if gap_us > b_us:
        raise ValueError("gap must not exceed the bucket size")

    def shard(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "bucket": pa.array((ts // b_us).astype(np.int64), type=pa.int64()),
                "ts": pa.array(ts, type=pa.int64()),
            }
        )

    def bucket_sessions(group: pa.Table) -> pa.Table:
        uid = int(group["user_id"][0].as_py())
        ts = np.sort(group["ts"].to_numpy(zero_copy_only=False))
        new = np.empty(len(ts), dtype=bool)
        new[0] = True
        np.greater(ts[1:] - ts[:-1], gap_us, out=new[1:])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ts))
        n = len(starts)
        # boundary flags: only the first/last session of the bucket can
        # merge across buckets
        is_first = np.zeros(n, dtype=bool)
        is_last = np.zeros(n, dtype=bool)
        is_first[0] = True
        is_last[n - 1] = True
        return pa.table(
            {
                "user_id": pa.array(np.full(n, uid), type=pa.int64()),
                "s": pa.array(ts[starts], type=pa.int64()),
                "e": pa.array(ts[ends - 1], type=pa.int64()),
                "n_events": pa.array((ends - starts).astype(np.int64), type=pa.int64()),
                "boundary": pa.array(is_first | is_last),
            }
        )

    pb_schema = pa.schema(
        [("user_id", pa.int64()), ("s", pa.int64()), ("e", pa.int64()),
         ("n_events", pa.int64()), ("boundary", pa.bool_())]
    )
    per_bucket = _keyed_partitions(
        _events(sf_dir, ["ts", "user_id"]).map_batches(
            shard, batch_format="pyarrow"
        ),
        ["user_id", "bucket"],
        bucket_sessions,
        pb_schema,
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    ).materialize()  # consumed twice: interior pass-through + stitch

    interior = per_bucket.filter(expr="boundary == False").select_columns(
        ["user_id", "s", "e", "n_events"]
    )

    def stitch(group: pa.Table) -> pa.Table:
        uid = int(group["user_id"][0].as_py())
        s = group["s"].to_numpy(zero_copy_only=False)
        e = group["e"].to_numpy(zero_copy_only=False)
        ne = group["n_events"].to_numpy(zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        s, e, ne = s[order], e[order], ne[order]
        out_s, out_e, out_n = [], [], []
        cs, ce, cn = s[0], e[0], ne[0]
        for i in range(1, len(s)):
            if s[i] - ce <= gap_us:
                ce = max(ce, e[i])
                cn += ne[i]
            else:
                out_s.append(cs), out_e.append(ce), out_n.append(cn)
                cs, ce, cn = s[i], e[i], ne[i]
        out_s.append(cs), out_e.append(ce), out_n.append(cn)
        return pa.table(
            {
                "user_id": pa.array(np.full(len(out_s), uid), type=pa.int64()),
                "s": pa.array(np.asarray(out_s, dtype=np.int64), type=pa.int64()),
                "e": pa.array(np.asarray(out_e, dtype=np.int64), type=pa.int64()),
                "n_events": pa.array(np.asarray(out_n, dtype=np.int64), type=pa.int64()),
            }
        )

    st_schema = pa.schema(
        [("user_id", pa.int64()), ("s", pa.int64()), ("e", pa.int64()),
         ("n_events", pa.int64())]
    )
    stitched = _keyed_partitions(
        per_bucket.filter(expr="boundary == True"),
        ["user_id"],
        stitch,
        st_schema,
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "session_start": t["s"].cast(pa.int64()).cast(pa.timestamp("us")),
                "session_end": t["e"].cast(pa.int64()).cast(pa.timestamp("us")),
                "n_events": t["n_events"].cast(pa.int64()),
            }
        )

    return interior.union(stitched).map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------ as-of join


def asof_join_events_scalable(
    sf_dir: str,
    *,
    left_type: str = "purchase",
    right_type: str = "click",
    bucket_hours: int = 24,
):
    """Exact skew-proof as-of join: per-(user, bucket) local resolution
    plus a carry pass over ONE summary row per non-empty bucket.

    Bucket-local pass resolves every left event that has a prior right
    in its own bucket; the rest need the latest right of any EARLIER
    bucket — a per-user prefix scan over (bucket, last_right_ts,
    last_right_value) summary rows, then a small keyed merge back onto
    the unresolved lefts. Right-side (user, ts) ties collapse to
    max(value) exactly like the plain twin."""
    b_us = bucket_hours * 3_600_000_000

    def shard(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        keep = (et == left_type) | (et == right_type)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)[keep]
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[keep]
        uid = batch["user_id"].to_numpy(zero_copy_only=False)[keep]
        val = batch["value"].to_numpy(zero_copy_only=False)[keep]
        is_left = et[keep] == left_type
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "bucket": pa.array((ts // b_us).astype(np.int64), type=pa.int64()),
                "event_id": pa.array(eid, type=pa.int64()),
                "ts": pa.array(ts, type=pa.int64()),
                "value": pa.array(val, type=pa.float64()),
                "is_left": pa.array(is_left),
            }
        )

    def local(group: pa.Table) -> pa.Table:
        uid = int(group["user_id"][0].as_py())
        b = int(group["bucket"][0].as_py())
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        val = group["value"].to_numpy(zero_copy_only=False)
        is_left = group["is_left"].to_numpy(zero_copy_only=False)
        l_eid, l_ts = eid[is_left], ts[is_left]
        r_ts, r_val = ts[~is_left], val[~is_left]
        order = np.argsort(r_ts, kind="stable")
        r_ts, r_val = r_ts[order], r_val[order]
        if len(r_ts):
            uniq_ts, start = np.unique(r_ts, return_index=True)
            ends = np.append(start[1:], len(r_ts))
            r_val = np.array(
                [r_val[s:e].max() for s, e in zip(start, ends)], dtype=np.float64
            )
            r_ts = uniq_ts
        cols_eid, cols_ts, cols_kind, pv = [], [], [], []
        if len(l_eid):
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            cols_eid.extend(int(x) for x in l_eid)
            cols_ts.extend(int(x) for x in l_ts)
            for i in idx:
                if i >= 0:
                    cols_kind.append("done")
                    pv.append(float(r_val[i]))
                else:
                    cols_kind.append("open")
                    pv.append(None)
        if len(r_ts):  # one summary row: the bucket's latest right
            cols_eid.append(-1)
            cols_ts.append(int(r_ts[-1]))
            cols_kind.append("summary")
            pv.append(float(r_val[-1]))
        n = len(cols_eid)
        return pa.table(
            {
                "user_id": pa.array(np.full(n, uid), type=pa.int64()),
                "bucket": pa.array(np.full(n, b, dtype=np.int64), type=pa.int64()),
                "kind": pa.array(cols_kind, type=pa.string()),
                "event_id": pa.array(cols_eid, type=pa.int64()),
                "ts": pa.array(cols_ts, type=pa.int64()),
                "prior_value": pa.array(pv, type=pa.float64()),
            }
        )

    lo_schema = pa.schema(
        [("user_id", pa.int64()), ("bucket", pa.int64()), ("kind", pa.string()),
         ("event_id", pa.int64()), ("ts", pa.int64()), ("prior_value", pa.float64())]
    )
    staged = _keyed_partitions(
        _events(
            sf_dir, ["event_id", "ts", "user_id", "event_type", "value"]
        ).map_batches(shard, batch_format="pyarrow"),
        ["user_id", "bucket"],
        local,
        lo_schema,
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    ).materialize()  # done rows pass through; open+summary go to carry

    done = staged.filter(expr="kind == 'done'")

    def carry(group: pa.Table) -> pa.Table:
        """Per user: resolve open lefts with the latest summary of any
        strictly earlier bucket. Row count here is O(open lefts +
        buckets), NOT O(events)."""
        uid = int(group["user_id"][0].as_py())
        kind = np.asarray(group["kind"].to_pylist(), dtype=object)
        bucket = group["bucket"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        pv = group["prior_value"].to_numpy(zero_copy_only=False)
        sm = kind == "summary"
        sb = bucket[sm]
        order = np.argsort(sb, kind="stable")
        sb, s_val = sb[order], pv[sm][order]
        om = kind == "open"
        o_eid, o_bucket = eid[om], bucket[om]
        idx = np.searchsorted(sb, o_bucket, side="left") - 1
        prior = [float(s_val[i]) if i >= 0 else None for i in idx]
        return pa.table(
            {
                "event_id": pa.array(o_eid, type=pa.int64()),
                "user_id": pa.array(np.full(len(o_eid), uid), type=pa.int64()),
                "prior_value": pa.array(prior, type=pa.float64()),
            }
        )

    ca_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("prior_value", pa.float64())]
    )
    carried = _keyed_partitions(
        staged.filter(expr="kind != 'done'"), ["user_id"], carry, ca_schema,
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "user_id": t["user_id"].cast(pa.int64()),
                "prior_value": t["prior_value"].cast(pa.float64()),
            }
        )

    return done.map_batches(finish, batch_format="pyarrow").union(
        carried.map_batches(finish, batch_format="pyarrow")
    )


# ------------------------------------------------------------ late events


def late_events_scalable(
    sf_dir: str,
    *,
    lateness_minutes: int = 60,
    bucket_events: int = 100_000,
):
    """Exact skew-proof watermark marking. Arrival order is event_id
    order, so bucketing by ``event_id // bucket_events`` preserves the
    replay order across buckets; the per-user watermark carried into a
    bucket is the max event time of all earlier buckets — one summary
    row per (user, bucket), prefix-maxed per user, merged back in a
    second (user, bucket) pass (events make two bounded shuffles, the
    summaries one tiny one)."""
    late_us = lateness_minutes * 60_000_000

    def shard(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "bucket": pa.array(
                    (eid // bucket_events).astype(np.int64), type=pa.int64()
                ),
                "event_id": pa.array(eid, type=pa.int64()),
                "ts": pa.array(ts, type=pa.int64()),
            }
        )

    def local(group: pa.Table) -> pa.Table:
        """Emit events with their LOCAL running-max watermark plus one
        summary row (event_id = -1) holding the bucket's max ts."""
        uid = int(group["user_id"][0].as_py())
        b = int(group["bucket"][0].as_py())
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        order = np.argsort(eid, kind="stable")
        eid, ts = eid[order], ts[order]
        wm = np.maximum.accumulate(ts)
        return pa.table(
            {
                "user_id": pa.array(np.full(len(eid) + 1, uid), type=pa.int64()),
                "bucket": pa.array(
                    np.full(len(eid) + 1, b, dtype=np.int64), type=pa.int64()
                ),
                "event_id": pa.array(
                    np.concatenate((eid, [-1])), type=pa.int64()
                ),
                "ts": pa.array(np.concatenate((ts, [0])), type=pa.int64()),
                "local_wm": pa.array(
                    np.concatenate((wm, [int(wm[-1])])), type=pa.int64()
                ),
            }
        )

    lw_schema = pa.schema(
        [("user_id", pa.int64()), ("bucket", pa.int64()), ("event_id", pa.int64()),
         ("ts", pa.int64()), ("local_wm", pa.int64())]
    )
    staged = _keyed_partitions(
        _events(sf_dir, ["event_id", "ts", "user_id"]).map_batches(
            shard, batch_format="pyarrow"
        ),
        ["user_id", "bucket"],
        local,
        lw_schema,
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    )

    # summaries are tiny (one row per (user, bucket)): prefix-max per
    # user, then merge the carry back onto the event rows via a second
    # (user, bucket) groupby over the union
    staged = staged.materialize()
    events_rows = staged.filter(expr="event_id >= 0")
    summaries = staged.filter(expr="event_id == -1")

    def carries(group: pa.Table) -> pa.Table:
        uid = int(group["user_id"][0].as_py())
        b = group["bucket"].to_numpy(zero_copy_only=False)
        wm = group["local_wm"].to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        b, wm = b[order], wm[order]
        carry = np.concatenate(([np.int64(-1)], np.maximum.accumulate(wm)[:-1]))
        return pa.table(
            {
                "user_id": pa.array(np.full(len(b), uid), type=pa.int64()),
                "bucket": pa.array(b, type=pa.int64()),
                "event_id": pa.array(np.full(len(b), -2), type=pa.int64()),
                "ts": pa.array(np.zeros(len(b), dtype=np.int64), type=pa.int64()),
                "local_wm": pa.array(carry, type=pa.int64()),
            }
        )

    carry_rows = _keyed_partitions(
        summaries, ["user_id"], carries, lw_schema,
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    )

    def apply(group: pa.Table) -> pa.Table:
        uid = int(group["user_id"][0].as_py())
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        lwm = group["local_wm"].to_numpy(zero_copy_only=False)
        cm = eid == -2
        carry = int(lwm[cm][0]) if cm.any() else -1
        em = ~cm
        eid, ts, lwm = eid[em], ts[em], lwm[em]
        order = np.argsort(eid, kind="stable")
        eid, ts, lwm = eid[order], ts[order], lwm[order]
        wm = np.maximum(lwm, carry)
        is_late = ts < (wm - late_us)
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "user_id": pa.array(np.full(len(eid), uid), type=pa.int64()),
                "is_late": pa.array(is_late.astype(np.int64), type=pa.int64()),
            }
        )

    ap_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("is_late", pa.int64())]
    )
    return _keyed_partitions(
        events_rows.union(carry_rows), ["user_id", "bucket"], apply, ap_schema,
        n_partitions=_tp(f"{sf_dir}/events.parquet"),
    )
