"""Skew-proof twins (pipelines/skewsafe.py) — result identity with the
plain per-user operators, plus the whale-key scenario the plain ops
refuse (VERDICT r2 #6: a key too big for one task must still compute).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _pdf(ds):
    return ds.to_pandas()


def _norm(ds, keys):
    return _pdf(ds).sort_values(keys).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
class TestSkewSafeEquivalence:
    """Each scalable twin must be row-identical to its plain twin on the
    real sf0.001 events table — including with SMALL buckets, so the
    cross-bucket stitch/carry paths actually run (30-day span / 6-hour
    buckets = ~120 buckets per active user)."""

    def test_sessionize(self):
        from invertedindex_ray.pipelines.skewsafe import sessionize_scalable
        from invertedindex_ray.pipelines.windows import sessionize

        keys = ["user_id", "session_start"]
        a = _norm(sessionize(SF), keys)
        for bucket_hours in (24, 6):
            b = _norm(sessionize_scalable(SF, bucket_hours=bucket_hours), keys)
            pd.testing.assert_frame_equal(a, b[a.columns.tolist()])

    def test_asof_join(self):
        from invertedindex_ray.pipelines.relational import asof_join_events
        from invertedindex_ray.pipelines.skewsafe import asof_join_events_scalable

        a = _norm(asof_join_events(SF), ["event_id"])
        for bucket_hours in (24, 6):
            b = _norm(
                asof_join_events_scalable(SF, bucket_hours=bucket_hours),
                ["event_id"],
            )
            pd.testing.assert_frame_equal(a, b[a.columns.tolist()])

    def test_range_join(self):
        from invertedindex_ray.pipelines.relational import range_join_counts
        from invertedindex_ray.pipelines.skewsafe import range_join_counts_scalable

        a = _norm(range_join_counts(SF), ["event_id"])
        for bucket_hours in (24, 1):
            b = _norm(
                range_join_counts_scalable(SF, bucket_hours=bucket_hours),
                ["event_id"],
            )
            pd.testing.assert_frame_equal(a, b[a.columns.tolist()])

    def test_late_events(self):
        from invertedindex_ray.pipelines.relational import late_events
        from invertedindex_ray.pipelines.skewsafe import late_events_scalable

        a = _norm(late_events(SF), ["event_id"])
        for bucket_events in (10**9, 100):  # single bucket vs ~10/user
            b = _norm(
                late_events_scalable(SF, bucket_events=bucket_events),
                ["event_id"],
            )
            pd.testing.assert_frame_equal(a, b[a.columns.tolist()])

    def test_parameter_validation(self):
        from invertedindex_ray.pipelines import skewsafe

        with pytest.raises(ValueError, match="bucket"):
            skewsafe.range_join_counts_scalable(
                SF, window_minutes=120, bucket_hours=1
            )
        with pytest.raises(ValueError, match="bucket"):
            skewsafe.sessionize_scalable(SF, gap_minutes=120, bucket_hours=1)


@pytest.mark.usefixtures("ray_session")
class TestWhaleKey:
    """One synthetic whale user bigger than the plain operators' per-task
    bound: the plain op fails loudly, the scalable twin computes the
    exact answer because no task ever sees more than one (user, bucket)."""

    @pytest.fixture(scope="class")
    def whale_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("whale")
        rng = np.random.default_rng(13)
        n = 4000  # one user, 4000 events spread over ~40 days
        ts = np.sort(rng.integers(0, 40 * 24 * 3600 * 10**6, size=n))
        types = np.where(
            rng.random(n) < 0.3,
            "purchase",
            np.where(rng.random(n) < 0.5, "click", "error"),
        )
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(np.zeros(n, dtype=np.int64)),
                "event_type": pa.array(types.tolist(), type=pa.string()),
                "value": pa.array(rng.random(n), type=pa.float64()),
                "props": pa.array(['{"k": 1}'] * n, type=pa.string()),
            }
        )
        pq.write_table(t, str(d / "events.parquet"))
        return str(d)

    def test_plain_refuses_scalable_computes(self, whale_dir):
        import ray

        from invertedindex_ray.pipelines.skewsafe import sessionize_scalable
        from invertedindex_ray.pipelines.windows import sessionize

        with pytest.raises((ValueError, ray.exceptions.RayTaskError)) as ei:
            _pdf(sessionize(whale_dir, max_group_rows=1000))
        assert "above the per-task bound" in str(ei.value)

        got = _norm(
            sessionize_scalable(whale_dir, bucket_hours=24),
            ["user_id", "session_start"],
        )
        # oracle: single-user sessionization in pandas
        ev = pq.read_table(whale_dir + "/events.parquet").to_pandas()
        ts = np.sort(ev["ts"].astype("int64").to_numpy())
        gap = 30 * 60_000_000
        new = np.concatenate(([True], (ts[1:] - ts[:-1]) > gap))
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ts))
        assert len(got) == len(starts)
        assert (got["session_start"].astype("int64").to_numpy() == ts[starts]).all()
        assert (got["session_end"].astype("int64").to_numpy() == ts[ends - 1]).all()
        assert (got["n_events"].to_numpy() == (ends - starts)).all()

    def test_asof_whale(self, whale_dir):
        """Scalable as-of on the whale matches a brute-force pandas oracle."""
        from invertedindex_ray.pipelines.skewsafe import asof_join_events_scalable

        got = _norm(asof_join_events_scalable(whale_dir, bucket_hours=24), ["event_id"])
        ev = pq.read_table(whale_dir + "/events.parquet").to_pandas()
        ev["t"] = ev["ts"].astype("int64")
        rights = (
            ev[ev.event_type == "click"]
            .groupby("t")["value"]
            .max()
            .sort_index()
        )
        r_ts = rights.index.to_numpy()
        r_val = rights.to_numpy()
        lefts = ev[ev.event_type == "purchase"].sort_values("event_id")
        assert len(got) == len(lefts)
        idx = np.searchsorted(r_ts, lefts["t"].to_numpy(), side="right") - 1
        for row, i in zip(got.itertuples(), idx):
            if i < 0:
                assert pd.isna(row.prior_value)
            else:
                assert row.prior_value == r_val[i]
