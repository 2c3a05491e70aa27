"""Local mirror of the driver's correctness check: run every queries()
entry and its oracle_sql() twin on the same sf dir, compare row count,
schema (column names) and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
(with query names given, only those entries are checked)
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(x) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.Error:
            pass

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
                )
                ok_vals = True
            except AssertionError as e:
                msg = str(e).splitlines()[0]
                print(f"       value diff: {msg}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"[{status}] {name}: rows {len(got)}/{len(exp)} cols_match={ok_cols} vals={ok_vals}"
        )
        if not ok_cols:
            print(f"       got  cols: {list(got.columns)}")
            print(f"       want cols: {list(exp.columns)}")
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rc = main(sf, only=sys.argv[2:] or None)
    import ray

    ray.shutdown()
    sys.exit(1 if rc else 0)
