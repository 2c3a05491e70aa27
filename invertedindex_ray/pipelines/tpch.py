"""Classic relational analytics over the TPC-H-shaped tables — the
wide-operator demonstration on the LARGEST test tables (lineitem is
600 K rows at sf0.1, 10x the documents table): filter-pushdown reads,
map-side partial aggregation, hash-shuffle joins with data-derived
fan-out, and bounded top-k merges.

Exact-arithmetic discipline: every money/discount column in the
synthetic tables is 2-decimal fixed-point, so per-row values cast to
exact integer cents (``round(x * 100)`` — the float is within 1e-9 of
the true cents, so the cast is exact and identical in numpy and
DuckDB) and all SUMs run in int64, immune to float-association
divergence between the Ray partials and the SQL oracle's hash
aggregate. Ratios divide the exact integers at the very end with the
same IEEE ops on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

US = 1_000_000


def _ts_us(date_str: str) -> int:
    """'YYYY-MM-DD' -> microseconds since epoch (UTC midnight)."""
    import datetime as dt

    d = dt.datetime.fromisoformat(date_str)
    return int(d.replace(tzinfo=dt.timezone.utc).timestamp()) * US


def _cents(col: np.ndarray) -> np.ndarray:
    return np.rint(col * 100.0).astype(np.int64)


def q1_pricing_summary(sf_dir: str, *, cutoff: str = "1998-09-02"):
    """(l_returnflag, l_linestatus, sum_qty, sum_base_price_r,
    sum_disc_price_r, sum_charge_r, avg_qty_r, avg_price_r, avg_disc_r,
    count_order): the TPC-H Q1 pricing summary over lineitems shipped
    on or before ``cutoff``.

    Scale shape: columns pruned and the date filter pushed to the
    parquet read; each batch collapses to <= |rf| x |ls| exact-integer
    partial rows; one tiny keyed reduction; ratios computed once at the
    end. The shuffle moves a handful of rows per block regardless of
    lineitem size."""
    import pandas as pd
    import pyarrow.dataset as pds
    import ray.data as rd

    from invertedindex_ray.functions.grouping import grouped_partitions
    from invertedindex_ray.functions.hashing import hash_strings
    from invertedindex_ray.functions.rounding import round_half_up

    cut = _ts_us(cutoff)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
        filter=pds.field("l_shipdate")
        <= pa.scalar(cut, type=pa.timestamp("us")),
    )

    part_schema = pa.schema(
        [("rf", pa.string()), ("ls", pa.string()), ("qty", pa.int64()),
         ("pc", pa.int64()), ("dpc", pa.int64()), ("chc", pa.int64()),
         ("dc", pa.int64()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False).view("int64")
        keep = ship <= cut  # belt over the pushdown (row-group granularity)
        rf = np.asarray(batch["l_returnflag"].to_pylist(), dtype=object)[keep]
        ls = np.asarray(batch["l_linestatus"].to_pylist(), dtype=object)[keep]
        qty = (
            batch["l_quantity"].to_numpy(zero_copy_only=False)[keep]
        ).astype(np.int64)
        pc = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        dc = _cents(batch["l_discount"].to_numpy(zero_copy_only=False)[keep])
        tc = _cents(batch["l_tax"].to_numpy(zero_copy_only=False)[keep])
        dpc = pc * (100 - dc)              # disc price in 1e-4 dollars
        chc = dpc * (100 + tc)             # charge in 1e-6 dollars
        df = pd.DataFrame(
            {"rf": rf, "ls": ls, "qty": qty, "pc": pc, "dpc": dpc,
             "chc": chc, "dc": dc}
        )
        g = df.groupby(["rf", "ls"], as_index=False).agg(
            qty=("qty", "sum"), pc=("pc", "sum"), dpc=("dpc", "sum"),
            chc=("chc", "sum"), dc=("dc", "sum"), n=("qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).cast(part_schema)

    def sum_key(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.groupby(["rf", "ls"], as_index=False).agg(
            qty=("qty", "sum"), pc=("pc", "sum"), dpc=("dpc", "sum"),
            chc=("chc", "sum"), dc=("dc", "sum"), n=("n", "sum"),
        )

    rows = grouped_partitions(
        li.map_batches(partial, batch_format="pyarrow"),
        lambda b: hash_strings(
            [f"{a}|{b_}" for a, b_ in zip(b["rf"].to_pylist(),
                                          b["ls"].to_pylist())]
        )
        & np.uint64(31),
        sum_key,
        part_schema,
    ).take_all()  # <= |rf| x |ls| rows
    rows.sort(key=lambda r: (r["rf"], r["ls"]))
    rf = [r["rf"] for r in rows]
    ls = [r["ls"] for r in rows]
    qty = np.array([r["qty"] for r in rows], dtype=np.int64)
    pc = np.array([r["pc"] for r in rows], dtype=np.int64)
    dpc = np.array([r["dpc"] for r in rows], dtype=np.int64)
    chc = np.array([r["chc"] for r in rows], dtype=np.int64)
    dc = np.array([r["dc"] for r in rows], dtype=np.int64)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    return pa.table(
        {
            "l_returnflag": pa.array(rf, type=pa.string()),
            "l_linestatus": pa.array(ls, type=pa.string()),
            "sum_qty": pa.array(qty, type=pa.int64()),
            "sum_base_price_r": pa.array(pc / 100.0, type=pa.float64()),
            "sum_disc_price_r": pa.array(dpc / 10000.0, type=pa.float64()),
            "sum_charge_r": pa.array(chc / 1000000.0, type=pa.float64()),
            "avg_qty_r": pa.array(
                round_half_up(qty / n.astype(np.float64), 6),
                type=pa.float64(),
            ),
            "avg_price_r": pa.array(
                round_half_up(pc / (100.0 * n), 6), type=pa.float64()
            ),
            "avg_disc_r": pa.array(
                round_half_up(dc / (100.0 * n), 6), type=pa.float64()
            ),
            "count_order": pa.array(n, type=pa.int64()),
        }
    )


def q6_revenue(
    sf_dir: str,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: int = 5,
    disc_hi: int = 7,
    qty_below: int = 24,
):
    """(revenue_r, n_rows): the TPC-H Q6 forecast — revenue gained by
    dropping discounts of ``disc_lo``..``disc_hi`` cents-on-the-dollar
    on small orders shipped in the window. One filtered streaming pass,
    one exact-integer partial row per block, driver sum."""
    import pyarrow.dataset as pds
    import ray.data as rd

    lo, hi = _ts_us(date_from), _ts_us(date_to)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=(pds.field("l_shipdate") >= pa.scalar(lo, pa.timestamp("us")))
        & (pds.field("l_shipdate") < pa.scalar(hi, pa.timestamp("us"))),
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"rev": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False).view("int64")
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        dc = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        pc = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        keep = (
            (ship >= lo) & (ship < hi)
            & (dc >= disc_lo) & (dc <= disc_hi)
            & (qty < qty_below)
        )
        return pa.table(
            {
                "rev": pa.array([int((pc[keep] * dc[keep]).sum())],
                                type=pa.int64()),
                "n": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    rows = li.map_batches(partial, batch_format="pyarrow").take_all()
    rev = sum(int(r["rev"]) for r in rows)
    n = sum(int(r["n"]) for r in rows)
    return pa.table(
        {
            "revenue_r": pa.array([rev / 10000.0], type=pa.float64()),
            "n_rows": pa.array([n], type=pa.int64()),
        }
    )


def q3_top_orders(
    sf_dir: str,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1997-01-01",
    k: int = 10,
):
    """(o_orderkey, o_orderdate, revenue_r, rank): the TPC-H Q3
    shipping-priority shape — top-k unshipped-revenue orders for one
    market segment: customers in ``segment`` joined to their orders
    placed before ``cutoff``, joined to lineitems shipped after
    ``cutoff``, revenue summed per order.

    Scale shape: all three reads are column-pruned and date/segment
    filtering happens before any exchange; the two hash joins use
    Dataset.join with fan-out derived from footer row counts (never
    cluster size); revenue pre-aggregates per (batch, orderkey) before
    the join; the final top-k is a per-block partial top-k + a bounded
    driver merge (the top_terms shape). Ties: (revenue desc,
    o_orderdate asc, o_orderkey asc)."""
    import pandas as pd
    import pyarrow.dataset as pds
    import ray.data as rd

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        pair_join_partitions,
        parquet_num_rows,
    )
    from invertedindex_ray.functions.rounding import round_half_up

    cut = _ts_us(cutoff)
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=pds.field("c_mktsegment") == segment,
    ).select_columns(["c_custkey"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pds.field("o_orderdate")
        < pa.scalar(cut, pa.timestamp("us")),
    )
    nparts = pair_join_partitions(parquet_num_rows(f"{sf_dir}/orders.parquet"))
    seg_orders = orders.join(
        cust, join_type="inner", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_orderdate"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pds.field("l_shipdate") > pa.scalar(cut, pa.timestamp("us")),
    )

    rev_schema = pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())])

    def rev_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return rev_schema.empty_table()
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False).view("int64")
        keep = ship > cut
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
        pc = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        dc = _cents(batch["l_discount"].to_numpy(zero_copy_only=False)[keep])
        rev = pc * (100 - dc)
        uniq, inv = np.unique(ok, return_inverse=True)
        tot = np.bincount(inv, weights=rev).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(uniq, type=pa.int64()),
                "rev": pa.array(tot, type=pa.int64()),
            }
        )

    rev = li.map_batches(rev_partial, batch_format="pyarrow")
    joined = rev.join(
        seg_orders, join_type="inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    agg_schema = pa.schema(
        [("l_orderkey", pa.int64()), ("o_orderdate", pa.int64()),
         ("rev", pa.int64())]
    )

    def sum_order(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["l_orderkey"].to_numpy()
        od = g["o_orderdate"].to_numpy()
        od = od.view("int64") if od.dtype.kind == "M" else od.astype(np.int64)
        rv = g["rev"].to_numpy()
        uniq, first, inv = np.unique(ok, return_index=True,
                                     return_inverse=True)
        tot = np.bincount(inv, weights=rv).astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": uniq.astype(np.int64),
                "o_orderdate": od[first],  # constant per order
                "rev": tot,
            }
        )

    per_order = grouped_partitions(
        joined,
        lambda b: b["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        & np.uint64(31),
        sum_order,
        agg_schema,
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        rv = batch["rev"].to_numpy(zero_copy_only=False)
        od = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((ok, od, -rv))[:k]
        return batch.take(pa.array(np.sort(sel)))

    rows = per_order.map_batches(
        partial_topk, batch_format="pyarrow"
    ).take_all()  # <= k rows per block
    if not rows:
        return pa.table(
            {"o_orderkey": pa.array([], type=pa.int64()),
             "o_orderdate": pa.array([], type=pa.timestamp("us")),
             "revenue_r": pa.array([], type=pa.float64()),
             "rank": pa.array([], type=pa.int64())}
        )
    ok = np.array([r["l_orderkey"] for r in rows], dtype=np.int64)
    od = np.array([int(r["o_orderdate"]) for r in rows], dtype=np.int64)
    rv = np.array([r["rev"] for r in rows], dtype=np.int64)
    sel = np.lexsort((ok, od, -rv))[:k]
    return pa.table(
        {
            "o_orderkey": pa.array(ok[sel], type=pa.int64()),
            "o_orderdate": pa.array(od[sel], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "revenue_r": pa.array(rv[sel] / 10000.0, type=pa.float64()),
            "rank": pa.array(
                np.arange(1, len(sel) + 1, dtype=np.int64), type=pa.int64()
            ),
        }
    )
