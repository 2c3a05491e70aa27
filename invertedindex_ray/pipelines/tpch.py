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

from invertedindex_ray.sources.io import read_parquet_clean as _rpq

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

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        parquet_num_rows,
        reduction_partitions,
    )
    from invertedindex_ray.functions.hashing import hash_strings
    from invertedindex_ray.functions.rounding import round_half_up

    cut = _ts_us(cutoff)
    li = _rpq(
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
        # read_parquet's filter= is exact row-level (verified on this
        # Ray), so no re-filter here
        if batch.num_rows == 0:
            return part_schema.empty_table()
        rf = np.asarray(batch["l_returnflag"].to_pylist(), dtype=object)
        ls = np.asarray(batch["l_linestatus"].to_pylist(), dtype=object)
        qty = np.rint(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)  # rint, matching the oracle's CAST(round(...))
        pc = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        dc = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        tc = _cents(batch["l_tax"].to_numpy(zero_copy_only=False))
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
        ),
        sum_key,
        part_schema,
        # per-batch partials: <= ~6 rows per read batch
        n_partitions=reduction_partitions(
            parquet_num_rows(f"{sf_dir}/lineitem.parquet") // 1000
        ),
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
    li = _rpq(
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
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        dc = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        pc = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        # the shipdate window is already exact at the read; only the
        # discount/quantity predicates remain
        keep = (dc >= disc_lo) & (dc <= disc_hi) & (qty < qty_below)
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
        materialized_nonempty,
        pair_join_partitions,
        parquet_num_rows,
        reduction_partitions,
    )
    from invertedindex_ray.functions.rounding import round_half_up

    cut = _ts_us(cutoff)
    # materialized_nonempty on every join side: a filtered side can
    # produce schema-less empty blocks that crash Acero's hash-join
    # partition builder (grouping.py's round-2 finding)
    cust, _ = materialized_nonempty(
        _rpq(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
            filter=pds.field("c_mktsegment") == segment,
        ).select_columns(["c_custkey"]),
        pa.schema([("c_custkey", pa.int64())]),
    )
    orders = _rpq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pds.field("o_orderdate")
        < pa.scalar(cut, pa.timestamp("us")),
    )
    nparts = pair_join_partitions(parquet_num_rows(f"{sf_dir}/orders.parquet"))
    seg_orders, _ = materialized_nonempty(
        orders.join(
            cust, join_type="inner", num_partitions=nparts,
            on=("o_custkey",), right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "o_orderdate"]),
        pa.schema([("o_orderkey", pa.int64()),
                   ("o_orderdate", pa.timestamp("us"))]),
    )

    li = _rpq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pds.field("l_shipdate") > pa.scalar(cut, pa.timestamp("us")),
    )

    rev_schema = pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())])

    def rev_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return rev_schema.empty_table()
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        pc = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        dc = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        rev = pc * (100 - dc)
        uniq, inv = np.unique(ok, return_inverse=True)
        # np.add.at on int64, NOT bincount(weights=...): bincount
        # accumulates in float64 and silently rounds above 2^53 —
        # the module's exactness contract would break at ~8M rows
        # per key of 1e9-magnitude revenue
        tot = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(tot, inv, rev)
        return pa.table(
            {
                "l_orderkey": pa.array(uniq, type=pa.int64()),
                "rev": pa.array(tot, type=pa.int64()),
            }
        )

    rev, _ = materialized_nonempty(
        li.map_batches(rev_partial, batch_format="pyarrow"), rev_schema
    )
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
        tot = np.zeros(len(uniq), dtype=np.int64)  # exact above 2^53
        np.add.at(tot, inv, rv)
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
        ),
        sum_order,
        agg_schema,
        n_partitions=reduction_partitions(
            parquet_num_rows(f"{sf_dir}/lineitem.parquet")
        ),
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


def q5_local_supplier_volume(
    sf_dir: str,
    *,
    region: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
):
    """(n_name, revenue_r): the TPC-H Q5 local-supplier-volume shape —
    revenue from lineitems where the CUSTOMER and the SUPPLIER sit in
    the same nation of ``region``, for orders placed in the window;
    one row per nation, revenue descending (n_name ties ascending).

    Scale shape: nation/region are true dimension tables (tens of
    rows) and ride the task closures as plain dicts — the standard
    star-schema treatment; supplier, customer, orders and lineitem are
    fact-scale and exchange through Dataset.join with footer-derived
    fan-out. Revenue is exact integer cents throughout; the final
    per-nation sum is a <= |nations| keyed reduction."""
    import pandas as pd
    import pyarrow.dataset as pds
    import ray.data as rd

    from invertedindex_ray.functions.grouping import (
        grouped_partitions,
        materialized_nonempty,
        pair_join_partitions,
        parquet_num_rows,
        reduction_partitions,
    )

    lo, hi = _ts_us(date_from), _ts_us(date_to)
    # dimension broadcast: region -> nation keys/names (tiny by contract)
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = {
        int(k)
        for k, name in zip(reg["r_regionkey"].to_pylist(),
                           reg["r_name"].to_pylist())
        if name == region
    }
    nat_name = {
        int(k): n
        for k, n, rk in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
        if int(rk) in rkeys
    }
    if not nat_name:
        return pa.table(
            {"n_name": pa.array([], type=pa.string()),
             "revenue_r": pa.array([], type=pa.float64())}
        )
    nat_set = frozenset(nat_name)

    # fact sides: filtered/pruned reads, joins with data-derived fan-out
    nat_arr = np.fromiter(nat_set, dtype=np.int64, count=len(nat_set))

    def _nation_filter(key_col: str, schema: pa.Schema):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return schema.empty_table()
            nk = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(np.isin(nk, nat_arr))).cast(schema)

        return f

    supp_schema = pa.schema(
        [("s_suppkey", pa.int64()), ("s_nationkey", pa.int64())]
    )
    supp, _ = materialized_nonempty(
        _rpq(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ).map_batches(
            _nation_filter("s_nationkey", supp_schema), batch_format="pyarrow"
        ),
        supp_schema,
    )
    cust_schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]
    )
    cust, _ = materialized_nonempty(
        _rpq(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).map_batches(
            _nation_filter("c_nationkey", cust_schema), batch_format="pyarrow"
        ),
        cust_schema,
    )
    orders = _rpq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pds.field("o_orderdate") >= pa.scalar(lo, pa.timestamp("us")))
        & (pds.field("o_orderdate") < pa.scalar(hi, pa.timestamp("us"))),
    ).select_columns(["o_orderkey", "o_custkey"])
    nparts = pair_join_partitions(parquet_num_rows(f"{sf_dir}/orders.parquet"))
    ords, _ = materialized_nonempty(
        orders.join(
            cust, join_type="inner", num_partitions=nparts,
            on=("o_custkey",), right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "c_nationkey"]),
        pa.schema([("o_orderkey", pa.int64()), ("c_nationkey", pa.int64())]),
    )

    li = _rpq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def slim_rev(batch: pa.Table) -> pa.Table:
        pc = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        dc = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
                "l_suppkey": batch["l_suppkey"].cast(pa.int64()),
                "rev": pa.array(pc * (100 - dc), type=pa.int64()),
            }
        )

    lrev_slim, _ = materialized_nonempty(
        li.map_batches(slim_rev, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
                   ("rev", pa.int64())]),
    )
    lrev, _ = materialized_nonempty(
        lrev_slim.join(
            supp, join_type="inner", num_partitions=nparts,
            on=("l_suppkey",), right_on=("s_suppkey",),
        ).select_columns(["l_orderkey", "rev", "s_nationkey"]),
        pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64()),
                   ("s_nationkey", pa.int64())]),
    )

    both = lrev.join(
        ords, join_type="inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    agg_schema = pa.schema([("nk", pa.int64()), ("rev", pa.int64())])

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        sn = g["s_nationkey"].to_numpy().astype(np.int64)
        cn = g["c_nationkey"].to_numpy().astype(np.int64)
        rv = g["rev"].to_numpy()
        keep = sn == cn  # customer and supplier share the nation
        uniq, inv = np.unique(sn[keep], return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.int64)  # exact above 2^53
        np.add.at(tot, inv, rv[keep])
        return pd.DataFrame({"nk": uniq.astype(np.int64), "rev": tot})

    rows = grouped_partitions(
        both,
        lambda b: b["s_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.uint64
        ),
        per_nation,
        agg_schema,
        n_partitions=reduction_partitions(
            parquet_num_rows(f"{sf_dir}/lineitem.parquet")
        ),
    ).take_all()  # <= |nations| rows
    agg: dict = {}
    for r in rows:
        agg[int(r["nk"])] = agg.get(int(r["nk"]), 0) + int(r["rev"])
    out = sorted(
        ((nat_name[k], v) for k, v in agg.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return pa.table(
        {
            "n_name": pa.array([n for n, _ in out], type=pa.string()),
            "revenue_r": pa.array(
                [v / 10000.0 for _, v in out], type=pa.float64()
            ),
        }
    )


def q14_promo_share(
    sf_dir: str,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1996-02-01",
):
    """(promo_share_r, promo_revenue_r, total_revenue_r, n_rows): the
    TPC-H Q14 promotion-effect shape — the percentage of window revenue
    from PROMO-typed parts. lineitem (shipdate window) joins part on
    partkey; both revenue sums are exact integer cents; the share
    divides the two exact integers once at the end (rounded 6)."""
    import pyarrow.dataset as pds
    import ray.data as rd

    from invertedindex_ray.functions.grouping import (
        materialized_nonempty,
        pair_join_partitions,
        parquet_num_rows,
    )
    from invertedindex_ray.functions.rounding import round_half_up

    lo, hi = _ts_us(date_from), _ts_us(date_to)
    li = _rpq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pds.field("l_shipdate") >= pa.scalar(lo, pa.timestamp("us")))
        & (pds.field("l_shipdate") < pa.scalar(hi, pa.timestamp("us"))),
    )
    part_t = _rpq(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )

    def slim(batch: pa.Table) -> pa.Table:
        pc = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        dc = _cents(batch["l_discount"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "l_partkey": pa.array(
                    batch["l_partkey"].to_numpy(zero_copy_only=False),
                    type=pa.int64(),
                ),
                "rev": pa.array(pc * (100 - dc), type=pa.int64()),
            }
        )

    nparts = pair_join_partitions(
        parquet_num_rows(f"{sf_dir}/lineitem.parquet")
    )
    li_slim, _ = materialized_nonempty(
        li.map_batches(slim, batch_format="pyarrow"),
        pa.schema([("l_partkey", pa.int64()), ("rev", pa.int64())]),
    )
    j = li_slim.join(
        part_t, join_type="inner", num_partitions=nparts,
        on=("l_partkey",), right_on=("p_partkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        rv = batch["rev"].to_numpy(zero_copy_only=False)
        promo = pc_.starts_with(
            batch["p_type"].combine_chunks()
            if isinstance(batch["p_type"], pa.ChunkedArray)
            else batch["p_type"],
            pattern="PROMO",
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "promo": pa.array([int(rv[promo].sum())], type=pa.int64()),
                "total": pa.array([int(rv.sum())], type=pa.int64()),
                "n": pa.array([len(rv)], type=pa.int64()),
            }
        )

    rows = j.map_batches(partial, batch_format="pyarrow").take_all()
    promo = sum(int(r["promo"]) for r in rows)
    total = sum(int(r["total"]) for r in rows)
    n = sum(int(r["n"]) for r in rows)
    share = 100.0 * promo / total if total else 0.0
    return pa.table(
        {
            "promo_share_r": pa.array(
                round_half_up(np.array([share]), 6), type=pa.float64()
            ),
            "promo_revenue_r": pa.array([promo / 10000.0], type=pa.float64()),
            "total_revenue_r": pa.array([total / 10000.0], type=pa.float64()),
            "n_rows": pa.array([n], type=pa.int64()),
        }
    )
