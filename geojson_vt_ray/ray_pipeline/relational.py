"""Relational pipelines over the TPC-H-shaped tables (orders / lineitem /
customer / nation / region) — the generic-engine surface a training-data
pipeline leans on around the geometry core: pre-aggregated scans,
broadcast dimension joins, and distributed top-k per group.

Exactness contract (shared with `entry_queries`): every compared aggregate
is computed in an exact integer domain (cents / basis points), so the
DuckDB oracle hashes bit-equal regardless of accumulation order. Derived
averages divide the same integers in both engines (one IEEE division).

Scale notes:
- `pricing_summary` shuffles only per-batch partials (≤ #groups rows per
  batch); the fact table streams.
- `revenue_by_nation` broadcasts the dimension chain (customer→nation→
  region collapsed to one custkey→(n_name, r_name) lookup) via `ray.put`
  once; the orders fact never shuffles — only ≤25-row partials do. When a
  dimension outgrows broadcast, the co-group union+groupby join pattern
  (`events.asof_join_latest`) is the fallback.
- `topk_per_group` keeps ≤ k rows per (batch, group) before the shuffle,
  so the exchange moves O(groups × k × blocks), not the table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

_US = 1_000_000


def _int_col(batch: pa.Table, name: str, scale: float) -> pa.Array:
    """Column rounded to an exact integer domain (e.g. dollars→cents)."""
    col = batch.column(name)
    if scale != 1.0:
        col = pc.multiply(col, scale)
    return pc.cast(pc.round(col), pa.int64())


def pricing_summary(
    lineitem: "ray.data.Dataset", cutoff: np.datetime64 = np.datetime64("2000-09-02")
) -> "ray.data.Dataset":
    """TPC-H Q1-shaped pricing summary: filter by ship date, aggregate
    quantity / base price / discounted price / charge per
    (returnflag, linestatus).

    Partial aggregation happens inside ``map_batches`` on the integer
    domain (cents, e4 = cents×pct, e6 = cents×pct×pct); the groupby
    shuffles one row per (batch, flag, status).
    """
    cutoff_us = cutoff.astype("datetime64[us]").astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ship = pc.cast(batch.column("l_shipdate"), pa.int64())
        batch = batch.filter(pc.less_equal(ship, cutoff_us))
        qty = _int_col(batch, "l_quantity", 1.0)
        price_c = _int_col(batch, "l_extendedprice", 100.0)
        disc_p = _int_col(batch, "l_discount", 100.0)
        tax_p = _int_col(batch, "l_tax", 100.0)
        disc_price_e4 = pc.multiply(price_c, pc.subtract(100, disc_p))
        charge_e6 = pc.multiply(disc_price_e4, pc.add(100, tax_p))
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": qty,
                "price_c": price_c,
                "disc_price_e4": disc_price_e4,
                "charge_e6": charge_e6,
            }
        )
        agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty", "sum"),
                ("price_c", "sum"),
                ("disc_price_e4", "sum"),
                ("charge_e6", "sum"),
                ("qty", "count"),
            ]
        )
        return agg.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_price", "p_disc", "p_charge", "p_n"]
        )

    totals = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("p_qty", alias_name="sum_qty"),
            Sum("p_price", alias_name="sum_base_price_cents"),
            Sum("p_disc", alias_name="sum_disc_price_e4"),
            Sum("p_charge", alias_name="sum_charge_e6"),
            Sum("p_n", alias_name="n_rows"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        # one IEEE division of exact integers — bit-equal to the oracle's
        # CAST(sum AS DOUBLE)/n
        sq = batch.column("sum_qty").to_numpy().astype(np.float64)
        n = batch.column("n_rows").to_numpy()
        return batch.append_column("avg_qty", pa.array(sq / n, pa.float64()))

    return totals.map_batches(finalize, batch_format="pyarrow")


def revenue_by_nation(
    orders: "ray.data.Dataset",
    customer: pa.Table,
    nation: pa.Table,
    region: pa.Table,
) -> "ray.data.Dataset":
    """Revenue (order total, cents) per nation and region: a broadcast
    dimension join — customer→nation→region is collapsed driver-side into
    one sorted custkey→dense-nation lookup, shipped once with ``ray.put``.

    The orders fact streams through one map stage; only per-batch
    (nation, partial-sum) rows reach the groupby.
    """
    nkey = nation.column("n_nationkey").to_numpy()
    order_n = np.argsort(nkey, kind="stable")
    nkey_sorted = nkey[order_n]
    n_names = np.asarray(nation.column("n_name").to_pylist(), dtype=object)[order_n]
    rkey = region.column("r_regionkey").to_numpy()
    order_r = np.argsort(rkey, kind="stable")
    r_names = np.asarray(region.column("r_name").to_pylist(), dtype=object)[order_r]
    r_of_n = rkey[order_r].searchsorted(nation.column("n_regionkey").to_numpy()[order_n])

    ckey = customer.column("c_custkey").to_numpy()
    order_c = np.argsort(ckey, kind="stable")
    cust_sorted = ckey[order_c]
    # dense nation index per customer (position into nkey_sorted)
    cust_nidx = nkey_sorted.searchsorted(customer.column("c_nationkey").to_numpy()[order_c])
    lookup_ref = ray.put((cust_sorted, cust_nidx.astype(np.int64)))

    def partial(batch: pa.Table) -> pa.Table:
        cust_keys, nidx = ray.get(lookup_ref)
        pos = cust_keys.searchsorted(batch.column("o_custkey").to_numpy())
        price_c = _int_col(batch, "o_totalprice", 100.0)
        t = pa.table(
            {
                "nidx": pa.array(nidx[pos], pa.int64()),
                "price_c": price_c,
            }
        )
        agg = t.group_by(["nidx"]).aggregate([("price_c", "sum"), ("price_c", "count")])
        return agg.rename_columns(["nidx", "p_rev", "p_n"])

    totals = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("nidx")
        .aggregate(
            Sum("p_rev", alias_name="revenue_cents"),
            Sum("p_n", alias_name="n_orders"),
        )
    )

    def attach_names(batch: pa.Table) -> pa.Table:
        nidx = batch.column("nidx").to_numpy()
        return pa.table(
            {
                "n_name": pa.array(n_names[nidx], pa.string()),
                "r_name": pa.array(r_names[r_of_n[nidx]], pa.string()),
                "revenue_cents": batch.column("revenue_cents"),
                "n_orders": batch.column("n_orders"),
            }
        )

    return totals.map_batches(attach_names, batch_format="pyarrow")


def topk_per_group(
    ds: "ray.data.Dataset",
    key: str,
    order_col: str,
    k: int,
    tie_col: str,
    out_cols: list[str],
) -> "ray.data.Dataset":
    """Distributed top-k per group, descending by ``order_col`` with
    ascending ``tie_col`` tie-break (deterministic total order). Each batch
    keeps its local top-k per key, so the shuffle moves ≤ k rows per
    (batch, group); the per-group merge emits a 1-based ``rank`` column.

    Partitioning assumption: ``key`` must be BOUNDED cardinality (every
    call site groups on nations / languages) — the final merge groups on
    the raw key and pays a dispatch per distinct value. For an unbounded
    key, hash it through `blocking.mix_to_partitions` first (the
    `cogroup_join` / `cumulative_per_group` shape).
    """

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(out_cols)
        keys = batch.column(key).to_numpy()
        val = batch.column(order_col).to_numpy()
        tie = batch.column(tie_col).to_numpy()
        # sort by (key, -val, tie); lexsort's last key is primary
        order = np.lexsort((tie, -val, keys))
        sk = keys[order]
        starts = np.nonzero(np.concatenate(([True], sk[1:] != sk[:-1])))[0]
        lens = np.diff(np.append(starts, len(sk)))
        # positions of the first min(k, len) entries of each group
        offsets = np.repeat(starts, np.minimum(lens, k))
        within = np.concatenate([np.arange(min(n, k)) for n in lens]) if len(lens) else np.array([], dtype=np.int64)
        return batch.take(pa.array(order[offsets + within]))

    def merge(g: pa.Table) -> pa.Table:
        order = np.lexsort(
            (g.column(tie_col).to_numpy(), -g.column(order_col).to_numpy())
        )[:k]
        out = g.take(pa.array(order)).select(out_cols)
        return out.append_column("rank", pa.array(np.arange(1, len(order) + 1), pa.int64()))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(key).map_groups(merge, batch_format="pyarrow")


def cogroup_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    left_cols: list[str],
    right_cols: list[str],
    n_partitions: int = 256,
) -> "ray.data.Dataset":
    """Big-big inner equi-join via co-grouping: both sides are tagged and
    unioned, then ONE shuffle on a BOUNDED hash of the (integer) join key
    co-locates each key's rows; inside each partition task the join runs
    as one lexsort + per-key-segment cross product (vectorized
    ``np.repeat``/``np.tile`` gathers, no row loop). This is the join
    shape when neither side fits a broadcast. Grouping on the raw key
    would pay a Python dispatch per distinct key — per-distinct-orderkey
    at TPC-H shape (BASELINE.md dispatch audit).

    Scale note: one pathological key serializes in its partition's
    segment — salt the hot key by replicating the smaller side across
    salt buckets when key skew is known. Column sets are pruned before
    the shuffle.
    """
    from .blocking import lexsort_segments, mix_to_partitions

    # unified schema on both sides: key + left payload + right payload
    # (typed nulls on the absent side) — avoids schema-divergent unions
    def project(side: int, my_cols: list[str], other_cols: list[str], other_schema):
        def fn(batch: pa.Table) -> pa.Table:
            cols: dict = {"__key": batch.column(key)}
            for c in my_cols:
                cols[("L" if side == 0 else "R") + c] = batch.column(c)
            for c in other_cols:
                cols[("R" if side == 0 else "L") + c] = pa.nulls(
                    batch.num_rows, other_schema[c]
                )
            cols["__side"] = pa.array(
                np.full(batch.num_rows, side, dtype=np.int8)
            )
            cols["__pk"] = pa.array(
                mix_to_partitions(
                    batch.column(key).to_numpy().astype(np.int64), n_partitions
                )
            )
            return pa.table(cols)

        return fn

    l_schema = {f.name: f.type for f in left.schema().base_schema}
    r_schema = {f.name: f.type for f in right.schema().base_schema}
    tagged = left.map_batches(
        project(0, left_cols, right_cols, r_schema), batch_format="pyarrow"
    ).union(
        right.map_batches(project(1, right_cols, left_cols, l_schema), batch_format="pyarrow")
    )

    def _empty(g: pa.Table) -> pa.Table:
        cols = {"__key": g.column("__key").slice(0, 0)}
        for c in left_cols:
            cols[f"L{c}"] = g.column(f"L{c}").slice(0, 0)
        for c in right_cols:
            cols[f"R{c}"] = g.column(f"R{c}").slice(0, 0)
        return pa.table(cols)

    def join_partition(g: pa.Table) -> pa.Table:
        """Every join key hashed into this partition, joined in ONE task:
        per-key work is a small numpy cross product over a sorted segment."""
        if g.num_rows == 0:
            return _empty(g)
        k = g.column("__key").to_numpy()
        side = g.column("__side").to_numpy()
        order, starts, ends = lexsort_segments((k,))
        side_s = side[order]
        lreps: list[np.ndarray] = []
        rreps: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            seg = order[s:e]
            li = seg[side_s[s:e] == 0]
            ri = seg[side_s[s:e] == 1]
            if len(li) == 0 or len(ri) == 0:
                continue
            lreps.append(np.repeat(li, len(ri)))
            rreps.append(np.tile(ri, len(li)))
        if not lreps:
            return _empty(g)
        lrep = pa.array(np.concatenate(lreps))
        rrep = pa.array(np.concatenate(rreps))
        cols = {"__key": g.column("__key").take(lrep)}
        for c in left_cols:
            cols[f"L{c}"] = g.column(f"L{c}").take(lrep)
        for c in right_cols:
            cols[f"R{c}"] = g.column(f"R{c}").take(rrep)
        return pa.table(cols)

    return tagged.groupby("__pk").map_groups(join_partition, batch_format="pyarrow")


def order_revenue_by_priority(
    lineitem: "ray.data.Dataset", orders: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Revenue (discounted, e4 integer domain) per order priority through a
    big-big co-group join of lineitem x orders on orderkey, pre-aggregated
    per key group before the final tiny groupby."""

    def li_partial(batch: pa.Table) -> pa.Table:
        price_c = _int_col(batch, "l_extendedprice", 100.0)
        disc_p = _int_col(batch, "l_discount", 100.0)
        rev = pc.multiply(price_c, pc.subtract(100, disc_p))
        t = pa.table({"l_orderkey": batch.column("l_orderkey"), "rev_e4": rev})
        agg = t.group_by(["l_orderkey"]).aggregate([("rev_e4", "sum"), ("rev_e4", "count")])
        return agg.rename_columns(["l_orderkey", "rev_e4", "n_items"])

    li = lineitem.map_batches(li_partial, batch_format="pyarrow")
    joined = cogroup_join(
        li.map_batches(
            lambda b: b.rename_columns(["okey", "rev_e4", "n_items"]),
            batch_format="pyarrow",
        ),
        orders.map_batches(
            lambda b: pa.table(
                {"okey": b.column("o_orderkey"), "prio": b.column("o_orderpriority")}
            ),
            batch_format="pyarrow",
        ),
        key="okey",
        left_cols=["rev_e4", "n_items"],
        right_cols=["prio"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderpriority": batch.column("Rprio"),
                "rev": batch.column("Lrev_e4"),
                "n": batch.column("Ln_items"),
            }
        )
        agg = t.group_by(["o_orderpriority"]).aggregate([("rev", "sum"), ("n", "sum")])
        return agg.rename_columns(["o_orderpriority", "p_rev", "p_n"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("p_rev", alias_name="revenue_e4"),
            Sum("p_n", alias_name="n_lineitems"),
        )
    )


def cumulative_per_group(
    ds: "ray.data.Dataset",
    key: str,
    order_cols: list[str],
    value_expr,
    out_cols: list[str],
    cum_name: str = "cum_value",
    n_partitions: int = 256,
) -> "ray.data.Dataset":
    """Ordered running total per group (integer domain → exact): ONE
    shuffle on a bounded hash of the (integer) group key, then a single
    lexsort by (key, ``order_cols``) per partition task with a
    segment-reset cumsum — each key's running total restarts at its
    segment boundary, so the result is identical to a per-group cumsum
    without the per-distinct-key Python dispatch (BASELINE.md dispatch
    audit). ``value_expr(batch) -> pa.Array`` computes the summand before
    the shuffle so only (key, order, value, out) columns move."""
    from .blocking import mix_to_partitions

    def prep(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key)}
        for c in order_cols:
            cols[c] = batch.column(c)
        for c in out_cols:
            cols[c] = batch.column(c)
        cols["__val"] = value_expr(batch)
        cols["__pk"] = pa.array(
            mix_to_partitions(
                batch.column(key).to_numpy().astype(np.int64), n_partitions
            )
        )
        return pa.table(cols)

    def per_partition(g: pa.Table) -> pa.Table:
        def col_as_np(c: str) -> np.ndarray:
            arr = g.column(c).to_numpy()
            if pa.types.is_timestamp(g.schema.field(c).type):
                arr = arr.astype("int64")
            return arr

        kcol = col_as_np(key)
        keys = tuple(col_as_np(c) for c in reversed(order_cols)) + (kcol,)
        order = np.lexsort(keys)
        g = g.take(pa.array(order)).drop_columns(["__pk"])
        vals = g.column("__val").to_numpy()
        cum = np.cumsum(vals)
        ks = kcol[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        seg_len = np.diff(np.append(starts, len(ks)))
        # subtract each segment's prefix so the cumsum restarts per key
        cum = cum - np.repeat(cum[starts] - vals[starts], seg_len)
        out = g.drop_columns(["__val"])
        return out.append_column(cum_name, pa.array(cum, pa.int64()))

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__pk")
        .map_groups(per_partition, batch_format="pyarrow")
    )
