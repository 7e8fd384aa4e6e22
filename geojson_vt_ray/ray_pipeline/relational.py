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
