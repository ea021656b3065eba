"""Relational join + aggregation operators over the TPC-H-ish driver tables.

The reference engine's joins are all in-UDF lookups against broadcast
dictionaries (SURVEY §2.4 — e.g. ``dictionary_langid/datatypes.py`` word→lang
maps).  This module supplies the *distributed* join patterns a 100 TB
training-data pipeline also needs, each oracle-checkable against DuckDB:

- ``customers_per_region`` — **broadcast join**: the small side (nation ⋈
  region, ≤ a few hundred rows at any scale) is ``ray.put`` once and read
  inside every ``map_batches`` task; the big side never shuffles.
- ``orders_by_mktsegment`` — **hash join** via ``Dataset.join`` after a
  shuffle-*reducing* pre-aggregation: orders are first combined per custkey
  (map-side partials → one groupby), so the join moves one row per customer,
  not one per order.
- ``lineitem_pricing_summary`` — TPC-H-Q1-style grouped aggregate:
  vectorized per-batch partials over ~4 group keys, then a tiny groupby.

Money sums use integer cents computed as ``floor(x*100 + 0.5)`` (round half
up) on BOTH the Ray and SQL sides: int64 sums are exact and order-independent,
so the driver's value hash cannot be tripped by float summation order.
"""

from __future__ import annotations

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as _pc
import pyarrow.dataset as pads

import ray
import ray.data as rd
from ray.data import DataContext
from ray.data.aggregate import Sum


def _cents_np(v: np.ndarray) -> np.ndarray:
    """Exact integer cents, round-half-up — matches SQL floor(x*100+0.5).
    The ONE place the money-rounding convention lives; every operator's
    oracle exactness depends on it."""
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def _cents(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return _cents_np(arr.to_numpy(zero_copy_only=False).astype(np.float64))


def _join_partitions(*datasets: "rd.Dataset", target_bytes: int = 64 << 20) -> int:
    """Shuffle-partition count for ``Dataset.join``, derived from the larger
    side's size so reducer parallelism grows with the data instead of being
    pinned (a fixed count caps a 100 TB join at that many reducers).  Uses
    parquet metadata via ``size_bytes()`` — no execution is triggered for
    fresh reads.  Cap 4096 bounds tiny-partition overhead.

    The floor is 1, NOT a fixed spread: Ray 2.49's hash join broadcasts a
    side's schema only with the FIRST block its shuffle submits, and a
    groupby-aggregated side carries schema-less 0-column blocks for its
    empty partitions — if one of those goes first, every join partition
    that side leaves empty finalizes as a 0-column table and
    ``pa.Table.join`` dies with "No match for FieldRef".  Sparse keys
    spread over many partitions (exactly what a fixed floor creates on
    small inputs) make that near-certain; sizing partitions to the data
    keeps every partition non-empty on the occupied side."""
    biggest = max(ds.size_bytes() or 0 for ds in datasets)
    return int(min(4096, max(1, biggest // target_bytes)))


def _parquet_num_rows(path: str) -> int:
    """Row count from parquet footers only — no data pages are read."""
    return pads.dataset(path).count_rows()


def _group_spread(ds: "rd.Dataset", target_block_bytes: int = 8 << 20) -> "rd.Dataset":
    """``map_groups`` parallelism equals the upstream BLOCK count in Ray
    2.49, not the group count: a single-file events read arrives as a few
    blocks and would squeeze thousands of per-user groups through those few
    tasks (the measured straggler shape — see stages/dedup.py's verify
    spread).  Repartition the narrow, column-pruned rows first.

    SIZE-AWARE (r2 regression fix): the block count is derived from
    ``size_bytes()`` (~8 MiB of pruned rows per block, metadata-only for
    fresh reads) and capped at 2 blocks/CPU — a fixed 2×CPU fan-out cost
    more than it saved on a 2 MB events read (0.98 s → 1.63 s).  When the
    upstream read already fans out at least that wide, the repartition is
    skipped entirely.  File count alone is NOT a safe width proxy: Ray's
    read planner COALESCES many small files into fewer read tasks
    (``num_blocks()`` is unavailable pre-execution), so the skip also
    requires the size-derived block estimate — a lower bound on what the
    planner emits at ``target_max_block_size`` — to reach the target."""
    cpus = int(ray.cluster_resources().get("CPU", 32)) if ray.is_initialized() else 32
    ceiling = min(512, max(16, 2 * cpus))
    size = ds.size_bytes() or 0
    target = int(min(ceiling, max(8, size // target_block_bytes)))
    try:
        n_files = len(ds.input_files())
        max_block = DataContext.get_current().target_max_block_size or (128 << 20)
        est_read_blocks = min(n_files, max(1, size // max_block))
        if est_read_blocks >= target:
            return ds
    except Exception:
        pass  # non-read upstream: no file count; repartition unconditionally
    return ds.repartition(target)


def customers_per_region(sf_dir: str) -> "rd.Dataset":
    """Customer count / balance totals per region (broadcast join).

    nation (25 rows) ⋈ region (5 rows) is composed driver-side into one
    nationkey→region-name array and broadcast with ``ray.put``; each batch
    resolves regions with a vectorized ``np.take``.  The only shuffle is the
    final groupby over ≤5 keys of per-batch partials."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    if nation.num_rows == 0 or region.num_rows == 0:
        # empty dimension table: the inner join yields nothing (and the
        # dense-LUT build below would crash on a zero-size max)
        return rd.from_arrow(
            pa.table(
                {
                    "region": pa.array([], pa.string()),
                    "n_customers": pa.array([], pa.int64()),
                    "total_acctbal": pa.array([], pa.float64()),
                    "avg_acctbal": pa.array([], pa.float64()),
                }
            )
        )
    rnames = {}
    for rk, rn in zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()):
        if rk is not None:
            rnames[int(rk)] = rn
    nkeys = [k for k in nation["n_nationkey"].to_pylist() if k is not None]
    size = (max(nkeys) + 1) if nkeys else 1
    # two-plane LUT: `found` marks nations whose region CHAIN resolves (the
    # SQL inner join keeps them even when r_name is NULL — a NULL name is a
    # real group, not a dropped row); `names` carries the possibly-NULL name
    found = np.zeros(size, dtype=bool)
    names = np.empty(size, dtype=object)
    for nk, rk in zip(
        nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()
    ):
        if nk is not None and rk is not None and int(rk) in rnames:
            found[int(nk)] = True
            names[int(nk)] = rnames[int(rk)]
    lut_ref = ray.put((found, names))

    def partial(batch: pa.Table) -> pa.Table:
        fnd, nm = ray.get(lut_ref)  # local-cache hit after first batch
        # NULL c_nationkey joins nothing (fill to -1 -> in_range drop); a
        # nullable column would otherwise to_numpy as float NaN and crash
        # the integer gather
        keys = (
            _pc.fill_null(batch["c_nationkey"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        in_range = (keys >= 0) & (keys < len(fnd))
        cl = np.clip(keys, 0, max(len(fnd) - 1, 0))
        ok = in_range & fnd[cl]
        regions = nm[cl[ok]]
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)[ok]
        vbal = ~np.isnan(bal)
        cents = np.where(vbal, _cents_np(np.nan_to_num(bal)), 0)
        out: dict[str, list] = {
            "region_key": [], "region_null": [], "n_customers": [],
            "acctbal_cents": [], "n_bal": [],
        }
        seen = {}
        for r in regions:
            seen.setdefault(r, None)
        for r in seen:
            m = np.array([x == r for x in regions], dtype=bool)
            out["region_key"].append("" if r is None else str(r))
            out["region_null"].append(r is None)
            out["n_customers"].append(int(m.sum()))
            out["acctbal_cents"].append(int(cents[m].sum()))
            out["n_bal"].append(int(vbal[m].sum()))
        return pa.table(
            {
                "region_key": pa.array(out["region_key"], pa.string()),
                "region_null": pa.array(out["region_null"], pa.bool_()),
                "n_customers": pa.array(out["n_customers"], pa.int64()),
                "acctbal_cents": pa.array(out["acctbal_cents"], pa.int64()),
                "n_bal": pa.array(out["n_bal"], pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "region_key" not in batch.schema.names:
            return pa.table(
                {
                    "region": pa.array([], pa.string()),
                    "n_customers": pa.array([], pa.int64()),
                    "total_acctbal": pa.array([], pa.float64()),
                    "avg_acctbal": pa.array([], pa.float64()),
                }
            )
        n = batch["n_customers"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = batch["n_bal"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = batch["acctbal_cents"].to_numpy(zero_copy_only=False) / 100.0
        rnull = batch["region_null"].to_numpy(zero_copy_only=False).astype(bool)
        # SQL: sum skips NULL balances (all-NULL group -> NULL total/avg);
        # avg divides the total by count(*), which counts NULL-balance rows
        return pa.table(
            {
                "region": pa.array(batch["region_key"].to_pylist(), pa.string(), mask=rnull),
                "n_customers": batch["n_customers"],
                "total_acctbal": pa.array(total, pa.float64(), mask=(nb == 0)),
                "avg_acctbal": pa.array(total / n, pa.float64(), mask=(nb == 0)),
            }
        )

    return (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["region_key", "region_null"])
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
            Sum("n_bal", alias_name="n_bal"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def orders_by_mktsegment(sf_dir: str) -> "rd.Dataset":
    """Order count / revenue per market segment.

    Two size-gated physical plans:

    - **Broadcast lookup** (customer parquet ≤ 256 MB): the custkey→segment
      map is composed driver-side (sorted int64 keys + int16 segment codes),
      ``ray.put`` once, and every orders batch resolves segments locally
      with a ``np.searchsorted`` probe and bincounts straight to per-segment
      partials — NO keyed exchange at order or customer granularity at all;
      the only shuffle is the final groupby over ~5 segment keys.  Measured
      3.9 s → 0.8 s at sf0.1 / 32 CPUs vs the join plan.
    - **Shuffle join** (large customer side): orders pre-aggregated per
      ``o_custkey`` map-side, then hash-joined to the customer projection —
      the exchange moves one row per customer rather than one per order
      (10:1 at TPC-H ratios; far better on skewed web data)."""
    cust_path = f"{sf_dir}/customer.parquet"
    if _parquet_bytes(cust_path) <= _BROADCAST_MAX_BYTES:
        import pyarrow.parquet as pq

        ctab = pq.read_table(cust_path, columns=["c_custkey", "c_mktsegment"])
        if ctab.num_rows == 0:
            # zero-row customer side: SQL returns no rows; an empty sidecar
            # would make the searchsorted probe index an empty array
            return rd.from_arrow(
                pa.table(
                    {
                        "mktsegment": pa.array([], pa.string()),
                        "n_orders": pa.array([], pa.int64()),
                        "total_price": pa.array([], pa.float64()),
                        "avg_price": pa.array([], pa.float64()),
                    }
                )
            )
        ckeys = ctab["c_custkey"].to_numpy()
        # dictionary_encode, not to_pylist+np.unique: at the 256 MB gate the
        # latter allocates one Python str per customer row driver-side
        seg_dict = ctab["c_mktsegment"].combine_chunks().dictionary_encode()
        seg_names = np.asarray(seg_dict.dictionary.to_pylist(), dtype=object)
        seg_idx = seg_dict.indices
        if seg_idx.null_count:  # NULL segment is its own group (SQL GROUP BY)
            seg_names = np.append(seg_names, None)
            seg_idx = _pc.fill_null(seg_idx, len(seg_names) - 1)
        seg_codes = seg_idx.to_numpy(zero_copy_only=False)
        cust_sort = np.argsort(ckeys, kind="stable")
        sorted_ckeys = ckeys[cust_sort]
        sorted_seg = seg_codes[cust_sort].astype(np.int16)
        sidecar_ref = ray.put((sorted_ckeys, sorted_seg))
        n_segs = len(seg_names)

        def seg_partial_bcast(batch: pa.Table) -> pa.Table:
            sorted_ckeys, sorted_seg = ray.get(sidecar_ref)
            # NULL o_custkey joins nothing (fill -1 → probe miss); NULL
            # totalprice drops from the sum but still counts the order
            keys = (
                _pc.fill_null(batch["o_custkey"], -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            price = batch["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
            vp = ~np.isnan(price)
            cents = np.where(vp, _cents_np(np.nan_to_num(price)), 0)
            idx, hit = _probe_sorted(sorted_ckeys, keys)  # dangling custkeys: inner-join dropped
            codes = sorted_seg[idx[hit]]
            n = np.bincount(codes, minlength=n_segs).astype(np.int64)
            tot = np.bincount(codes, weights=cents[hit], minlength=n_segs).astype(np.int64)
            np_ = np.bincount(codes, weights=vp[hit], minlength=n_segs).astype(np.int64)
            nz = np.nonzero(n)[0]
            return pa.table(
                {
                    "seg_key": pa.array(
                        ["" if s is None else s for s in seg_names[nz]], pa.string()
                    ),
                    "seg_null": pa.array([s is None for s in seg_names[nz]], pa.bool_()),
                    "n_orders": pa.array(n[nz], pa.int64()),
                    "price_cents": pa.array(tot[nz], pa.int64()),
                    "n_price": pa.array(np_[nz], pa.int64()),
                }
            )

        return (
            rd.read_parquet(
                f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
            )
            .map_batches(seg_partial_bcast, batch_format="pyarrow")
            .groupby(["seg_key", "seg_null"])
            .aggregate(
                Sum("n_orders", alias_name="n_orders"),
                Sum("price_cents", alias_name="price_cents"),
                Sum("n_price", alias_name="n_price"),
            )
            .map_batches(_mktsegment_finalize, batch_format="pyarrow")
        )
    return _orders_by_mktsegment_join(sf_dir)


def _mktsegment_finalize(batch: pa.Table) -> pa.Table:
    """Shared finalize for both ``orders_by_mktsegment`` plans: SQL sum/avg
    NULL semantics (all-NULL price group → NULL total AND avg; avg divides
    by count(*) including NULL-price orders), NULL segment reconstructed
    from the two-key pattern."""
    if batch.num_rows == 0 or "seg_key" not in batch.schema.names:
        return pa.table(
            {
                "mktsegment": pa.array([], pa.string()),
                "n_orders": pa.array([], pa.int64()),
                "total_price": pa.array([], pa.float64()),
                "avg_price": pa.array([], pa.float64()),
            }
        )
    total = batch["price_cents"].to_numpy(zero_copy_only=False) / 100.0
    n = batch["n_orders"].to_numpy(zero_copy_only=False).astype(np.int64)
    np_ = batch["n_price"].to_numpy(zero_copy_only=False).astype(np.int64)
    snull = batch["seg_null"].to_numpy(zero_copy_only=False).astype(bool)
    return pa.table(
        {
            "mktsegment": pa.array(batch["seg_key"].to_pylist(), pa.string(), mask=snull),
            "n_orders": batch["n_orders"],
            "total_price": pa.array(total, pa.float64(), mask=(np_ == 0)),
            "avg_price": pa.array(total / n, pa.float64(), mask=(np_ == 0)),
        }
    )


def _orders_by_mktsegment_join(sf_dir: str) -> "rd.Dataset":
    """Shuffle-join plan for ``orders_by_mktsegment`` (large customer side)."""
    if (
        _parquet_num_rows(f"{sf_dir}/orders.parquet") == 0
        or _parquet_num_rows(f"{sf_dir}/customer.parquet") == 0
    ):
        # an all-empty join side never ships a schema through the shuffle
        # (see _join_partitions); SQL just returns no rows
        return rd.from_arrow(
            pa.table(
                {
                    "mktsegment": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                    "total_price": pa.array([], pa.float64()),
                    "avg_price": pa.array([], pa.float64()),
                }
            )
        )

    def order_partial(batch: pa.Table) -> pa.Table:
        # NULL o_custkey joins nothing — drop before the exchange (a null
        # int64 column would otherwise to_numpy as float NaN into np.unique)
        m = _pc.is_valid(batch["o_custkey"]).to_numpy(zero_copy_only=False)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)[m]
        vp = ~np.isnan(price)
        cents = np.where(vp, _cents_np(np.nan_to_num(price)), 0)
        uk, inv = np.unique(keys, return_inverse=True)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        tot = np.bincount(inv, weights=cents, minlength=len(uk)).astype(np.int64)
        np_ = np.bincount(inv, weights=vp, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "o_custkey": pa.array(uk, pa.int64()),
                "n_orders": pa.array(n, pa.int64()),
                "price_cents": pa.array(tot, pa.int64()),
                "n_price": pa.array(np_, pa.int64()),
            }
        )

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    per_cust = (
        orders.map_batches(order_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("price_cents", alias_name="price_cents"),
            Sum("n_price", alias_name="n_price"),
        )
    )
    joined = per_cust.join(
        cust,
        join_type="inner",
        # sized from the pre-aggregation INPUT (an upper bound on the
        # joined exchange) so reducer count scales with the data
        num_partitions=_join_partitions(orders, cust),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def seg_partial(batch: pa.Table) -> pa.Table:
        # dictionary codes, not Python strings: integer scatter-add partials,
        # and a NULL segment becomes its own group (SQL GROUP BY semantics)
        # instead of a str-vs-None TypeError
        sdict = batch["c_mktsegment"].combine_chunks().dictionary_encode()
        names = sdict.dictionary.to_pylist()
        idx = sdict.indices
        if idx.null_count:
            names.append(None)
            idx = _pc.fill_null(idx, len(names) - 1)
        codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n_orders"].to_numpy(zero_copy_only=False)
        cents = batch["price_cents"].to_numpy(zero_copy_only=False)
        np_in = batch["n_price"].to_numpy(zero_copy_only=False)
        n_sum = np.zeros(len(names), dtype=np.int64)
        np.add.at(n_sum, codes, n)
        c_sum = np.zeros(len(names), dtype=np.int64)
        np.add.at(c_sum, codes, cents)
        p_sum = np.zeros(len(names), dtype=np.int64)
        np.add.at(p_sum, codes, np_in)
        return pa.table(
            {
                "seg_key": pa.array(
                    ["" if s is None else s for s in names], pa.string()
                ),
                "seg_null": pa.array([s is None for s in names], pa.bool_()),
                "n_orders": pa.array(n_sum, pa.int64()),
                "price_cents": pa.array(c_sum, pa.int64()),
                "n_price": pa.array(p_sum, pa.int64()),
            }
        )

    return (
        joined.map_batches(seg_partial, batch_format="pyarrow")
        .groupby(["seg_key", "seg_null"])
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("price_cents", alias_name="price_cents"),
            Sum("n_price", alias_name="n_price"),
        )
        .map_batches(_mktsegment_finalize, batch_format="pyarrow")
    )


def events_asof_purchase(sf_dir: str) -> "rd.Dataset":
    """As-of join (custom operator — Ray Data has no native one): each
    ``click`` event is joined to the most recent ``purchase`` (ts <= click
    ts) by the same user.

    Composition: one hash shuffle on ``user_id`` (``groupby.map_groups``),
    then a per-group sort + vectorized ``np.searchsorted`` — the canonical
    sort-within-partition as-of pattern.  Partitioning assumption: one
    user's history fits in one group (true for web-session data; salt the
    key by time-range if a single user exceeds block size).  Purchases are
    first deduped to one row per (user, ts) with max(value) so tie
    semantics are deterministic on both sides."""

    def per_user(group: pa.Table) -> pa.Table:
        ts = group["ts"].to_numpy(zero_copy_only=False)
        # DuckDB's ASOF inequality orders NULL as +infinity on BOTH sides: a
        # NULL-ts click satisfies c.ts >= p.ts for every purchase (so it
        # matches the LATEST one), and a NULL-ts purchase ranks as the
        # latest purchase of its user (all NULL-ts purchases are ONE p-CTE
        # group — GROUP BY treats NULLs as equal)
        tkey = ts.astype(np.int64)
        tkey[np.isnat(ts)] = np.iinfo(np.int64).max
        order = np.argsort(tkey, kind="stable")
        ts, tkey = ts[order], tkey[order]
        etype = np.asarray(group["event_type"].to_pylist(), dtype=object)[order]
        value = group["value"].to_numpy(zero_copy_only=False)[order]
        eid = group["event_id"].to_numpy(zero_copy_only=False)[order]
        uid = group["user_id"][0].as_py()

        # the NULL-user group matches nothing at all (= on NULL)
        pm = (etype == "purchase") & (uid is not None)
        pts, pval = tkey[pm], value[pm]
        if pts.size:
            # dedupe to one purchase per ts: max(value) wins (deterministic).
            # fmax, not maximum: NULL values arrive as NaN and SQL max()
            # ignores NULLs — maximum.at would propagate NaN over a real
            # value; a slot whose purchases are ALL NULL stays NaN (= SQL
            # NULL), which is also why the init is NaN, not -inf
            uts, inv = np.unique(pts, return_inverse=True)
            vmax = np.full(len(uts), np.nan)
            np.fmax.at(vmax, inv, pval)
            pts, pval = uts, vmax

        cm = etype == "click"
        cts = ts[cm]
        ckey = tkey[cm]
        if pts.size:
            idx = np.searchsorted(pts, ckey, side="right") - 1
            last_val = np.where(idx >= 0, pval[np.clip(idx, 0, None)], np.nan)
        else:
            # ASOF LEFT JOIN semantics: no purchases → NULL for every click
            # (np.where evaluates both branches eagerly; indexing an empty
            # pval with clipped zeros would raise IndexError)
            last_val = np.full(len(cts), np.nan)
        return pa.table(
            {
                "event_id": pa.array(eid[cm], pa.int64()),
                "user_id": pa.array([uid] * int(cm.sum()), pa.int64()),
                "ts": pa.array(cts),
                "last_purchase_value": pa.array(last_val, pa.float64(), from_pandas=True),
            }
        )

    return (
        _group_spread(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts", "event_type", "value"],
                filter=pads.field("event_type").isin(["click", "purchase"]),
            )
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def lineitem_pricing_summary(sf_dir: str) -> "rd.Dataset":
    """TPC-H-Q1-style pricing summary: filter on shipdate, group by
    (returnflag, linestatus).  Fully vectorized per-batch partials (Arrow →
    numpy, no Python row loop); the shuffle moves ≤ a handful of partial
    rows per batch.  Filter + column prune happen at the read.

    SQL NULL semantics throughout: NULL returnflag/linestatus are REAL
    groups distinct from any string (two-key pattern), NULL measures drop
    from their sum but still count toward ``count(*)``, and an all-NULL
    measure in a group yields a NULL sum (and a NULL avg/price), never 0 —
    a NaN→int64 cast would otherwise poison the partial with INT64_MIN."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "rf_key": pa.array([], pa.string()),
                "rf_null": pa.array([], pa.bool_()),
                "ls_key": pa.array([], pa.string()),
                "ls_null": pa.array([], pa.bool_()),
                "sum_qty": pa.array([], pa.int64()),
                "n_qty": pa.array([], pa.int64()),
                "sum_base_price_cents": pa.array([], pa.int64()),
                "n_base": pa.array([], pa.int64()),
                "sum_disc_price_cents": pa.array([], pa.int64()),
                "n_disc": pa.array([], pa.int64()),
                "count_order": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        vq = ~np.isnan(qty)
        vb = ~np.isnan(price)
        vd = vb & ~np.isnan(disc)
        qty_i = np.where(vq, np.floor(np.nan_to_num(qty) + 0.5), 0).astype(np.int64)
        base_cents = np.where(vb, _cents_np(np.nan_to_num(price)), 0)
        disc_cents = np.where(
            vd, _cents_np(np.nan_to_num(price) * (1.0 - np.nan_to_num(disc))), 0
        )
        rf = _pc.fill_null(batch["l_returnflag"], "").combine_chunks()
        ls = _pc.fill_null(batch["l_linestatus"], "").combine_chunks()
        rfn = _pc.is_null(batch["l_returnflag"]).combine_chunks()
        lsn = _pc.is_null(batch["l_linestatus"]).combine_chunks()
        joined = _pc.binary_join_element_wise(
            rf, _pc.cast(rfn, pa.string()), ls, _pc.cast(lsn, pa.string()), "\x00"
        )
        enc = _pc.dictionary_encode(
            joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined
        )
        inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nk = len(enc.dictionary)
        parts = [s.split("\x00") for s in enc.dictionary.to_pylist()]
        return pa.table(
            {
                "rf_key": pa.array([p[0] for p in parts], pa.string()),
                "rf_null": pa.array([p[1] == "true" for p in parts], pa.bool_()),
                "ls_key": pa.array([p[2] for p in parts], pa.string()),
                "ls_null": pa.array([p[3] == "true" for p in parts], pa.bool_()),
                "sum_qty": pa.array(
                    np.bincount(inv, weights=qty_i, minlength=nk).astype(np.int64)
                ),
                "n_qty": pa.array(
                    np.bincount(inv, weights=vq, minlength=nk).astype(np.int64)
                ),
                "sum_base_price_cents": pa.array(
                    np.bincount(inv, weights=base_cents, minlength=nk).astype(np.int64)
                ),
                "n_base": pa.array(
                    np.bincount(inv, weights=vb, minlength=nk).astype(np.int64)
                ),
                "sum_disc_price_cents": pa.array(
                    np.bincount(inv, weights=disc_cents, minlength=nk).astype(np.int64)
                ),
                "n_disc": pa.array(
                    np.bincount(inv, weights=vd, minlength=nk).astype(np.int64)
                ),
                "count_order": pa.array(
                    np.bincount(inv, minlength=nk).astype(np.int64)
                ),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "rf_key" not in batch.schema.names:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "l_linestatus": pa.array([], pa.string()),
                    "sum_qty": pa.array([], pa.int64()),
                    "sum_base_price": pa.array([], pa.float64()),
                    "sum_disc_price": pa.array([], pa.float64()),
                    "avg_qty": pa.array([], pa.float64()),
                    "count_order": pa.array([], pa.int64()),
                }
            )
        sum_qty = batch["sum(sum_qty)"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_qty = batch["sum(n_qty)"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = batch["sum(sum_base_price_cents)"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_base = batch["sum(n_base)"].to_numpy(zero_copy_only=False).astype(np.int64)
        dc = batch["sum(sum_disc_price_cents)"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_disc = batch["sum(n_disc)"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = batch["sum(count_order)"].to_numpy(zero_copy_only=False).astype(np.int64)
        rf = pa.array(
            batch["rf_key"].to_pylist(), pa.string(),
            mask=batch["rf_null"].to_numpy(zero_copy_only=False).astype(bool),
        )
        ls = pa.array(
            batch["ls_key"].to_pylist(), pa.string(),
            mask=batch["ls_null"].to_numpy(zero_copy_only=False).astype(bool),
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = sum_qty.astype(np.float64) / cnt
        return pa.table(
            {
                "l_returnflag": rf,
                "l_linestatus": ls,
                "sum_qty": pa.array(sum_qty, pa.int64(), mask=(n_qty == 0)),
                "sum_base_price": pa.array(
                    base / 100.0, pa.float64(), mask=(n_base == 0)
                ),
                "sum_disc_price": pa.array(
                    dc / 100.0, pa.float64(), mask=(n_disc == 0)
                ),
                "avg_qty": pa.array(avg, pa.float64(), mask=(n_qty == 0) | (cnt == 0)),
                "count_order": pa.array(cnt, pa.int64()),
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
            filter=(pads.field("l_shipdate") <= datetime.datetime(2000, 6, 30)),
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["rf_key", "rf_null", "ls_key", "ls_null"])
        .aggregate(
            Sum("sum_qty", alias_name="sum(sum_qty)"),
            Sum("n_qty", alias_name="sum(n_qty)"),
            Sum("sum_base_price_cents", alias_name="sum(sum_base_price_cents)"),
            Sum("n_base", alias_name="sum(n_base)"),
            Sum("sum_disc_price_cents", alias_name="sum(sum_disc_price_cents)"),
            Sum("n_disc", alias_name="sum(n_disc)"),
            Sum("count_order", alias_name="sum(count_order)"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def revenue_by_supplier_nation(sf_dir: str) -> "rd.Dataset":
    """TPC-H-Q5-shaped revenue rollup: lineitem ⋈ supplier ⋈ nation ⋈ region,
    grouped by (region, nation) — implemented as a **broadcast star join**.

    Scale path: the three dimension tables are tiny at ANY scale factor
    (supplier is the largest at ~10k rows/TB; nation/region are fixed 25/5),
    so they are composed driver-side into ONE suppkey → (region, nation)
    array pair and ``ray.put`` once; every lineitem batch does two numpy
    gathers — the 100 TB fact table never shuffles.  Per-batch partials
    reduce each block to ≤ |nation| rows before the final tiny groupby.
    Reference analogue: the in-UDF broadcast-lookup join family (SURVEY
    §2.4, ``dictionary_langid/datatypes.py:86-113``) applied relationally.
    """
    import pyarrow.parquet as pq

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    if sup.num_rows == 0 or nat.num_rows == 0 or reg.num_rows == 0:
        # empty dimension table: the star join yields nothing (and the
        # dense-LUT build below would crash on a zero-size max)
        return rd.from_arrow(
            pa.table(
                {
                    "region": pa.array([], pa.string()),
                    "nation": pa.array([], pa.string()),
                    "revenue": pa.array([], pa.float64()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        )
    # joins are on KEYS: a NULL r_name / n_name row still joins (it is a
    # real output group), only a MISSING or NULL key breaks the chain
    r_name_by_key = {}
    r_found = set()
    for rk, rn in zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()):
        if rk is not None:
            r_found.add(int(rk))
            r_name_by_key[int(rk)] = rn
    n_keys = [k for k in nat["n_nationkey"].to_pylist() if k is not None]
    max_n = (max(n_keys) + 1) if n_keys else 1
    nation_name = np.empty(max_n, dtype=object)
    region_name = np.empty(max_n, dtype=object)
    valid = np.zeros(max_n, dtype=bool)  # full key chain resolves
    for nk, nn, nr in zip(
        nat["n_nationkey"].to_pylist(),
        nat["n_name"].to_pylist(),
        nat["n_regionkey"].to_pylist(),
    ):
        if nk is not None and nr is not None and int(nr) in r_found:
            valid[int(nk)] = True
            nation_name[int(nk)] = nn
            region_name[int(nk)] = r_name_by_key[int(nr)]
    # dense suppkey → nationkey; suppliers pointing at an invalid nation
    # keep the -1 sentinel so their lineitems drop like the SQL join
    s_keys = [k for k in sup["s_suppkey"].to_pylist() if k is not None]
    max_s = (max(s_keys) + 1) if s_keys else 1
    supp_nation = np.full(max_s, -1, dtype=np.int64)
    for sk, sn in zip(
        sup["s_suppkey"].to_pylist(), sup["s_nationkey"].to_pylist()
    ):
        if (
            sk is not None
            and sn is not None
            and 0 <= int(sn) < max_n
            and valid[int(sn)]
        ):
            supp_nation[int(sk)] = int(sn)
    lookup_ref = ray.put((supp_nation, nation_name, region_name))

    def partial(batch: pa.Table) -> pa.Table:
        supp_nation, nation_name, region_name = ray.get(lookup_ref)
        # NULL l_suppkey joins nothing (fill to -1 -> dropped); a nullable
        # column would to_numpy as float NaN and crash the integer gather
        keys = (
            _pc.fill_null(batch["l_suppkey"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # inner-join semantics for dangling FKs (the docstring's skewed web
        # data): keys outside the dense table or hitting the -1 sentinel are
        # DROPPED like the SQL join drops them — negative fancy indexing
        # would silently credit their revenue to the last nation
        in_range = (keys >= 0) & (keys < len(supp_nation))
        nk = np.where(in_range, supp_nation[np.clip(keys, 0, len(supp_nation) - 1)], -1)
        ok = nk >= 0
        nk = nk[ok]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[ok]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)[ok]
        # NULL price/discount: the term drops from the sum (SQL), the row
        # still counts toward count(*); an all-NULL group keeps a NULL sum
        pv = ~(np.isnan(price) | np.isnan(disc))
        rev = np.where(
            pv, _cents_np(np.nan_to_num(price) * (1.0 - np.nan_to_num(disc))), 0
        )
        empty = pa.table(
            {
                "region_key": pa.array([], pa.string()),
                "region_null": pa.array([], pa.bool_()),
                "nation_key": pa.array([], pa.string()),
                "nation_null": pa.array([], pa.bool_()),
                "revenue_cents": pa.array([], pa.int64()),
                "n_rev": pa.array([], pa.int64()),
                "n_items": pa.array([], pa.int64()),
            }
        )
        if not len(nk):
            return empty
        uk, inv = np.unique(nk, return_inverse=True)
        tot = np.bincount(inv, weights=rev, minlength=len(uk)).astype(np.int64)
        nr = np.bincount(inv, weights=pv, minlength=len(uk)).astype(np.int64)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        # SQL groups by the NAME pair, so the exchange key is the two-key
        # encoding of (region name, nation name) — NULL names are groups
        rn = region_name[uk]
        nn = nation_name[uk]
        return pa.table(
            {
                "region_key": pa.array(
                    ["" if x is None else x for x in rn], pa.string()
                ),
                "region_null": pa.array([x is None for x in rn], pa.bool_()),
                "nation_key": pa.array(
                    ["" if x is None else x for x in nn], pa.string()
                ),
                "nation_null": pa.array([x is None for x in nn], pa.bool_()),
                "revenue_cents": pa.array(tot, pa.int64()),
                "n_rev": pa.array(nr, pa.int64()),
                "n_items": pa.array(cnt, pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "region_key" not in batch.schema.names:
            return pa.table(
                {
                    "region": pa.array([], pa.string()),
                    "nation": pa.array([], pa.string()),
                    "revenue": pa.array([], pa.float64()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        nr = batch["n_rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "region": pa.array(
                    batch["region_key"].to_pylist(), pa.string(),
                    mask=batch["region_null"].to_numpy(zero_copy_only=False).astype(bool),
                ),
                "nation": pa.array(
                    batch["nation_key"].to_pylist(), pa.string(),
                    mask=batch["nation_null"].to_numpy(zero_copy_only=False).astype(bool),
                ),
                "revenue": pa.array(
                    batch["revenue_cents"].to_numpy(zero_copy_only=False) / 100.0,
                    pa.float64(),
                    mask=(nr == 0),
                ),
                "n_items": batch["n_items"],
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["region_key", "region_null", "nation_key", "nation_null"])
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_rev", alias_name="n_rev"),
            Sum("n_items", alias_name="n_items"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def inactive_customers(sf_dir: str, cutoff: str = "2001-01-01") -> "rd.Dataset":
    """Anti-join: customers with NO order on/after ``cutoff``.

    Distributed anti-join shape (NOT EXISTS) as a UNION-TAG groupby: the
    order side is first reduced to distinct active custkeys (shuffle moves
    one row per active customer, not one per order), active keys and
    customer rows are tagged and unioned, and ONE keyed groupby keeps
    customers whose group saw no active row.  Both sides stay distributed —
    no driver-side key set.  Deliberately NOT ``Dataset.join`` left-outer:
    Ray 2.49's hash join crashes when the active side is empty or sparse
    (a cutoff past the last order date — schema-less empty shuffle
    partitions; the same hazard ``semantic_dedup_docs`` documents), while
    the union-tag shape degrades to a plain pass-through.  The reference's
    analogous op is the cardinality anti-join in ``merge_wordlists.ipynb``
    cells 3-4 (SURVEY §2.7 D3).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum as _Sum

    cut = datetime.datetime.fromisoformat(cutoff)
    recent_orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= cut),
    )

    def active_rows(batch: pa.Table) -> pa.Table:
        # distinct within batch; the groupby below finishes the reduction.
        # NULL custkeys drop: NULL never satisfies the NOT-EXISTS equality
        # (and a null-bearing int64 column reads as float NaN otherwise)
        keys = np.unique(
            batch["o_custkey"].drop_null().to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "c_name": pa.nulls(len(keys), pa.string()),
                "is_active": pa.array(np.ones(len(keys), np.int64)),
                "is_cust": pa.array(np.zeros(len(keys), np.int64)),
            }
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "c_custkey": batch["c_custkey"].cast(pa.int64()),
                "c_name": batch["c_name"],
                "is_active": pa.array(np.zeros(n, np.int64)),
                "is_cust": pa.array(np.ones(n, np.int64)),
            }
        )

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    combined = cust.map_batches(cust_rows, batch_format="pyarrow").union(
        recent_orders.map_batches(active_rows, batch_format="pyarrow")
    )
    agg = combined.groupby("c_custkey").aggregate(
        _Sum("is_active", alias_name="n_recent"),
        _Sum("is_cust", alias_name="n_cust"),
        Max("c_name", alias_name="c_name"),
    )

    def keep_inactive(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(batch["n_recent"], 0), pc.greater(batch["n_cust"], 0))
        return batch.filter(m).select(["c_custkey", "c_name"])

    return agg.map_batches(keep_inactive, batch_format="pyarrow")


def events_purchases_within_hour(sf_dir: str) -> "rd.Dataset":
    """Range join: for every click, count same-user purchases in the
    trailing 1-hour interval ``[click.ts - 1h, click.ts]`` (inclusive).

    Distributed range-join shape: one shuffle on the equi-key (user_id),
    then per-group ordered interval probes — purchases sorted once per
    group, every click answered with two binary searches
    (``np.searchsorted``), never a per-pair nested loop.  This is the same
    partitioning contract as the as-of join (``events_asof_purchase``):
    one user's events co-located and ordered within the group.  At 10^12
    rows hot users are the skew risk — salt the key and merge per-salt
    counts (counts are additive over disjoint purchase partitions).
    """

    def per_user(group: pa.Table) -> pa.Table:
        ts64 = group["ts"].to_numpy(zero_copy_only=False).astype("datetime64[ns]")
        ts = ts64.astype(np.int64)
        tval = ~np.isnat(ts64)
        etype = np.asarray(group["event_type"].to_pylist(), dtype=object)
        order = np.argsort(ts, kind="stable")
        ts, tval = ts[order], tval[order]
        etype = etype[order]
        eid = group["event_id"].to_numpy(zero_copy_only=False)[order]
        clicks = etype == "click"
        uid = group["user_id"][0].as_py()
        c_ts = ts[clicks]
        c_val = tval[clicks]
        hour = np.int64(3_600_000_000_000)
        n = np.zeros(int(clicks.sum()), dtype=np.int64)
        # SQL: a NULL-user click matches NO purchase (= on NULL) and a
        # NULL-ts click matches none (BETWEEN NULL) — both keep their row
        # with count 0; NULL-ts purchases are never counted
        if uid is not None and c_val.any():
            p_ts = ts[(etype == "purchase") & tval]
            lo = np.searchsorted(p_ts, c_ts[c_val] - hour, side="left")
            hi = np.searchsorted(p_ts, c_ts[c_val], side="right")
            n[c_val] = (hi - lo).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(eid[clicks]),
                "user_id": pa.array([uid] * int(clicks.sum()), pa.int64()),
                # source column is timestamp[us]; emit the same unit (ns→us is
                # exact here — values originated at microsecond resolution).
                # NaT round-trips to a NULL timestamp.
                "ts": pa.array(c_ts.astype("datetime64[ns]")).cast(pa.timestamp("us")),
                "n_purchases_1h": pa.array(n, pa.int64()),
            }
        )

    return (
        _group_spread(
            rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "user_id", "ts", "event_type"],
                # only the two probed types leave storage; 'view' rows (the
                # bulk of a web events table) never hit the shuffle
                filter=pads.field("event_type").isin(["click", "purchase"]),
            )
        )
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
    )


def revenue_filter(sf_dir: str):
    """TPC-H-Q6-style selective scan: shipdate-range + discount-band +
    quantity filters, then one global (revenue, count) total.

    Scale shape: the date range is pushed into the parquet read (row-group
    pruning skips whole files at 100 TB), only 4 columns leave storage, each
    batch reduces to ONE partial row, and the driver sums a handful of
    int64 partials — no shuffle at all.  Returns a 1-row pandas DataFrame
    (the aggregate is a scalar; materializing it is the correct driver-side
    step)."""
    import datetime as _dt

    import pandas as pd
    import pyarrow.compute as pc

    lo = _dt.datetime(2000, 1, 1)
    hi = _dt.datetime(2001, 1, 1)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=((pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi)),
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc = batch["l_discount"]
        mask = pc.and_(
            pc.and_(pc.greater_equal(disc, 0.04), pc.less_equal(disc, 0.06)),
            pc.less(batch["l_quantity"], 24.0),
        )
        sub = batch.filter(mask)
        price = sub["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = sub["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        rev = np.floor(price * d * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "revenue_cents": pa.array([int(rev.sum())], pa.int64()),
                "n_items": pa.array([len(sub)], pa.int64()),
            }
        )

    parts = li.map_batches(partial, batch_format="pyarrow")
    totals = parts.sum(["revenue_cents", "n_items"])
    if totals is None or totals.get("sum(n_items)") is None:
        # no lineitem in the shipdate window at all (Ray returns None or a
        # dict of Nones depending on version): SQL sum() over zero rows is
        # NULL (count is 0)
        return pd.DataFrame({"revenue": [None], "n_items": [0]}).astype(
            {"revenue": "float64", "n_items": "int64"}
        )
    if int(totals["sum(n_items)"]) == 0:
        # window rows exist but none pass the discount/quantity predicate:
        # same NULL-sum semantics as the empty window
        return pd.DataFrame({"revenue": [None], "n_items": [0]}).astype(
            {"revenue": "float64", "n_items": "int64"}
        )
    return pd.DataFrame(
        {
            "revenue": [totals["sum(revenue_cents)"] / 100.0],
            "n_items": [int(totals["sum(n_items)"])],
        }
    )


#: file-size gate for the broadcast semi-join paths (late_shipment_priority,
#: orders_by_mktsegment, top_revenue_orders) — a dimension-side parquet
#: larger than this means the driver-composed sidecar would strain worker
#: heaps, so the shuffle-join path runs instead (the stats-driven
#: broadcast-vs-shuffle choice every planner makes).
_BROADCAST_MAX_BYTES = 256 << 20


def _parquet_bytes(path: str) -> int:
    """On-disk size of a parquet file or directory (broadcast-gate input)."""
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, fs in os.walk(path)
            for f in fs
        )
    return os.path.getsize(path)


def _probe_sorted(sorted_keys: np.ndarray, keys: np.ndarray):
    """Membership probe of ``keys`` against a SORTED key array — the shared
    kernel of every broadcast-sidecar plan in this module.  Returns
    ``(positions, hit_mask)``; positions are valid wherever the mask is
    True.  Safe on an empty sidecar (all-miss, no IndexError)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(keys), np.intp), np.zeros(len(keys), dtype=bool)
    idx = np.searchsorted(sorted_keys, keys)
    np.clip(idx, 0, len(sorted_keys) - 1, out=idx)
    return idx, sorted_keys[idx] == keys


def _sorted_sidecar(path: str, key_col: str, *val_cols: str,
                    drop_null_vals: bool = False):
    """Load a dimension parquet as a broadcast-ready sorted sidecar:
    NULL-key rows dropped (inner-join semantics), keys int64-sorted,
    value columns reordered to match.  ``drop_null_vals`` also drops rows
    with a NULL in any value column — for values that feed a FURTHER
    inner join (e.g. supplier.nationkey); leave False when a NULL value
    should survive to the output (SQL keeps a NULL name through a
    key-valid join).  Returns ``(sorted_keys, *values)`` where string
    values come back as object ndarrays and numeric ones as int64 — the
    shared prologue of every name/attribute-attach plan in this module
    (pair with :func:`_probe_sorted`)."""
    import pyarrow.parquet as _pq

    t = _pq.read_table(path, columns=[key_col, *val_cols])
    t = t.filter(_pc.is_valid(t[key_col]))
    if drop_null_vals:
        for c in val_cols:
            t = t.filter(_pc.is_valid(t[c]))
    keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys)
    out = [keys[order]]
    for c in val_cols:
        col = t[c]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            out.append(np.asarray(col.to_pylist(), dtype=object)[order])
        else:
            out.append(
                col.to_numpy(zero_copy_only=False).astype(np.int64)[order]
            )
    return tuple(out)


# empty partial shape shared by returned_item_revenue's two fact emitters
_EMPTY_RII_PARTIAL = pa.table(
    {
        "cbkt": pa.array([], pa.int64()),
        "custkey": pa.array([], pa.int64()),
        "rev_cents": pa.array([], pa.int64()),
        "n_rev": pa.array([], pa.int64()),
        "n_items": pa.array([], pa.int64()),
        "is_cust": pa.array([], pa.int64()),
        "c_name": pa.array([], pa.string()),
        "nationkey": pa.array([], pa.int64()),
    }
)


# rank sentinel for an all-NULL-revenue order: DuckDB's default NULL order
# puts NULL revenue LAST even under DESC, so those orders rank below every
# real sum; INT64_MIN/2 is unreachable by any real cents total
_NULL_REV_RANK = np.int64(np.iinfo(np.int64).min // 2)


def _revenue_cents_per_order(batch_keys: np.ndarray, price: np.ndarray, disc: np.ndarray) -> pa.Table:
    """Map-side partial: exact integer-cents revenue summed per orderkey —
    shared by both physical plans of ``top_revenue_orders`` so the rounding
    rule can never drift between them.  A NULL price or discount NULLs the
    term (SQL ``sum`` skips it); ``n_rev`` counts surviving terms so the
    finalize can emit a NULL revenue for an all-NULL order."""
    p = price.astype(np.float64)
    d = disc.astype(np.float64)
    valid = ~(np.isnan(p) | np.isnan(d))
    rev = np.where(valid, _cents_np(np.nan_to_num(p) * (1.0 - np.nan_to_num(d))), 0)
    keys_i = batch_keys.astype(np.int64) if batch_keys.dtype != np.int64 else batch_keys
    uk, inv = np.unique(keys_i, return_inverse=True)
    tot = np.bincount(inv, weights=rev, minlength=len(uk)).astype(np.int64)
    nr = np.bincount(inv, weights=valid, minlength=len(uk)).astype(np.int64)
    return pa.table(
        {
            "l_orderkey": pa.array(uk, pa.int64()),
            "revenue_cents": pa.array(tot, pa.int64()),
            "n_rev": pa.array(nr, pa.int64()),
        }
    )


def _rank_rev(rev: np.ndarray, n_rev: np.ndarray) -> np.ndarray:
    """Sort key for revenue with SQL NULLS-LAST-under-DESC semantics."""
    return np.where(n_rev > 0, rev, _NULL_REV_RANK)


def _topk_order(rev: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-``k`` rows by (revenue desc, orderkey asc) — the
    one tie-break rule both ``top_revenue_orders`` plans share."""
    return np.lexsort((keys, -rev))[:k]


def _finalize_top_revenue(batch: pa.Table) -> pa.Table:
    """Output projection shared by both ``top_revenue_orders`` plans."""
    nr = batch["n_rev"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "orderkey": batch["l_orderkey"],
            "revenue": pa.array(
                batch["revenue_cents"].to_numpy(zero_copy_only=False) / 100.0,
                pa.float64(),
                mask=(nr == 0),
            ),
            "orderdate": batch["o_orderdate"],
            "orderpriority": batch["o_orderpriority"],
        }
    )


def late_shipment_priority(sf_dir: str, grace_days: int = 30) -> "rd.Dataset":
    """TPC-H-Q4-style EXISTS semi-join: orders per priority having at least
    one lineitem shipped ≥ ``grace_days`` after the order date.

    Two size-gated physical plans (the stats-driven broadcast-vs-shuffle
    choice every planner makes):

    - **Broadcast semi-join** (orders parquet ≤ 256 MB): the per-order
      (date, priority-code) sidecar is composed driver-side, ``ray.put``
      once, and every lineitem batch resolves its EXISTS predicate locally
      (sorted-key ``np.searchsorted`` probe — no key-density assumption).
      The only keyed exchange is the distinct-late-orderkey groupby: ONE
      int64 column of already-late keys, per-batch deduped — far smaller
      than any order-level join.  Priorities rejoin AFTER the dedup via the
      same broadcast, so the big exchange never carries a string.
    - **Shuffle semi-join** (large orders side): lineitem is reduced
      map-side to one (orderkey, max_ship) partial per batch, combined by
      one groupby, and hash-joined to orders — the shuffle moves one row
      per order, never one per lineitem.

    Measured at sf0.1 / 32 CPUs: shuffle-join 8.1 s; a full union-tag
    groupby (the ``inactive_customers`` shape carrying date+priority
    through one keyed aggregate) measured 8.9-9.1 s and was REJECTED — with
    150k groups the sort-aggregate costs ~12 µs/row and the extra agg
    columns outweigh the removed join operator (hash-shuffle strategy
    measured 24-47 s, worse still).  The broadcast path cuts the keyed
    exchange to one deduped int64 column; r3 number in BASELINE.md."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum as _Sum

    grace_ns = np.int64(grace_days) * np.int64(86_400_000_000_000)
    orders_path = f"{sf_dir}/orders.parquet"
    if _parquet_bytes(orders_path) > _BROADCAST_MAX_BYTES:
        return _late_shipment_priority_join(sf_dir, grace_ns)

    otab = pq.read_table(
        orders_path, columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    if otab.num_rows == 0:
        # zero-row orders side: no order can have a late lineitem; an empty
        # sidecar would make the searchsorted probe index an empty array
        return rd.from_arrow(
            pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        )
    okeys = otab["o_orderkey"].to_numpy()
    odates64 = otab["o_orderdate"].to_numpy().astype("datetime64[ns]")
    odates = odates64.astype(np.int64)
    prio_dict = otab["o_orderpriority"].combine_chunks().dictionary_encode()
    prio_names = np.asarray(prio_dict.dictionary.to_pylist(), dtype=object)
    prio_idx = prio_dict.indices
    if prio_idx.null_count:  # NULL priority is its own group (SQL GROUP BY)
        prio_names = np.append(prio_names, None)
        prio_idx = _pc.fill_null(prio_idx, len(prio_names) - 1)
    prio_codes = prio_idx.to_numpy(zero_copy_only=False)
    order_sort = np.argsort(okeys, kind="stable")
    sorted_keys = okeys[order_sort]
    sorted_deadline = odates[order_sort] + grace_ns  # precompute date+grace
    # NULL o_orderdate is NaT == INT64_MIN; +grace wraps to a huge negative
    # deadline that every real shipdate passes.  SQL's `ship >= NULL + 30d`
    # is NULL → not late, so pin those deadlines unreachably high.
    sorted_deadline[np.isnat(odates64[order_sort])] = np.iinfo(np.int64).max
    sorted_prio = prio_codes[order_sort].astype(np.int16)
    sidecar_ref = ray.put((sorted_keys, sorted_deadline, sorted_prio))

    def late_keys(batch: pa.Table) -> pa.Table:
        sorted_keys, sorted_deadline, _ = ray.get(sidecar_ref)
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        ts = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[ns]").astype(np.int64)
        # dangling lineitem orderkeys (no order row) are inner-join dropped
        idx_c, hit = _probe_sorted(sorted_keys, keys)
        late = hit & (ts >= sorted_deadline[idx_c])
        return pa.table({"orderkey": pa.array(np.unique(keys[late]), pa.int64())})

    def prio_partial(batch: pa.Table) -> pa.Table:
        sorted_keys, _, sorted_prio = ray.get(sidecar_ref)
        keys = batch["orderkey"].to_numpy(zero_copy_only=False)
        codes = sorted_prio[np.searchsorted(sorted_keys, keys)]
        cnt = np.bincount(codes, minlength=len(prio_names)).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        # two-key NULL-safe groupby: Ray's sort-based exchange cannot order
        # a None string key, and SQL keeps NULL priority as its own group
        return pa.table(
            {
                "prio_key": pa.array(
                    ["" if prio_names[i] is None else prio_names[i] for i in nz],
                    pa.string(),
                ),
                "prio_null": pa.array([prio_names[i] is None for i in nz], pa.bool_()),
                "n_orders": pa.array(cnt[nz], pa.int64()),
            }
        )

    return (
        rd.read_parquet(orders_path.replace("orders.parquet", "lineitem.parquet"),
                        columns=["l_orderkey", "l_shipdate"])
        .map_batches(late_keys, batch_format="pyarrow")
        .groupby("orderkey")
        .aggregate(Count(alias_name="n_seen"))  # dedup: distinct late orderkeys
        .map_batches(prio_partial, batch_format="pyarrow")
        .groupby(["prio_key", "prio_null"])
        .aggregate(_Sum("n_orders", alias_name="n_orders"))
        .map_batches(_prio_finalize, batch_format="pyarrow")
    )


def _prio_finalize(batch: pa.Table) -> pa.Table:
    """Reconstruct the possibly-NULL o_orderpriority from the two-key pair —
    shared by both ``late_shipment_priority`` plans."""
    if batch.num_rows == 0 or "prio_key" not in batch.schema.names:
        return pa.table(
            {
                "o_orderpriority": pa.array([], pa.string()),
                "n_orders": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "o_orderpriority": pa.array(
                batch["prio_key"].to_pylist(), pa.string(),
                mask=batch["prio_null"].to_numpy(zero_copy_only=False).astype(bool),
            ),
            "n_orders": batch["n_orders"],
        }
    )


def _late_shipment_priority_join(sf_dir: str, grace_ns: np.int64) -> "rd.Dataset":
    """Shuffle-join fallback for ``late_shipment_priority`` (orders side too
    large to broadcast): map-side per-order max-shipdate partials → one
    keyed groupby → hash join to orders → 5-key priority rollup."""
    from ray.data.aggregate import Count, Max

    if (
        _parquet_num_rows(f"{sf_dir}/lineitem.parquet") == 0
        or _parquet_num_rows(f"{sf_dir}/orders.parquet") == 0
    ):
        # an all-empty join side never ships a schema through the shuffle
        # (see _join_partitions); SQL just returns no rows
        return rd.from_arrow(
            pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def ship_partial(batch: pa.Table) -> pa.Table:
        # NULL l_orderkey joins nothing — drop before np.unique (float NaN)
        m = _pc.is_valid(batch["l_orderkey"]).to_numpy(zero_copy_only=False)
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        ts = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[ns]").astype(np.int64)[m]
        uk, inv = np.unique(keys, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, ts)
        return pa.table(
            {
                "l_orderkey": pa.array(uk, pa.int64()),
                "max_ship_ns": pa.array(mx, pa.int64()),
            }
        )

    maxship = (
        li.map_batches(ship_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Max("max_ship_ns", alias_name="max_ship_ns"))
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    joined = orders.join(
        maxship,
        join_type="inner",
        num_partitions=_join_partitions(li, orders),
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def late_filter(batch: pa.Table) -> pa.Table:
        od64 = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[ns]")
        od = od64.astype(np.int64)
        late = batch["max_ship_ns"].to_numpy(zero_copy_only=False) >= od + grace_ns
        # NULL o_orderdate → NaT int64 wraps negative and passes the >= test;
        # SQL's NULL comparison makes the order NOT late
        late &= ~np.isnat(od64)
        out = batch.filter(pa.array(late))
        prio = out["o_orderpriority"].combine_chunks()
        return pa.table(
            {
                "prio_key": _pc.fill_null(prio, ""),
                "prio_null": _pc.is_null(prio),
            }
        )

    return (
        joined.map_batches(late_filter, batch_format="pyarrow")
        .groupby(["prio_key", "prio_null"])
        .aggregate(Count(alias_name="n_orders"))
        .map_batches(_prio_finalize, batch_format="pyarrow")
    )


def _any_row_matches(path: str, filter_expr, probe_column: str) -> bool:
    """True iff the parquet file has ≥1 row passing ``filter_expr``.

    Driver-side, but strictly bounded: a streaming single-column scan that
    stops at the FIRST matching batch, with parquet row-group statistics
    pruning non-matching row groups before any page is read.  Replaces the
    former three ``limit(1).count()`` probe executions, each of which spun
    up a full Ray execution and re-opened the fact table (VERDICT r2)."""
    scanner = pads.dataset(path).scanner(columns=[probe_column], filter=filter_expr)
    for batch in scanner.to_batches():
        if batch.num_rows:
            return True
    return False


def _empty_top_revenue_table() -> pa.Table:
    return pa.table(
        {
            "orderkey": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
            "orderdate": pa.array([], pa.timestamp("us")),
            "orderpriority": pa.array([], pa.string()),
        }
    )


def top_revenue_orders(
    sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-07-01", k: int = 10
) -> "rd.Dataset":
    """TPC-H-Q3-style top-k: the ``k`` highest-revenue orders from one
    market segment, ordered before ``cutoff``, for lineitems shipped after
    it.

    Two size-gated physical plans:

    - **Broadcast** (customer + orders parquet ≤ 256 MB): the segment
      custkey set and the date-filtered orders both reduce driver-side to
      ONE sidecar — sorted qualifying orderkeys plus their (date, priority)
      — ``ray.put`` once.  Lineitem batches (shipdate predicate pushed into
      the read) probe it with ``np.searchsorted``, pre-aggregate revenue
      cents per orderkey, and the only keyed exchange is a groupby over
      qualifying orderkeys carrying one int64 row each.  Attributes rejoin
      AFTER the aggregate via the same broadcast, so no string ever
      shuffles and no join operator runs.  No empty-side guard probes
      needed: the qualifying set is known driver-side.  Measured 6.5 s →
      ~1 s at sf0.1 / 32 CPUs vs the two-join plan.
    - **Shuffle joins** (large dimension sides): both joins are
      ``Dataset.join`` hash joins with size-derived partition counts;
      lineitem is pre-aggregated to one revenue-cents row per orderkey
      BEFORE its join.

    Both plans: the top-k is a per-batch partial top-k (each batch emits
    ≤ k rows) followed by a sort over ≤ k × n_batches survivors — never a
    full sort.  Ties broken by orderkey so the cut is deterministic on both
    engines."""
    cut = datetime.datetime.fromisoformat(cutoff)
    cust_path = f"{sf_dir}/customer.parquet"
    orders_path = f"{sf_dir}/orders.parquet"
    if (
        _parquet_bytes(cust_path) <= _BROADCAST_MAX_BYTES
        and _parquet_bytes(orders_path) <= _BROADCAST_MAX_BYTES
    ):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        ctab = pq.read_table(cust_path, columns=["c_custkey", "c_mktsegment"])
        seg_keys = np.sort(
            ctab["c_custkey"]
            .filter(pc.equal(ctab["c_mktsegment"], segment))
            .to_numpy(zero_copy_only=False)
        )
        otab = pq.read_table(
            orders_path,
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            filters=[("o_orderdate", "<", cut)],
        )
        okeys = otab["o_orderkey"].to_numpy()
        ockeys = otab["o_custkey"].to_numpy()
        _, in_seg = _probe_sorted(seg_keys, ockeys)
        if not in_seg.any():
            return rd.from_arrow(_empty_top_revenue_table())
        qkeys = okeys[in_seg]
        qdates = otab["o_orderdate"].to_numpy()[in_seg]
        # codes in the sidecar, not Python strings: object arrays pickle
        # per-element through ray.put; int16 codes are zero-copy
        prio_dict = otab["o_orderpriority"].combine_chunks().dictionary_encode()
        prio_names = np.asarray(prio_dict.dictionary.to_pylist(), dtype=object)
        prio_idx = prio_dict.indices
        if prio_idx.null_count:
            prio_names = np.append(prio_names, None)
            prio_idx = _pc.fill_null(prio_idx, len(prio_names) - 1)
        qprio = prio_idx.to_numpy(zero_copy_only=False).astype(np.int16)[in_seg]
        qsort = np.argsort(qkeys, kind="stable")
        sidecar_ref = ray.put((qkeys[qsort], qdates[qsort], qprio[qsort]))

        def rev_partial_bcast(batch: pa.Table) -> pa.Table:
            sorted_qkeys, _, _ = ray.get(sidecar_ref)
            keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            _, hit = _probe_sorted(sorted_qkeys, keys)
            return _revenue_cents_per_order(
                keys[hit],
                batch["l_extendedprice"].to_numpy(zero_copy_only=False)[hit],
                batch["l_discount"].to_numpy(zero_copy_only=False)[hit],
            )

        def topk_attach(batch: pa.Table) -> pa.Table:
            sorted_qkeys, sorted_dates, sorted_prio = ray.get(sidecar_ref)
            rev = batch["revenue_cents"].to_numpy(zero_copy_only=False)
            nr = batch["n_rev"].to_numpy(zero_copy_only=False).astype(np.int64)
            keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
            rank = _rank_rev(rev, nr)
            order = _topk_order(rank, keys, k)
            keys, rank, nr = keys[order], rank[order], nr[order]
            pos = np.searchsorted(sorted_qkeys, keys)  # every key is a prior hit
            return pa.table(
                {
                    "l_orderkey": pa.array(keys, pa.int64()),
                    # rank value doubles as the global sort key; finalize
                    # masks the NULL-revenue sentinel back to NULL
                    "revenue_cents": pa.array(rank, pa.int64()),
                    "n_rev": pa.array(nr, pa.int64()),
                    "o_orderdate": pa.array(sorted_dates[pos]).cast(pa.timestamp("us")),
                    "o_orderpriority": pa.array(prio_names[sorted_prio[pos]], pa.string()),
                }
            )

        return (
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_extendedprice", "l_discount"],
                filter=(pads.field("l_shipdate") > cut),
            )
            .map_batches(rev_partial_bcast, batch_format="pyarrow")
            .groupby("l_orderkey")
            .aggregate(
                Sum("revenue_cents", alias_name="revenue_cents"),
                Sum("n_rev", alias_name="n_rev"),
            )
            .map_batches(topk_attach, batch_format="pyarrow")
            .sort(["revenue_cents", "l_orderkey"], descending=[True, False])
            .limit(k)
            .map_batches(_finalize_top_revenue, batch_format="pyarrow")
        )
    return _top_revenue_orders_join(sf_dir, segment, cut, k)


def _top_revenue_orders_join(
    sf_dir: str, segment: str, cut: datetime.datetime, k: int
) -> "rd.Dataset":
    """Two-hash-join plan for ``top_revenue_orders`` (large dimension sides)."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=(pads.field("c_mktsegment") == segment),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") < cut),
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") > cut),
    )
    # Ray 2.49's hash join crashes on an EMPTY side (schema-less shuffle
    # partitions) where SQL just returns no rows — an unknown segment or an
    # out-of-range cutoff must degrade, not die.  The guards are
    # first-match-terminating driver-side scans with row-group statistics
    # pruning (no Ray execution spun up; see _any_row_matches).
    guards = (
        (f"{sf_dir}/customer.parquet", pads.field("c_mktsegment") == segment, "c_mktsegment"),
        (f"{sf_dir}/orders.parquet", pads.field("o_orderdate") < cut, "o_orderdate"),
        (f"{sf_dir}/lineitem.parquet", pads.field("l_shipdate") > cut, "l_shipdate"),
    )
    if not all(_any_row_matches(p, f, c) for p, f, c in guards):
        return rd.from_arrow(_empty_top_revenue_table())
    co = orders.join(
        cust,
        join_type="inner",
        num_partitions=_join_partitions(orders, cust),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def rev_partial(batch: pa.Table) -> pa.Table:
        # NULL l_orderkey joins nothing — drop before np.unique (a null
        # int64 column to_numpy's as float NaN and corrupts the int cast)
        m = _pc.is_valid(batch["l_orderkey"]).to_numpy(zero_copy_only=False)
        return _revenue_cents_per_order(
            batch["l_orderkey"].to_numpy(zero_copy_only=False)[m],
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m],
            batch["l_discount"].to_numpy(zero_copy_only=False)[m],
        )

    li_rev = (
        li.map_batches(rev_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_rev", alias_name="n_rev"),
        )
    )
    joined = li_rev.join(
        co,
        join_type="inner",
        num_partitions=_join_partitions(li, orders),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        rev = batch["revenue_cents"].to_numpy(zero_copy_only=False)
        nr = batch["n_rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        rank = _rank_rev(rev, nr)
        out = batch.take(pa.array(_topk_order(rank, keys, k)))
        # the global sort reads revenue_cents: swap in the rank value so the
        # NULLS-LAST-under-DESC rule survives the exchange
        return out.set_column(
            out.schema.get_field_index("revenue_cents"),
            "revenue_cents",
            pa.array(_rank_rev(
                out["revenue_cents"].to_numpy(zero_copy_only=False),
                out["n_rev"].to_numpy(zero_copy_only=False).astype(np.int64),
            ), pa.int64()),
        )

    return (
        joined.map_batches(topk_partial, batch_format="pyarrow")
        .sort(["revenue_cents", "l_orderkey"], descending=[True, False])
        .limit(k)
        .map_batches(_finalize_top_revenue, batch_format="pyarrow")
    )


def returned_item_revenue(
    sf_dir: str, k: int = 20, n_buckets: int = 64, force_buckets: bool = False
) -> "rd.Dataset":
    """TPC-H-Q10-shaped returned-item report: the ``k`` customers who
    generated the most revenue from RETURNED items (``l_returnflag='R'``)
    among orders placed in 1996Q1, with the customer's nation — the
    classic "who is returning what we sold them" rollup.

    TWO size-gated physical plans (the ``orders_by_mktsegment`` idiom,
    parity-tested row-for-row):

    **Sidecar plan** (default when the date-window order keys fit the
    256 MB dimension budget — a 3-month window is a bounded fraction of
    orders at any scale): the window's (orderkey → custkey) pairs are
    read driver-side with the date filter pushed down, sorted once, and
    broadcast via ``ray.put``; every lineitem batch probes them with
    ``np.searchsorted`` and emits per-CUSTOMER partials directly, so the
    only exchange is the custkey-bucket fuse with customer rows — the
    fact table never shuffles on orderkey at all.

    **Bucket plan** (fallback, ``force_buckets=True`` or oversized
    window) — two bucket-co-partitioned exchanges, zero ``Dataset.join``
    and zero driver-side key sets: Ray's sort-based
    aggregate pays per (group, AggregateFn), so with ~1 group per order
    the first version spent ~2.4 s per extra aggregate on this host;
    hashing to ``key % n_buckets`` instead shuffles the same rows into 64
    groups and resolves each group with ONE vectorized numpy call (the
    ``events_retention_cohorts`` pattern — segment sums + sorted-key
    ``np.searchsorted`` probes, no per-order Python):

    1. lineitem, returnflag filter PUSHED DOWN, pre-aggregated per batch
       to (orderkey, revenue-cents, n_items) partials; orders, date
       window pushed down, contribute (orderkey, custkey) rows; one
       okey-bucket exchange fuses them — per-order revenue probes the
       bucket's sorted order keys, orderless lineitems and itemless
       orders drop like the SQL inner join (assumes orderkey unique in
       orders, the TPC-H key contract both engines share).
    2. The per-order rows re-key to custkey buckets with customer rows
       (name + nationkey); each bucket folds per-customer totals,
       resolves names the same way, drops dangling custkeys/nationkeys
       like the join, and emits ONLY its top-``k`` — the final exchange
       sorts ≤ k × n_buckets rows.

    Nation names ARE broadcast (25 rows at any scale — the star-join
    dimension rule from ``revenue_by_supplier_nation``).  Ties at the
    boundary break by custkey — deterministic on both engines."""
    import pyarrow.parquet as pq

    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 4, 1)

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    if nat.num_rows == 0:
        return rd.from_arrow(_empty_returned_item_table())
    nk_list = [k for k in nat["n_nationkey"].to_pylist() if k is not None]
    size = (max(nk_list) + 1) if nk_list else 1
    nation_name = np.empty(size, dtype=object)  # gaps stay None
    nation_found = np.zeros(size, dtype=bool)  # key EXISTS (name may be NULL)
    for kk, nm in zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()):
        if kk is not None:
            nation_found[int(kk)] = True
            nation_name[int(kk)] = nm

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_returnflag") == "R"),
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )

    # ---- sidecar plan gate: window orders as a broadcast lookup ---------
    use_sidecar = not force_buckets
    side_ref = None
    if use_sidecar:
        win = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey"],
            filters=[("o_orderdate", ">=", lo), ("o_orderdate", "<", hi)],
        )
        if win.nbytes > (256 << 20):  # dimension budget: fall back
            use_sidecar = False
        else:
            wk = win["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            wc = (
                _pc.fill_null(win["o_custkey"], -1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            wo = np.argsort(wk, kind="stable")
            side_ref = ray.put((wk[wo], wc[wo]))

    def li_partial_sidecar(batch: pa.Table) -> pa.Table:
        o_keys, o_cust = ray.get(side_ref)
        keys = (
            _pc.fill_null(batch["l_orderkey"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        pos, hit = _probe_sorted(o_keys, keys)
        hit &= keys >= 0
        if not hit.any():
            return _EMPTY_RII_PARTIAL
        cust = o_cust[pos[hit]]
        pv = ~(np.isnan(price[hit]) | np.isnan(disc[hit]))
        rev = np.where(
            pv,
            _cents_np(np.nan_to_num(price[hit]) * (1.0 - np.nan_to_num(disc[hit]))),
            0,
        )
        keep = cust >= 0  # NULL custkey orders drop like the customer join
        cust, rev, pv = cust[keep], rev[keep], pv[keep]
        uc, inv = np.unique(cust, return_inverse=True)
        tot = np.bincount(inv, weights=rev, minlength=len(uc)).astype(np.int64)
        cnt = np.bincount(inv, minlength=len(uc)).astype(np.int64)
        nrv = np.bincount(inv, weights=pv, minlength=len(uc)).astype(np.int64)
        return pa.table(
            {
                "cbkt": pa.array(uc % n_buckets, pa.int64()),
                "custkey": pa.array(uc, pa.int64()),
                "rev_cents": pa.array(tot, pa.int64()),
                "n_rev": pa.array(nrv, pa.int64()),
                "n_items": pa.array(cnt, pa.int64()),
                "is_cust": pa.array(np.zeros(len(uc), np.int64)),
                "c_name": pa.nulls(len(uc), pa.string()),
                "nationkey": pa.array(np.full(len(uc), -1, np.int64)),
            }
        )

    def li_partial(batch: pa.Table) -> pa.Table:
        keys = (
            _pc.fill_null(batch["l_orderkey"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = keys >= 0  # NULL orderkey joins nothing
        keys = keys[ok]
        pv = ~(np.isnan(price[ok]) | np.isnan(disc[ok]))
        rev = np.where(
            pv,
            _cents_np(np.nan_to_num(price[ok]) * (1.0 - np.nan_to_num(disc[ok]))),
            0,
        )
        uk, inv = np.unique(keys, return_inverse=True)
        tot = np.bincount(inv, weights=rev, minlength=len(uk)).astype(np.int64)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        nrv = np.bincount(inv, weights=pv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(uk % n_buckets, pa.int64()),
                "okey": pa.array(uk, pa.int64()),
                "custkey": pa.array(np.full(len(uk), -1, np.int64)),
                "rev_cents": pa.array(tot, pa.int64()),
                "n_rev": pa.array(nrv, pa.int64()),
                "n_items": pa.array(cnt, pa.int64()),
            }
        )

    def ord_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        okey = batch["o_orderkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(okey % n_buckets, pa.int64()),
                "okey": pa.array(okey, pa.int64()),
                # NULL custkey -> -1 sentinel: drops below like the SQL join
                "custkey": _pc.fill_null(batch["o_custkey"], -1).cast(pa.int64()),
                "rev_cents": pa.array(np.zeros(n, np.int64)),
                "n_rev": pa.array(np.zeros(n, np.int64)),
                "n_items": pa.array(np.zeros(n, np.int64)),
            }
        )

    def fuse_orders(group: pa.Table) -> pa.Table:
        ck = group["custkey"].to_numpy(zero_copy_only=False)
        okey = group["okey"].to_numpy(zero_copy_only=False)
        is_ord = ck >= 0
        o_keys, o_cust = okey[is_ord], ck[is_ord]
        oo = np.argsort(o_keys, kind="stable")
        o_keys, o_cust = o_keys[oo], o_cust[oo]
        li_keys = okey[~is_ord]
        rev = group["rev_cents"].to_numpy(zero_copy_only=False)[~is_ord]
        nrv = group["n_rev"].to_numpy(zero_copy_only=False)[~is_ord]
        cnt = group["n_items"].to_numpy(zero_copy_only=False)[~is_ord]
        pos, hit = _probe_sorted(o_keys, li_keys)
        if not hit.any():
            return _EMPTY_RII_PARTIAL
        cust = o_cust[pos[hit]]
        rev, nrv, cnt = rev[hit], nrv[hit], cnt[hit]
        uc, inv = np.unique(cust, return_inverse=True)
        tot = np.bincount(inv, weights=rev, minlength=len(uc)).astype(np.int64)
        nr = np.bincount(inv, weights=nrv, minlength=len(uc)).astype(np.int64)
        n_it = np.bincount(inv, weights=cnt, minlength=len(uc)).astype(np.int64)
        keep = uc >= 0  # NULL custkey orders drop like the customer join
        uc, tot, nr, n_it = uc[keep], tot[keep], nr[keep], n_it[keep]
        return pa.table(
            {
                "cbkt": pa.array(uc % n_buckets, pa.int64()),
                "custkey": pa.array(uc, pa.int64()),
                "rev_cents": pa.array(tot, pa.int64()),
                "n_rev": pa.array(nr, pa.int64()),
                "n_items": pa.array(n_it, pa.int64()),
                "is_cust": pa.array(np.zeros(len(uc), np.int64)),
                "c_name": pa.nulls(len(uc), pa.string()),
                "nationkey": pa.array(np.full(len(uc), -1, np.int64)),
            }
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        # NULL custkey joins nothing; drop BEFORE to_numpy (float NaN).
        # is_cust is an explicit tag: classifying by c_name validity would
        # misfile a NULL-named customer as a partial row, and SQL joins on
        # the KEY — a NULL name survives into the report.
        batch = batch.filter(_pc.is_valid(batch["c_custkey"]))
        n = batch.num_rows
        ck = batch["c_custkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cbkt": pa.array(ck % n_buckets, pa.int64()),
                "custkey": pa.array(ck, pa.int64()),
                "rev_cents": pa.array(np.zeros(n, np.int64)),
                "n_rev": pa.array(np.zeros(n, np.int64)),
                "n_items": pa.array(np.zeros(n, np.int64)),
                "is_cust": pa.array(np.ones(n, np.int64)),
                "c_name": batch["c_name"],
                "nationkey": _pc.fill_null(batch["c_nationkey"], -1).cast(pa.int64()),
            }
        )

    def fuse_customers(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "custkey": pa.array([], pa.int64()),
                "rev_cents": pa.array([], pa.int64()),
                "rev_rank": pa.array([], pa.int64()),
                "n_rev": pa.array([], pa.int64()),
                "n_items": pa.array([], pa.int64()),
                "name": pa.array([], pa.string()),
                "nationkey": pa.array([], pa.int64()),
            }
        )
        name_col = group["c_name"]
        is_cust = group["is_cust"].to_numpy(zero_copy_only=False) > 0
        ck = group["custkey"].to_numpy(zero_copy_only=False)
        c_keys = ck[is_cust]
        co = np.argsort(c_keys, kind="stable")
        c_keys = c_keys[co]
        c_nat = group["nationkey"].to_numpy(zero_copy_only=False)[is_cust][co]
        names = np.asarray(name_col.to_pylist(), dtype=object)[is_cust][co]
        p_keys = ck[~is_cust]
        rev = group["rev_cents"].to_numpy(zero_copy_only=False)[~is_cust]
        nrv = group["n_rev"].to_numpy(zero_copy_only=False)[~is_cust]
        cnt = group["n_items"].to_numpy(zero_copy_only=False)[~is_cust]
        if len(p_keys) == 0 or len(c_keys) == 0:
            return empty
        uc, inv = np.unique(p_keys, return_inverse=True)
        tot = np.bincount(inv, weights=rev, minlength=len(uc)).astype(np.int64)
        nr = np.bincount(inv, weights=nrv, minlength=len(uc)).astype(np.int64)
        n_it = np.bincount(inv, weights=cnt, minlength=len(uc)).astype(np.int64)
        pos, hit = _probe_sorted(c_keys, uc)
        nk = np.where(hit, c_nat[np.clip(pos, 0, max(len(c_keys) - 1, 0))], -1)
        # the nation join is on the KEY: a nation row with a NULL name still
        # joins (NULL nation in the report); only a MISSING key drops
        valid = hit & (nk >= 0) & (nk < len(nation_found))
        valid &= nation_found[np.clip(nk, 0, len(nation_found) - 1)]
        if not valid.any():
            return empty
        uc, tot, nr, n_it, nk = uc[valid], tot[valid], nr[valid], n_it[valid], nk[valid]
        nm = names[pos[valid]]
        rank = _rank_rev(tot, nr)  # SQL NULLS LAST under DESC
        cut = _topk_order(rank, uc, k)  # bucket-local partial top-k
        return pa.table(
            {
                "custkey": pa.array(uc[cut], pa.int64()),
                "rev_cents": pa.array(tot[cut], pa.int64()),
                "rev_rank": pa.array(rank[cut], pa.int64()),
                "n_rev": pa.array(nr[cut], pa.int64()),
                "n_items": pa.array(n_it[cut], pa.int64()),
                "name": pa.array(nm[cut], pa.string()),
                "nationkey": pa.array(nk[cut], pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        nk = batch["nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nr = batch["n_rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "custkey": batch["custkey"],
                "name": batch["name"],
                "nation": pa.array(nation_name[nk], pa.string()),
                "revenue": pa.array(
                    batch["rev_cents"].to_numpy(zero_copy_only=False) / 100.0,
                    pa.float64(),
                    mask=(nr == 0),  # all-NULL revenue group: SQL sum is NULL
                ),
                "n_items": batch["n_items"],
            }
        )

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    if use_sidecar:
        per_cust = li.map_batches(li_partial_sidecar, batch_format="pyarrow")
    else:
        per_cust = (
            li.map_batches(li_partial, batch_format="pyarrow")
            .union(orders.map_batches(ord_rows, batch_format="pyarrow"))
            .groupby("bkt")
            .map_groups(fuse_orders, batch_format="pyarrow")
        )
    return (
        per_cust.union(cust.map_batches(cust_rows, batch_format="pyarrow"))
        # the union is ~1 row per (window customer + customer) — tiny — but
        # arrives as 128 near-empty blocks and Ray's sort shuffle pays per
        # block: coalesce first (5.5 s -> sub-second on the sf0.1 profile)
        .repartition(8)
        .groupby("cbkt")
        .map_groups(fuse_customers, batch_format="pyarrow")
        .sort(["rev_rank", "custkey"], descending=[True, False])
        .limit(k)
        .map_batches(finalize, batch_format="pyarrow")
    )


def _empty_returned_item_table() -> pa.Table:
    return pa.table(
        {
            "custkey": pa.array([], pa.int64()),
            "name": pa.array([], pa.string()),
            "nation": pa.array([], pa.string()),
            "revenue": pa.array([], pa.float64()),
            "n_items": pa.array([], pa.int64()),
        }
    )


def large_order_customers(
    sf_dir: str, min_qty: float = 300.0, k: int = 100, n_buckets: int = 64
) -> "rd.Dataset":
    """TPC-H-Q18-shaped large-volume-order report: orders whose total line
    quantity exceeds ``min_qty``, with customer name, order date, total
    price, and the quantity — top ``k`` by total price (ties break by
    orderkey; both engines order identically).

    Scale shape: lineitem (okey, qty) partials are co-partitioned by
    ``okey % n_buckets`` and each bucket resolves its per-order sums +
    the HAVING filter in ONE vectorized numpy call — NOT a per-order
    groupby: Ray's sort-based aggregate pays per (group, AggregateFn)
    and the first version spent 15 s shipping order attributes through
    five aggregates over ~150k groups; the bucket shape shuffles the
    same rows into 64 groups and never ships the attributes at all.
    The HAVING survivors (a vanishing fraction — 46 of 150k at sf0.01;
    the TPC spec targets ~1 in 10^4) are collected under a LOUD bound
    (``max_result_rows``, the ``length_outlier_filter`` bounded-collect
    contract) and their order/customer attributes resolved with two
    pushed-down point-list parquet reads.  Quantities use the Q1
    integer convention (``floor(q+0.5)``) so int64 sums are exact."""
    import pyarrow.parquet as pq

    max_result_rows = 1_000_000  # loud bound on the HAVING survivors

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])

    def li_partial(batch: pa.Table) -> pa.Table:
        keys = (
            _pc.fill_null(batch["l_orderkey"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        # NULL quantities drop from the sum (SQL sum skips them; an
        # all-NULL order gets a NULL sum, which HAVING > excludes) — a
        # NaN->int64 cast would otherwise poison the total with INT64_MIN
        ok = (keys >= 0) & ~np.isnan(qty)
        keys = keys[ok]
        q_int = np.floor(qty[ok] + 0.5).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        tot = np.bincount(inv, weights=q_int, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "bkt": pa.array(uk % n_buckets, pa.int64()),
                "okey": pa.array(uk, pa.int64()),
                "total_qty": pa.array(tot, pa.int64()),
            }
        )

    thresh = int(min_qty) if float(min_qty).is_integer() else min_qty

    def fold_bucket(group: pa.Table) -> pa.Table:
        okey = group["okey"].to_numpy(zero_copy_only=False)
        qty = group["total_qty"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(okey, return_inverse=True)
        tot = np.bincount(inv, weights=qty, minlength=len(uk)).astype(np.int64)
        big = tot > thresh
        return pa.table(
            {
                "okey": pa.array(uk[big], pa.int64()),
                "total_qty": pa.array(tot[big], pa.int64()),
            }
        )

    survivors_ds = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(fold_bucket, batch_format="pyarrow")
    )
    tables = [t for t in ray.get(survivors_ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        # hand back the typed pa.Table itself: a 0-row Dataset drops its
        # column names through to_pandas (queries() allows Table returns)
        return _empty_large_order_table()
    survivors = pa.concat_tables(tables)
    if survivors.num_rows > max_result_rows:
        raise ValueError(
            f"large_order_customers: {survivors.num_rows} orders exceed "
            f"min_qty={min_qty} (> bound {max_result_rows}); raise min_qty "
            "or the bound — refusing an unbounded driver collect"
        )
    qty_by_okey = dict(
        zip(survivors["okey"].to_pylist(), survivors["total_qty"].to_pylist())
    )
    # point-list reads: the key lists are bounded by the HAVING selectivity
    ords = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        filters=[("o_orderkey", "in", list(qty_by_okey))],
    )
    ock = _pc.fill_null(ords["o_custkey"], -1).to_numpy(zero_copy_only=False).astype(np.int64)
    keep_ord = ock >= 0  # NULL custkey: the customer join drops it
    ords = ords.filter(pa.array(keep_ord))
    ock = ock[keep_ord]
    if ords.num_rows == 0:
        return _empty_large_order_table()
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filters=[("c_custkey", "in", np.unique(ock).tolist())],
    )
    name_by_key = dict(zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist()))
    # membership, not name validity: a customer row with a NULL c_name still
    # JOINS (the SQL join is on custkey) — only a MISSING customer row drops
    have_cust = np.array([int(c) in name_by_key for c in ock], dtype=bool)
    names = [name_by_key.get(int(c)) for c in ock]
    price = ords["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
    vprice = ~np.isnan(price)
    out = pa.table(
        {
            "custkey": pa.array(ock, pa.int64()),
            "name": pa.array(names, pa.string()),
            "orderkey": ords["o_orderkey"].cast(pa.int64()),
            "orderdate": ords["o_orderdate"].cast(pa.timestamp("us")),
            "totalprice": pa.array(
                _cents_np(np.nan_to_num(price)) / 100.0, pa.float64(),
                mask=~vprice,  # SQL: NULL price stays NULL, row survives
            ),
            "total_qty": pa.array(
                [qty_by_okey[int(o)] for o in ords["o_orderkey"].to_pylist()],
                pa.int64(),
            ),
        }
    ).filter(pa.array(have_cust))
    # NULLS LAST under DESC (DuckDB default): rank NULL prices at -inf
    rank = np.where(
        vprice[have_cust], np.nan_to_num(price[have_cust]), -np.inf
    )
    idx = np.lexsort((out["orderkey"].to_numpy(), -rank))[:k]
    out = out.take(pa.array(idx))
    return out if out.num_rows == 0 else rd.from_arrow(out)


def _empty_large_order_table() -> pa.Table:
    return pa.table(
        {
            "custkey": pa.array([], pa.int64()),
            "name": pa.array([], pa.string()),
            "orderkey": pa.array([], pa.int64()),
            "orderdate": pa.array([], pa.timestamp("us")),
            "totalprice": pa.array([], pa.float64()),
            "total_qty": pa.array([], pa.int64()),
        }
    )


def promo_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H-Q14-shaped promotion-effect metric: the share of March-1996
    revenue that came from parts of type ``PROMO`` — one output row
    (promo_revenue, total_revenue, promo_pct).

    Scale shape: ONE union-tag groupby on partkey, no broadcast of the
    part table (part grows with scale, unlike nation/region — the
    dimension-size rule from ``revenue_by_supplier_nation`` does NOT
    apply): lineitem is read with the ship-month window pushed down and
    pre-aggregated per batch to (partkey, revenue-cents) partials; part
    contributes (partkey, is_promo) flag rows; the groupby resolves each
    partkey's flag, dangling partkeys drop like the SQL inner join, and
    the surviving rows fold to ≤ 2 (is_promo ∈ {0,1}) partials before a
    single-row finalize.  ``promo_pct`` is rounded to 6 decimals on both
    engines."""
    from ray.data.aggregate import Max

    lo = datetime.datetime(1996, 3, 1)
    hi = datetime.datetime(1996, 4, 1)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )
    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])

    def li_partial(batch: pa.Table) -> pa.Table:
        keys = (
            _pc.fill_null(batch["l_partkey"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = keys >= 0
        keys = keys[ok]
        prod = price[ok] * (1.0 - disc[ok])
        # NULL price/discount -> NULL rc: the value is skipped by SQL sum
        # but the ROW still joins (a NaN through _cents_np would poison the
        # partial with INT64_MIN) — track valid-value counts separately
        val = ~np.isnan(prod)
        rev = np.zeros(len(prod), np.int64)
        rev[val] = _cents_np(prod[val])
        uk, inv = np.unique(keys, return_inverse=True)
        tot = np.bincount(inv, weights=rev.astype(np.float64), minlength=len(uk)).astype(np.int64)
        nval = np.bincount(inv[val], minlength=len(uk)).astype(np.int64)
        nrow = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "pkey": pa.array(uk, pa.int64()),
                "rev_cents": pa.array(tot, pa.int64()),
                "is_promo": pa.array(np.full(len(uk), -1, np.int64)),
                "n_li": pa.array(nrow, pa.int64()),
                "n_val": pa.array(nval, pa.int64()),
            }
        )

    def part_rows(batch: pa.Table) -> pa.Table:
        promo = _pc.equal(_pc.fill_null(batch["p_type"], ""), "PROMO")
        return pa.table(
            {
                "pkey": batch["p_partkey"].cast(pa.int64()),
                "rev_cents": pa.array(np.zeros(batch.num_rows, np.int64)),
                "is_promo": promo.cast(pa.int64()),
                "n_li": pa.array(np.zeros(batch.num_rows, np.int64)),
                "n_val": pa.array(np.zeros(batch.num_rows, np.int64)),
            }
        )

    per_part = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(part.map_batches(part_rows, batch_format="pyarrow"))
        .groupby("pkey")
        .aggregate(
            Sum("rev_cents", alias_name="rev_cents"),
            Max("is_promo", alias_name="is_promo"),
            Sum("n_li", alias_name="n_li"),
            Sum("n_val", alias_name="n_val"),
        )
    )

    def fold(batch: pa.Table) -> pa.Table:
        # is_promo == -1 means no part row joined: dangling partkey, drop.
        # A JOINED row needs both sides: a part flag (is_promo >= 0) AND at
        # least one lineitem row (n_li > 0) — part-only partkeys must not
        # count, or an empty ship-date window with a non-empty part table
        # would finalize to 0.0 instead of SQL's NULL.  NULL-ness of the
        # two sums mirrors the oracle exactly: sum(rc) is NULL iff no
        # joined row carries a non-NULL rc (n_rc); sum(prc) is NULL iff
        # there is neither a non-promo joined row (its prc is a literal 0)
        # nor a promo row with non-NULL rc (n_prc).
        flag = batch["is_promo"].to_numpy(zero_copy_only=False)
        rev = batch["rev_cents"].to_numpy(zero_copy_only=False)
        n_li = batch["n_li"].to_numpy(zero_copy_only=False)
        n_val = batch["n_val"].to_numpy(zero_copy_only=False)
        ok = (flag >= 0) & (n_li > 0)
        promo = ok & (flag == 1)
        return pa.table(
            {
                "promo_cents": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_cents": pa.array([int(rev[ok].sum())], pa.int64()),
                "n_rc": pa.array([int(n_val[ok].sum())], pa.int64()),
                "n_prc": pa.array(
                    [int(n_val[promo].sum() + n_li[ok & (flag == 0)].sum())],
                    pa.int64(),
                ),
            }
        )

    agg = (
        per_part.map_batches(fold, batch_format="pyarrow")
        .aggregate(Sum("promo_cents"), Sum("total_cents"), Sum("n_rc"), Sum("n_prc"))
    ) or {}  # fully-empty input: aggregate yields no row at all
    n_rc = int(agg.get("sum(n_rc)") or 0)
    n_prc = int(agg.get("sum(n_prc)") or 0)
    pc_cents = int(agg.get("sum(promo_cents)") or 0)
    tc_cents = int(agg.get("sum(total_cents)") or 0)
    promo_rev = None if n_prc == 0 else pc_cents / 100.0
    total_rev = None if n_rc == 0 else tc_cents / 100.0
    # x/0 is NULL in DuckDB, so a zero total also yields a NULL pct
    pct = (
        round(100.0 * pc_cents / tc_cents, 6)
        if (n_prc and n_rc and tc_cents)
        else None
    )
    return rd.from_arrow(
        pa.table(
            {
                "promo_revenue": pa.array([promo_rev], pa.float64()),
                "total_revenue": pa.array([total_rev], pa.float64()),
                "promo_pct": pa.array([pct], pa.float64()),
            }
        )
    )


def customer_order_histogram(sf_dir: str, n_buckets: int = 64) -> "rd.Dataset":
    """TPC-H-Q13-shaped customer distribution: how many customers placed
    exactly N orders, INCLUDING the zero-order customers the LEFT JOIN
    keeps — the group-size-distribution analytic (the per-source/lang
    variants of which drive corpus-balance decisions).

    Scale shape: orders pre-aggregate per batch to (custkey, n) partials;
    customer contributes marker rows; one custkey-hash bucket exchange
    (64 groups, the Q18 rationale — a per-customer groupby would pay
    Ray's per-(group, AggregateFn) sort cost over |customers| groups)
    resolves each bucket's per-customer totals with one vectorized numpy
    call and emits LOCAL histogram rows, so the final exchange carries
    O(buckets × distinct counts).  NULL/dangling custkey orders drop
    exactly like ``ON c_custkey = o_custkey`` (NULL matches nothing; an
    order pointing at a missing customer is invisible from the customer
    side)."""

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def ord_partial(batch: pa.Table) -> pa.Table:
        keys = (
            _pc.fill_null(batch["o_custkey"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keys = keys[keys >= 0]  # NULL custkey matches no customer
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "bkt": pa.array(uk % n_buckets, pa.int64()),
                "custkey": pa.array(uk, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "is_cust": pa.array(np.zeros(len(uk), np.int64)),
            }
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ck)
        return pa.table(
            {
                "bkt": pa.array(ck % n_buckets, pa.int64()),
                "custkey": pa.array(ck, pa.int64()),
                "n": pa.array(np.zeros(n, np.int64)),
                "is_cust": pa.array(np.ones(n, np.int64)),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        ck = group["custkey"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        isc = group["is_cust"].to_numpy(zero_copy_only=False) > 0
        c_keys = np.unique(ck[isc])
        if len(c_keys) == 0:
            return pa.table(
                {
                    "c_count": pa.array([], pa.int64()),
                    "custdist": pa.array([], pa.int64()),
                }
            )
        o_keys, o_n = ck[~isc], n[~isc]
        uk, inv = np.unique(o_keys, return_inverse=True)
        tot = np.bincount(inv, weights=o_n, minlength=len(uk)).astype(np.int64)
        pos = np.searchsorted(c_keys, uk)
        np.clip(pos, 0, len(c_keys) - 1, out=pos)
        hit = c_keys[pos] == uk  # dangling custkeys drop (customer-side join)
        per_cust = np.zeros(len(c_keys), dtype=np.int64)
        per_cust[pos[hit]] = tot[hit]
        counts, dist = np.unique(per_cust, return_counts=True)
        return pa.table(
            {
                "c_count": pa.array(counts, pa.int64()),
                "custdist": pa.array(dist.astype(np.int64), pa.int64()),
            }
        )

    return (
        orders.map_batches(ord_partial, batch_format="pyarrow")
        .union(cust.map_batches(cust_rows, batch_format="pyarrow"))
        .groupby("bkt")
        .map_groups(fold, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
    )


def brand_bracket_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H-Q19-shaped disjunctive bracket join: revenue from lineitems
    whose PART satisfies any of three (brand/type, size-range,
    quantity-range) brackets — the OR-of-ANDs predicate that couples a
    fact-side column (``l_quantity``) with dimension-side attributes, so
    neither side's filter can be pushed down alone.  One output row
    (n_items, revenue); revenue is NULL when no row qualifies (SQL SUM).

    Brackets (adapted to this schema — no container column):
      1. Brand#13, size 1–15, qty 1–11
      2. Brand#19, size 1–25, qty 10–20
      3. type PROMO, size 1–35, qty 20–30

    Scale shape: the ``promo_revenue`` union-tag groupby on partkey (part
    grows with scale — never broadcast), generalized to OR semantics with
    a COMBO-MASK expansion: each lineitem row computes its quantity-band
    bitmask (bit i = qty in bracket i's range) and the batch pre-aggregates
    (partkey, combo) → (rev_cents, n) partials over the ≤ 7 non-zero
    combos; the part side ships (partkey, attribute bitmask).  After the
    single partkey groupby, a row qualifies iff ``attr_mask & combo != 0``
    — each lineitem row counted exactly ONCE however many brackets it
    matches (the SQL OR), because it lives in exactly one combo bucket."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        keys = (
            _pc.fill_null(batch["l_partkey"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        combo = (
            ((qty >= 1) & (qty <= 11)).astype(np.int64)
            | (((qty >= 10) & (qty <= 20)).astype(np.int64) << 1)
            | (((qty >= 20) & (qty <= 30)).astype(np.int64) << 2)
        )
        ok = (keys >= 0) & (combo > 0)  # combo 0 can never qualify: drop early
        if not ok.any():
            e = pa.array([], pa.int64())
            return pa.table(
                {"pkey": e, "combo": e, "rev_cents": e, "n": e, "attr_mask": e}
            )
        keys, combo = keys[ok], combo[ok]
        rev = _cents_np(price[ok] * (1.0 - disc[ok]))
        packed = keys * 8 + combo  # combo ∈ 1..7: reversible pack
        uk, inv = np.unique(packed, return_inverse=True)
        tot = np.bincount(inv, weights=rev, minlength=len(uk)).astype(np.int64)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "pkey": pa.array(uk // 8, pa.int64()),
                "combo": pa.array(uk % 8, pa.int64()),
                "rev_cents": pa.array(tot, pa.int64()),
                "n": pa.array(cnt, pa.int64()),
                "attr_mask": pa.array(np.full(len(uk), -1, np.int64)),
            }
        )

    def part_rows(batch: pa.Table) -> pa.Table:
        keys = (
            _pc.fill_null(batch["p_partkey"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        brand = _pc.fill_null(batch["p_brand"], "").to_numpy(zero_copy_only=False)
        ptype = _pc.fill_null(batch["p_type"], "").to_numpy(zero_copy_only=False)
        size = (
            _pc.fill_null(batch["p_size"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        mask = (
            ((brand == "Brand#13") & (size >= 1) & (size <= 15)).astype(np.int64)
            | (((brand == "Brand#19") & (size >= 1) & (size <= 25)).astype(np.int64) << 1)
            | (((ptype == "PROMO") & (size >= 1) & (size <= 35)).astype(np.int64) << 2)
        )
        ok = keys >= 0
        n = int(ok.sum())
        return pa.table(
            {
                "pkey": pa.array(keys[ok], pa.int64()),
                "combo": pa.array(np.zeros(n, np.int64)),
                "rev_cents": pa.array(np.zeros(n, np.int64)),
                "n": pa.array(np.zeros(n, np.int64)),
                "attr_mask": pa.array(mask[ok], pa.int64()),
            }
        )

    def per_key(group: pa.Table) -> pa.Table:
        am = group["attr_mask"].to_numpy(zero_copy_only=False)
        m = int(am.max())  # the part row's mask; -1 everywhere = dangling pkey
        empty = pa.table(
            {"rev_cents": pa.array([], pa.int64()), "n_items": pa.array([], pa.int64())}
        )
        if m <= 0:
            return empty
        combo = group["combo"].to_numpy(zero_copy_only=False)
        hit = (combo & m) != 0
        if not hit.any():
            return empty
        return pa.table(
            {
                "rev_cents": pa.array(
                    [int(group["rev_cents"].to_numpy(zero_copy_only=False)[hit].sum())],
                    pa.int64(),
                ),
                "n_items": pa.array(
                    [int(group["n"].to_numpy(zero_copy_only=False)[hit].sum())],
                    pa.int64(),
                ),
            }
        )

    folded = (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(part.map_batches(part_rows, batch_format="pyarrow"))
        .groupby("pkey")
        .map_groups(per_key, batch_format="pyarrow")
    )

    # the fold leaves ≤ one tiny (rev_cents, n_items) row per qualifying
    # partkey; the global total is ONE distributed aggregate (scalar to the
    # driver — never the rows).  SQL SUM over zero rows is NULL.
    import pandas as pd

    tot = folded.sum(["rev_cents", "n_items"]) or {}
    n = int(tot.get("sum(n_items)") or 0)
    rev = int(tot.get("sum(rev_cents)") or 0)
    return pd.DataFrame(
        {
            "n_items": pd.array([n], dtype="int64"),
            "revenue": pd.array([None if n == 0 else rev / 100.0], dtype="float64"),
        }
    )


def top_supplier_revenue(
    sf_dir: str, start: str = "1996-01-01", end: str = "1996-04-01"
) -> "rd.Dataset":
    """TPC-H-Q15-shaped top-supplier report: the supplier(s) whose revenue
    over the ship-date window equals the GLOBAL maximum — the
    argmax-over-a-grouped-aggregate shape (group, reduce, broadcast one
    scalar back as a filter).  Emits (s_suppkey, s_name,
    total_revenue_cents); ties all survive, like the SQL ``= (SELECT
    max(...))`` subquery.  (Reference parity: the match-count ranking of
    SURVEY §2.5 G7 — pick the key(s) attaining the best score — lifted to
    a distributed grouped aggregate.)

    Scale shape: the window is pushed into the parquet read; each batch is
    pre-aggregated to (suppkey, cents) partials so the ONE shuffle moves a
    row per distinct supplier per batch; the grouped result (bounded by
    the supplier DIMENSION, not lineitem) is materialized once, its max is
    ONE distributed scalar aggregate, and the equality filter re-reads the
    cached grouped rows.  Supplier names come from the dimension parquet
    driver-side (same broadcast rule as ``revenue_by_supplier_nation`` —
    nation/region/supplier grow far slower than facts)."""
    import pyarrow.parquet as _pq

    lo = datetime.datetime.fromisoformat(start)
    hi = datetime.datetime.fromisoformat(end)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def partial(batch: pa.Table) -> pa.Table:
        # the oracle's rev CTE groups by RAW l_suppkey, NULL included — a
        # NULL-suppkey group takes part in the max() even though the final
        # supplier join drops it; encode it as the -1 sentinel (real TPC-H
        # suppkeys are positive).  NULL price/discount terms drop from the
        # sum (SQL); an all-NULL group has a NULL total, which max() skips
        # and the = comparison rejects — n_rev carries that distinction.
        keys = (
            _pc.fill_null(batch["l_suppkey"], -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        pv = ~(np.isnan(price) | np.isnan(disc))
        rc = np.where(
            pv, _cents_np(np.nan_to_num(price) * (1.0 - np.nan_to_num(disc))), 0
        )
        uk, inv = np.unique(keys, return_inverse=True)
        sums = np.bincount(inv, weights=rc.astype(np.float64), minlength=len(uk))
        nrv = np.bincount(inv, weights=pv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "s_suppkey": pa.array(uk, pa.int64()),
                "total_revenue_cents": pa.array(sums.astype(np.int64), pa.int64()),
                "n_rev": pa.array(nrv, pa.int64()),
            }
        )

    grouped = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(
            Sum("total_revenue_cents", alias_name="total_revenue_cents"),
            Sum("n_rev", alias_name="n_rev"),
        )
        # NULL totals (all terms NULL) leave both the max and the report
        .filter(lambda r: r["n_rev"] > 0)
        .materialize()  # bounded by the supplier dimension
    )
    mx = grouped.max("total_revenue_cents") if grouped.count() else None
    if mx is None:  # empty window → empty report, stable schema (a 0-row
        # Dataset drops its column names through to_pandas, so hand back a
        # typed empty frame — queries() allows DataFrame returns)
        import pandas as pd

        return pd.DataFrame(
            {
                "s_suppkey": pd.array([], dtype="int64"),
                "s_name": pd.array([], dtype="object"),
                "total_revenue_cents": pd.array([], dtype="int64"),
            }
        )
    sup = _pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    skeys = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(skeys)
    skeys_sorted = skeys[order]
    snames = np.asarray(sup["s_name"].to_pylist(), dtype=object)[order]

    def keep_max(batch: pa.Table) -> pa.Table:
        m = _pc.equal(batch["total_revenue_cents"], mx)
        hit = batch.filter(m)
        k = hit["s_suppkey"].to_numpy(zero_copy_only=False)
        pos, found = _probe_sorted(skeys_sorted, k)
        # dangling suppkeys drop, matching the oracle's INNER JOIN supplier
        hit = hit.filter(pa.array(found))
        return pa.table(
            {
                "s_suppkey": hit["s_suppkey"],
                "s_name": pa.array(snames[pos[found]], pa.string()),
                "total_revenue_cents": hit["total_revenue_cents"],
            }
        )

    return grouped.map_batches(keep_max, batch_format="pyarrow")


def small_quantity_revenue(
    sf_dir: str, brand: str = "Brand#23", max_size: int = 10
) -> "pd.DataFrame":
    """TPC-H-Q17-shaped small-quantity-order revenue: over the parts of one
    brand with ``p_size <= max_size``, the revenue (and row count) of
    lineitems whose quantity is below 20%% of that PART's average quantity
    — the correlated-aggregate join-back shape (per-key stats feed a
    per-row predicate on the same key).  One row: (n_small,
    revenue_cents); 0/0 when nothing qualifies (COUNT semantics — the
    oracle emits the same via coalesce).

    Scale shape: the qualifying partkey set is read from the part
    DIMENSION driver-side (a brand+size slice — tiny at any scale) and
    pushed into BOTH lineitem reads as an ``isin`` predicate, so only the
    brand's lineitems ever leave storage.  Pass 1 pre-aggregates
    (partkey, sum_qty, n) per batch into one bounded groupby; the per-part
    thresholds (≤ |slice| rows) broadcast back into the pass-2 scan's
    filter.  Quantities are small exact integers in double — ``sum/cnt``
    is the identical IEEE-754 value on both engines, so the strict ``<``
    compare cannot diverge."""
    import pandas as pd
    import pyarrow.parquet as _pq

    part = _pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    sel = _pc.and_(
        _pc.equal(part["p_brand"], brand), _pc.less_equal(part["p_size"], max_size)
    )
    pkeys = part["p_partkey"].filter(sel).combine_chunks()
    empty = pd.DataFrame(
        {
            "n_small": pd.array([0], dtype="int64"),
            "revenue_cents": pd.array([0], dtype="int64"),
        }
    )
    if len(pkeys) == 0:
        return empty
    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=li_cols,
        filter=pads.field("l_partkey").isin(pkeys),
    )

    def qty_partial(batch: pa.Table) -> pa.Table:
        k = batch["l_partkey"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "pkey": pa.array(uk, pa.int64()),
                "sum_qty": pa.array(np.bincount(inv, weights=q, minlength=len(uk))),
                "n": pa.array(np.bincount(inv, minlength=len(uk)).astype(np.int64)),
            }
        )

    stats = (
        li.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("pkey")
        .aggregate(Sum("sum_qty", alias_name="sum_qty"), Sum("n", alias_name="n"))
        .take_all()  # bounded by the brand/size part slice
    )
    if not stats:
        return empty
    tk = np.array([r["pkey"] for r in stats], dtype=np.int64)
    thr = np.array(
        [0.2 * (r["sum_qty"] / r["n"]) for r in stats], dtype=np.float64
    )
    torder = np.argsort(tk)
    tk = tk[torder]
    thr = thr[torder]

    def small_partial(batch: pa.Table) -> pa.Table:
        k = batch["l_partkey"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        pos, found = _probe_sorted(tk, k)
        m = found & (q < thr[np.clip(pos, 0, len(tk) - 1)])
        rc = _cents_np(batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m])
        return pa.table(
            {
                "n_small": pa.array([int(m.sum())], pa.int64()),
                "revenue_cents": pa.array([int(rc.sum())], pa.int64()),
            }
        )

    tot = li.map_batches(small_partial, batch_format="pyarrow").sum(
        ["n_small", "revenue_cents"]
    ) or {}
    return pd.DataFrame(
        {
            "n_small": pd.array([int(tot.get("sum(n_small)") or 0)], dtype="int64"),
            "revenue_cents": pd.array(
                [int(tot.get("sum(revenue_cents)") or 0)], dtype="int64"
            ),
        }
    )


def idle_rich_customers(sf_dir: str, cutoff: str = "1998-01-01") -> "rd.Dataset":
    """TPC-H-Q22-shaped idle-capital report: customers with an
    above-average POSITIVE balance and NO order on/after ``cutoff``,
    rolled up per nation — the global-scalar-gate + anti-join composition
    (Q22 gates on avg positive acctbal and NOT EXISTS orders).  Emits
    (c_nationkey, n_cust, acctbal_cents).

    Exactness: the "above average" gate is evaluated in INTEGER cents
    cross-multiplied form — ``cents(bal) * n_pos > sum_pos_cents`` — on
    both engines, so no float average ever enters a comparison (a float
    avg differs between numpy and DuckDB summation orders at the 1e-16
    level, which a boundary customer would amplify into a row diff).

    Scale shape: pass 1 is a map-only partial (2 scalars) over the
    customer scan; the two scalars broadcast into the pass-2 filter; the
    NOT-EXISTS side reduces orders to distinct active custkeys before the
    ONE union-tag groupby (the ``inactive_customers`` anti-join shape —
    no driver-side key set, both sides distributed); the final nation
    rollup shuffles ≤ 25 keys."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum as _Sum

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=cust_cols)

    def pos_partial(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = bal > 0.0
        return pa.table(
            {
                "s": pa.array([int(_cents_np(bal[pos]).sum())], pa.int64()),
                "c": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    tot = cust.map_batches(pos_partial, batch_format="pyarrow").sum(["s", "c"]) or {}
    s_pos = int(tot.get("sum(s)") or 0)
    n_pos = int(tot.get("sum(c)") or 0)

    cut = datetime.datetime.fromisoformat(cutoff)
    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=(pads.field("o_orderdate") >= cut),
    )

    def active_rows(batch: pa.Table) -> pa.Table:
        # NULL custkeys drop: NULL never satisfies o_custkey = c_custkey
        keys = np.unique(
            batch["o_custkey"].drop_null().to_numpy(zero_copy_only=False)
        )
        n = len(keys)
        return pa.table(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "c_nationkey": pa.array(np.zeros(n, np.int64)),
                "nk_null": pa.array(np.zeros(n, np.int64)),
                "bal_cents": pa.array(np.zeros(n, np.int64)),
                "is_active": pa.array(np.ones(n, np.int64)),
                "is_cust": pa.array(np.zeros(n, np.int64)),
            }
        )

    def rich_rows(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        finite = np.isfinite(bal)  # NULL balances read as NaN — SQL excludes them
        cents = np.zeros(len(bal), np.int64)
        cents[finite] = _cents_np(bal[finite])
        keep = finite & (cents * n_pos > s_pos)
        n = int(keep.sum())
        # two-key NULL-safe nationkey: a null int64 column to_numpy's as
        # float NaN, and .astype(int64) would mint INT64_MIN where SQL
        # groups under NULL.  Emitted (idle) customers have NO active rows,
        # so the Max fold below always returns THIS row's (key, flag) pair.
        nk = batch["c_nationkey"].combine_chunks()
        nk_key = _pc.fill_null(nk, 0).to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        nk_null = _pc.is_null(nk).to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table(
            {
                "c_custkey": batch["c_custkey"].to_numpy(zero_copy_only=False)[keep],
                "c_nationkey": pa.array(nk_key, pa.int64()),
                "nk_null": pa.array(nk_null, pa.int64()),
                "bal_cents": pa.array(cents[keep], pa.int64()),
                "is_active": pa.array(np.zeros(n, np.int64)),
                "is_cust": pa.array(np.ones(n, np.int64)),
            }
        )

    combined = cust.map_batches(rich_rows, batch_format="pyarrow").union(
        recent.map_batches(active_rows, batch_format="pyarrow")
    )
    agg = combined.groupby("c_custkey").aggregate(
        _Sum("is_active", alias_name="n_recent"),
        _Sum("is_cust", alias_name="n_cust"),
        Max("c_nationkey", alias_name="c_nationkey"),
        Max("nk_null", alias_name="nk_null"),
        Max("bal_cents", alias_name="bal_cents"),
    )

    def idle_partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(batch["n_recent"], 0), pc.greater(batch["n_cust"], 0))
        hit = batch.filter(m)
        nk = hit["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = hit["nk_null"].to_numpy(zero_copy_only=False).astype(np.int64)
        bc = hit["bal_cents"].to_numpy(zero_copy_only=False)
        pair = np.stack([nk, nn], axis=1)
        uk, inv = np.unique(pair, axis=0, return_inverse=True)
        return pa.table(
            {
                "c_nationkey": pa.array(uk[:, 0], pa.int64()),
                "nk_null": pa.array(uk[:, 1], pa.int64()),
                "n_cust": pa.array(np.bincount(inv, minlength=len(uk)).astype(np.int64)),
                "acctbal_cents": pa.array(
                    np.bincount(inv, weights=bc.astype(np.float64), minlength=len(uk)).astype(
                        np.int64
                    )
                ),
            }
        )

    rows = (
        agg.map_batches(idle_partial, batch_format="pyarrow")
        .groupby(["c_nationkey", "nk_null"])
        .aggregate(
            _Sum("n_cust", alias_name="n_cust"),
            _Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        # bounded by the nation dimension (≤ 25 keys at any scale); collect
        # so the empty report keeps its schema (Ray's empty groupby yields a
        # schema-less dataset, which would fail the driver's column check)
        .take_all()
    )
    return pa.table(
        {
            "c_nationkey": pa.array(
                [None if r["nk_null"] else r["c_nationkey"] for r in rows],
                pa.int64(),
            ),
            "n_cust": pa.array([r["n_cust"] for r in rows], pa.int64()),
            "acctbal_cents": pa.array([r["acctbal_cents"] for r in rows], pa.int64()),
        }
    )


def customer_order_full_join(sf_dir: str) -> "rd.Dataset":
    """FULL OUTER join coverage report — the referential-integrity audit
    shape (which keys exist on one side only?): every custkey seen in
    CUSTOMER or ORDERS gets one row (c_custkey, n_orders, has_customer) —
    zero-order customers keep n_orders = 0, dangling order custkeys (no
    customer row) keep has_customer = false.  Completes the join-type
    surface: broadcast/hash inner (`orders_by_mktsegment`), semi
    (`late_shipment_priority`), anti (`inactive_customers`), as-of/range
    (`events_asof_purchase`), and now full-outer.

    Scale shape: the order side pre-aggregates to (custkey, n) per batch
    (the shuffle moves one row per distinct customer per batch, not one
    per order), both sides tag and union, and ONE keyed groupby resolves
    the union — the same union-tag machinery as the anti-join, which
    degrades gracefully where Ray 2.49's hash join crashes on empty/sparse
    sides (see ``inactive_customers``)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as _Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def order_partial(batch: pa.Table) -> pa.Table:
        # NULL order custkeys form their own group: SQL GROUP BY keeps one
        # NULL row, and the FULL OUTER join carries it through unmatched
        # (coalesce -> NULL key, has_customer = false)
        nnull = batch["o_custkey"].null_count
        k = batch["o_custkey"].drop_null().to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(k, return_counts=True)
        keys = pa.array(uk, pa.int64())
        counts = cnt.astype(np.int64)
        if nnull:
            keys = pa.concat_arrays([keys, pa.array([None], pa.int64())])
            counts = np.concatenate([counts, np.array([nnull], np.int64)])
        return pa.table(
            {
                "c_custkey": keys,
                "n_orders": pa.array(counts, pa.int64()),
                "is_cust": pa.array(np.zeros(len(counts), np.int64)),
            }
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "c_custkey": batch["c_custkey"].cast(pa.int64()),
                "n_orders": pa.array(np.zeros(n, np.int64)),
                "is_cust": pa.array(np.ones(n, np.int64)),
            }
        )

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    combined = cust.map_batches(cust_rows, batch_format="pyarrow").union(
        orders.map_batches(order_partial, batch_format="pyarrow")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "n_orders": batch["n_orders"],
                "has_customer": pc.greater(batch["is_cust"], 0),
            }
        )

    return (
        combined.groupby("c_custkey")
        .aggregate(
            _Sum("n_orders", alias_name="n_orders"),
            _Sum("is_cust", alias_name="is_cust"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


def nation_trade_volume(
    sf_dir: str,
    start: str = "1996-01-01",
    end: str = "1998-01-01",
    n_buckets: int = 1024,
) -> "rd.Dataset":
    """TPC-H-Q7-shaped bilateral trade volume: revenue by (supplier nation,
    customer nation, ship year) over the window, cross-nation pairs only —
    the two-sided star + fact-fact join shape (two DIMENSION sidecars feed
    the two facts; the facts meet on orderkey).  Emits (supp_nation,
    cust_nation, year, revenue_cents).

    Scale shape: supplier→nation and customer→nation are dimension
    sidecars (driver-composed sorted arrays, ``searchsorted`` probes —
    the `revenue_by_supplier_nation` broadcast rule); lineitem
    pre-aggregates per batch to (orderkey, supp_nation, year, cents) and
    orders to (orderkey, cust_nation); the ONE wide exchange is an
    orderkey-hash BUCKET groupby (`returned_item_revenue`'s co-partition
    machinery — ≤ |orders|/n_buckets rows per group, vectorized
    searchsorted attach inside), after which ≤ 25×25×years partials fold
    in a tiny second groupby.  Neither fact ever broadcasts."""
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    lo = datetime.datetime.fromisoformat(start)
    hi = datetime.datetime.fromisoformat(end)

    nat = _pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nkeys = nat["n_nationkey"].to_numpy().astype(np.int64)
    norder = np.argsort(nkeys)
    nkeys_sorted = nkeys[norder]
    nnames = np.asarray(nat["n_name"].to_pylist(), dtype=object)[norder]

    sup = _pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    skeys = sup["s_suppkey"].to_numpy().astype(np.int64)
    sorder = np.argsort(skeys)
    skeys_sorted = skeys[sorder]
    snation = sup["s_nationkey"].to_numpy().astype(np.int64)[sorder]

    cust = _pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ckeys = cust["c_custkey"].to_numpy().astype(np.int64)
    corder = np.argsort(ckeys)
    ckeys_sorted = ckeys[corder]
    cnation = cust["c_nationkey"].to_numpy().astype(np.int64)[corder]

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def li_partial(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = price * (1.0 - disc)
        year = (
            batch["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        spos, sfound = _probe_sorted(skeys_sorted, np.nan_to_num(sk, nan=-1).astype(np.int64))
        m = sfound & ~np.isnan(okey.astype(np.float64))
        okey, rev, year, spos = okey[m], rev[m], year[m], spos[m]
        # NULL price/discount: the term drops from the sum but the group
        # survives (revenue NULL when ALL its terms are NULL — n_rev carries
        # that); the shipdate filter is pushed down, so year is never NaT
        pv = np.isfinite(rev)
        cents_row = np.where(pv, _cents_np(np.nan_to_num(rev)), 0)
        sn = snation[spos]
        df_keys = np.stack([okey.astype(np.int64), sn, year], axis=1)
        uk, inv = np.unique(df_keys, axis=0, return_inverse=True)
        cents = np.bincount(inv, weights=cents_row.astype(np.float64)).astype(np.int64)
        nrv = np.bincount(inv, weights=pv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((uk[:, 0] % n_buckets).astype(np.int64)),
                "okey": pa.array(uk[:, 0], pa.int64()),
                "sn": pa.array(uk[:, 1], pa.int64()),
                "year": pa.array(uk[:, 2], pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "n_rev": pa.array(nrv, pa.int64()),
                "cn": pa.array(np.full(len(uk), -1, np.int64)),
                "is_order": pa.array(np.zeros(len(uk), np.int64)),
            }
        )

    def ord_rows(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].drop_null()
        okey = ok.to_numpy(zero_copy_only=False).astype(np.int64)
        ck = (
            batch["o_custkey"]
            .to_numpy(zero_copy_only=False)[pc.is_valid(batch["o_orderkey"]).to_numpy(zero_copy_only=False)]
        )
        cpos, cfound = _probe_sorted(ckeys_sorted, np.nan_to_num(ck, nan=-1).astype(np.int64))
        okey = okey[cfound]
        cn = cnation[cpos[cfound]]
        n = len(okey)
        return pa.table(
            {
                "bucket": pa.array((okey % n_buckets).astype(np.int64)),
                "okey": pa.array(okey, pa.int64()),
                "sn": pa.array(np.full(n, -1, np.int64)),
                "year": pa.array(np.zeros(n, np.int64)),
                "cents": pa.array(np.zeros(n, np.int64)),
                "n_rev": pa.array(np.zeros(n, np.int64)),
                "cn": pa.array(cn, pa.int64()),
                "is_order": pa.array(np.ones(n, np.int64)),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sn": pa.array([], pa.int64()),
                "cn": pa.array([], pa.int64()),
                "year": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "n_rev": pa.array([], pa.int64()),
            }
        )
        is_order = group["is_order"].to_numpy(zero_copy_only=False) > 0
        if is_order.all() or not is_order.any():
            return empty
        o_keys = group["okey"].to_numpy(zero_copy_only=False)[is_order]
        o_cn = group["cn"].to_numpy(zero_copy_only=False)[is_order]
        oo = np.argsort(o_keys)
        o_keys, o_cn = o_keys[oo], o_cn[oo]
        li_keys = group["okey"].to_numpy(zero_copy_only=False)[~is_order]
        pos, found = _probe_sorted(o_keys, li_keys)
        if not found.any():
            return empty
        sn = group["sn"].to_numpy(zero_copy_only=False)[~is_order][found]
        year = group["year"].to_numpy(zero_copy_only=False)[~is_order][found]
        cents = group["cents"].to_numpy(zero_copy_only=False)[~is_order][found]
        nrv = group["n_rev"].to_numpy(zero_copy_only=False)[~is_order][found]
        cn = o_cn[pos[found]]
        keys = np.stack([sn, cn, year], axis=1)
        uk, inv = np.unique(keys, axis=0, return_inverse=True)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        nr = np.bincount(inv, weights=nrv.astype(np.float64), minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "sn": pa.array(uk[:, 0], pa.int64()),
                "cn": pa.array(uk[:, 1], pa.int64()),
                "year": pa.array(uk[:, 2], pa.int64()),
                "cents": pa.array(s, pa.int64()),
                "n_rev": pa.array(nr, pa.int64()),
            }
        )

    def name_keys(batch: pa.Table) -> pa.Table:
        # SQL groups by the NAME pair (GROUP BY 1,2,3): re-key the tiny
        # (sn, cn, year) rollup by two-key names — NULL names are groups,
        # duplicate names merge — before the final fold
        empty = pa.table(
            {
                "sn_key": pa.array([], pa.string()),
                "sn_null": pa.array([], pa.bool_()),
                "cn_key": pa.array([], pa.string()),
                "cn_null": pa.array([], pa.bool_()),
                "year": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "n_rev": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or "sn" not in batch.schema.names:
            return empty
        sn = batch["sn"].to_numpy(zero_copy_only=False)
        cn = batch["cn"].to_numpy(zero_copy_only=False)
        keep = sn != cn  # cross-nation pairs only (Q7's key inequality)
        sn, cn = sn[keep], cn[keep]
        spos, sf = _probe_sorted(nkeys_sorted, sn)
        cpos, cf = _probe_sorted(nkeys_sorted, cn)
        m = sf & cf  # dangling nationkeys drop like the SQL inner join
        snm = nnames[spos[m]]
        cnm = nnames[cpos[m]]
        kept = batch.filter(pa.array(keep)).filter(pa.array(m))
        return pa.table(
            {
                "sn_key": pa.array(["" if x is None else x for x in snm], pa.string()),
                "sn_null": pa.array([x is None for x in snm], pa.bool_()),
                "cn_key": pa.array(["" if x is None else x for x in cnm], pa.string()),
                "cn_null": pa.array([x is None for x in cnm], pa.bool_()),
                "year": kept["year"],
                "cents": kept["cents"],
                "n_rev": kept["n_rev"],
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "sn_key" not in batch.schema.names:
            return pa.table(
                {
                    "supp_nation": pa.array([], pa.string()),
                    "cust_nation": pa.array([], pa.string()),
                    "year": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        nr = batch["n_rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "supp_nation": pa.array(
                    batch["sn_key"].to_pylist(), pa.string(),
                    mask=batch["sn_null"].to_numpy(zero_copy_only=False).astype(bool),
                ),
                "cust_nation": pa.array(
                    batch["cn_key"].to_pylist(), pa.string(),
                    mask=batch["cn_null"].to_numpy(zero_copy_only=False).astype(bool),
                ),
                "year": batch["year"],
                "revenue_cents": pa.array(
                    batch["cents"].to_numpy(zero_copy_only=False),
                    pa.int64(),
                    mask=(nr == 0),
                ),
            }
        )

    return (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(orders.map_batches(ord_rows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .map_batches(name_keys, batch_format="pyarrow")
        .groupby(["sn_key", "sn_null", "cn_key", "cn_null", "year"])
        .aggregate(Sum("cents", alias_name="cents"), Sum("n_rev", alias_name="n_rev"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def sole_late_supplier(
    sf_dir: str,
    grace_days: int = 30,
    k: int = 100,
    n_buckets: int = 1024,
) -> "rd.Dataset":
    """TPC-H-Q21-shaped "suppliers who kept orders waiting": count, per
    supplier, the late lineitems (``l_shipdate > o_orderdate + grace``)
    in multi-supplier orders where that supplier was the ONLY late one —
    the grouped EXISTS (another supplier participated) + NOT EXISTS (no
    other supplier was also late) shape, the one relational pattern the
    rest of the suite lacks (reference has no analogue; TPC-H Q21 adapted
    to this schema's columns — no l_receiptdate/l_commitdate here, so
    "late" is ship-vs-order-date).  Emits the top-``k`` ``(s_name,
    numwait)`` by ``numwait DESC, s_name`` (names are unique, so the
    LIMIT cutoff is deterministic).

    Scale shape: supplier→name is a dimension sidecar (sorted-probe
    broadcast); lineitem pre-compresses per batch to distinct
    ``(orderkey, suppkey, ship_ns, cnt)`` rows (day-aligned dates make
    runs common); the ONE wide exchange is the orderkey-hash BUCKET
    co-partition with orders' ``(orderkey, odate_ns)`` rows, after which
    the per-order set logic (distinct suppliers ≥ 2, distinct LATE
    suppliers == 1) runs vectorized inside each bucket and emits at most
    one ``(suppkey, cnt)`` row per qualifying order.  The final exchange
    is a per-supplier Sum (≤ |supplier| rows) and the sort/limit runs on
    that tiny rollup.  NULL suppkey lines drop on BOTH engines (the
    ``<>``/GROUP BY semantics); NULL shipdate is never late but still
    counts toward supplier presence; NULL orderdate orders join but can
    have no late line (comparison NULL → false)."""
    import pyarrow.parquet as _pq

    grace_ns = np.int64(grace_days) * 86_400_000_000_000
    NEG = np.int64(np.iinfo(np.int64).min // 4)  # "never late" sentinel

    sup = _pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    skeys = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    svalid = ~np.isnan(skeys.astype(np.float64))
    skeys = skeys[svalid].astype(np.int64)
    sorder = np.argsort(skeys)
    skeys_sorted = skeys[sorder]
    snames = np.asarray(sup["s_name"].to_pylist(), dtype=object)[svalid][sorder]

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        m = (
            _pc.and_(
                _pc.is_valid(batch["l_orderkey"]), _pc.is_valid(batch["l_suppkey"])
            )
        ).to_numpy(zero_copy_only=False)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        ship = batch["l_shipdate"].combine_chunks()
        sv = _pc.is_valid(ship).to_numpy(zero_copy_only=False)[m]
        # fill_null BEFORE to_numpy: a null-carrying int64 column otherwise
        # round-trips through float64 and loses ns exactness at 1996-era
        # epoch offsets (2^53 ns ≈ 104 days), flipping day-boundary compares
        sn = (
            _pc.fill_null(ship.cast(pa.timestamp("ns")).cast(pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[m]
        )
        sn = np.where(sv, sn, NEG)
        keys = np.stack([okey, sk, sn], axis=1)
        uk, inv = np.unique(keys, axis=0, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((uk[:, 0] % n_buckets).astype(np.int64)),
                "okey": pa.array(uk[:, 0], pa.int64()),
                "skey": pa.array(uk[:, 1], pa.int64()),
                "ship_ns": pa.array(uk[:, 2], pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "is_order": pa.array(np.zeros(len(uk), np.int64)),
            }
        )

    def ord_rows(batch: pa.Table) -> pa.Table:
        ov = _pc.is_valid(batch["o_orderkey"]).to_numpy(zero_copy_only=False)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)[ov].astype(np.int64)
        od = batch["o_orderdate"].combine_chunks()
        dv = _pc.is_valid(od).to_numpy(zero_copy_only=False)[ov]
        dn = (
            _pc.fill_null(od.cast(pa.timestamp("ns")).cast(pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[ov]
        )
        # NULL orderdate → +inf/4 sentinel: no shipdate exceeds it + grace,
        # so the order joins (suppliers still count) but never yields lates
        dn = np.where(dv, dn, -NEG)
        n = len(okey)
        return pa.table(
            {
                "bucket": pa.array((okey % n_buckets).astype(np.int64)),
                "okey": pa.array(okey, pa.int64()),
                "skey": pa.array(np.zeros(n, np.int64)),
                "ship_ns": pa.array(dn, pa.int64()),
                "cnt": pa.array(np.zeros(n, np.int64)),
                "is_order": pa.array(np.ones(n, np.int64)),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"skey": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
        )
        is_order = group["is_order"].to_numpy(zero_copy_only=False) > 0
        if is_order.all() or not is_order.any():
            return empty
        o_keys = group["okey"].to_numpy(zero_copy_only=False)[is_order]
        o_date = group["ship_ns"].to_numpy(zero_copy_only=False)[is_order]
        oo = np.argsort(o_keys)
        o_keys, o_date = o_keys[oo], o_date[oo]
        lk = group["okey"].to_numpy(zero_copy_only=False)[~is_order]
        pos, found = _probe_sorted(o_keys, lk)
        if not found.any():
            return empty
        lk = lk[found]
        sk = group["skey"].to_numpy(zero_copy_only=False)[~is_order][found]
        ship = group["ship_ns"].to_numpy(zero_copy_only=False)[~is_order][found]
        cnt = group["cnt"].to_numpy(zero_copy_only=False)[~is_order][found]
        late = ship > o_date[pos[found]] + grace_ns
        # per (order, supplier): total late-line count; then per order:
        # distinct suppliers and distinct late suppliers
        o = np.lexsort((sk, lk))
        lk, sk, cnt, late = lk[o], sk[o], cnt[o], late[o]
        first = np.r_[True, (lk[1:] != lk[:-1]) | (sk[1:] != sk[:-1])]
        pid = np.cumsum(first) - 1
        n_pairs = int(pid[-1]) + 1
        late_cnt = np.bincount(pid, weights=np.where(late, cnt, 0), minlength=n_pairs).astype(np.int64)
        p_okey = lk[first]
        p_skey = sk[first]
        ofirst = np.r_[True, p_okey[1:] != p_okey[:-1]]
        oid = np.cumsum(ofirst) - 1
        n_orders = int(oid[-1]) + 1
        n_supp = np.bincount(oid, minlength=n_orders)
        n_late_supp = np.bincount(oid, weights=(late_cnt > 0), minlength=n_orders).astype(np.int64)
        ok_order = (n_supp >= 2) & (n_late_supp == 1)
        emit = ok_order[oid] & (late_cnt > 0)
        if not emit.any():
            return empty
        return pa.table(
            {
                "skey": pa.array(p_skey[emit], pa.int64()),
                "cnt": pa.array(late_cnt[emit], pa.int64()),
            }
        )

    def attach_names(batch: pa.Table) -> pa.Table:
        # SQL groups by s_name (NULL names form ONE group; duplicate names
        # merge), so the supplier rollup re-keys by the two-key name pair
        if batch.num_rows == 0 or "skey" not in batch.schema.names:
            return pa.table(
                {
                    "name_key": pa.array([], pa.string()),
                    "name_null": pa.array([], pa.bool_()),
                    "numwait": pa.array([], pa.int64()),
                }
            )
        sk = batch["skey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos, found = _probe_sorted(skeys_sorted, sk)
        nm = snames[pos[found]]
        return pa.table(
            {
                "name_key": pa.array(
                    ["" if x is None else x for x in nm], pa.string()
                ),
                "name_null": pa.array([x is None for x in nm], pa.bool_()),
                "numwait": batch["sum(cnt)"].filter(pa.array(found)),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "name_key" not in batch.schema.names:
            return pa.table(
                {
                    "s_name": pa.array([], pa.string()),
                    "numwait": pa.array([], pa.int64()),
                    "name_key": pa.array([], pa.string()),
                    "name_null": pa.array([], pa.bool_()),
                }
            )
        nnull = batch["name_null"].to_numpy(zero_copy_only=False).astype(bool)
        return pa.table(
            {
                "s_name": pa.array(batch["name_key"].to_pylist(), pa.string(), mask=nnull),
                "numwait": batch["numwait"],
                # sort helpers: DuckDB orders s_name ASC NULLS LAST
                "name_key": batch["name_key"],
                "name_null": batch["name_null"],
            }
        )

    return (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(orders.map_batches(ord_rows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("skey")
        .aggregate(Sum("cnt"))
        .map_batches(attach_names, batch_format="pyarrow")
        .groupby(["name_key", "name_null"])
        .aggregate(Sum("numwait", alias_name="numwait"))
        .map_batches(finalize, batch_format="pyarrow")
        .sort(["numwait", "name_null", "name_key"], descending=[True, False, False])
        .limit(k)
        .map_batches(
            lambda t: t.select(["s_name", "numwait"]), batch_format="pyarrow"
        )
    )


def regional_market_share(
    sf_dir: str,
    region: str = "AMERICA",
    nation: str = "NATION_3",
    start: str = "1996-01-01",
    end: str = "1998-01-01",
    n_buckets: int = 1024,
) -> "rd.Dataset":
    """TPC-H-Q8-shaped market share: within the ship-date window, the
    fraction of revenue in ``region``'s customer market (customer →
    nation → region chain) supplied by ``nation``, per ship year — the
    conditional-share (CASE-sum / sum) grouped ratio over the two-sided
    star, completing the Q5/Q7/Q8 family.  Emits ``(year, nation_cents,
    total_cents, mkt_share)``; the single double division runs LAST on
    exact int64 cent sums on both engines, so the share is IEEE-bit
    identical.

    Scale shape: both dimension chains collapse to sorted-probe sidecars
    (custkey → in-region membership, suppkey → is-target flag — each one
    driver-composed from the tiny dimension tables, broadcast once);
    lineitem pre-aggregates per batch to ``(orderkey, year,
    target_cents, total_cents)`` and orders ships only its IN-REGION
    ``orderkey`` rows (the membership filter prunes the exchange at the
    map side); the ONE wide exchange is the orderkey-hash bucket
    co-partition, after which ≤ years partials fold in a tiny second
    groupby.  Dangling keys anywhere along either chain drop the row,
    matching the SQL inner joins; an all-zero-revenue year yields a NULL
    share (NULLIF denominator)."""
    import pyarrow.parquet as _pq

    lo = datetime.datetime.fromisoformat(start)
    hi = datetime.datetime.fromisoformat(end)

    reg = _pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    rmask = (
        _pc.fill_null(_pc.equal(reg["r_name"], region), False)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    rk = reg["r_regionkey"].to_numpy(zero_copy_only=False)[rmask]
    rkeys = set(rk[~np.isnan(rk.astype(np.float64))].astype(np.int64))

    nat = _pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    nv = ~np.isnan(nk.astype(np.float64))
    nk = nk[nv].astype(np.int64)
    nreg = nat["n_regionkey"].to_numpy(zero_copy_only=False)[nv]
    nname = np.asarray(nat["n_name"].to_pylist(), dtype=object)[nv]
    in_region_nations = set(
        nk[
            np.array(
                [(not np.isnan(float(r))) and int(r) in rkeys for r in nreg],
                dtype=bool,
            )
        ]
    )
    target_nations = set(nk[np.array([n == nation for n in nname], dtype=bool)])

    cust = _pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cv = ~np.isnan(ck.astype(np.float64))
    ck = ck[cv].astype(np.int64)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False)[cv]
    cin = np.array(
        [(not np.isnan(float(x))) and int(x) in in_region_nations for x in cn],
        dtype=bool,
    )
    ckeys_sorted = np.sort(ck[cin])  # custkeys whose region chain resolves to `region`

    sup = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    sv = ~np.isnan(sk.astype(np.float64))
    sk = sk[sv].astype(np.int64)
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False)[sv]
    # the supplier chain must RESOLVE (inner join to nation) for the row to
    # survive at all; the target flag is then nation-name equality
    sres = np.array(
        [(not np.isnan(float(x))) and int(x) in set(nk) for x in snat], dtype=bool
    )
    stgt = np.array(
        [(not np.isnan(float(x))) and int(x) in target_nations for x in snat],
        dtype=bool,
    )
    so = np.argsort(sk[sres])
    skeys_sorted = sk[sres][so]
    s_is_target = stgt[sres][so]

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def li_partial(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        skc = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = price * (1.0 - disc)
        year = (
            batch["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        ov = ~np.isnan(okey.astype(np.float64))
        sv2 = ~np.isnan(skc.astype(np.float64))
        m = ov & sv2 & np.isfinite(rev)
        okey, skc, rev, year = (
            okey[m].astype(np.int64),
            skc[m].astype(np.int64),
            rev[m],
            year[m],
        )
        pos, found = _probe_sorted(skeys_sorted, skc)
        okey, rev, year = okey[found], rev[found], year[found]
        tgt = s_is_target[pos[found]]
        cents = _cents_np(rev)
        keys = np.stack([okey, year], axis=1)
        uk, inv = np.unique(keys, axis=0, return_inverse=True)
        tot = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        tc = np.bincount(
            inv, weights=np.where(tgt, cents, 0).astype(np.float64), minlength=len(uk)
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((uk[:, 0] % n_buckets).astype(np.int64)),
                "okey": pa.array(uk[:, 0], pa.int64()),
                "year": pa.array(uk[:, 1], pa.int64()),
                "t_cents": pa.array(tc, pa.int64()),
                "a_cents": pa.array(tot, pa.int64()),
                "is_order": pa.array(np.zeros(len(uk), np.int64)),
            }
        )

    def ord_rows(batch: pa.Table) -> pa.Table:
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        ckc = batch["o_custkey"].to_numpy(zero_copy_only=False)
        m = ~np.isnan(okey.astype(np.float64)) & ~np.isnan(ckc.astype(np.float64))
        okey, ckc = okey[m].astype(np.int64), ckc[m].astype(np.int64)
        _, found = _probe_sorted(ckeys_sorted, ckc)
        okey = okey[found]  # map-side prune: only in-region orders ship
        n = len(okey)
        return pa.table(
            {
                "bucket": pa.array((okey % n_buckets).astype(np.int64)),
                "okey": pa.array(okey, pa.int64()),
                "year": pa.array(np.zeros(n, np.int64)),
                "t_cents": pa.array(np.zeros(n, np.int64)),
                "a_cents": pa.array(np.zeros(n, np.int64)),
                "is_order": pa.array(np.ones(n, np.int64)),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "year": pa.array([], pa.int64()),
                "t_cents": pa.array([], pa.int64()),
                "a_cents": pa.array([], pa.int64()),
            }
        )
        is_order = group["is_order"].to_numpy(zero_copy_only=False) > 0
        if is_order.all() or not is_order.any():
            return empty
        o_keys = np.sort(group["okey"].to_numpy(zero_copy_only=False)[is_order])
        lk = group["okey"].to_numpy(zero_copy_only=False)[~is_order]
        _, found = _probe_sorted(o_keys, lk)
        if not found.any():
            return empty
        year = group["year"].to_numpy(zero_copy_only=False)[~is_order][found]
        tc = group["t_cents"].to_numpy(zero_copy_only=False)[~is_order][found]
        ac = group["a_cents"].to_numpy(zero_copy_only=False)[~is_order][found]
        uy, inv = np.unique(year, return_inverse=True)
        return pa.table(
            {
                "year": pa.array(uy, pa.int64()),
                "t_cents": pa.array(
                    np.bincount(inv, weights=tc.astype(np.float64)).astype(np.int64),
                    pa.int64(),
                ),
                "a_cents": pa.array(
                    np.bincount(inv, weights=ac.astype(np.float64)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "year" not in batch.schema.names:
            return pa.table(
                {
                    "year": pa.array([], pa.int64()),
                    "nation_cents": pa.array([], pa.int64()),
                    "total_cents": pa.array([], pa.int64()),
                    "mkt_share": pa.array([], pa.float64()),
                }
            )
        tc = batch["sum(t_cents)"].to_numpy(zero_copy_only=False).astype(np.int64)
        ac = batch["sum(a_cents)"].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            share = tc.astype(np.float64) / ac.astype(np.float64)
        return pa.table(
            {
                "year": batch["year"],
                "nation_cents": pa.array(tc, pa.int64()),
                "total_cents": pa.array(ac, pa.int64()),
                "mkt_share": pa.array(
                    np.where(ac > 0, share, np.nan), pa.float64(), mask=(ac <= 0)
                ),
            }
        )

    return (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(orders.map_batches(ord_rows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("year")
        .aggregate(Sum("t_cents"), Sum("a_cents"))
        .map_batches(finalize, batch_format="pyarrow")
    )


def returnflag_priority_counts(
    sf_dir: str,
    start: str = "1996-01-01",
    end: str = "1998-01-01",
    n_buckets: int = 1024,
) -> "rd.Dataset":
    """TPC-H-Q12-shaped conditional two-way count: per return flag, how many
    in-window lineitems belong to HIGH-priority orders ('1-URGENT'/'2-HIGH')
    vs everything else — the CASE-WHEN split-count over a fact⋈dimension
    join (Q12 splits shipments by ship mode; this dataset's analogue splits
    by return flag, the only line-level category the schema carries).

    Two size-gated physical plans (the stats-driven broadcast-vs-shuffle
    choice, same gate as ``late_shipment_priority``):

    - **Broadcast probe** (orders parquet ≤ 256 MB): a sorted
      (orderkey → is-high int8) sidecar is composed driver-side and
      ``ray.put`` once; every lineitem batch resolves its priority class
      locally and pre-aggregates to ≤ |flags| rows — the ONLY exchange is
      the ≤ |flags|-key final groupby.  The fact table never shuffles.
    - **Bucket co-partition** (orders side too large to broadcast):
      lineitem pre-aggregates per batch to (orderkey, flag, cnt) rows,
      orders ships (orderkey, is_high), both hash into ``orderkey %
      n_buckets`` groups, and each bucket joins locally with a sorted
      probe — the exchange moves one row per (order, flag) pair and one
      per order, never one per lineitem.

    SQL semantics pinned on both plans: dangling lineitem orderkeys drop
    (inner join); NULL o_orderpriority is not high (CASE ELSE); NULL
    l_shipdate fails the range predicate; NULL l_returnflag keeps its own
    group (two-key NULL-safe pattern)."""
    lo = np.datetime64(start, "ns").astype(np.int64)
    hi = np.datetime64(end, "ns").astype(np.int64)
    orders_path = f"{sf_dir}/orders.parquet"
    li_cols = ["l_orderkey", "l_returnflag", "l_shipdate"]
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols)

    def _flag_partial(
        flag_arr: pa.Array, high: np.ndarray, weights: np.ndarray | None = None
    ) -> pa.Table:
        """(flag_key, flag_null, high_cnt, low_cnt) partial rows from a
        joined slice: one bincount pair over dictionary codes.  NULL flags
        get their own code (codes + nf offset — the two-key pattern encoded
        as a code shift, collision-free for any real string value)."""
        isnull = _pc.is_null(flag_arr).to_numpy(zero_copy_only=False).astype(bool)
        fd = _pc.fill_null(flag_arr, "").dictionary_encode()
        names = fd.dictionary.to_pylist()
        codes = fd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nf = len(names)
        codes = codes + nf * isnull  # null rows shift into [nf, 2nf)
        w = weights if weights is not None else np.ones(len(codes), dtype=np.int64)
        h = np.bincount(codes[high], weights=w[high], minlength=2 * nf).astype(np.int64)
        l = np.bincount(codes[~high], weights=w[~high], minlength=2 * nf).astype(np.int64)
        nz = np.nonzero(h + l)[0]
        return pa.table(
            {
                "flag_key": pa.array(
                    ["" if i >= nf else names[i] for i in nz], pa.string()
                ),
                "flag_null": pa.array([bool(i >= nf) for i in nz], pa.bool_()),
                "high_cnt": pa.array(h[nz], pa.int64()),
                "low_cnt": pa.array(l[nz], pa.int64()),
            }
        )

    def _finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "flag_key" not in batch.schema.names:
            return pa.table(
                {
                    "l_returnflag": pa.array([], pa.string()),
                    "high_count": pa.array([], pa.int64()),
                    "low_count": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "l_returnflag": pa.array(
                    batch["flag_key"].to_pylist(), pa.string(),
                    mask=batch["flag_null"].to_numpy(zero_copy_only=False).astype(bool),
                ),
                "high_count": batch["high_cnt"],
                "low_count": batch["low_cnt"],
            }
        )

    def _window_mask(batch: pa.Table) -> np.ndarray:
        ts64 = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[ns]")
        ts = ts64.astype(np.int64)
        return ~np.isnat(ts64) & (ts >= lo) & (ts < hi)

    if _parquet_bytes(orders_path) <= _BROADCAST_MAX_BYTES:
        import pyarrow.parquet as _pq

        otab = _pq.read_table(orders_path, columns=["o_orderkey", "o_orderpriority"])
        otab = otab.filter(_pc.is_valid(otab["o_orderkey"]))  # NULL keys never join
        okeys = otab["o_orderkey"].to_numpy()
        is_high = _pc.is_in(
            otab["o_orderpriority"], value_set=pa.array(["1-URGENT", "2-HIGH"])
        )
        # NULL priority is not high (SQL CASE ELSE branch)
        high_np = _pc.fill_null(is_high, False).to_numpy(zero_copy_only=False).astype(bool)
        order_sort = np.argsort(okeys, kind="stable")
        sidecar_ref = ray.put((okeys[order_sort], high_np[order_sort].astype(np.int8)))

        def li_partial(batch: pa.Table) -> pa.Table:
            sorted_keys, sorted_high = ray.get(sidecar_ref)
            m = _window_mask(batch)
            t = batch.filter(pa.array(m))
            t = t.filter(_pc.is_valid(t["l_orderkey"]))  # NULL keys never join
            keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
            idx_c, hit = _probe_sorted(sorted_keys, keys)
            t = t.filter(pa.array(hit))
            high = sorted_high[idx_c[hit]].astype(bool)
            return _flag_partial(t["l_returnflag"].combine_chunks(), high)

        return (
            li.map_batches(li_partial, batch_format="pyarrow")
            .groupby(["flag_key", "flag_null"])
            .aggregate(Sum("high_cnt", alias_name="high_cnt"),
                       Sum("low_cnt", alias_name="low_cnt"))
            .map_batches(_finalize, batch_format="pyarrow")
        )

    # ---- bucket co-partition fallback (orders side too large) ------------
    def li_rows(batch: pa.Table) -> pa.Table:
        m = _window_mask(batch)
        t = batch.filter(pa.array(m))
        # NULL orderkeys can never inner-join (SQL semantics); drop them before
        # the int64 cast or NaN would collapse onto the INT64_MIN sentinel and
        # spuriously match NULL keys from the orders side.
        t = t.filter(_pc.is_valid(t["l_orderkey"]))
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        flag_arr = t["l_returnflag"].combine_chunks()
        isnull = _pc.is_null(flag_arr).to_numpy(zero_copy_only=False).astype(bool)
        fd = _pc.fill_null(flag_arr, "").dictionary_encode()
        names = np.asarray(fd.dictionary.to_pylist() + [None], dtype=object)
        nf = len(names) - 1
        codes = fd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        codes = codes + nf * isnull  # NULL flags keep their own pre-agg group
        # pre-agg: one row per (orderkey, flag) pair per batch
        o = np.lexsort((codes, keys))
        k, c = keys[o], codes[o]
        if len(k):
            newg = np.r_[True, (k[1:] != k[:-1]) | (c[1:] != c[:-1])]
            gidx = np.nonzero(newg)[0]
            cnt = np.diff(np.r_[gidx, len(k)])
            k, c = k[gidx], c[gidx]
        else:
            cnt = np.zeros(0, dtype=np.int64)
        fnull = c >= nf
        fkey = np.where(fnull, "", names[np.minimum(c, nf - 1) if nf else c])
        return pa.table(
            {
                "bucket": pa.array(k % n_buckets, pa.int64()),
                "okey": pa.array(k, pa.int64()),
                "fkey": pa.array(fkey.astype(object), pa.string()),
                "fnull": pa.array(fnull),
                "cnt": pa.array(cnt, pa.int64()),
                "is_order": pa.array(np.zeros(len(k), dtype=bool)),
                "is_high": pa.array(np.zeros(len(k), dtype=bool)),
            }
        )

    def ord_rows(batch: pa.Table) -> pa.Table:
        batch = batch.filter(_pc.is_valid(batch["o_orderkey"]))  # NULL keys never join
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        high = _pc.fill_null(
            _pc.is_in(batch["o_orderpriority"], value_set=pa.array(["1-URGENT", "2-HIGH"])),
            False,
        ).to_numpy(zero_copy_only=False).astype(bool)
        n = len(keys)
        return pa.table(
            {
                "bucket": pa.array(keys % n_buckets, pa.int64()),
                "okey": pa.array(keys, pa.int64()),
                "fkey": pa.array([""] * n, pa.string()),
                "fnull": pa.array(np.zeros(n, dtype=bool)),
                "cnt": pa.array(np.zeros(n, dtype=np.int64)),
                "is_order": pa.array(np.ones(n, dtype=bool)),
                "is_high": pa.array(high),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        is_ord = group["is_order"].to_numpy(zero_copy_only=False).astype(bool)
        okeys = group["okey"].to_numpy(zero_copy_only=False)
        osort = np.argsort(okeys[is_ord], kind="stable")
        skeys = okeys[is_ord][osort]
        shigh = group["is_high"].to_numpy(zero_copy_only=False).astype(bool)[is_ord][osort]
        lt = group.filter(pa.array(~is_ord))
        lkeys = okeys[~is_ord]
        idx_c, hit = _probe_sorted(skeys, lkeys)
        lt = lt.filter(pa.array(hit))
        high = shigh[idx_c[hit]]
        cnt = lt["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        # fold the (fkey, fnull) pair back into one nullable array so the
        # shared _flag_partial re-derives collision-free codes
        flags = _pc.if_else(
            lt["fnull"], pa.scalar(None, pa.string()), lt["fkey"]
        ).combine_chunks()
        return _flag_partial(flags, high, weights=cnt)

    orders = rd.read_parquet(orders_path, columns=["o_orderkey", "o_orderpriority"])
    return (
        li.map_batches(li_rows, batch_format="pyarrow")
        .union(orders.map_batches(ord_rows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["flag_key", "flag_null"])
        .aggregate(Sum("high_cnt", alias_name="high_cnt"),
                   Sum("low_cnt", alias_name="low_cnt"))
        .map_batches(_finalize, batch_format="pyarrow")
    )


def segment_revenue_bloom(
    sf_dir: str,
    segment: str = "BUILDING",
    n_buckets: int = 512,
    m_bits: int = 1 << 17,
) -> "rd.Dataset":
    """Bloom-runtime-filtered semi-join rollup: total order count and exact
    cent revenue from customers in one market segment — the sideways-
    information-passing optimization every warehouse planner applies (build
    a compact filter from the join's build side, push it into the probe
    side's SCAN so non-joining rows die map-side, BEFORE the exchange).
    The Bloom never decides membership — it only prunes: surviving rows
    still go through the exact orderkey-bucket co-partition join, so false
    positives cost work, never correctness (hash-exact SQL oracle).

    Scale shape: the segment Bloom is built DISTRIBUTED (per-batch
    partials, OR-merged — the collect is bounded at m_bits/8 bytes per
    customer batch) and broadcast once via ``ray.put`` (~10 bits/key at
    any build size — the point of a Bloom is that raw keys need NOT fit a
    broadcast); the RAW segment keys never touch the driver: they ship
    through the same custkey-bucket exchange as the order partials, and
    each bucket verifies its own keys locally.  Orders pre-aggregate
    map-side AFTER the bloom cut, so the one keyed exchange carries only
    maybe-matching (custkey, cents) partials plus the per-bucket key rows.
    SQL semantics: NULL custkey never joins; NULL totalprice counts the
    order but adds no cents (SQL sum ignores NULL)."""
    from language_identification_ray.functions import sketches as sk

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )

    def _seg_slice(batch: pa.Table) -> np.ndarray:
        keep = _pc.fill_null(_pc.equal(batch["c_mktsegment"], segment), False)
        t = batch.filter(keep)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        return keys[~np.isnan(keys.astype(np.float64))].astype(np.int64)

    def bloom_partial(batch: pa.Table) -> pa.Table:
        keys = _seg_slice(batch)
        bits = sk.bloom_empty(m_bits)
        sk.bloom_add_hashes(bits, keys.astype(np.uint32))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    # bounded collect: one m_bits/8-byte row per customer batch
    parts = cust.map_batches(bloom_partial, batch_format="pyarrow").take_all()
    bits = sk.bloom_empty(m_bits)
    for p in parts:
        bits = sk.bloom_merge(bits, np.frombuffer(p["bloom"], np.uint8))
    bloom_ref = ray.put(bits)

    def cust_rows(batch: pa.Table) -> pa.Table:
        keys = _seg_slice(batch)
        n = len(keys)
        return pa.table(
            {
                "bucket": pa.array(keys % n_buckets, pa.int64()),
                "custkey": pa.array(keys, pa.int64()),
                "n": pa.array(np.zeros(n, dtype=np.int64)),
                "n_priced": pa.array(np.zeros(n, dtype=np.int64)),
                "cents": pa.array(np.zeros(n, dtype=np.int64)),
                "is_cust": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def ord_partial(batch: pa.Table) -> pa.Table:
        b = ray.get(bloom_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(ck)
        ck64 = ck.astype(np.int64)
        maybe = np.zeros(len(ck), dtype=bool)
        if valid.any():
            maybe[valid] = sk.bloom_contains_hashes(b, ck64[valid].astype(np.uint32))
        t = batch.filter(pa.array(maybe))
        ck64 = ck64[maybe]
        price = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        has_p = ~np.isnan(price)
        cents = np.where(has_p, _cents_np(np.nan_to_num(price)), 0)
        # pre-agg per custkey within the batch; carry the priced-row count
        # so an all-NULL-price group can yield SQL's NULL sum downstream
        o = np.argsort(ck64, kind="stable")
        k = ck64[o]
        c = cents[o]
        hp = has_p[o].astype(np.int64)
        n = np.ones(len(k), dtype=np.int64)
        if len(k):
            newg = np.r_[True, k[1:] != k[:-1]]
            gidx = np.nonzero(newg)[0]
            cnt = np.add.reduceat(n, gidx)
            cs = np.add.reduceat(c, gidx)
            nps = np.add.reduceat(hp, gidx)
            k = k[gidx]
        else:
            cnt = cs = nps = np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "bucket": pa.array(k % n_buckets, pa.int64()),
                "custkey": pa.array(k, pa.int64()),
                "n": pa.array(cnt, pa.int64()),
                "n_priced": pa.array(nps.astype(np.int64), pa.int64()),
                "cents": pa.array(cs.astype(np.int64), pa.int64()),
                "is_cust": pa.array(np.zeros(len(k), dtype=bool)),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        is_c = group["is_cust"].to_numpy(zero_copy_only=False).astype(bool)
        keys = group["custkey"].to_numpy(zero_copy_only=False)
        ks = np.unique(keys[is_c])  # this bucket's segment keys
        hit = np.zeros(len(keys), dtype=bool)
        if len(ks):
            _, hit_probe = _probe_sorted(ks, keys[~is_c])
            hit[~is_c] = hit_probe
        n = group["n"].to_numpy(zero_copy_only=False)[hit].sum()
        n_priced = group["n_priced"].to_numpy(zero_copy_only=False)[hit].sum()
        cents = group["cents"].to_numpy(zero_copy_only=False)[hit].sum()
        return pa.table(
            {
                "n": pa.array([int(n)], pa.int64()),
                "n_priced": pa.array([int(n_priced)], pa.int64()),
                "cents": pa.array([int(cents)], pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        n = int(batch["n"].to_numpy(zero_copy_only=False).sum()) if batch.num_rows else 0
        n_priced = (
            int(batch["n_priced"].to_numpy(zero_copy_only=False).sum())
            if batch.num_rows
            else 0
        )
        cents = (
            int(batch["cents"].to_numpy(zero_copy_only=False).sum())
            if batch.num_rows
            else 0
        )
        # SQL sum ignores NULL prices and is NULL when no priced row joined
        return pa.table(
            {
                "n_orders": pa.array([n], pa.int64()),
                "revenue_cents": pa.array(
                    [cents if n_priced > 0 else None], pa.int64()
                ),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return (
        orders.map_batches(ord_partial, batch_format="pyarrow")
        .union(cust.map_batches(cust_rows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finalize, batch_format="pyarrow")
    )


def monthly_revenue_growth(sf_dir: str) -> "rd.Dataset":
    """Month-over-month revenue trend: per order month, exact cent revenue,
    the previous month's revenue, and the delta — the LAG-over-aggregate
    report every revenue/ingest dashboard leads with (for a crawl pipeline:
    month-over-month ingest-volume drift).  ``prev_cents``/``delta_cents``
    are NULL for the first month (SQL ``LAG`` semantics); months are
    calendar-derived with vectorized epoch arithmetic (days → civil
    year/month via the Howard Hinnant algorithm, matching SQL
    ``date_trunc('month')``); NULL order dates keep their own group with
    NULL lag fields (SQL: a NULL month sorts last and LAG still assigns its
    neighbor — excluded here on BOTH engines via ``WHERE o_orderdate IS NOT
    NULL`` to keep the trend well-defined).

    Scale shape: per-batch month-keyed cent partials (≤ months rows per
    batch), one month-cardinality groupby, then the ordered diff folds
    inside ONE months-sized block — the same bounded-head pattern as
    ``zipf_alpha``'s regression."""
    us_day = np.int64(86_400_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        ts64 = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ok = ~np.isnat(ts64)
        t = batch.filter(pa.array(ok))
        if t.num_rows == 0:
            return pa.table(
                {
                    "ym": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "n_priced": pa.array([], pa.int64()),
                }
            )
        days = np.floor_divide(ts64[ok].astype(np.int64), us_day)
        # civil-from-days (Hinnant): days since 1970-01-01 -> (y, m)
        z = days + 719468
        era = np.floor_divide(z, 146097)
        doe = z - era * 146097
        yoe = np.floor_divide(doe - doe // 1460 + doe // 36524 - doe // 146096, 365)
        y = yoe + era * 400
        doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
        mp = np.floor_divide(5 * doy + 2, 153)
        m = mp + np.where(mp < 10, 3, -9)
        y = y + (m <= 2)
        ym = y * 12 + (m - 1)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        has_p = ~np.isnan(price)
        cents = np.where(has_p, _cents_np(np.nan_to_num(price)), 0)
        o = np.argsort(ym, kind="stable")
        k, c, hp = ym[o], cents[o], has_p[o].astype(np.int64)
        newg = np.r_[True, k[1:] != k[:-1]]
        gidx = np.nonzero(newg)[0]
        return pa.table(
            {
                "ym": pa.array(k[gidx], pa.int64()),
                "cents": pa.array(
                    np.add.reduceat(c, gidx).astype(np.int64), pa.int64()
                ),
                "n_priced": pa.array(
                    np.add.reduceat(hp, gidx).astype(np.int64), pa.int64()
                ),
            }
        )

    def diff(batch: pa.Table) -> pa.Table:
        ym = batch["ym"].to_numpy(zero_copy_only=False)
        cents = batch["cents"].to_numpy(zero_copy_only=False)
        npr = batch["n_priced"].to_numpy(zero_copy_only=False)
        o = np.argsort(ym, kind="stable")
        ym, cents, npr = ym[o], cents[o], npr[o]
        # an all-NULL-price month has a NULL sum (SQL); its neighbors' lag
        # fields go NULL with it
        cnull = npr == 0
        prev = np.r_[0, cents[:-1]].astype(np.int64)
        pnull = np.r_[True, cnull[:-1]]
        y = ym // 12
        m = ym - y * 12 + 1
        month = np.array(
            ["%04d-%02d" % (yy, mm) for yy, mm in zip(y, m)], dtype=object
        )
        return pa.table(
            {
                "month": pa.array(month, pa.string()),
                "cents": pa.array(cents, pa.int64(), mask=cnull),
                "prev_cents": pa.array(prev, pa.int64(), mask=pnull),
                "delta_cents": pa.array(
                    cents - prev, pa.int64(), mask=(pnull | cnull)
                ),
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("cents", alias_name="cents"),
                   Sum("n_priced", alias_name="n_priced"))
        .repartition(1)
        .map_batches(diff, batch_format="pyarrow")
    )


def min_cost_suppliers(sf_dir: str, k: int = 100) -> "rd.Dataset":
    """TPC-H-Q2-shaped correlated-MIN join: for each part, the supplier(s)
    whose unit offer (min lineitem extended-price cents for that
    (part, supplier) pair) equals the part's GLOBAL minimum — the
    ``WHERE price = (SELECT min(...) ... WHERE partkey = outer.partkey)``
    shape, the last classic join form the relational suite lacked.
    Ties all survive, like the SQL correlated subquery; the report is the
    top-``k`` by (min_price DESC, partkey, suppkey) — a unique sort key,
    so LIMIT is deterministic on both engines.  (Reference parity: the
    per-key best-match selection of SURVEY §2.5 G7, lifted to a
    distributed correlated aggregate.)

    Scale shape: each batch pre-aggregates to (partkey, suppkey,
    min_cents) partials, so the ONE fact exchange moves a row per distinct
    pair per batch, keyed on partkey; each part group resolves its
    correlated min locally and emits only the achieving pair(s).  Supplier
    names attach via the sorted broadcast sidecar (dimension-sized, same
    rule as ``top_supplier_revenue``); the final sort ranks a
    |parts|-bounded aggregate, never the fact table.  NULL partkey /
    suppkey / price rows drop exactly like the oracle's inner joins and
    NULL-skipping min()."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    sidecar = ray.put(
        _sorted_sidecar(f"{sf_dir}/supplier.parquet", "s_suppkey", "s_name")
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            _pc.and_(
                _pc.and_(
                    _pc.is_valid(batch["l_partkey"]),
                    _pc.is_valid(batch["l_suppkey"]),
                ),
                _pc.is_valid(batch["l_extendedprice"]),
            )
        )
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(t["l_extendedprice"])
        # per-batch min per (partkey, suppkey): sort by pair, min via reduceat
        o = np.lexsort((cents, sk, pk))
        pk, sk, cents = pk[o], sk[o], cents[o]
        if len(pk):
            newg = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
            gidx = np.nonzero(newg)[0]
            pk, sk, cents = pk[gidx], sk[gidx], cents[gidx]  # first = min (cents sorted)
        return pa.table(
            {
                "l_partkey": pa.array(pk, pa.int64()),
                "l_suppkey": pa.array(sk, pa.int64()),
                "min_cents": pa.array(cents, pa.int64()),
            }
        )

    def per_part(group: pa.Table) -> pa.Table:
        pk = group["l_partkey"].to_numpy(zero_copy_only=False)
        sk = group["l_suppkey"].to_numpy(zero_copy_only=False)
        cents = group["min_cents"].to_numpy(zero_copy_only=False)
        # combine cross-batch partials for the same (partkey, suppkey)
        o = np.lexsort((cents, sk, pk))
        pk, sk, cents = pk[o], sk[o], cents[o]
        newg = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        gidx = np.nonzero(newg)[0]
        pk, sk, cents = pk[gidx], sk[gidx], cents[gidx]
        # correlated min per part; emit every achieving supplier (ties)
        newp = np.r_[True, pk[1:] != pk[:-1]]
        pidx = np.nonzero(newp)[0]
        pmin = np.minimum.reduceat(cents, pidx)
        keep = cents == np.repeat(pmin, np.diff(np.r_[pidx, len(pk)]))
        return pa.table(
            {
                "partkey": pa.array(pk[keep], pa.int64()),
                "suppkey": pa.array(sk[keep], pa.int64()),
                "min_cents": pa.array(cents[keep], pa.int64()),
            }
        )

    def attach(batch: pa.Table) -> pa.Table:
        keys_sorted, names = ray.get(sidecar)
        sk = batch["suppkey"].to_numpy(zero_copy_only=False)
        pos, found = _probe_sorted(keys_sorted, sk)
        t = batch.filter(pa.array(found))  # dangling suppkeys: inner join drops
        return pa.table(
            {
                "partkey": t["partkey"],
                "suppkey": t["suppkey"],
                "supplier_name": pa.array(names[pos[found]], pa.string()),
                "min_price": _pc.divide(
                    _pc.cast(t["min_cents"], pa.float64()), 100.0
                ),
            }
        )

    return (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .map_groups(per_part, batch_format="pyarrow")
        .map_batches(attach, batch_format="pyarrow")
        .sort(["min_price", "partkey", "suppkey"], descending=[True, False, False])
        .limit(k)
    )


def dominant_share_suppliers(
    sf_dir: str, k: int = 100, share_den: int = 8
) -> "rd.Dataset":
    """TPC-H-Q20-shaped nested semi-join aggregate: suppliers that DOMINATE
    at least one part — shipped more than ``1/share_den`` of that part's
    total quantity — reported as (suppkey, name, n_dominated_parts), the
    ``s_suppkey IN (SELECT ... HAVING qty > frac * correlated total)``
    shape turned into a countable semi-join (Q20 gates suppliers on a
    correlated availability threshold; this dataset's analogue gates on
    shipped-share — its uniform supplier mix caps any share near 25%, so
    the default gate is a >1/8 share).  Quantities round half-up to exact
    int64 on both engines, and the share test is the cross-multiplied
    ``share_den*qty > total`` — no float division anywhere, so the hash
    cannot be tripped.

    Scale shape: per-batch (partkey, suppkey, qty) partials make the first
    exchange pair-distinct-per-batch, keyed on partkey; each part group
    resolves its total locally and emits only dominating suppkeys; the
    second exchange counts per supplier over that (≤ one row per
    (part, dominator)) set — both groupbys move compressed aggregates,
    never lineitem rows.  NULL partkey / suppkey / quantity rows drop,
    matching the oracle's WHERE and inner joins."""
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )
    sidecar = ray.put(
        _sorted_sidecar(f"{sf_dir}/supplier.parquet", "s_suppkey", "s_name")
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            _pc.and_(
                _pc.and_(
                    _pc.is_valid(batch["l_partkey"]),
                    _pc.is_valid(batch["l_suppkey"]),
                ),
                _pc.is_valid(batch["l_quantity"]),
            )
        )
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64) + 0.5
        ).astype(np.int64)
        o = np.lexsort((sk, pk))
        pk, sk, qty = pk[o], sk[o], qty[o]
        if len(pk):
            newg = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
            gidx = np.nonzero(newg)[0]
            sums = np.add.reduceat(qty, gidx).astype(np.int64)
            pk, sk, qty = pk[gidx], sk[gidx], sums
        return pa.table(
            {
                "l_partkey": pa.array(pk, pa.int64()),
                "l_suppkey": pa.array(sk, pa.int64()),
                "qty": pa.array(qty, pa.int64()),
            }
        )

    def per_part(group: pa.Table) -> pa.Table:
        pk = group["l_partkey"].to_numpy(zero_copy_only=False)
        sk = group["l_suppkey"].to_numpy(zero_copy_only=False)
        qty = group["qty"].to_numpy(zero_copy_only=False)
        o = np.lexsort((sk, pk))
        pk, sk, qty = pk[o], sk[o], qty[o]
        newg = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        gidx = np.nonzero(newg)[0]
        qsum = np.add.reduceat(qty, gidx).astype(np.int64)
        pk, sk = pk[gidx], sk[gidx]
        newp = np.r_[True, pk[1:] != pk[:-1]]
        pidx = np.nonzero(newp)[0]
        totals = np.add.reduceat(qsum, pidx).astype(np.int64)
        tot = np.repeat(totals, np.diff(np.r_[pidx, len(pk)]))
        keep = share_den * qsum > tot  # strict share gate, cross-multiplied
        return pa.table(
            {
                "suppkey": pa.array(sk[keep], pa.int64()),
                "n": pa.array(np.ones(int(keep.sum()), dtype=np.int64), pa.int64()),
            }
        )

    def attach(batch: pa.Table) -> pa.Table:
        keys_sorted, names = ray.get(sidecar)
        sk = batch["suppkey"].to_numpy(zero_copy_only=False)
        pos, found = _probe_sorted(keys_sorted, sk)
        t = batch.filter(pa.array(found))
        return pa.table(
            {
                "suppkey": t["suppkey"],
                "supplier_name": pa.array(names[pos[found]], pa.string()),
                "n_dominated_parts": t["n_dominated_parts"],
            }
        )

    return (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("suppkey")
        .aggregate(Sum("n", alias_name="n_dominated_parts"))
        .map_batches(attach, batch_format="pyarrow")
        .sort(["n_dominated_parts", "suppkey"], descending=[True, False])
        .limit(k)
    )


def nation_year_profit(
    sf_dir: str, name_like: str = "red", n_buckets: int = 1024
) -> "rd.Dataset":
    """TPC-H-Q9-shaped product-profit report: for parts whose name contains
    ``name_like`` (Q9's ``p_name LIKE '%green%'`` filter), the pseudo-profit
    ``sum(l_extendedprice*(1-l_discount) − p_retailprice*l_quantity)`` per
    (supplier nation, order year) — the five-way star+fact-fact join
    (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈ orders) that completes the
    classic-join suite next to Q7 (``nation_trade_volume``).  This schema
    has no partsupp, so part retail price stands in for Q9's supplycost —
    the join/aggregation SHAPE is identical.  All money in exact int64
    cents; NULL-key rows drop like the oracle's inner joins; rows with a
    NULL price/discount/quantity are excluded from the profit sum on both
    engines (their SQL profit expression is NULL, and sum skips NULL
    addends).

    Scale shape: part (filtered, catalog-sized), supplier and nation
    broadcast as sorted sidecars; lineitem pre-aggregates per batch to
    (orderkey, nationkey, profit_cents) partials — the ONLY fact-fact
    exchange is the orderkey-bucket co-partition against the (orderkey,
    year) projection of orders (one row per order), then a
    |nations×years|-bounded final groupby."""
    import pyarrow.parquet as _pq

    # supplier rows with a NULL nationkey cannot reach the nation join
    s_sorted, s_nat = _sorted_sidecar(
        f"{sf_dir}/supplier.parquet", "s_suppkey", "s_nationkey",
        drop_null_vals=True,
    )
    n_sorted, n_names = _sorted_sidecar(
        f"{sf_dir}/nation.parquet", "n_nationkey", "n_name"
    )

    part = _pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"])
    pm = _pc.match_substring(_pc.fill_null(part["p_name"], ""), name_like)
    part = part.filter(
        _pc.and_(
            _pc.and_(_pc.is_valid(part["p_partkey"]), pm),
            _pc.is_valid(part["p_retailprice"]),
        )
    )
    pkeys = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    po = np.argsort(pkeys)
    p_sorted = pkeys[po]
    p_cents = _cents(part["p_retailprice"])[po]

    sidecar = ray.put((s_sorted, s_nat, n_sorted, n_names, p_sorted, p_cents))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount", "l_quantity"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        ss, sn, _, _, ps, pc_ = ray.get(sidecar)
        m = batch
        for c in ("l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount", "l_quantity"):
            m = m.filter(_pc.is_valid(m[c]))
        ok = m["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = m["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = m["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # part filter probe (dangling/unmatched parts drop: inner join)
        pi, phit = _probe_sorted(ps, pk)
        si, shit = _probe_sorted(ss, sk)
        keep = phit & shit
        ok, pk, sk = ok[keep], pk[keep], sk[keep]
        retail = pc_[pi[keep]]
        natk = sn[si[keep]]
        price = m["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = m["l_discount"].to_numpy(zero_copy_only=False)[keep]
        qty = m["l_quantity"].to_numpy(zero_copy_only=False)[keep]
        profit = (
            _cents_np(price * (1.0 - disc))
            - retail * np.floor(qty + 0.5).astype(np.int64)
        )
        # per-batch pre-agg to (orderkey, nationkey) partials
        o = np.lexsort((natk, ok))
        ok, natk, profit = ok[o], natk[o], profit[o]
        if len(ok):
            newg = np.r_[True, (ok[1:] != ok[:-1]) | (natk[1:] != natk[:-1])]
            gidx = np.nonzero(newg)[0]
            profit = np.add.reduceat(profit, gidx).astype(np.int64)
            ok, natk = ok[gidx], natk[gidx]
        return pa.table(
            {
                "bucket": pa.array(ok % n_buckets, pa.int64()),
                "okey": pa.array(ok, pa.int64()),
                "natkey": pa.array(natk, pa.int64()),
                "cents": pa.array(profit, pa.int64()),
                "is_order": pa.array(np.zeros(len(ok), dtype=bool)),
                "year": pa.array(np.zeros(len(ok), dtype=np.int64), pa.int64()),
            }
        )

    def ord_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            _pc.and_(_pc.is_valid(batch["o_orderkey"]), _pc.is_valid(batch["o_orderdate"]))
        )
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        yr = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        n = len(ok)
        return pa.table(
            {
                "bucket": pa.array(ok % n_buckets, pa.int64()),
                "okey": pa.array(ok, pa.int64()),
                "natkey": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "cents": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "is_order": pa.array(np.ones(n, dtype=bool)),
                "year": pa.array(yr, pa.int64()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        is_ord = group["is_order"].to_numpy(zero_copy_only=False).astype(bool)
        okeys = group["okey"].to_numpy(zero_copy_only=False)
        years = group["year"].to_numpy(zero_copy_only=False)
        osort = np.argsort(okeys[is_ord], kind="stable")
        o_keys = okeys[is_ord][osort]
        o_years = years[is_ord][osort]
        lk = okeys[~is_ord]
        idx, hit = _probe_sorted(o_keys, lk)
        natk = group["natkey"].to_numpy(zero_copy_only=False)[~is_ord][hit]
        cents = group["cents"].to_numpy(zero_copy_only=False)[~is_ord][hit]
        yr = o_years[idx[hit]]
        key = natk * 10000 + yr
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cents)
        return pa.table(
            {
                "natkey": pa.array(uk // 10000, pa.int64()),
                "year": pa.array(uk % 10000, pa.int64()),
                "cents": pa.array(sums, pa.int64()),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        _, _, ns, nn, _, _ = ray.get(sidecar)
        nk = batch["natkey"].to_numpy(zero_copy_only=False)
        pos, hit = _probe_sorted(ns, nk)
        t = batch.filter(pa.array(hit))  # dangling nationkeys: inner join
        return pa.table(
            {
                "nation": pa.array(nn[pos[hit]], pa.string()),
                "o_year": t["year"],
                "profit": _pc.divide(_pc.cast(t["cents"], pa.float64()), 100.0),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    return (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(orders.map_batches(ord_rows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["natkey", "year"])
        .aggregate(Sum("cents", alias_name="cents"))
        .map_batches(finalize, batch_format="pyarrow")
        .sort(["nation", "o_year"], descending=[False, True])
    )
