"""Mergeable deterministic quantile sketch (Munro–Paterson / MRL-style
compactor stack) — the approximate, bounded-memory counterpart of the
exact per-group quantiles in `entry_queries.q_doc_length_quantiles`.

At 100 TB an exact quantile needs a full sort (all-to-all). This sketch
is the scale path: each batch folds into a compactor stack of ~k·log(n/k)
stored values; partial sketches serialize as tiny (value, weight) rows;
one bounded-size final merge answers any quantile with deterministic
rank error. No randomness (classical MRL even-index compaction, not
KLL's coin-flip), so identical inputs give identical sketches.

Structure: level h holds a buffer of values each representing 2^h input
points. When a buffer exceeds capacity k it is sorted and every second
element (even indices) is promoted to level h+1 — one compaction
perturbs any rank by at most 2^h, giving the standard
O(log²(n/k)/k · n) worst-case rank error; the accuracy test pins an
empirical bound.

Reference: none in geojson-vt (no sketch surface); this belongs to the
training-data-pipeline extension alongside the HLL distinct sketch
(`events.py::hll_users_window`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


class QuantileSketch:
    """Deterministic compactor stack. Not thread-safe; numpy float64."""

    def __init__(self, k: int = 256) -> None:
        if k < 4 or k % 2:
            raise ValueError("k must be an even integer >= 4")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0

    def add(self, values: np.ndarray) -> "QuantileSketch":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        self.n += len(values)
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compact()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, buf in enumerate(other.levels):
            self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self._compact()
        return self

    def _compact(self) -> None:
        h = 0
        while h < len(self.levels):
            buf = self.levels[h]
            if len(buf) > self.k:
                buf = np.sort(buf, kind="stable")
                # only an even count compacts (weight is conserved: L items
                # of weight w -> L/2 items of weight 2w); an odd buffer
                # retains its max at this level — deterministic
                if len(buf) % 2:
                    keep, buf = buf[-1:], buf[:-1]
                else:
                    keep = np.empty(0, dtype=np.float64)
                promote = buf[::2]  # even indices — deterministic
                self.levels[h] = keep
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[h + 1] = np.concatenate([self.levels[h + 1], promote])
            h += 1

    # ---- (value, weight) row codec: how partials travel between stages
    def to_rows(self) -> tuple[np.ndarray, np.ndarray]:
        vals = [buf for buf in self.levels if len(buf)]
        wts = [
            np.full(len(buf), np.int64(1) << np.int64(h), dtype=np.int64)
            for h, buf in enumerate(self.levels)
            if len(buf)
        ]
        if not vals:
            return np.empty(0, dtype=np.float64), np.empty(0, dtype=np.int64)
        return np.concatenate(vals), np.concatenate(wts)

    @classmethod
    def from_rows(
        cls, values: np.ndarray, weights: np.ndarray, k: int = 256
    ) -> "QuantileSketch":
        sk = cls(k)
        weights = np.asarray(weights, dtype=np.int64)
        values = np.asarray(values, dtype=np.float64)
        max_h = 0 if len(weights) == 0 else int(np.max(np.log2(weights)))
        while len(sk.levels) <= max_h:
            sk.levels.append(np.empty(0, dtype=np.float64))
        for h in range(max_h + 1):
            m = weights == (np.int64(1) << np.int64(h))
            if m.any():
                sk.levels[h] = values[m].copy()
        sk.n = int(weights.sum())
        sk._compact()
        return sk

    def query(self, q: float) -> float:
        """Value whose weighted rank is closest to q·n (q ∈ [0, 1])."""
        vals, wts = self.to_rows()
        if len(vals) == 0:
            return float("nan")
        order = np.argsort(vals, kind="stable")
        vals = vals[order]
        cum = np.cumsum(wts[order].astype(np.float64))
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(vals[min(idx, len(vals) - 1)])


def quantile_sketch_column(
    ds: "ray.data.Dataset",
    column: str,
    qs: list[float],
    k: int = 256,
) -> "ray.data.Dataset":
    """Distributed quantile estimation: per-batch compactor stacks emit
    bounded (value, weight) partial rows (~k·log(batch/k) each — never
    the data), and ONE tiny reducer merges them. No full sort, no
    all-to-all: the only shuffle is the O(sketch-size) partial rows."""

    def partial(batch: pa.Table) -> pa.Table:
        sk = QuantileSketch(k).add(batch.column(column).to_numpy(zero_copy_only=False))
        vals, wts = sk.to_rows()
        return pa.table({"sk_value": pa.array(vals), "sk_weight": pa.array(wts)})

    partials = ds.select_columns([column]).map_batches(partial, batch_format="pyarrow")

    def final(batch: pa.Table) -> pa.Table:
        sk = QuantileSketch.from_rows(
            batch.column("sk_value").to_numpy(),
            batch.column("sk_weight").to_numpy(),
            k,
        )
        return pa.table(
            {
                "q": pa.array(np.asarray(qs, dtype=np.float64)),
                "value": pa.array([sk.query(q) for q in qs], pa.float64()),
                "n": pa.array([sk.n] * len(qs), pa.int64()),
            }
        )

    # bounded data: num_batches × k·log rows — one reducer task is the point
    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def _range_histograms(
    ds: "ray.data.Dataset",
    column: str,
    ranges: list[tuple[float, float, bool]],
    edges_per_range: list[np.ndarray],
    n_slots: int,
) -> np.ndarray:
    """One full pass: per-batch histogram counts for every active
    (lo, hi, inclusive_hi) range against its driver-computed internal
    edge array, reduced through a BOUNDED groupby (≤ len(ranges)·n_slots
    slots) so only tiny (slot, cnt) rows shuffle. Binning is
    ``searchsorted(edges, v, 'right')`` — bin b is exactly
    [edges[b-1], edges[b]), the SAME float comparisons the next round's
    range-membership test applies, so boundary values can never be
    counted in one round and excluded in the next. Returns int64 counts
    of shape (len(ranges), n_slots)."""
    nr = len(ranges)
    los = np.array([r[0] for r in ranges], dtype=np.float64)
    his = np.array([r[1] for r in ranges], dtype=np.float64)
    incl = np.array([r[2] for r in ranges], dtype=bool)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
        slots: list[np.ndarray] = []
        cnts: list[np.ndarray] = []
        for i in range(nr):
            lo, hi = los[i], his[i]
            m = (v >= lo) & ((v < hi) | (incl[i] & (v == hi)))
            if not m.any():
                continue
            b = np.searchsorted(edges_per_range[i], v[m], side="right")
            s, c = np.unique(i * n_slots + b, return_counts=True)
            slots.append(s)
            cnts.append(c)
        if not slots:
            return pa.table(
                {"slot": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "slot": pa.array(np.concatenate(slots)),
                "cnt": pa.array(np.concatenate(cnts).astype(np.int64)),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        """Map-only tree-reduce level: sum (slot, cnt) partials within
        each rebatched window — no shuffle; the stream rebatcher pools
        many blocks' partials into one task."""
        s = batch.column("slot").to_numpy()
        c = batch.column("cnt").to_numpy()
        u, inv = np.unique(s, return_inverse=True)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(acc, inv, c)
        return pa.table({"slot": pa.array(u), "cnt": pa.array(acc)})

    rows = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=1 << 20)
        .take_all()
    )
    out = np.zeros(nr * n_slots, dtype=np.int64)
    for r in rows:
        out[int(r["slot"])] += int(r["cnt"])
    return out.reshape(nr, n_slots)


def exact_quantiles_global(
    ds: "ray.data.Dataset",
    column: str,
    qs: list[float],
    n_bins: int = 4096,
    gather_threshold: int = 1 << 16,
    max_rounds: int = 6,
) -> "ray.data.Dataset":
    """EXACT global quantiles (quantile_cont semantics) without a full
    sort: distributed selection by iterative histogram refinement.

    A global exact quantile is a selection problem — quantile_cont(q)
    interpolates the order statistics at floor/ceil of (n-1)·q. Instead
    of an all-to-all sort, each needed rank keeps a candidate value
    range; every round ONE streaming pass histograms the column into
    n_bins sub-bins per active range (bounded (slot, cnt) rows are all
    that shuffles), the driver locates the rank's bin and narrows the
    range by n_bins×. When a range holds ≤ gather_threshold values, one
    final filtered pass pulls just those candidates and reads the order
    statistic off a local sort. ceil(log_{n_bins}(n)) + 2 passes total
    (~3 passes for 10^12 rows at the default 4096 bins); each pass reads
    only the pruned column and ships kilobytes to the driver.

    Exactness: the selected values are actual data values, and the final
    interpolation uses the same symmetric lerp DuckDB's quantile_cont
    evaluates (see `entry_queries.q_doc_length_quantiles`) — bit-equal
    results. Massive ties are handled by the zero-width range fast path
    (the order statistic is the range itself).

    This is the exact twin of `quantile_sketch_column` (same (q, value,
    n) output schema): the sketch is one pass with deterministic rank
    error; this is a few passes for exactness.
    """
    from ray.data.aggregate import Count, Max, Min

    stats = ds.select_columns([column]).aggregate(
        Min(column), Max(column), Count()
    )
    n = int(stats["count()"])
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "q": pa.array(np.asarray(qs, np.float64)),
                    "value": pa.array([float("nan")] * len(qs), pa.float64()),
                    "n": pa.array([0] * len(qs), pa.int64()),
                }
            )
        )
    vmin = float(stats[f"min({column})"])
    vmax = float(stats[f"max({column})"])

    # 0-based order-statistic ranks needed across all quantiles
    need: dict[int, float | None] = {}
    for q in qs:
        idx = (n - 1) * q
        need[int(np.floor(idx))] = None
        need[int(np.ceil(idx))] = None

    # per-rank state: (lo, hi, inclusive_hi, count_below_lo, count_in_range)
    state = {r: [vmin, vmax, True, 0, n] for r in need}

    for _ in range(max_rounds):
        active = [
            r
            for r, (lo, hi, _, _, cnt) in state.items()
            if cnt > gather_threshold and hi > lo
        ]
        if not active:
            break
        # internal edges strictly inside (lo, hi); an empty array means no
        # representable double lies between them — candidates are exactly
        # {lo} (or {hi} when inclusive), split by a single edge at hi.
        # Identical ranges (all of round 1; adjacent ranks often after)
        # are histogrammed ONCE and shared.
        edges_list = []
        uniq_ranges: list[tuple] = []
        uniq_edges: list[np.ndarray] = []
        slot_of: dict[tuple, int] = {}
        range_slot: list[int] = []
        for r in active:
            lo, hi, inclusive, *_ = state[r]
            key = (lo, hi, inclusive)
            if key not in slot_of:
                raw = lo + np.arange(1, n_bins, dtype=np.float64) * (
                    (hi - lo) / n_bins
                )
                internal = np.unique(raw[(raw > lo) & (raw < hi)])
                slot_of[key] = len(uniq_ranges)
                uniq_ranges.append(key)
                uniq_edges.append(internal if len(internal) else np.array([hi]))
            range_slot.append(slot_of[key])
        uhist = _range_histograms(ds, column, uniq_ranges, uniq_edges, n_bins + 1)
        hist = uhist[range_slot]
        edges_list = [uniq_edges[s] for s in range_slot]
        for i, r in enumerate(active):
            lo, hi, inclusive, below, _ = state[r]
            edges = edges_list[i]
            nb = len(edges) + 1
            cum = np.cumsum(hist[i][:nb])
            local_rank = r - below
            b = int(np.searchsorted(cum, local_rank, side="right"))
            if len(edges) == 1 and edges[0] == hi:
                # adjacent-doubles fast path: bin 0 is exactly {lo},
                # bin 1 exactly {hi}
                val = lo if b == 0 else hi
                state[r] = [val, val, True, below, 0]
                need[r] = val
                continue
            new_lo = lo if b == 0 else float(edges[b - 1])
            new_hi = float(edges[b]) if b < len(edges) else hi
            state[r] = [
                new_lo,
                new_hi,
                inclusive and b == nb - 1,
                below + (int(cum[b - 1]) if b > 0 else 0),
                int(hist[i][b]),
            ]
            if new_hi <= new_lo:
                need[r] = new_lo

    gather = [
        (r, s) for r, s in state.items() if need[r] is None and not s[1] <= s[0]
    ]
    for r, (lo, hi, *_rest) in list(state.items()):
        if need[r] is None and hi <= lo:
            need[r] = lo
    if gather:
        los = np.array([s[0] for _, s in gather])
        his = np.array([s[1] for _, s in gather])
        incl = np.array([s[2] for _, s in gather], dtype=bool)

        def keep(batch: pa.Table) -> pa.Table:
            v = batch.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
            m = np.zeros(len(v), dtype=bool)
            for j in range(len(gather)):
                m |= (v >= los[j]) & ((v < his[j]) | (incl[j] & (v == his[j])))
            return pa.table({"v": pa.array(v[m], pa.float64())})

        cand = np.sort(
            np.concatenate(
                [
                    b["v"]
                    for b in ds.select_columns([column])
                    .map_batches(keep, batch_format="pyarrow")
                    .iter_batches(batch_format="numpy")
                ]
                or [np.array([], np.float64)]
            )
        )
        for j, (r, (lo, hi, inclusive, below, _cnt)) in enumerate(gather):
            m = (cand >= lo) & ((cand < hi) | (inclusive & (cand == hi)))
            need[r] = float(cand[m][r - below])

    def qc(q: float) -> float:
        idx = (n - 1) * q
        lo_r = int(np.floor(idx))
        hi_r = int(np.ceil(idx))
        frac = idx - lo_r
        return need[lo_r] * (1 - frac) + need[hi_r] * frac

    return ray.data.from_arrow(
        pa.table(
            {
                "q": pa.array(np.asarray(qs, np.float64)),
                "value": pa.array([qc(q) for q in qs], pa.float64()),
                "n": pa.array([n] * len(qs), pa.int64()),
            }
        )
    )


class FrequencySketch:
    """Mergeable Misra–Gries heavy-hitter sketch with ≤ k counters.

    Estimates are lower bounds: true_count - err <= est <= true_count,
    where err is the total decrement offset this sketch has applied
    (tracked exactly in `self.offset`; always <= n/(k+1)). Merging sums
    counters then re-compacts to k by subtracting the (k+1)-th largest
    count — the standard mergeable-MG construction, deterministic, so
    partial sketches built per batch combine into one bounded-error
    global sketch without ever shuffling raw occurrences."""

    def __init__(self, k: int = 1024) -> None:
        if k < 1:
            raise ValueError("k >= 1")
        self.k = int(k)
        self.counts: dict[str, int] = {}
        self.n = 0
        self.offset = 0  # exact upper bound on undercounting

    def add_counts(self, items: np.ndarray, counts: np.ndarray) -> "FrequencySketch":
        """Fold exact (item, count) pairs (e.g. a batch's np.unique) in."""
        for it, c in zip(items.tolist(), counts.tolist()):
            self.counts[it] = self.counts.get(it, 0) + int(c)
        self.n += int(counts.sum())
        self._compact()
        return self

    def merge(self, other: "FrequencySketch") -> "FrequencySketch":
        for it, c in other.counts.items():
            self.counts[it] = self.counts.get(it, 0) + c
        self.n += other.n
        self.offset += other.offset
        self._compact()
        return self

    def _compact(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64)
        # subtract the (k+1)-th largest value from every counter
        cut = int(np.partition(vals, -(self.k + 1))[-(self.k + 1)])
        self.offset += cut
        self.counts = {it: c - cut for it, c in self.counts.items() if c > cut}

    def top(self, k_out: int) -> list[tuple[str, int, int]]:
        """(item, est_lower_bound, err) for the k_out largest estimates,
        ties by item ascending; true count ∈ [est, est + err]."""
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k_out]
        return [(it, c, self.offset) for it, c in items]


def heavy_hitter_tokens(
    docs: "ray.data.Dataset",
    k_track: int = 1024,
    k_out: int = 20,
) -> "ray.data.Dataset":
    """Approximate top tokens via per-batch Misra–Gries partials merged
    by ONE bounded reducer — the sketch counterpart of `text.top_tokens`
    (exact). At token cardinalities where the exact groupby's key space
    explodes, this caps state at k_track counters per partial and ships
    only (token, count, offset) rows. Guarantee: any token with true
    frequency > n/(k_track+1) survives, and every reported estimate is
    within the reported `err` of truth (asserted vs exact in tests)."""

    from .text import batch_token_counts

    def partial(batch: pa.Table) -> pa.Table:
        vals, cnts = batch_token_counts(batch)
        sk = FrequencySketch(k_track).add_counts(vals, cnts)
        items = list(sk.counts.items())
        # one null-token MARKER row per partial carries (offset, n) exactly
        # once, so the reducer's sums stay exact even if two partials are
        # byte-identical
        return pa.table(
            {
                "token": pa.array([it for it, _ in items] + [None], pa.string()),
                "cnt": pa.array([c for _, c in items] + [0], type=pa.int64()),
                "offset": pa.array([0] * len(items) + [sk.offset], pa.int64()),
                "n": pa.array([0] * len(items) + [sk.n], pa.int64()),
            }
        )

    partials = docs.select_columns(["text"]).map_batches(partial, batch_format="pyarrow")

    def final(batch: pa.Table) -> pa.Table:
        sk = FrequencySketch(k_track)
        toks = batch.column("token").to_pylist()
        cnts = batch.column("cnt").to_numpy()
        for it, c in zip(toks, cnts.tolist()):
            if it is not None:
                sk.counts[it] = sk.counts.get(it, 0) + int(c)
        sk.offset = int(batch.column("offset").to_numpy().sum())
        sk.n = int(batch.column("n").to_numpy().sum())
        sk._compact()
        rows = sk.top(k_out)
        return pa.table(
            {
                "token": pa.array([r[0] for r in rows], pa.string()),
                "est": pa.array([r[1] for r in rows], type=pa.int64()),
                "err": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )

    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )
