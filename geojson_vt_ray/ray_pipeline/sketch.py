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
