"""Flat static 2-D spatial index (kdbush algorithm, from the published
design: mourner/kdbush — implemented from scratch).

Coordinates are stored in float32 (matching the reference cluster index's
Float32Array trees, `src/cluster-tile-index.ts:323`); query traversal order is
part of the clustering contract (greedy cluster formation consumes neighbor
lists in index order), so `range`/`within` reproduce the canonical recursive
kd-sort + stack traversal exactly.
"""

from __future__ import annotations

import math

import numpy as np


class KDBush:
    def __init__(self, num_items: int, node_size: int = 64):
        self.node_size = node_size
        self.num_items = num_items
        self.ids = np.empty(num_items, dtype=np.int32)
        self.coords = np.empty(num_items * 2, dtype=np.float32)
        self._pos = 0

    def add(self, x: float, y: float) -> None:
        i = self._pos
        self.ids[i] = i
        self.coords[2 * i] = x  # float32 narrowing
        self.coords[2 * i + 1] = y
        self._pos += 1

    def finish(self) -> None:
        if self._pos != self.num_items:
            raise ValueError("not all items added")
        self._sort(0, self.num_items - 1, 0)

    # -- recursive kd-sort ---------------------------------------------------

    def _sort(self, left: int, right: int, axis: int) -> None:
        stack = [(left, right, axis)]
        while stack:
            left, right, axis = stack.pop()
            if right - left <= self.node_size:
                continue
            m = (left + right) >> 1
            self._select(m, left, right, axis)
            stack.append((left, m - 1, 1 - axis))
            stack.append((m + 1, right, 1 - axis))

    def _select(self, k: int, left: int, right: int, axis: int) -> None:
        # Floyd-Rivest selection — the constants and float arithmetic pin the
        # exact final permutation (which downstream consumers observe).
        coords = self.coords
        while right > left:
            if right - left > 600:
                n = right - left + 1
                m = k - left + 1
                z = math.log(n)
                s = 0.5 * math.exp(2 * z / 3)
                sd = 0.5 * math.sqrt(z * s * (n - s) / n) * (-1 if m - n / 2 < 0 else 1)
                new_left = max(left, int(math.floor(k - m * s / n + sd)))
                new_right = min(right, int(math.floor(k + (n - m) * s / n + sd)))
                self._select(k, new_left, new_right, axis)

            t = coords[2 * k + axis]
            i = left
            j = right

            self._swap(left, k)
            if coords[2 * right + axis] > t:
                self._swap(left, right)

            while True:  # do-while: the first exchange always happens
                self._swap(i, j)
                i += 1
                j -= 1
                while coords[2 * i + axis] < t:
                    i += 1
                while coords[2 * j + axis] > t:
                    j -= 1
                if i >= j:
                    break

            if coords[2 * left + axis] == t:
                self._swap(left, j)
            else:
                j += 1
                self._swap(j, right)

            if j <= k:
                left = j + 1
            if k <= j:
                right = j - 1

    def _swap(self, i: int, j: int) -> None:
        ids = self.ids
        coords = self.coords
        ids[i], ids[j] = ids[j], ids[i]
        coords[2 * i], coords[2 * j] = coords[2 * j], coords[2 * i]
        coords[2 * i + 1], coords[2 * j + 1] = coords[2 * j + 1], coords[2 * i + 1]

    # -- queries -------------------------------------------------------------

    def range(self, min_x: float, min_y: float, max_x: float, max_y: float) -> list[int]:
        ids = self.ids
        coords = self.coords
        result: list[int] = []
        stack = [(0, self.num_items - 1, 0)]
        while stack:
            left, right, axis = stack.pop()
            if right - left <= self.node_size:
                for i in range(left, right + 1):
                    x = coords[2 * i]
                    y = coords[2 * i + 1]
                    if min_x <= x <= max_x and min_y <= y <= max_y:
                        result.append(int(ids[i]))
                continue
            m = (left + right) >> 1
            x = coords[2 * m]
            y = coords[2 * m + 1]
            if min_x <= x <= max_x and min_y <= y <= max_y:
                result.append(int(ids[m]))
            if (min_x <= x) if axis == 0 else (min_y <= y):
                stack.append((left, m - 1, 1 - axis))
            if (max_x >= x) if axis == 0 else (max_y >= y):
                stack.append((m + 1, right, 1 - axis))
        return result

    def within(self, qx: float, qy: float, r: float) -> list[int]:
        ids = self.ids
        coords = self.coords
        result: list[int] = []
        r2 = r * r
        stack = [(0, self.num_items - 1, 0)]
        while stack:
            left, right, axis = stack.pop()
            if right - left <= self.node_size:
                for i in range(left, right + 1):
                    if _sq_dist(coords[2 * i], coords[2 * i + 1], qx, qy) <= r2:
                        result.append(int(ids[i]))
                continue
            m = (left + right) >> 1
            x = coords[2 * m]
            y = coords[2 * m + 1]
            if _sq_dist(x, y, qx, qy) <= r2:
                result.append(int(ids[m]))
            if (qx - r <= x) if axis == 0 else (qy - r <= y):
                stack.append((left, m - 1, 1 - axis))
            if (qx + r >= x) if axis == 0 else (qy + r >= y):
                stack.append((m + 1, right, 1 - axis))
        return result


def _sq_dist(ax: float, ay: float, bx: float, by: float) -> float:
    dx = float(ax) - bx
    dy = float(ay) - by
    return dx * dx + dy * dy
