"""Comparison helpers for fixture parity.

Integers (tile coordinates, type codes, counts) must match exactly.
Computed doubles (line-metrics fractions) are compared to 1e-12 relative
tolerance: the only permitted slack is last-ulp libm (sin/log) divergence
between V8 and glibc — everything structural is exact.
"""

from __future__ import annotations

import math


def deep_equal(a, b, path="$") -> tuple[bool, str]:
    if isinstance(a, bool) or isinstance(b, bool):
        if a is not b:
            return False, f"{path}: {a!r} != {b!r}"
        return True, ""
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if isinstance(a, int) and isinstance(b, int):
            if a != b:
                return False, f"{path}: {a} != {b}"
            return True, ""
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True, ""
        if fa == fb or math.isclose(fa, fb, rel_tol=1e-12, abs_tol=1e-15):
            return True, ""
        return False, f"{path}: {a!r} != {b!r}"
    if type(a) is not type(b):
        return False, f"{path}: type {type(a).__name__} != {type(b).__name__} ({a!r} vs {b!r})"
    if isinstance(a, dict):
        if set(a) != set(b):
            return False, f"{path}: keys {sorted(map(str, a))} != {sorted(map(str, b))}"
        for k in a:
            ok, msg = deep_equal(a[k], b[k], f"{path}.{k}")
            if not ok:
                return ok, msg
        return True, ""
    if isinstance(a, (list, tuple)):
        if len(a) != len(b):
            return False, f"{path}: len {len(a)} != {len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            ok, msg = deep_equal(x, y, f"{path}[{i}]")
            if not ok:
                return ok, msg
        return True, ""
    if a != b:
        return False, f"{path}: {a!r} != {b!r}"
    return True, ""


def assert_deep_equal(a, b):
    ok, msg = deep_equal(a, b)
    assert ok, msg
