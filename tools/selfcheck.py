"""Mimic the driver's correctness gate locally: run each queries() entry and
its oracle_sql() on the same sf dir, compare row-count + schema + an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns, floats hashed by exact repr).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    for col in df.columns:
        for v in df[col]:
            h.update(repr(v).encode())
        h.update(b"|")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={sorted(got.columns)}")
            continue
        want = con.execute(oracles[name]).fetchdf()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        gh = value_hash(got) if ok_rows and ok_cols else None
        wh = value_hash(want) if ok_rows and ok_cols else None
        status = "OK" if (ok_rows and ok_cols and gh == wh) else "MISMATCH"
        if status != "OK":
            failures += 1
            print(f"[{status}] {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols}")
            if ok_rows and ok_cols:
                # show first differing row for debugging
                g = got.reindex(sorted(got.columns), axis=1).sort_values(
                    sorted(got.columns), kind="mergesort"
                ).reset_index(drop=True)
                w = want.reindex(sorted(want.columns), axis=1).sort_values(
                    sorted(want.columns), kind="mergesort"
                ).reset_index(drop=True)
                for i in range(len(g)):
                    if not g.iloc[i].equals(w.iloc[i]):
                        print("  first diff row", i)
                        print("  got :", g.iloc[i].to_dict())
                        print("  want:", w.iloc[i].to_dict())
                        break
        else:
            print(f"[OK] {name}: {len(got)} rows")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
