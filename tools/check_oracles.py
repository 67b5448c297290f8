"""Local stand-in for the driver's correctness gate: run each queries()
entry and its oracle_sql() on the same sf dir, compare row count, schema,
and order-insensitive values."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if hasattr(res, "to_pandas"):
        try:
            return res.to_pandas()
        except TypeError:
            pass
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None):
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, log_to_driver=False)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(ray_df)} rows")
            continue
        try:
            duck_df = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        if list(ray_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(ray_df.columns)} vs {list(duck_df.columns)}")
            failures += 1
        elif len(ray_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(ray_df)} vs {len(duck_df)}")
            failures += 1
        elif not ray_df.equals(duck_df):
            diff = (ray_df != duck_df).any(axis=1)
            n_bad = int(diff.sum())
            print(f"FAIL {name}: {n_bad}/{len(ray_df)} rows differ")
            bad_idx = diff[diff].index[:3]
            for i in bad_idx:
                print("  ray :", ray_df.loc[i].to_dict())
                print("  duck:", duck_df.loc[i].to_dict())
            failures += 1
        else:
            print(f"OK   {name}: {len(ray_df)} rows")
    print("failures:", failures)
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    raise SystemExit(1 if main(sf, only) else 0)
