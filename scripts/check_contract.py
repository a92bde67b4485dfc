"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB at sf0.01; compare row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from video_duplicate_finder_python_spark import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_digest(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.blake2b(digest_size=12)
    for _, row in df.iterrows():
        for v in row:
            if isinstance(v, float):
                h.update(f"{v!r}".encode())
            else:
                h.update(str(v).encode())
            h.update(b"|")
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = []
    for name, fn in queries.items():
        t0 = time.monotonic()
        sdf = fn(spark, SF_DIR).toPandas()
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(sdf):6d} rows  ({t_spark:5.1f}s)")
            continue
        t0 = time.monotonic()
        ddf = con.sql(oracles[name]).df()
        t_duck = time.monotonic() - t0
        problems = []
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if not problems:
            a, b = normalize(sdf), normalize(ddf)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            except AssertionError as e:
                problems.append(f"values differ: {str(e)[:300]}")
                if value_digest(a) != value_digest(b):
                    problems.append("digest mismatch")
        status = "OK " if not problems else "FAIL"
        print(f"  {name:28s} {status} {len(sdf):6d} rows  (spark {t_spark:5.1f}s duck {t_duck:5.1f}s)")
        for p in problems:
            print(f"      !! {p}")
            failures.append((name, p))

    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        sys.exit(1)
    print("all queries match")
    spark.stop()


if __name__ == "__main__":
    main()
