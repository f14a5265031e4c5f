"""Local mimic of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() twin on DuckDB at the given sf dir, compare
row-count + column names + order-insensitive values (rounded)."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from accelerated_intelligent_document_processing_on_aws_spark import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str]):
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            if len(got) == 0 and name != "q_dedup_exact":
                print(f"     WARNING: {name} returned 0 rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"schema {list(g.columns)} vs {list(w.columns)}"))
            print(f"FAIL {name}: schema {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} vs {len(w)}"))
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            # the driver's value hash is dtype-sensitive (int64 vs float64
            # differ even when values match — e.g. DuckDB HUGEINT sums):
            # fail on numeric-kind mismatch before any coerced comparison
            if a.dtype.kind != b.dtype.kind:
                mismatch = f"col {c} dtype {a.dtype} vs {b.dtype} (driver hash would differ)"
                break
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                af = pd.to_numeric(a, errors="coerce")
                bf = pd.to_numeric(b, errors="coerce")
                bad = ~(
                    (af.isna() & bf.isna())
                    | ((af - bf).abs() <= 1e-9 + 1e-9 * bf.abs())
                )
            else:
                bad = a.astype(str) != b.astype(str)
            if bad.any():
                i = bad.idxmax()
                mismatch = f"col {c} row {i}: {a[i]!r} vs {b[i]!r}"
                break
        if mismatch:
            failures.append((name, mismatch))
            print(f"FAIL {name}: {mismatch}")
        else:
            print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    sys.exit(main(sf, only))
