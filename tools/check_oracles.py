"""Local driver-simulation: run every queries() entry and its oracle_sql()
side by side, compare row count, column names, and order-insensitive
values. Usage: python tools/check_oracles.py [sf_dir] [query ...]"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return pdf


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from parq_tools_spark import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, rows_only = [], []
    results: dict = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            results[name] = {"status": "fail-spark", "rows": None}
            print(f"[FAIL-spark] {name}: {str(e)[:200]}")
            continue
        results[name] = {"status": "pending", "rows": len(spdf)}
        if name not in oracles:
            rows_only.append((name, len(spdf)))
            results[name]["status"] = "rows-only"
            print(f"[rows-only] {name}: {len(spdf)} rows")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            results[name]["status"] = "fail-oracle"
            print(f"[FAIL-oracle] {name}: {str(e)[:200]}")
            continue
        if len(spdf) != len(opdf):
            failures.append((name, f"rowcount {len(spdf)} vs {len(opdf)}"))
            results[name]["status"] = "fail-rows"
            print(f"[FAIL-rows] {name}: {len(spdf)} vs {len(opdf)}")
            continue
        if sorted(spdf.columns) != sorted(opdf.columns):
            failures.append(
                (name, f"columns {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
            )
            results[name]["status"] = "fail-cols"
            print(f"[FAIL-cols] {name}")
            continue
        a, b = normalize(spdf), normalize(opdf)
        try:
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=True
            )
            results[name]["status"] = "ok"
            print(f"[ok] {name}: {len(spdf)} rows")
        except AssertionError as e:
            # find first differing cell for the report
            diff_cols = []
            for c in a.columns:
                if not a[c].equals(b[c]):
                    mism = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
                    idx = mism.idxmax()
                    diff_cols.append((c, a[c][idx], b[c][idx]))
            failures.append((name, f"values differ: {diff_cols[:3]}"))
            results[name]["status"] = "fail-values"
            print(f"[FAIL-values] {name}: {diff_cols[:3]}")
    print(f"\n{len(failures)} failures, {len(rows_only)} rows-only")
    out_path = os.environ.get("ORACLE_SWEEP_OUT")
    if out_path:
        import json
        import time

        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "when": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    "n_queries": len(results),
                    "n_failures": len(failures),
                    "n_rows_only": len(rows_only),
                    "results": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"sweep record -> {out_path}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
