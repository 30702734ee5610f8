"""Local replica of the driver's correctness gate: run each queries() entry
on Spark at a given SF and compare against oracle_sql() via DuckDB —
row count, schema (column names), and order-insensitive value equality.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].astype(np.float64)
        elif pdf[c].dtype.kind in "iu":
            pdf[c] = pdf[c].astype(np.int64)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from deepgraph_spark.session import get_spark

    sys.path.insert(0, ROOT)
    import importlib.util

    spec = importlib.util.spec_from_file_location("spark_entry", os.path.join(ROOT, "__spark_entry__.py"))
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    from deepgraph_spark.entry_queries import EXTRA_QUERIES, ORACLES

    # graded surface first (driver order), then the local-only overflow gates
    # (entry_mod.oracle_sql() is driver-facing and exposes only the graded
    # surface; the full oracle map lives in entry_queries.ORACLES)
    qs = dict(entry_mod.queries())
    qs.update(EXTRA_QUERIES)
    oracles = dict(ORACLES)
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            results[name] = f"SPARK-FAIL {type(ex).__name__}: {str(ex)[:200]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(got)} rows)"
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as ex:
            results[name] = f"ORACLE-FAIL {type(ex).__name__}: {str(ex)[:200]}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT {len(got)} vs {len(exp)}"
            continue
        if sorted(got.columns) != sorted(exp.columns):
            results[name] = f"SCHEMA {sorted(got.columns)} vs {sorted(exp.columns)}"
            continue
        g, e = canon(got), canon(exp)
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            results[name] = f"MATCH ({len(got)} rows)"
        except AssertionError as ex:
            # retry with tolerance to distinguish fp-noise from real bugs
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, rtol=1e-9, atol=1e-9)
                results[name] = f"MATCH-APPROX ({len(got)} rows)"
            except AssertionError:
                results[name] = f"VALUES-DIFF: {str(ex)[:200]}"
    width = max(len(k) for k in results)
    fails = 0
    for k, v in results.items():
        print(f"{k:<{width}}  {v}")
        if not (v.startswith("MATCH") or v.startswith("rows-only")):
            fails += 1
    print(f"\n{len(results) - fails}/{len(results)} OK")
    if json_out:
        import json
        import subprocess

        head = subprocess.run(
            ["git", "-C", ROOT, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip()
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "git_head": head,
                    "n_ok": len(results) - fails,
                    "n_total": len(results),
                    "results": results,
                },
                f,
                indent=1,
            )
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
