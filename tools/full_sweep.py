#!/usr/bin/env python
"""Full oracle-parity sweep artifact (VERDICT r4 #2): run EVERY
oracle-backed catalog query against DuckDB on identical parquet and
check in the per-query result, so the round-over-round hard signal
covers the whole inventory, not just the driver's 50-query prefix.

Protocol matches the verification driver: a FOREIGN plain SparkSession
(none of the repo's confs), columns sorted by name, rows sorted by all
columns, exact equality for non-floats and 1e-9 tolerance for floats.

Usage:
    python tools/full_sweep.py [out.json]
Env:
    SWEEP_SF_DIR  parquet dir (default /root/testdata/sf0.1)

Writes {query: {rows, oracle_rows, schema_match, hash_match}} plus a
summary header, one JSON document, sorted keys — re-run and diff.
"""

from __future__ import annotations

import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(pdf):
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pdf[c].dtype == object and len(pdf[c].dropna()) and isinstance(
            pdf[c].dropna().iloc[0], (datetime.date, datetime.datetime)
        ):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns), na_position="first").reset_index(
        drop=True
    )


def values_match(s, o) -> bool:
    import pandas as pd

    for c in s.columns:
        if pd.api.types.is_float_dtype(s[c]):
            if not (abs(s[c].fillna(-9e99) - o[c].fillna(-9e99)) < 1e-9).all():
                return False
        elif s[c].dtype == object:
            if not (s[c].fillna("@n@") == o[c].fillna("@n@")).all():
                return False
        elif not s[c].equals(o[c]):
            return False
    return True


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SWEEP.json"
    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.1")

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("full-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    results: dict[str, dict] = {}
    bad = 0
    for name in sorted(osql):
        try:
            s = norm(qs[name](spark, sf_dir).toPandas())
            o = norm(con.execute(osql[name]).df())
            schema_match = list(s.columns) == list(o.columns)
            rows_match = len(s) == len(o)
            hash_match = (
                schema_match and rows_match and values_match(s, o)
            )
            results[name] = {
                "rows": len(s),
                "oracle_rows": len(o),
                "schema_match": schema_match,
                "hash_match": hash_match,
            }
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
        if not results[name].get("hash_match"):
            bad += 1
            print(f"MISMATCH {name}: {results[name]}", file=sys.stderr)
    doc = {
        "_summary": {
            "sf_dir": sf_dir,
            "oracle_queries": len(osql),
            "registered_queries": len(qs),
            "mismatches": bad,
        },
        **results,
    }
    try:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:  # keep the stdout result even if FS is RO
        print(f"# artifact write failed: {exc}", file=sys.stderr)
    print(json.dumps(doc["_summary"]))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
