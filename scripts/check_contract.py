"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive value hashes. Usage:

    python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for _, row in pdf.iterrows():
        parts = []
        for c in cols:
            v = row[c]
            if pd.isna(v):
                parts.append("NULL")
            elif isinstance(v, float):
                parts.append(f"{v:.9g}")
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


# Pin of the registered contract size: the driver's correctness file must
# cover EXACTLY this many queries. A silent drop (r4 covered 50 of 52) or an
# unregistered addition fails here before it can fail invisibly driver-side.
EXPECTED_REGISTERED = 54  # round 5: + cdc_wap_publish, cdc_secondary_range_scan


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from gobblin_spark.queries import QUERIES, TABLES, oracle_sqls
    from gobblin_spark.session import get_spark

    if len(QUERIES) != EXPECTED_REGISTERED:
        print(f"[FAIL] registry pin: {len(QUERIES)} registered queries, "
              f"expected {EXPECTED_REGISTERED} — update the pin with intent")
        sys.exit(1)
    unknown = only - set(QUERIES)
    if unknown:
        print(f"[FAIL] unknown query name(s): {sorted(unknown)}")
        sys.exit(1)

    spark = get_spark("contract-check", parallelism=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    sqls = oracle_sqls()
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"[rows] {name}: {len(spdf)} rows (no oracle — "
                  "driver records the weaker rows/schema check)")
            continue
        try:
            opdf = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rows {len(spdf)} vs {len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(f"cols {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
        if not problems and value_hash(spdf) != value_hash(opdf):
            problems.append("value hash mismatch")
            # show a diff sample
            s = spdf.sort_values(sorted(spdf.columns)).reset_index(drop=True)
            o = opdf[spdf.columns].sort_values(sorted(opdf.columns)).reset_index(drop=True)
            for i in range(min(len(s), len(o))):
                if not s.iloc[i].equals(o.iloc[i]):
                    print(f"  first diff row {i}:\n   spark: {s.iloc[i].to_dict()}\n   duck : {o.iloc[i].to_dict()}")
                    break
        if problems:
            print(f"[FAIL] {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"[ OK ] {name}: {len(spdf)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
