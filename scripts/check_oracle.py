#!/usr/bin/env python3
"""Dev-only self-check replicating the driver's correctness gate.

NOT part of the engine (the library is pure Scala/Spark). This mirrors what
the driver does with Verify.scala output: run each oracle SQL in DuckDB over
the same parquet tables, then compare against the Spark result parquet —
columns sorted by name, rows sorted, values compared.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr → bit-exact compare
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_key(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: spark result missing")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        sk, dk = frame_key(spark_df), frame_key(duck_df)
        scols = sorted(spark_df.columns)
        dcols = sorted(duck_df.columns)
        if scols == dcols:
            sd = spark_df.reindex(scols, axis=1).dtypes
            dd = duck_df.reindex(dcols, axis=1).dtypes
            for c in scols:
                if str(sd[c]) != str(dd[c]):
                    print(f"WARN {name}: dtype of '{c}': "
                          f"spark={sd[c]} vs duck={dd[c]}")
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            n_fail += 1
        elif len(sk) != len(dk):
            print(f"FAIL {name}: rows {len(sk)} vs {len(dk)}")
            n_fail += 1
        elif sk != dk:
            diff = [i for i, (a, b) in enumerate(zip(sk, dk)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {diff}")
            for i in diff[:2]:
                print(f"  spark: {sk[i]}")
                print(f"  duck : {dk[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sk)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
