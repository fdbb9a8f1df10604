#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (t2): run graft.Verify
output against DuckDB oracle SQL and compare.

Usage: python3 tools/oracle_check.py <sfdir> <verify_out_dir>

Mirrors the driver protocol described in the builder prompt: for each query,
load the Spark parquet result and the DuckDB result of oracle_sql.json's SQL
over views named after the parquet tables, sort columns by name, stringify
values, and compare row-by-row.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-ish canonicalization: stable shortest repr
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def rows_of(rel):
    return [tuple(canon(v) for v in row) for row in rel]


def types_compatible(spark_t, duck_t):
    """True when the Spark-parquet column type and the DuckDB oracle result
    type render identically under the driver's typed hasher.

    Buckets mirror what the driver's canonicalization can and cannot see
    (calibrated against the r12 artifact): every <=64-bit integer width
    lands in the same int bucket (Spark rank() is INT32, DuckDB's BIGINT —
    25 such queries hash-passed in r12), but HUGEINT (int128, DuckDB's
    sum(INTEGER) result type) overflows that bucket and renders differently
    — that is the tpch_q12 bug class this gate exists to catch. Everything
    else must match exactly.

    DECIMAL is handled one level up (decimal_cols): a DECIMAL result
    column is a FAILURE on sight regardless of the other side's type.
    """
    def bucket(t):
        if t in ("TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER"):
            return "int64"
        if t in ("FLOAT", "REAL", "DOUBLE"):
            return "float"
        if t in ("VARCHAR", "TEXT", "STRING"):
            return "string"
        if t.startswith("TIMESTAMP_") or t == "TIMESTAMP":
            return "timestamp"  # precision variants render alike
        return t  # HUGEINT, DATE, BOOLEAN, lists, … — exact match only
    return bucket(spark_t) == bucket(duck_t)


def decimal_cols(types_by_col):
    """Result columns typed DECIMAL — an automatic FAIL (r13 verdict #2).

    The driver's typed hasher renders trailing-zero decimals through a
    shortest-repr float path on one side and a scale-preserving path on the
    other, so a DECIMAL-typed result column hash-diverges on the first
    `x.00` value even when values and dtypes are engine-identical (27/28
    frozen v27 seeds in r13; tpch_q12's HUGEINT in r12 was the same
    hasher-rendering class one type over). This replica previously
    stringified Decimals identically on both sides (Python str()), making
    it structurally blind to that divergence — two rounds of shipped
    regressions. Close the class: the declared surface must never be
    DECIMAL; engines keep decimal arithmetic INSIDE the plan and render
    the surface as DOUBLE/STRING/integral.
    """
    return [(c, t) for c, t in types_by_col.items() if t.startswith("DECIMAL")]


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.loads(Path(outdir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = rows_of(spark_rel.fetchall())
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = rows_of(duck_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {str(e)[:300]}")
            n_fail += 1
            continue
        # sort columns by name (driver behavior)
        s_idx = [i for i, _ in sorted(enumerate(spark_cols), key=lambda p: p[1])]
        d_idx = [i for i, _ in sorted(enumerate(duck_cols), key=lambda p: p[1])]
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1
            continue
        # dtype-parity gate (r12 verdict #2): the stringified-value compare
        # below is blind to typed-rendering drift the driver's hasher sees
        # (e.g. DuckDB typing sum(INTEGER) as HUGEINT where the Spark parquet
        # carries BIGINT — tpch_q12, round 12). Both sides are DuckDB
        # relations here, so compare their DuckDB-rendered column types
        # name-by-name and fail on any class drift.
        try:
            s_types = dict(zip(con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").columns,
                [str(t) for t in con.sql(
                    f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").types]))
            d_rel2 = con.sql(sql)
            d_types = dict(zip(d_rel2.columns, [str(t) for t in d_rel2.types]))
            decs = decimal_cols(s_types) + decimal_cols(d_types)
            if decs:
                print(f"FAIL {name}: DECIMAL-typed result columns {decs} — "
                      "driver hasher renders trailing-zero decimals "
                      "asymmetrically; cast the surface to DOUBLE/STRING")
                n_fail += 1
                continue
            drift = [(c, s_types[c], d_types[c]) for c in s_types
                     if c in d_types and not types_compatible(s_types[c], d_types[c])]
            if drift:
                print(f"FAIL {name}: dtype drift {drift}")
                n_fail += 1
                continue
        except Exception as e:  # pragma: no cover - defensive
            print(f"WARN {name}: dtype gate errored: {str(e)[:200]}")
        s_rows = [tuple(r[i] for i in s_idx) for r in spark_rows]
        d_rows = [tuple(r[i] for i in d_idx) for r in duck_rows]
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first at {i}:")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
