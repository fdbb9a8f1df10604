#!/usr/bin/env python3
"""Replay FuzzDump output against DuckDB and diff (the mass-differential
counterpart of oracle_check.py: same canonicalization, fuzz_sql.json instead
of oracle_sql.json, and results keyed by generated-query name).

Usage: python3 tools/fuzz_check.py <sfdir> <dump_dir>
"""
import json
import sys
from pathlib import Path

import duckdb

from oracle_check import TABLES, decimal_cols, rows_of


def main(sfdir, dumpdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    sqls = json.loads(Path(dumpdir, "fuzz_sql.json").read_text())
    n_pass = n_fail = n_empty = 0
    for name, sql in sorted(sqls.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{dumpdir}/{name}/*.parquet')")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = rows_of(spark_rel.fetchall())
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = rows_of(duck_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {str(e)[:300]}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        # r13 verdict #2: a DECIMAL-typed result column fails on sight —
        # the driver's hasher renders trailing-zero decimals asymmetrically
        # even when the value compare below would pass (both sides are
        # Python Decimals here, structurally blind to that divergence).
        # DBAPI description only yields 'NUMBER', so re-derive precise
        # types from .sql() relations (cheap: schema-only, no execution).
        try:
            s_rel2 = con.sql(
                f"SELECT * FROM read_parquet('{dumpdir}/{name}/*.parquet')")
            s_types = dict(zip(s_rel2.columns, [str(t) for t in s_rel2.types]))
            d_rel2 = con.sql(sql)
            d_types = dict(zip(d_rel2.columns, [str(t) for t in d_rel2.types]))
            decs = decimal_cols(s_types) + decimal_cols(d_types)
            if decs:
                print(f"FAIL {name}: DECIMAL-typed result columns {decs} — "
                      "cast the rendered surface to DOUBLE/STRING")
                n_fail += 1
                continue
        except Exception as e:
            # r14 advice: an errored gate must FAIL, not warn-and-proceed —
            # the value compare below is structurally blind to the decimal
            # rendering bug class this gate exists to catch.
            print(f"FAIL {name}: decimal-type gate errored: {str(e)[:200]}")
            n_fail += 1
            continue
        if spark_rows != duck_rows:
            diffs = [(i, a, b) for i, (a, b) in
                     enumerate(zip(spark_rows, duck_rows)) if a != b]
            print(f"FAIL {name}: spark={len(spark_rows)} duck={len(duck_rows)} rows, "
                  f"{len(diffs)} differ")
            if diffs:
                i, a, b = diffs[0]
                print(f"  first at {i}:\n  spark: {a}\n  duck : {b}")
            print(f"  sql: {sql[:300]}")
            n_fail += 1
            continue
        n_pass += 1
        if not spark_rows:
            n_empty += 1
    print(f"\n{n_pass} pass ({n_empty} empty-result), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
