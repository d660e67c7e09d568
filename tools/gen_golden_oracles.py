#!/usr/bin/env python3
"""Regenerate CdcGoldenOracles.scala from a Verify output directory.

Usage: python3 tools/gen_golden_oracles.py <verifyOutDir>

Turns the c01/c02 golden-query parquet outputs into DuckDB VALUES
literals (regression locks; semantic assertions live in the specs).
"""
import sys, glob
import pandas as pd

QUERIES = {
    "c01_decode_dump":
        ("employee_id, last_name, salary, op, is_snapshot, row_id", "row_id"),
    "c02_cdc_final_state":
        ("employee_id, first_name, salary, deleted", "employee_id"),
    "c07_decode_cdc":
        ("employee_id, first_name, salary, op, is_snapshot, scn",
         "scn, op, employee_id"),
    "c09_router_multiplex":
        ("table_name, employee_id, first_name, salary, deleted",
         "table_name, employee_id"),
    "c10_time_travel":
        ("employee_id, first_name, salary, deleted", "employee_id"),
    "c11_change_feed":
        ("employee_id, first_name, salary, deleted", "employee_id"),
    "c18_incremental_agg":
        ("n_live, sum_salary", "n_live"),
}


def lit(v):
    if v is None or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, (int,)):
        return f"CAST({v} AS BIGINT)"
    return "'" + str(v).replace("'", "''") + "'"


def main():
    outdir = sys.argv[1]
    entries = []
    for name, (cols, order) in QUERIES.items():
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        df = pd.concat([pd.read_parquet(f) for f in files])
        rows = ",\n      ".join(
            "(" + ", ".join(lit(v) for v in row) + ")"
            for row in df.itertuples(index=False, name=None))
        sql = (f"SELECT * FROM (VALUES {rows}) AS t({cols}) "
               f"ORDER BY {order}")
        entries.append((name, sql))
    body = ",\n".join(
        f'    "{n}" ->\n      """{sql}""".stripMargin' for n, sql in entries)
    src = f'''package graft.queries

/** Generated VALUES-literal oracles for the CDC golden queries
  * (regenerate with tools/gen_golden_oracles.py after intentional
  * changes; semantic coverage lives in the ScalaTest specs). */
object CdcGoldenOracles {{
  val map: Map[String, String] = Map(
{body}
  )
}}
'''
    path = "src/main/scala/graft/queries/CdcGoldenOracles.scala"
    open(path, "w").write(src)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
