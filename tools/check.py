#!/usr/bin/env python3
"""Local mimic of the driver's t2 gate: run graft.Verify output against the
DuckDB oracle and diff. Dev tooling only — NOT part of the engine (the engine
is pure Scala/Spark; see the builder contract).

Usage: python3 tools/check.py <sfDir> <outDir> [querySubstr ...]
(outDir = what `sbt "runMain graft.Verify <sfDir> <outDir>"` produced;
 optional substrings restrict the check to matching query names)
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, only=()) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    err_path = Path(out_dir) / "errors.json"
    if err_path.exists():
        for name, msg in json.loads(err_path.read_text()).items():
            print(f"VERIFY-FAIL {name}: {msg[:200]}")
    if only:
        oracle = {k: v for k, v in oracle.items()
                  if any(s in k for s in only)}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        try:
            got_df = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
            exp_df = con.sql(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        # Mimic the driver: sort columns by name, stringify PANDAS-coerced
        # values, compare row multisets. The pandas coercion is the
        # type-strictness that burned r6 (qd36/qd37): DuckDB HUGEINT (from
        # an uncast SUM(BIGINT)) coerces to float64 -> "6164847.0" !=
        # Spark BIGINT's "6164847", while benign width differences
        # (INTEGER vs BIGINT, e.g. ROW_NUMBER) still stringify equal —
        # exactly matching which queries the driver greens (q06/ql02 pass,
        # qd36/qd37 failed). fetchall() hid this: HUGEINT fetches as a
        # plain Python int, identical to BIGINT's.
        got_cols, exp_cols = list(got_df.columns), list(exp_df.columns)

        def norm(df):
            cols = sorted(df.columns)
            return sorted(tuple(str(v) for v in row)
                          for row in df[cols].itertuples(index=False, name=None))
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_bad += 1
        elif norm(got_df) != norm(exp_df):
            g, e = norm(got_df), norm(exp_df)
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            extra = f" len {len(g)} vs {len(e)}" if len(g) != len(e) else ""
            print(f"FAIL {name}: value mismatch{extra} sample={diff}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got_df)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
