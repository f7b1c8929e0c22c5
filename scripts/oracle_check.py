#!/usr/bin/env python3
"""Builder-side reproduction of the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir> [q1,q2,...]

For each entry in <verifyOutDir>/oracle_sql.json: create a DuckDB view per
parquet table in <sfDir>, run the oracle SQL, load <verifyOutDir>/<name>.parquet,
sort columns by name, sort rows, and compare values (floats to 1e-6 after
round-trip rounding — the oracle SQL itself rounds to 6 dp on both sides).

Driver-side only (python/duckdb are not part of the engine); kept in-repo so a
/tmp wipe can't lose the harness between rounds.
"""
import json, sys, math, time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize floats so -0.0 == 0.0 and 6-dp-rounded values compare clean
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6).add(0.0)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-6
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    report, n_ok = {}, 0
    total_duck = 0.0
    for name, sql in sorted(oracles.items()):
        if subset and name not in subset:
            continue
        try:
            t0 = time.time()
            exp = con.execute(sql).fetchdf()
            dt = time.time() - t0
            total_duck += dt
            got = pd.read_parquet(f"{out_dir}/{name}.parquet")
            if sorted(exp.columns) != sorted(got.columns):
                report[name] = {"status": "SCHEMA_MISMATCH",
                                "oracle_cols": sorted(exp.columns),
                                "spark_cols": sorted(got.columns)}
                continue
            ec, gc = canon(exp), canon(got)
            if len(ec) != len(gc):
                report[name] = {"status": "ROWCOUNT_MISMATCH",
                                "oracle_rows": len(ec), "spark_rows": len(gc)}
                continue
            bad = None
            for col in ec.columns:
                ev, gv = ec[col].tolist(), gc[col].tolist()
                for i, (a, b) in enumerate(zip(ev, gv)):
                    # pandas NaN for nulls in object cols
                    if isinstance(a, float) and isinstance(b, float):
                        pass
                    if a is pd.NA or (isinstance(a, float) and math.isnan(a)):
                        a = None if not isinstance(b, float) else a
                    if not cell_eq(a, b):
                        bad = {"col": col, "row": i, "oracle": str(a)[:80],
                               "spark": str(b)[:80]}
                        break
                if bad:
                    break
            if bad:
                report[name] = {"status": "VALUE_MISMATCH", **bad}
            else:
                report[name] = {"status": "OK", "rows": len(ec),
                                "duckdb_sec": round(dt, 2)}
                n_ok += 1
        except FileNotFoundError:
            report[name] = {"status": "NO_SPARK_OUTPUT"}
        except Exception as e:
            report[name] = {"status": "ERROR", "error": str(e)[:300]}
        s = report[name]["status"]
        print(f"[oracle] {name}: {s}", flush=True)
    n = len(report)
    print(json.dumps({"ok": n_ok, "total": n,
                      "duckdb_wall_sec": round(total_duck, 1)}))
    json.dump(report, open(f"{out_dir}/oracle_report.json", "w"), indent=1)
    sys.exit(0 if n_ok == n else 1)


if __name__ == "__main__":
    main()
