#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query parquet in
<outDir> (written by graft.Verify), run the matching oracle SQL from
oracle_sql.json in DuckDB over the same sf tables, and compare
(columns sorted by name, rows sorted, values normalized).

Usage: check_oracles.py <sfDir> <outDir>
"""
import json
import math
import pathlib
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.loads(pathlib.Path(f"{out}/oracle_sql.json").read_text())
    ok = bad = skip = 0
    for name in sorted(oracles):
        qdir = pathlib.Path(out) / name
        if not qdir.exists():
            print(f"MISSING RESULT {name}")
            bad += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        try:
            exp = con.execute(oracles[name])
        except Exception as e:
            print(f"ORACLE SQL ERROR {name}: {e}")
            bad += 1
            continue
        ecols = [d[0] for d in exp.description]
        erows = exp.fetchall()
        gc, gr = normalize(grows, gcols)
        ec, er = normalize(erows, ecols)
        if gc != ec:
            print(f"SCHEMA MISMATCH {name}: spark={gc} duck={ec}")
            bad += 1
        elif gr != er:
            print(f"ROWS MISMATCH {name}: spark={len(gr)} duck={len(er)}")
            for a, b in list(zip(gr, er))[:1000]:
                if a != b:
                    print(f"  spark: {a}\n  duck:  {b}")
                    break
            bad += 1
        else:
            ok += 1
    # rows-only entries (queries without oracle)
    for qdir in sorted(pathlib.Path(out).glob("*/")):
        if qdir.name not in oracles and qdir.is_dir():
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')").fetchone()[0]
            status = "rows-only OK" if n > 0 else "rows-only EMPTY"
            if n == 0:
                bad += 1
            else:
                skip += 1
            print(f"{status} {qdir.name}: {n} rows")
    print(f"oracle check: {ok} matched, {skip} rows-only, {bad} failed")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
