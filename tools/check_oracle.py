#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
Compares each <name>/ parquet result against oracle_sql.json run in DuckDB,
column-name-sorted, row-sorted, approx-equal on floats.
"""
import json, sys, glob, math
import duckdb


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (int,)):
        return float(v) if abs(v) < 2**52 else v
    return v


def table(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), [cols[i] for i in idx]


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                fail += 1
                continue
            sp = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            sp_rows, sp_cols = sp.fetchall(), [d[0] for d in sp.description]
            du = con.execute(sql)
            du_rows, du_cols = du.fetchall(), [d[0] for d in du.description]
            a, ca = table(sp_rows, sp_cols)
            b, cb = table(du_rows, du_cols)
            if ca != cb:
                print(f"FAIL {name}: columns {ca} vs {cb}")
                fail += 1
            elif a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: {len(a)} vs {len(b)} rows; first diffs: {diff}")
                fail += 1
            else:
                print(f"  ok {name} ({len(a)} rows)")
                ok += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            fail += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"  rows-only {name}: {n} rows {'OK' if n >= 0 else ''}")
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
