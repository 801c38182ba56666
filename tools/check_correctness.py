#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB over the same parquet tables and compares row count, column names, and
a value hash (columns sorted by name, rows sorted) against the Spark parquet
output written by `graft.Verify`.

Usage: python3 tools/check_correctness.py SF_DIR OUT_DIR
"""
import sys, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        entry = {}
        try:
            spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not spark_files:
                entry["status"] = "missing_spark_output"
                results[name] = entry
                continue
            srel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols, srows = [c for c in srel.columns], srel.fetchall()
            orel = con.sql(oracle[name])
            ocols, orows = [c for c in orel.columns], orel.fetchall()
            entry["rows"] = [len(srows), len(orows)]
            entry["cols_match"] = sorted(scols) == sorted(ocols)
            if not entry["cols_match"]:
                entry["cols"] = [sorted(scols), sorted(ocols)]
            sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
            entry["hash_match"] = sh == oh
            entry["status"] = "ok" if (entry["cols_match"] and sh == oh
                                       and len(srows) == len(orows)) else "MISMATCH"
        except Exception as e:
            entry["status"] = f"error: {e}"
        results[name] = entry
    bad = {k: v for k, v in results.items() if v["status"] != "ok"}
    print(json.dumps(results, indent=1, default=str))
    print(f"\n{len(results) - len(bad)}/{len(results)} ok")
    if bad:
        print("FAILING:", ", ".join(bad))
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
