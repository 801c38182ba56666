#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB over the same parquet tables and compares row count, column names,
COLUMN TYPES, and a value hash (columns sorted by name, rows sorted) against
the Spark parquet output written by `graft.Verify`.

The type gate exists because the driver hashes through pandas, where DuckDB
HUGEINT (any uncast SUM over BIGINT) becomes float64 and renders "800.0"
against Spark's "800" — invisible to a str()-based value hash over fetchall()
Python ints (that blind spot shipped a 61/63 round while this checker said
63/63). Every oracle column's DuckDB type must EXACTLY equal the type DuckDB
reads from the Spark parquet: cast aggregates (::BIGINT) and row_number
(CAST(rn AS INT)) in the oracle SQL to match the Spark schema.

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
            scols, stypes = list(srel.columns), [str(t) for t in srel.types]
            srows = srel.fetchall()
            orel = con.sql(oracle[name])
            ocols, otypes = list(orel.columns), [str(t) for t in orel.types]
            orows = orel.fetchall()
            entry["rows"] = [len(srows), len(orows)]
            entry["cols_match"] = sorted(scols) == sorted(ocols)
            if not entry["cols_match"]:
                entry["cols"] = [sorted(scols), sorted(ocols)]
            smap = dict(zip(scols, stypes))
            omap = dict(zip(ocols, otypes))
            skew = {c: [smap[c], omap[c]] for c in smap
                    if c in omap and smap[c] != omap[c]}
            entry["types_match"] = not skew
            if skew:
                entry["type_skew"] = skew
            sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
            entry["hash_match"] = sh == oh
            entry["status"] = "ok" if (entry["cols_match"] and not skew
                                       and sh == oh
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
