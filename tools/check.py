#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
graft.Verify parquet dump against its DuckDB oracle SQL on the same
fixture tables. Dev tool only — the Scala library never imports this.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dirs = set(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json"))
    names = sorted(dirs | set(oracle))
    n_ok = n_bad = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING-OUTPUT {name}"); n_bad += 1; continue
        if len(files) != 1:
            # Verify coalesce(1)s every dump; >1 part file would make the
            # positional row compare below order-unstable.
            print(f"MULTI-FILE    {name}: {len(files)} part files"); n_bad += 1; continue
        mine = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        mine = mine[sorted(mine.columns)]
        if name not in oracle:
            print(f"NO-ORACLE     {name}: rows={len(mine)}")
            continue
        try:
            ref = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERROR  {name}: {e}"); n_bad += 1; continue
        ref = ref[sorted(ref.columns)]
        if list(mine.columns) != list(ref.columns):
            print(f"SCHEMA-DIFF   {name}: mine={list(mine.columns)} ref={list(ref.columns)}")
            n_bad += 1; continue
        if len(mine) != len(ref):
            print(f"ROWS-DIFF     {name}: mine={len(mine)} ref={len(ref)}"); n_bad += 1; continue
        diffs = []
        for c in mine.columns:
            a, b = mine[c], ref[c]
            try:
                eq = (a.astype(str).values == b.astype(str).values)
            except Exception:
                eq = a.values == b.values
            bad = (~eq).sum()
            if bad:
                diffs.append((c, int(bad)))
        if diffs:
            print(f"VALUE-DIFF    {name}: {diffs}")
            c = diffs[0][0]
            import numpy as np
            mask = mine[c].astype(str).values != ref[c].astype(str).values
            i = int(np.argmax(mask))
            print(f"   first diff row {i}: mine={mine.iloc[i].to_dict()}")
            print(f"                    ref={ref.iloc[i].to_dict()}")
            n_bad += 1
        else:
            print(f"OK            {name}: rows={len(mine)}"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {len(names)} total")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
