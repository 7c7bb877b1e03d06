#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify
output vs DuckDB oracle on the same parquet tables.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [sorted(cols)] + out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # large-octave probes (1000x = 600M lineitem) need the oracle to
    # prefer RAM over spill: the default budget pushed the q160
    # closure's ~1e9-row edge aggregate into >63 GiB of temp files and
    # died on disk while 70+ GiB of RAM sat idle. Overridable so a
    # small box can lower it.
    # default derives from the box (advice round-13): a flat 96GB
    # replaced DuckDB's RAM-aware default and would invite an OOM kill
    # instead of spill on hosts under ~100 GiB. min(96GB, 80% of
    # MemTotal) keeps the large-octave RAM-first behavior on this
    # 128 GiB box and degrades to DuckDB's own policy elsewhere.
    def _default_mem():
        try:
            with open("/proc/meminfo") as f:
                kib = int(next(l for l in f if l.startswith("MemTotal")).split()[1])
            # floor at 1GB (advice round-14): whole-GB truncation on a
            # sub-1.25GiB host yields '0GB', which DuckDB rejects
            # instead of degrading gracefully
            return f"{max(1, min(96, int(kib * 0.8 / 1048576)))}GB"
        except Exception:
            return "96GB"
    mem = os.environ.get("SELFCHECK_DUCKDB_MEM") or _default_mem()
    con.sql(f"SET memory_limit='{mem}'")
    # every gated query carries its own ORDER BY; dropping insertion-
    # order preservation lets DuckDB's large aggregates/joins use
    # streaming operators instead of order-preserving buffering (the
    # q148 1000x oracle spilled >59 GiB with it on)
    con.sql("SET preserve_insertion_order=false")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table: directory of parts
            if not glob.glob(f"{p}/*.parquet"):
                continue  # empty/partial write: degrade to per-query fails
            p = f"{p}/*.parquet"
        if os.path.exists(p) or "*" in p:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # iterate the MANIFEST, not the directory listing: a query that
    # crashed in Verify leaves no output and must FAIL, not vanish
    manifest_path = f"{out_dir}/queries.json"
    names = (json.load(open(manifest_path)) if os.path.exists(manifest_path)
             else sorted(n for n in os.listdir(out_dir)
                         if os.path.isdir(os.path.join(out_dir, n))))
    n_pass = n_fail = 0
    for name in sorted(names):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"[MISS] {name}: query produced no output (crashed?)")
            n_fail += 1
            continue
        parts = glob.glob(f"{d}/*.parquet")
        if not parts:
            print(f"[MISS] {name}: no parquet output")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        got_cols, got_rows = got.columns, got.fetchall()
        if name not in oracle:
            # rows-only check: an empty result from a generator-style
            # operator means it is broken
            if len(got_rows) == 0:
                print(f"[FAIL] {name}: 0 rows (rows-only check)")
                n_fail += 1
            else:
                print(f"[ROWS] {name}: {len(got_rows)} rows (no oracle)")
                n_pass += 1
            continue
        try:
            exp = con.sql(oracle[name])
            exp_cols, exp_rows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_fail += 1
            continue
        g = norm_rows(got_cols, got_rows)
        x = norm_rows(exp_cols, exp_rows)
        if g == x:
            print(f"[PASS] {name}: {len(got_rows)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"[FAIL] {name}: spark {len(got_rows)} rows vs oracle {len(exp_rows)}")
            if g[0] != x[0]:
                print(f"   cols spark={g[0]} oracle={x[0]}")
            else:
                diffs = [(a, b) for a, b in zip(g[1:], x[1:]) if a != b]
                for a, b in diffs[:3]:
                    print(f"   spark={a}\n   oracl={b}")
                if len(g) != len(x):
                    print(f"   row counts differ: {len(g)-1} vs {len(x)-1}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
