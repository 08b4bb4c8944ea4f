#!/usr/bin/env python3
"""Local dev harness mirroring the driver's correctness gate:
runs DuckDB oracle SQL against the sfDir parquet tables and compares with
the parquet dumps written by `graft.Verify`.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [--prune-quadratic]
       [--oracle-override name=path ...] [--json <path>]

--oracle-override name=path replaces that query's oracle SQL with the
file's contents before grading — the sf0.1 q29 recipe: regenerate the
key pin with `runMain graft.tools.KeyPin /root/testdata/sf0.1`, then
pass --oracle-override q29_session_keys=tools/pins/q29_sf0.1.sql.

--prune-quadratic is kept for recipe compatibility but prunes NOTHING
since round 10: round 9 restated every dedup/cosine-family oracle
sub-quadratically, and round 10 un-pinned q29 (KeyPin regenerates its
key pin per SF). The sweep is total.

--json <path> additionally writes a machine-readable record (per-query
ok/fail + the skip list) so a sweep leaves an artifact, not just a
console log.

(Dev tool only — the Scala library has no Python dependency.)
"""
import json, sys, glob, os
import duckdb

# Empty since round 10 (see --prune-quadratic above).
QUADRATIC_ORACLES = ()

def main(sf_dir, out_dir, prune_quadratic=False, json_out=None, overrides=None):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name, path in (overrides or {}).items():
        if name not in oracle:
            sys.exit(f"--oracle-override {name}: no such query in oracle_sql.json")
        oracle[name] = open(path).read()
        print(f"(oracle for {name} overridden from {path})")
    pruned = []
    if prune_quadratic:
        pruned = sorted(n for n in oracle
                        if n.split("_")[0] in QUADRATIC_ORACLES)
        oracle = {n: q for n, q in oracle.items() if n not in pruned}
        print(f"(pruned {len(pruned)} quadratic/pinned oracles: "
              f"{', '.join(s.split('_')[0] for s in pruned)})")
    n_ok = n_bad = 0
    record = {}
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1
            record[name] = {"ok": False, "err": "no spark output"}; continue
        try:
            got = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1
            record[name] = {"ok": False, "err": str(e)[:300]}; continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_bad += 1
            record[name] = {"ok": False, "err": "columns differ"}; continue
        if list(got.dtypes) != list(exp.dtypes):
            print(f"FAIL {name}: dtypes differ: " + str(
                [(c, str(a), str(b)) for c, a, b in
                 zip(got.columns, got.dtypes, exp.dtypes) if a != b]))
            n_bad += 1
            record[name] = {"ok": False, "err": "dtypes differ"}; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_bad += 1
            record[name] = {"ok": False, "err": "row counts differ"}; continue
        # sort rows for order-insensitive compare, then exact value compare
        gs = got.sort_values(by=list(got.columns), ignore_index=True)
        es = exp.sort_values(by=list(exp.columns), ignore_index=True)
        eq_sorted = gs.equals(es)
        eq_ordered = got.reset_index(drop=True).equals(exp.reset_index(drop=True))
        if eq_ordered:
            print(f"OK   {name} ({len(got)} rows, ordered)"); n_ok += 1
            record[name] = {"ok": True, "rows": len(got)}
        elif eq_sorted:
            print(f"WARN {name}: matches only after row sort"); n_ok += 1
            record[name] = {"ok": True, "rows": len(got), "note": "row-sort only"}
        else:
            diff = (gs != es) & ~(gs.isna() & es.isna())
            bad_cols = [c for c in gs.columns if diff[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = diff[c].idxmax()
                print(f"  {c}[{idx}]: spark={gs[c][idx]!r} oracle={es[c][idx]!r}")
            n_bad += 1
            record[name] = {"ok": False, "err": f"value mismatch in {bad_cols}"}
    print(f"== {n_ok} ok, {n_bad} bad")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_ok": n_ok, "n_bad": n_bad,
                       "pruned": pruned, "queries": record}, f, indent=1)
        print(f"(record written to {json_out})")
    return 1 if n_bad else 0

if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__ or "usage: parity.py <sfDir> <verifyOutDir> "
                            "[--prune-quadratic] [--json <path>]")
    _rest = sys.argv[3:]
    _json = None
    if "--json" in _rest:
        _i = _rest.index("--json")
        if _i + 1 >= len(_rest) or _rest[_i + 1].startswith("--"):
            sys.exit("--json requires a path operand")
        _json = _rest[_i + 1]
    _overrides = {}
    for _i, _a in enumerate(_rest):
        if _a == "--oracle-override":
            if _i + 1 >= len(_rest) or "=" not in _rest[_i + 1]:
                sys.exit("--oracle-override requires a name=path operand")
            _n, _p = _rest[_i + 1].split("=", 1)
            _overrides[_n] = _p
    sys.exit(main(sys.argv[1], sys.argv[2],
                  prune_quadratic="--prune-quadratic" in _rest,
                  json_out=_json, overrides=_overrides))
