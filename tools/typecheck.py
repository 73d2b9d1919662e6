#!/usr/bin/env python3
"""Output-type sweep (dev tool only): for every oracle query, compare the
DuckDB oracle's column types against the engine's persisted parquet types.

The driver's hasher is type-sensitive at the int128 boundary (round-12
q_scan_jsonl_roundtrip), and int32-vs-int64 tolerance is an implementation
detail we must not lean on — the contract is that engine and oracle agree
on output types everywhere.

Usage: python3 tools/typecheck.py [SF_DIR] [OUT_DIR]
Exit 0 iff zero type diffs across all oracle queries.
"""
import sys, json
import duckdb

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_verify'
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    diffs = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            exp = dict(zip(rel.columns, (str(t) for t in rel.types)))
            got_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
            got = dict(zip(got_rel.columns, (str(t) for t in got_rel.types)))
        except Exception as e:
            print(f'ERR  {name}: {e}')
            diffs += 1
            continue
        bad = {c: (got.get(c), exp.get(c))
               for c in set(exp) | set(got)
               if got.get(c) != exp.get(c)}
        if bad:
            diffs += 1
            print(f'TYPE {name}: ' + ', '.join(
                f'{c} spark={a} oracle={b}' for c, (a, b) in sorted(bad.items())))
    print('TYPE_DIFFS:', diffs)
    sys.exit(1 if diffs else 0)


if __name__ == '__main__':
    main()
