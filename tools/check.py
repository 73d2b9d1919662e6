#!/usr/bin/env python3
"""Local imitation of the driver's correctness gate (dev tool only).

Usage: python3 tools/check.py [SF_DIR] [OUT_DIR] [query ...]

Reads OUT_DIR/<name>/ parquet (written by graft.Verify), runs
OUT_DIR/oracle_sql.json against DuckDB views over SF_DIR/*.parquet,
sorts columns by name (driver behavior) and compares values exactly.
"""
import sys, json, math
import duckdb

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_verify'
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            rel = con.sql(sql)
            expcols = [d[0] for d in rel.description]
            exp = rel.fetchall()
            got_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
            gotcols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            if sorted(expcols) != sorted(gotcols):
                print(f'FAIL {name}: cols spark={sorted(gotcols)} oracle={sorted(expcols)}')
                fail += 1
                continue
            ei = sorted(range(len(expcols)), key=lambda i: expcols[i])
            gi = sorted(range(len(gotcols)), key=lambda i: gotcols[i])
            erows = [tuple(r[i] for i in ei) for r in exp]
            grows = [tuple(r[i] for i in gi) for r in got]
            if len(erows) != len(grows):
                print(f'FAIL {name}: rows spark={len(grows)} oracle={len(erows)}')
                fail += 1
                continue
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
            if bad:
                i, a, b = bad[0]
                print(f'FAIL {name}: {len(bad)}/{len(grows)} rows differ; first @%d:\n  spark : %r\n  oracle: %r' % (i, a, b))
                fail += 1
            else:
                print(f'ok   {name} ({len(grows)} rows)')
        except Exception as e:
            print(f'ERR  {name}: {e}')
            fail += 1
    print('FAILURES:', fail)
    sys.exit(1 if fail else 0)


if __name__ == '__main__':
    main()
