#!/usr/bin/env python3
"""Derive a 10x scale-stress dataset from sf0.1 (dev tool only).

Key-shifted self-replication: entity-id columns are offset per copy so
the entity domains grow 10x while every value distribution (text,
amounts, timestamps) is preserved exactly. Schema (incl. TIMESTAMP
NANOS on events.ts) is preserved by doing the transform in pyarrow.
Replicated text makes the dedup family's candidate sets dense and the
distance space tie-heavy - deliberately adversarial for tie-break and
accumulator-regime divergences that only show at scale.

Usage: python3 tools/scale10.py [SRC_SF_DIR] [DST_DIR] [COPIES]
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table entity-id columns to shift by copy * (max+1).
# event_id is shifted too: the generator guarantees it globally unique
# (q_stream_dedup's oracle counts the raw table BECAUSE dedup-by-id of
# unique ids is the identity) - a clone that repeats event_ids tests a
# data contract the engine is entitled to assume, not the engine.
SHIFT = {
    'documents': ['doc_id'],
    'embeddings': ['vec_id'],
    'events': ['user_id', 'event_id'],
    'lineitem': ['l_orderkey'],
    'orders': ['o_orderkey'],
}
# events.ts is globally unique in the generated corpus; the final
# ORDER BY of several window queries is only total under that
# invariant. Perturb each copy by +copy microseconds (exact in both
# engines' timestamp models; hour/minute bucketing unmoved away from
# boundaries) to keep global ordering total.
TS_PERTURB = {'events': 'ts'}
# tables copied through unchanged (small dims shared by every copy)
PASSTHROUGH = ['region', 'nation', 'customer', 'supplier', 'part']


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/graft_sf1'
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    for t in PASSTHROUGH:
        pq.write_table(pq.read_table(f'{src}/{t}.parquet'),
                       f'{dst}/{t}.parquet')
        print(f'{t}: passthrough')
    # orderkey is a SHARED domain across orders and lineitem: one
    # offset for both, so the order<->lineitem join keeps matching
    # inside every copy
    okey_off = pc.add(pc.max(pq.read_table(
        f'{src}/orders.parquet', columns=['o_orderkey'])['o_orderkey']),
        1).as_py()
    for t, cols in SHIFT.items():
        tab = pq.read_table(f'{src}/{t}.parquet')
        offs = {c: (okey_off if c.endswith('orderkey')
                    else pc.add(pc.max(tab[c]), 1).as_py()) for c in cols}
        parts = []
        for k in range(copies):
            part = tab
            for c in cols:
                idx = part.schema.get_field_index(c)
                shifted = pc.add(part[c], k * offs[c]).cast(part.schema[idx].type)
                part = part.set_column(idx, part.schema[idx], shifted)
            tc = TS_PERTURB.get(t)
            if tc is not None and k > 0:
                idx = part.schema.get_field_index(tc)
                unit = part.schema[idx].type.unit
                dur = pa.scalar(k * {'ns': 1000, 'us': 1}[unit],
                                type=pa.duration(unit))
                part = part.set_column(
                    idx, part.schema[idx],
                    pc.add(part[tc], dur).cast(part.schema[idx].type))
            parts.append(part)
        out = pa.concat_tables(parts)
        pq.write_table(out, f'{dst}/{t}.parquet')
        print(f'{t}: {tab.num_rows} -> {out.num_rows} rows '
              f'(shift {offs})')


if __name__ == '__main__':
    main()
