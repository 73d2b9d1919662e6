#!/usr/bin/env python3
"""Regenerate the as-built counts quoted in SURVEY §2.C and README.

Round-13 judge item: the hand-recorded test count drifted one behind
the as-built suite. Counts quoted in prose must come from THIS script,
not from memory.

Two sources of truth:
  * the SOURCE TREE for the query-registry parity check — the
    QuerySmokeSpec pin must equal the number of distinct `q_*` rows in
    SURVEY §2.B (dynamic per-query tests make static test counting
    meaningless, so tests are NOT counted from the tree);
  * the LAST `sbt test` LOG for the test/suite counts — run
    `sbt -batch test | tee /tmp/sbt_test.log` at round close, then
    `python3 tools/counts.py --sbt-log /tmp/sbt_test.log [--update-readme]`.

--update-readme rewrites README's "N scalatests green across M
suites" sentence in place from the log. Exit 1 on any parity mismatch.
"""
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def flag_value(flag):
    """Value following `flag` in argv — named failure instead of the
    bare IndexError a trailing valueless flag used to raise (round-16
    advice item)."""
    i = sys.argv.index(flag)
    if i + 1 >= len(sys.argv) or sys.argv[i + 1].startswith('--'):
        sys.exit(f'{flag} requires a value')
    return sys.argv[i + 1]


def tree_hash(roots):
    """sha256 over every regular file under the given repo-relative
    roots, sorted by unix-style relative path, each contributing
    `relpath \\0 bytes \\0` — MUST stay in lock-step with
    graft.Provenance.treeHash (the Scala twin that stamps Verify dumps
    and the sbt log). Replaces the old mtime comparison, which a fresh
    git checkout falsified both ways (round-17 advice item)."""
    import hashlib
    md = hashlib.sha256()
    files = []
    for r in roots:
        root = os.path.join(ROOT, r)
        for dirpath, dirnames, names in os.walk(root):
            dirnames.sort()
            for n in names:
                p = os.path.join(dirpath, n)
                if os.path.isfile(p):
                    files.append((os.path.relpath(p, ROOT).replace(os.sep, '/'), p))
    for rel, p in sorted(files):
        md.update(rel.encode('utf-8')); md.update(b'\0')
        md.update(open(p, 'rb').read()); md.update(b'\0')
    return md.hexdigest()


def main():
    ok = True
    smoke = open(os.path.join(
        ROOT, 'src/test/scala/graft/queries/QuerySmokeSpec.scala')).read()
    m = re.search(r'queries\.size == (\d+)', smoke) or \
        re.search(r'val pin = (\d+)', smoke)
    pin = int(m.group(1))
    survey = open(os.path.join(ROOT, 'SURVEY.md')).read()
    # the ONE copy of the 2B-row regex: the pin-parity check and the
    # stray-dump check below must agree on what a registered row is
    survey_keys = set(re.findall(r'^\| `(q_[a-z0-9_]+)` \|', survey, re.M))
    survey_rows = len(survey_keys)
    print(f'registry pin:   {pin}')
    print(f'survey 2B rows: {survey_rows}')
    if pin != survey_rows:
        print(f'MISMATCH: registry pin {pin} != SURVEY 2B rows {survey_rows}')
        ok = False

    # oracle / rows-only split, derived from the LAST driver correctness
    # record so prose can never drift again (round-14 judge item: the
    # hand-counted "202/20" was actually 200/22). The driver writes one
    # record per registered query; err == 'no_oracle' marks the
    # rows-only-by-design faces.
    import glob
    import json
    # --verify-out DIR: derive the oracle/rows-only split from THIS
    # round's own Verify dump (oracle_sql.json holds exactly the
    # oracle-gated keys) — the machine source for close-time prose,
    # since the driver's CORRECTNESS_r{N} for the closing round is
    # only written AFTER the round (round-16 review finding: the r16
    # close would otherwise quote a hand-derived 208/26)
    if '--verify-out' in sys.argv:
        vout = flag_value('--verify-out')
        oracle_path = os.path.join(vout, 'oracle_sql.json')
        oracle_keys = json.load(open(oracle_path))
        n_or = len(oracle_keys)
        # the dump must describe THIS registry, not a stale run from an
        # older tree (round-16 advice item: a stale dump was quoted
        # silently) — every dumped oracle key must be a registered
        # SURVEY 2B row and the oracle count can never exceed the pin
        stray = sorted(set(oracle_keys) - survey_keys)
        if stray:
            print(f'MISMATCH: stale verify dump — {len(stray)} oracle '
                  f'key(s) not in the SURVEY 2B registry: '
                  f'{", ".join(stray[:5])}')
            ok = False
        if n_or > pin:
            print(f'MISMATCH: stale verify dump — {n_or} oracle keys '
                  f'exceed the registry pin {pin}')
            ok = False
        # the subset checks above cannot catch an OLDER dump whose keys
        # are all still registered (round-17 review finding) — at close
        # the dump must carry the BUILD-KEYED provenance hash graft.Verify
        # stamps (provenance.json, sha256 of src/main at run time) and it
        # must equal the current tree's hash. Content keying, not mtimes:
        # a fresh checkout can't falsify it, and a missing stamp fails
        # loudly instead of passing silently (round-17 advice item).
        if '--at-close' in sys.argv:
            prov_path = os.path.join(vout, 'provenance.json')
            if not os.path.isfile(prov_path):
                print(f'MISMATCH: {prov_path} missing — the dump predates '
                      f'the provenance stamp; re-run graft.Verify on the '
                      f'current build')
                ok = False
            else:
                stamped = json.load(open(prov_path)).get('src_main_hash')
                current = tree_hash(['src/main'])
                if stamped != current:
                    print(f'MISMATCH: verify dump was built from a '
                          f'different src/main (stamped {stamped[:12]}…, '
                          f'current {current[:12]}…) — re-run graft.Verify '
                          f'before quoting its split')
                    ok = False
        print(f'verify dump {vout}: {pin} queries = '
              f'{n_or} oracle-gated + {pin - n_or} rows-only')
    # sort by the NUMERIC round suffix, not lexicographically — a
    # lexicographic sort breaks at r100 or on any unpadded record
    # (round-15 advice item)
    recs = sorted(glob.glob(os.path.join(ROOT, 'CORRECTNESS_r*.json')),
                  key=lambda p: int(re.search(r'_r(\d+)', p).group(1)))
    if not recs and '--at-close' in sys.argv:
        print('MISMATCH: no CORRECTNESS_r*.json record found at close')
        ok = False
    if recs:
        rec = recs[-1]
        d = json.load(open(rec))
        n_total = len(d)
        n_no_oracle = sum(1 for v in d.values() if v.get('err') == 'no_oracle')
        n_pass = sum(1 for v in d.values() if v.get('hash_match') is True)
        n_fail = n_total - n_no_oracle - n_pass
        print(f'{os.path.basename(rec)}: {n_total} queries = '
              f'{n_pass} hash-match + {n_no_oracle} rows-only'
              + (f' + {n_fail} FAILING' if n_fail else ''))
        if n_fail:
            print('MISMATCH: failing correctness rows — fix before quoting')
            ok = False
        if n_total != pin:
            # mid-round a stale record is expected (the driver writes it
            # at round START); at round CLOSE a count mismatch means the
            # quoted split would silently come from last round's record —
            # pass --at-close to make that a hard failure (round-15
            # advice item: the r15 close quoted r14's 222-query record)
            msg = (f'record has {n_total} queries vs pin {pin} — '
                   'a stale record is expected mid-round, not at round close')
            if '--at-close' in sys.argv and '--verify-out' not in sys.argv:
                # without a fresh dump to quote from, the stale record
                # would silently become the quoted split
                print(f'MISMATCH: {msg}')
                ok = False
            else:
                print(f'NOTE: {msg}')

    if '--sbt-log' in sys.argv:
        log_path = flag_value('--sbt-log')
        log = open(log_path).read()
        # close-time provenance (round-16 judge item, re-keyed to content
        # round 18): ProvenanceSpec prints `PROVENANCE src_hash=<sha256 of
        # src/main+src/test>` into every suite run, so the log itself
        # certifies WHICH tree it tested — compare against the current
        # tree instead of mtimes (round-17 advice item)
        if '--at-close' in sys.argv:
            pm = re.search(r'PROVENANCE src_hash=([0-9a-f]{64})', log)
            if not pm:
                print(f'MISMATCH: no PROVENANCE line in {log_path} — the '
                      f'log predates ProvenanceSpec; re-run '
                      f'`sbt -batch test | tee`')
                ok = False
            else:
                current = tree_hash(['src/main', 'src/test'])
                if pm.group(1) != current:
                    print(f'MISMATCH: sbt log tested a different tree '
                          f'(stamped {pm.group(1)[:12]}…, current '
                          f'{current[:12]}…) — re-run `sbt -batch test | '
                          f'tee` after the final source change')
                    ok = False
        # strip ANSI color codes sbt leaves in a captured log
        log = re.sub(r'\x1b\[[0-9;]*m', '', log)
        tests = re.findall(r'Tests: succeeded (\d+), failed (\d+)', log)
        suites = re.findall(r'Suites: completed (\d+), aborted (\d+)', log)
        if not tests or not suites:
            print('MISMATCH: no scalatest summary in the log')
            sys.exit(1)
        n_t = sum(int(t) for t, _ in tests)
        n_f = sum(int(f) for _, f in tests)
        n_s = sum(int(s) for s, _ in suites)
        n_a = sum(int(a) for _, a in suites)
        print(f'tests:          {n_t} (failed {n_f})')
        print(f'suites:         {n_s} (aborted {n_a})')
        if n_f or n_a:
            print('MISMATCH: failures/aborts in the log — fix before quoting')
            ok = False
        if '--update-readme' in sys.argv and ok:
            path = os.path.join(ROOT, 'README.md')
            readme = open(path).read()
            new = re.sub(r'\d+\s+scalatests green across \d+\s+suites',
                         f'{n_t} scalatests green across {n_s} suites',
                         readme)
            open(path, 'w').write(new)
            print('README updated' if new != readme else 'README already current')
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
