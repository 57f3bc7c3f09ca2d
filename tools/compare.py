#!/usr/bin/env python3
"""Replica of the driver's t2 DuckDB compare: columns sorted by name,
rows compared in declared order, floats at 10 significant digits.
Type-sensitive (r11): arrow-level column types must also agree after
canonicalization, mirroring the driver hash that flagged rel_q12's
DuckDB HUGEINT (decimal128) vs Spark BIGINT (int64) in round 10.

Transient attribution (r15, VERDICT r14 #3): a per-query mismatch is
immediately re-compared ONCE — both legs re-read from scratch — and the
tool logs which leg changed between the two attempts (query name, leg,
both canonical digests, both rowcounts) BEFORE deciding on the second
result. The round-14 close saw a first compare land 309/310 and five
re-compares of the same dump land 310/310 with no way to name the
flaky query or the flaky leg; now a transient names itself on first
occurrence.

Adoption policy (r16, ADVICE r15): a recompare PASS is adopted ONLY
when the transient is attributable — the SPARK leg's digest moved (a
concurrent Spark writer re-dumping the outdir is a real scenario) and
the ORACLE leg's did not. DuckDB re-executing a deterministic oracle
against immutable parquet must not change, so changed_leg=oracle (or
a verdict flip with NO digest movement, which would mean the compare
itself is nondeterministic) stays FAIL. And the escape hatch is
bounded: more than MAX_TRANSIENT_ADOPTIONS adopted passes in one run
fail the run by name — a systematically flaky dump must not pass at
p^2 instead of p."""

MAX_TRANSIENT_ADOPTIONS = 2
import sys, json, glob, math, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    except Exception:
        pass

def canon_type(t):
    """Canonical physical class matching the driver's observed sensitivity:
    integer widths collapse (driver passed int32 row_number vs int64 in r10),
    but decimal128 (DuckDB HUGEINT) stays distinct from int (r10's one flag)."""
    if pa.types.is_integer(t): return 'int'
    if pa.types.is_string(t) or pa.types.is_large_string(t): return 'utf8'
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return 'binary'
    if pa.types.is_date(t): return 'date'
    if pa.types.is_timestamp(t): return 'timestamp'
    if pa.types.is_decimal(t): return f'decimal({t.precision},{t.scale})'
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f'list<{canon_type(t.value_type)}>'
    return str(t)

def type_check(s_tbl, o_tbl):
    """Return per-column type mismatches between Spark parquet and DuckDB arrow."""
    s_types = {f.name: canon_type(f.type) for f in s_tbl.schema}
    o_types = {f.name: canon_type(f.type) for f in o_tbl.schema}
    return [f'{c}: spark {s_types[c]} vs oracle {o_types[c]}'
            for c in sorted(set(s_types) & set(o_types)) if s_types[c] != o_types[c]]

def sig10(x):
    if x is None: return 'None'
    if isinstance(x, float):
        if math.isnan(x): return 'nan'
        if x == 0: return '0'
        return f'{x:.10g}'
    s = str(x)
    if s.endswith(' 00:00:00'):  # date read back as midnight datetime
        s = s[:-9]
    return s

def leg_digest(df):
    """Canonical content digest of one leg: columns sorted by name, rows in
    declared order, values at sig10 — the same canonicalization the value
    compare walks, so two attempts' digests differ iff the compare would."""
    h = hashlib.sha256()
    for c in sorted(df.columns):
        h.update(c.encode())
        for v in df[c].tolist():
            h.update(sig10(v).encode()); h.update(b'\x00')
    return h.hexdigest()[:16]

def read_legs(name):
    """Read both legs fresh from their sources. Returns
    (sdf, odf, s_tbl0, o_tbl, err) — err set means the leg read failed."""
    files = sorted(glob.glob(f'{outdir}/{name}/*.parquet'))
    if not files:
        return None, None, None, None, 'NO SPARK OUTPUT'
    s_tbls = [pq.read_table(f) for f in files]
    sdf = pd.concat([t.to_pandas() for t in s_tbls], ignore_index=True)
    try:
        o_tbl = con.execute(oracle[name]).fetch_arrow_table()
        odf = o_tbl.to_pandas()
    except Exception as e:
        return sdf, None, s_tbls[0], None, f'ORACLE ERR {e}'
    return sdf, odf, s_tbls[0], o_tbl, None

def compare_once(name):
    """One full compare of `name`. Returns (ok, why, s_digest, o_digest,
    s_rows, o_rows); digests are None when a leg failed to read."""
    sdf, odf, s_tbl0, o_tbl, err = read_legs(name)
    if err:
        return (False, err,
                leg_digest(sdf) if sdf is not None else None, None,
                len(sdf) if sdf is not None else -1, -1)
    ok = True; why = []
    tmis = type_check(s_tbl0, o_tbl)
    if tmis:
        ok = False; why.append('types ' + '; '.join(tmis))
    elif sorted(sdf.columns) != sorted(odf.columns):
        ok = False; why.append(f'schema {sorted(sdf.columns)} vs {sorted(odf.columns)}')
    elif len(sdf) != len(odf):
        ok = False; why.append(f'rows {len(sdf)} vs {len(odf)}')
    else:
        s = sdf[sorted(sdf.columns)]; o = odf[sorted(odf.columns)]
        for c in s.columns:
            sv = [sig10(v) for v in s[c].tolist()]
            ov = [sig10(v) for v in o[c].tolist()]
            if sv != ov:
                ok = False
                i = next(i for i in range(len(sv)) if sv[i] != ov[i])
                why.append(f'{c}[{i}]: {sv[i]} vs {ov[i]}')
                break
    return ok, '; '.join(why), leg_digest(sdf), leg_digest(odf), len(sdf), len(odf)

npass = nfail = 0
adopted = []
for name in sorted(oracle):
    if only and name not in only: continue
    ok, why, sd1, od1, sr1, or1 = compare_once(name)
    if not ok:
        # transient attribution: re-read BOTH legs once and log which one
        # moved before letting the verdict stand
        ok2, why2, sd2, od2, sr2, or2 = compare_once(name)
        changed = [leg for leg, a, b in
                   [('spark', sd1, sd2), ('oracle', od1, od2)] if a != b]
        attributable = changed == ['spark']
        print(f'{name}: TRANSIENT-CHECK first=FAIL({why}) '
              f'recompare={"PASS" if ok2 else f"FAIL({why2})"} '
              f'changed_leg={",".join(changed) if changed else "none"} '
              f'{"" if attributable or not ok2 else "UNATTRIBUTABLE->FAIL "}'
              f'spark_digest={sd1}->{sd2} oracle_digest={od1}->{od2} '
              f'spark_rows={sr1}->{sr2} oracle_rows={or1}->{or2}')
        if ok2 and attributable:
            adopted.append(name)
            ok, why = ok2, why2
        elif ok2:
            # oracle leg moved (deterministic SQL over immutable parquet
            # must not) or neither digest moved: the PASS is not adoptable
            ok, why = False, f'recompare PASS rejected (changed_leg=' \
                f'{",".join(changed) if changed else "none"}); first: {why}'
        else:
            ok, why = ok2, why2
    if ok: npass += 1
    else:
        nfail += 1
        print(f'{name}: FAIL ({why})')
if len(adopted) > MAX_TRANSIENT_ADOPTIONS:
    # retract the adoptions: move each adopted query from pass to fail
    # (not nfail += on top of an unchanged npass, which double-counts and
    # inflates the summary total past the number of queries compared)
    print(f'TOO MANY TRANSIENT ADOPTIONS ({len(adopted)} > '
          f'{MAX_TRANSIENT_ADOPTIONS}): {",".join(adopted)} — failing the run')
    for name in adopted:
        print(f'{name}: FAIL (transient adoption retracted: cap exceeded)')
    npass -= len(adopted)
    nfail += len(adopted)
if npass + nfail == 0:
    # a typo'd --only filter or an empty dump must not read as success
    print('NO QUERIES COMPARED (bad name filter or empty outdir)')
    sys.exit(2)
print(f'PASS {npass}/{npass+nfail}')
sys.exit(1 if nfail else 0)
