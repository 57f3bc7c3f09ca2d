#!/usr/bin/env python3
"""Replica of the driver's t2 DuckDB compare: columns sorted by name,
rows compared in declared order, floats at 10 significant digits.
Type-sensitive (r11): arrow-level column types must also agree after
canonicalization, mirroring the driver hash that flagged rel_q12's
DuckDB HUGEINT (decimal128) vs Spark BIGINT (int64) in round 10."""
import sys, json, glob, math
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

npass = nfail = 0
for name in sorted(oracle):
    if only and name not in only: continue
    files = sorted(glob.glob(f'{outdir}/{name}/*.parquet'))
    if not files:
        print(f'{name}: NO SPARK OUTPUT'); nfail += 1; continue
    s_tbls = [pq.read_table(f) for f in files]
    sdf = pd.concat([t.to_pandas() for t in s_tbls], ignore_index=True)
    try:
        o_tbl = con.execute(oracle[name]).fetch_arrow_table()
        odf = o_tbl.to_pandas()
    except Exception as e:
        print(f'{name}: ORACLE ERR {e}'); nfail += 1; continue
    ok = True; why = []
    tmis = type_check(s_tbls[0], o_tbl)
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
    if ok: npass += 1
    else:
        nfail += 1
        print(f'{name}: FAIL ({"; ".join(why)})')
if npass + nfail == 0:
    # a typo'd --only filter or an empty dump must not read as success
    print('NO QUERIES COMPARED (bad name filter or empty outdir)')
    sys.exit(2)
print(f'PASS {npass}/{npass+nfail}')
sys.exit(1 if nfail else 0)
