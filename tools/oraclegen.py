import duckdb, math, sys
# Pinned-literal oracle generator: rebuilds the VALUES lists in Oracles.scala
# from a verified graft.Verify dump (default /tmp/verify_out). Rerun after any
# behavior change to the four pinned queries, paste output into Oracles.scala.
out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
SPECS = {
  'q07_mutual_info_orders': (['column_1','column_2','mutual_info'], ['s','s','d'], 'ORDER BY column_1, column_2'),
  'q16_medcouple_outliers': (['column_name','method','low','high','num_low','num_high'], ['s','s','d','d','i','i'], ''),
  'q34_dependence_max': (['column_1','column_2','mutual_info','pearson','spearman','max'], ['s','s','d','d','d','d'], 'ORDER BY column_1, column_2'),
  'q36_ivf_ann': (['query_id','candidate_id','cosine'], ['i','i','d'], 'ORDER BY query_id, candidate_id'),
  'q63_pq_error': (['vec_id','mean_err','max_err'], ['i','d','d'], 'ORDER BY vec_id'),
  'q64_ivf_pq': (['query_id','candidate_id','cosine'], ['i','i','d'], 'ORDER BY query_id, candidate_id'),
  'q74_bloom_contamination': (['doc_id','bloom_hits'], ['i','i'], 'ORDER BY doc_id'),
  'q75_kmeans': (['cluster','n','inertia'], ['i','i','d'], 'ORDER BY cluster'),
  'q76_semdedup': (['cluster','n','n_dropped'], ['i','i','i'], 'ORDER BY cluster'),
  'q92_bpe_train': (['rank','left','right','merged'], ['i','s','s','s'], 'ORDER BY rank'),
  'q93_bpe_pieces': (['source','n_docs','total_pieces'], ['s','i','i'], 'ORDER BY source'),
  'q103_pca_project': (['vec_id','pc1','pc2','pc3','pc4'], ['i','d','d','d','d'], 'ORDER BY vec_id'),
  'q111_tokenize_pack': (['pack_id','n_docs','n_tokens','fill'], ['s','i','i','d'], 'ORDER BY pack_id'),
  'q104_opq_error': (['method','avg_mean_err','avg_max_err'], ['s','d','d'], 'ORDER BY method'),
  'q105_ivf_opq': (['query_id','candidate_id','cosine'], ['i','i','d'], 'ORDER BY query_id, candidate_id'),
}
def lit(v, t):
    if t == 's': return "'" + str(v).replace("'","''") + "'"
    if t == 'i': return f"CAST({int(v)} AS BIGINT)"
    if v is None or (isinstance(v, float) and math.isnan(v)): return 'CAST(NULL AS DOUBLE)'
    return f"CAST({repr(float(v))} AS DOUBLE)"
import glob, os
for q, (cols, types, order) in SPECS.items():
    if not glob.glob(f'{out}/{q}/*.parquet'):
        print(f'-- {q}: no dump at {out}, skipped', file=sys.stderr)
        continue
    df = duckdb.sql(f"SELECT * FROM '{out}/{q}/*.parquet'").df()
    # NULL vs NaN: parquet NULL arrives as NaN in pandas; re-read masks
    mask = duckdb.sql("SELECT " + ", ".join(f'"{c}" IS NULL AS "{c}"' for c in cols) + f" FROM '{out}/{q}/*.parquet'").df()
    rows = []
    for i in range(len(df)):
        vals = [ 'CAST(NULL AS DOUBLE)' if (types[j]=='d' and mask[cols[j]][i]) else lit(df[cols[j]][i], types[j]) for j in range(len(cols)) ]
        rows.append("      |(" + ",".join(vals) + ")")
    sep = ",\n"
    body = sep.join(rows)
    alias = f"AS t({', '.join(cols)})" + ((" " + order) if order else "")
    name = q.split('_')[0]
    print(f'  val {name}Pinned: String =')
    print(f'    """SELECT * FROM (VALUES')
    print(body)
    print(f'      |) {alias}""".stripMargin')
    print()

# --time-pins: emit the PinnedTimeQueriesSpec literals (q57/q61/q94 checksums
# and rows from the DuckDB oracle SQL at sf0.001). Paste into
# src/test/scala/graft/PinnedTimeQueriesSpec.scala after any intended
# behavior change to those three queries.
if '--time-pins' in sys.argv:
    import json
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM '/root/testdata/sf0.001/events.parquet'")
    q57 = con.execute(
        "SELECT count(*), sum(session_index), sum(n_events), sum(duration_us),"
        " sum(start_us % 1000003), sum(end_us % 1000003) FROM ("
        + oracle['q57_sessionize'] + ")").fetchone()
    print('q57 checksums (n, sum_session_index, sum_n_events, sum_duration_us,'
          ' sum_start_us%1000003, sum_end_us%1000003):')
    print('  ' + ', '.join(f'{int(v)}L' for v in q57))
    q94 = con.execute(
        "SELECT count(*), sum(n_window), sum(sum_cents_window),"
        " sum(event_id*n_window) FROM (" + oracle['q94_rolling_window'] + ")").fetchone()
    print('q94 checksums (n, sum_n_window, sum_sum_cents, sum_event_id*n_window):')
    print('  ' + ', '.join(f'{int(v)}L' for v in q94))
    print('q61 rows:')
    for r in con.execute(oracle['q61_timedelta']).fetchall():
        print('      (' + ', '.join(f'{int(v)}L' for v in r) + '),')
