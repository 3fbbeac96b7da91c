import json

a = json.load(open('/root/repo/bench_history/r22a.json'))
d = json.load(open('/root/repo/bench_history/r22e.json'))
qa, qd = a['queries'], d['queries']
duck = d.get('duck_queries') or {}

ch1 = {'x47_bm25_topk', 'x48_rrf_fusion', 'x21_tfidf_topk'}
ch2 = {'x54_arrival_inclusion', 'x50_inclusion', 'x49_containment'}
ch7 = {'x19_dedup_clusters', 'x20_dedup_survivors', 'x36_quality_survivors',
       'x5_exact_dedup', 'x6_minhash_lsh', 'x7_jaccard_neardup',
       'x23_dup_ngrams', 'x32_curation_pipeline', 'x40_line_dedup',
       'x44_dup_span_scrub', 'x10_embedding_neardup', 'x35_semdedup',
       'm5_phash_neardup'}
ch3 = {'x8_simhash', 'x34_simhash60', 'x22_contamination',
       'x42_decontaminate', 'k8_salted_agg', 'x45_bigram_nll',
       'x51_interp_nll', 'x53_incremental_lm', 'x41_unigram_nll',
       'x14_cms_estimates', 'x29_bloom_prefilter', 'x4_fingerprint'}
ch6 = {'x43_dsir_select'}
storage = {'k11', 'k12', 'k13', 'k14', 'k17', 'k18', 'k19', 'k20', 'k22',
           'k23', 'k24', 'k25', 'k26', 'k29', 'k30'}
logreaders = {'k2_upsert_orders', 'k5_update_join', 'k7_view_sql',
              'k9_bucketed_join', 'k10_zorder_key', 'k15_log_timewindow',
              'k16_catalog_sql', 'k21_stats_agg', 'k27_constrained_load',
              'k28_string_constraint', 'k4_align_columns'}
examined = {
  'j3_item_refund_join': 'examined (r21 audit carried): broadcast join, pushed filters — left',
  'j1_enrich_items': 'examined (r21 audit carried): broadcast dim join — left',
  'w1_pergroup_topk': 'examined: salted top-k exchange is scale-deliberate — left',
  'x52_pq_rerank': 'examined: native PQ loops, beats duck 2-5x — left',
  'x46_ivfpq_topk': 'examined: native PQ loops, beats duck 5x — left',
  'x16_ivf_topk': 'examined: IVF probe shape audited — left',
  'x2_lang_id': 'examined: beats duck 7x — left',
  'x24_hll_distinct': 'examined: native HLL agg — left',
  'x30_incremental_dedup': 'examined: batch x index shape audited — left',
  'x38_ingest_dedup': 'examined: pair-graph rounds (r21) — left',
  'x39_cluster_balance': 'examined: cluster stats floor — left',
}

def disp(q):
    p = q[:3]
    if q in ch1: return 'CHANGED §1: query-restricted df + one totals action'
    if q in ch2: return 'CHANGED §2: one-scan derived corpus (4→1 / 2→1)'
    if q in ch7: return 'CHANGED §7: one-scan derived corpus (Corpora.derived)'
    if q in ch6: return 'CHANGED §6: overlapped artifact builds (+§3 digest)'
    if q in ch3: return 'CHANGED §3: thread-cached digest / byte-direct shingles'
    if p in storage: return 'CHANGED §4: shared Hadoop conf (no XML re-parse per commit/task)'
    if q in logreaders: return 'CHANGED §4: shared Hadoop conf on the log scan path'
    if q in examined: return examined[q]
    return 'tail: floor-bound (scan + ≤3 AQE stages + noop), untouched'

rows = sorted(qd.items(), key=lambda kv: -kv[1])
print('| query | r22a cold | r22e cold | duck (r22e) | disposition |')
print('|---|---|---|---|---|')
for q, v in rows:
    av = qa.get(q)
    dk = duck.get(q)
    print(f"| {q} | {av:.3f} | {v:.3f} | {dk if dk is None else format(dk,'.3f')} | {disp(q)} |")
