#!/usr/bin/env bash
# Reproduce the 10x scaling artifacts (dev tooling, not shipped):
#   BENCH_SF1.json       — heavy-tail set at sf0.1 AND the 10x dir
#   BENCH_SF1_FULL.json  — ALL declared queries at the 10x dir,
#                          base side = committed BENCH_LOCAL.json
# Usage: scripts/bench_sf1.sh [--full]
#   default: heavy-tail set both scales (~15 min idle box)
#   --full:  full suite at 10x only (~15 min; refresh BENCH_LOCAL first
#            via precommit --bench so the base side is current)
# Prereq: the 10x dir (regenerate after any testdata change):
#   sbt -batch "runMain graft.tools.ScaleTestdata /root/testdata/sf0.1 /root/repo/testdata_sf1 10"
set -euo pipefail
cd /root/repo
SF1=/root/repo/testdata_sf1
[[ -d $SF1 ]] || { echo "missing $SF1 — see prereq in this script"; exit 1; }

HEAVY="q_agg_approx_distinct q_bpe_encode q_common_span_ratio q_curate_e2e \
q_curate_funnel q_decontaminate_bloom q_dedup_apply q_dedup_cluster_sizes \
q_dedup_eval q_dedup_incremental q_dedup_keep_best q_dedup_minhash_incr_recall \
q_dedup_minhash_incremental q_dedup_simhash_incr_recall q_dedup_simhash_incremental \
q_dedup_substring q_merge_upsert q_normalize_text q_repetition_gopher \
q_repetition_ratio q_scd2 q_scrub_spans q_sim_eval_pq q_unpivot \
q_win_range_frame_bucketed \
q_dedup_containment q_dedup_containment_incremental q_source_overlap \
q_corpus_novelty q_split_leakage"

if [[ "${1:-}" == "--full" ]]; then
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$SF1 \
    SPARK_GRAFT_BENCH_OUT=/tmp/sf1_full.json \
    sbt -batch "runMain graft.Bench" >/dev/null
  python3 - <<'PYEOF'
import json, statistics
base = json.load(open('BENCH_LOCAL.json'))
scaled = json.load(open('/tmp/sf1_full.json'))
qb, qs = base['queries'], scaled['queries']
shared = sorted(set(qb) & set(qs))
ratios = {q: round(qs[q] / qb[q], 2) for q in shared if qb[q] > 0}
rv = sorted(ratios.values())
out = {
 'generator': 'graft.tools.ScaleTestdata sf0.1 -> 10x (substitution-cipher relabeling)',
 'method': scaled['method'],
 'note': ('ALL declared queries at 10x; base side = committed '
          'BENCH_LOCAL.json (same plans, same box)'),
 'n_queries': len(shared), 'sf_base': base['sf'], 'sf_scaled': scaled['sf'],
 'total_base_sec': base['value'], 'total_scaled_sec': scaled['value'],
 'suite_ratio': round(scaled['value'] / base['value'], 3),
 'median_ratio': round(statistics.median(rv), 3),
 'p90_ratio': round(rv[int(len(rv) * 0.9)], 3), 'max_ratio': round(rv[-1], 3),
 'queries_scaled': {q: qs[q] for q in sorted(qs)}, 'ratios': ratios,
}
json.dump(out, open('BENCH_SF1_FULL.json', 'w'), indent=1, sort_keys=True)
print('BENCH_SF1_FULL.json:', base['value'], '->', scaled['value'],
      'suite_ratio', out['suite_ratio'])
PYEOF
else
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT=/tmp/sf1_base.json \
    sbt -batch "runMain graft.Bench $HEAVY" >/dev/null
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$SF1 \
    SPARK_GRAFT_BENCH_OUT=/tmp/sf1_scaled.json \
    sbt -batch "runMain graft.Bench $HEAVY" >/dev/null
  python3 - <<'PYEOF'
import json
base = json.load(open('/tmp/sf1_base.json'))
scaled = json.load(open('/tmp/sf1_scaled.json'))
qb, qs = base['queries'], scaled['queries']
shared = sorted(set(qb) & set(qs))
out = {
 'generator': ('graft.tools.ScaleTestdata sf0.1 -> 10x (per-copy substitution-cipher '
               'relabeling for documents - measure-preserving at token AND char level; '
               'deterministic embedding perturbation; id-offset replication for '
               'events/orders/lineitem)'),
 'method': base['method'], 'sf_base': base['sf'], 'sf_scaled': scaled['sf'],
 'total_base_sec': base['value'], 'total_scaled_sec': scaled['value'],
 'scaling_factor': round(scaled['value'] / base['value'], 3),
 'queries_base': {q: qb[q] for q in sorted(qb)},
 'queries_scaled': {q: qs[q] for q in sorted(qs)},
 'ratios': {q: round(qs[q] / qb[q], 2) for q in shared if qb[q] > 0},
 'recall_at_scale': 'run Verify + selfcheck q_dedup_*_incr_recall on the 10x dir',
}
json.dump(out, open('BENCH_SF1.json', 'w'), indent=1, sort_keys=True)
print('BENCH_SF1.json:', base['value'], '->', scaled['value'],
      'factor', out['scaling_factor'])
PYEOF
fi
echo "bench_sf1: OK"
