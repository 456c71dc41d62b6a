#!/usr/bin/env python3
"""Assemble the empirical scaling artifact: per-query wall-time at sf0.1 vs a
10x (sf1) scale-up of the same tables (ScaleGen), both measured with the same
interleaved min-of-reps Bench on the same machine.

Usage: python3 tools/scaling_report.py <bench_sf01.json> <bench_sf1.json> [out]

Writes BENCH_SF1.json: one JSON object with totals, per-query
{base, big, ratio}, and the outlier list (ratio > threshold), so the
"survives 100x" claims rest on a measured 10x datapoint rather than plan
inspection alone. Queries over the fixed-size fixture corpora (q_stix_*,
q_wood_*, q_xlate_*, q_multimodal_*, ...) legitimately scale ~1x; the
sfDir-reading pipeline/relational queries are the ones the ratio tests.
"""
import json, sys

base_p = sys.argv[1] if len(sys.argv) > 1 else '/tmp/bench2_sf01.json'
big_p = sys.argv[2] if len(sys.argv) > 2 else '/tmp/bench2_sf1.json'
out_p = sys.argv[3] if len(sys.argv) > 3 else 'BENCH_SF1.json'
THRESH = 12.0  # 10x data + overhead headroom

base = json.load(open(base_p))
big = json.load(open(big_p))
qb, qg = base['queries'], big['queries']
queries, outliers, failures = {}, [], []
# union of both runs' query sets: a query present only in one run is a
# failure of the other run, never silently dropped
for q in sorted(set(qb) | set(qg)):
    b, g = qb.get(q, -1.0), qg.get(q, -1.0)
    if b < 0 or g < 0:
        failures.append(q)
        queries[q] = {'base': b, 'big': g, 'ratio': None}
        continue
    r = round(g / b, 2) if b > 0 else None
    queries[q] = {'base': b, 'big': g, 'ratio': r}
    if r is not None and r > THRESH:
        outliers.append(q)

tot_b = round(sum(v for v in qb.values() if v > 0), 3)
tot_g = round(sum(v for v in qg.values() if v > 0), 3)
total_ratio = round(tot_g / tot_b, 3) if tot_b > 0 else None
rec = {
    'metric': 'scaling_10x',
    'base_sf': base.get('sf'),
    'big_sf': big.get('sf'),
    'reps': base.get('reps'),
    'nqueries': len(queries),
    'total_base_sec': tot_b,
    'total_big_sec': tot_g,
    'total_ratio': total_ratio,
    'outlier_threshold': THRESH,
    'outliers': outliers,
    'failures': failures,
    'queries': queries,
}
with open(out_p, 'w') as f:
    json.dump(rec, f, indent=1)
ratio_str = f"x{total_ratio:.2f}" if total_ratio is not None else "n/a (no base timings)"
print(f"total {tot_b}s -> {tot_g}s ({ratio_str}); "
      f"{len(outliers)} outliers > {THRESH}x: {outliers}; "
      f"{len(failures)} failures: {failures}")
