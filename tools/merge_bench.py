#!/usr/bin/env python3
"""Merge Bench's self-delimiting chunk lines into the single-object form
scaling_report.py consumes: {'queries': {...}, 'sf': ..., 'reps': ...}.
Usage: python3 tools/merge_bench.py <raw_lines_file> <out.json>
Accepts either the chunked form (N chunk lines + one total line) or the
single-line form; fails loudly on missing parts."""
import json, sys

raw, out = sys.argv[1], sys.argv[2]
queries, total = {}, None
parts_seen, parts_expected = 0, None
for line in open(raw):
    line = line.strip()
    if not line or '"metric"' not in line:
        continue
    rec = json.loads(line[line.index('{'):])  # strip any sbt [info] prefix
    if rec.get('metric') == 'chunk':
        queries.update(rec['queries'])
        parts_seen += 1
        parts_expected = rec['parts']
    elif rec.get('metric') == 'total':
        total = rec
        if 'queries' in rec:  # single-line form
            queries.update(rec['queries'])
if total is None:
    sys.exit('no total line found')
if parts_expected is not None and parts_seen != parts_expected:
    sys.exit(f'chunk lines missing: {parts_seen}/{parts_expected}')
merged = {
    'metric': 'total', 'value': total['value'], 'unit': 'sec',
    'reps': total.get('reps'), 'sf': total.get('sf'),
    'nqueries': len(queries), 'queries': queries,
}
with open(out, 'w') as f:
    json.dump(merged, f, indent=1)
print(f"{out}: {total['value']}s / {len(queries)} queries / reps={total.get('reps')}")
