#!/bin/bash
# r18: assemble the 9 missing BENCH_scale.json rows (verdict ask #5)
# from target/bench_detail.partial.json (targeted sf0.01 run) + the
# post-run-B bench_detail.json sidecar. Grouped by input table.
set -euo pipefail
cd /root/repo
P=target/bench_detail.partial.json
python3 tools/assemble_scale.py "$P" q36_aqe_skew_join "lineitem+supplier" 10.0
python3 tools/assemble_scale.py "$P" \
  j05_band_join_full_outer,j06_band_join_right_outer,t26_cms_frequency,t27_quantile_maintenance,t29_cms_maintenance,st08_stream_quantiles,t30_user_quantiles \
  events 10.0
python3 tools/assemble_scale.py "$P" t28_curation_chain documents 10.0
