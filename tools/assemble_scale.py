#!/usr/bin/env python3
"""Append/update BENCH_scale.json rows from a targeted sf0.01 partial
detail + the full sf0.1 detail sidecar (the r14 protocol: numerators
targeted, denominators from the committed full-inventory sidecar).

Usage: assemble_scale.py <small_partial_detail.json> <query,query,...> <input_table> <input_ratio>
"""
import json
import sys

small = json.load(open(sys.argv[1]))
names = sys.argv[2].split(",")
table = sys.argv[3]
ratio = float(sys.argv[4])
large = json.load(open("bench_detail.json"))
scale = json.load(open("BENCH_scale.json"))

missing = [(n, side) for n in names
           for side, d in (("small", small), ("large", large))
           if n not in d.get("queries", {})]
if missing:
    for n, side in missing:
        print(f"ERROR: {n!r} missing from the {side} detail "
              f"({'partial' if side == 'small' else 'bench_detail.json'}); "
              f"known: {sorted((small if side == 'small' else large).get('queries', {}))[:8]}...",
              file=sys.stderr)
    sys.exit(1)

for n in names:
    ss, sl = small["queries"][n], large["queries"][n]
    shs = small["shuffle_read_mb"].get(n, 0.0)
    shl = large["shuffle_read_mb"].get(n, 0.0)
    scale["queries"][n] = {
        "input_table": table,
        "input_ratio": ratio,
        "sec_small": ss,
        "sec_large": sl,
        "time_ratio": round(sl / ss, 2) if ss else None,
        "shuffle_mb_small": round(shs, 1),
        "shuffle_mb_large": round(shl, 1),
        "shuffle_ratio": round(shl / shs, 2) if shs else None,
    }
    print(n, scale["queries"][n])

json.dump(scale, open("BENCH_scale.json", "w"), indent=1)
print("wrote BENCH_scale.json")
