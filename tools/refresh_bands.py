#!/usr/bin/env python3
"""Re-derive BANDS.json from a clean (canary-in-band) BENCH.json capture.

Usage: python3 tools/refresh_bands.py [extra_p50s.json]

Policy (the r8 protocol, r10 edition):
- A query whose new p50 sits INSIDE its old band did not move: its band
  becomes the union [min(old_lo, p50/1.5), max(old_hi, p50*1.5)] — history
  keeps the lower edge honest, the new capture keeps the ceiling current.
- A query whose new p50 sits OUTSIDE its old band moved (r10: the events
  regeneration + loader change re-based the whole S-series): it re-bands
  on the clean capture alone, [p50/1.5, p50*1.5].
- A query with no old band (new this round) bands on the capture alone.
- extra_p50s.json (optional): {"name": p50} for queries measured outside
  the committed capture (e.g. added after it) — treated as new.
The canary band is preserved verbatim.
"""
import json, sys

bench = json.load(open("BENCH.json"))
old = json.load(open("BANDS.json"))
p50s = dict(bench["queries"])
if len(sys.argv) > 1:
    p50s.update(json.load(open(sys.argv[1])))

bands, moved, fresh = {}, [], []
for q, v in sorted(p50s.items()):
    ob = old["bands"].get(q)
    lo, hi = round(v / 1.5, 3), round(v * 1.5, 3)
    if ob and ob[0] <= v <= ob[1]:
        bands[q] = [round(min(ob[0], lo), 3), round(max(ob[1], hi), 3)]
    else:
        bands[q] = [lo, hi]
        (moved if ob else fresh).append(q)

out = {
    "_comment": (
        "per-query p50 bands [lo,hi] sec at sf0.1. r10 refresh: derived from "
        "the r10 clean capture (canary 0.304/0.307, ratio 1.011, n_failed 0) "
        "after the events-loader fix; queries inside their r8 band keep the "
        "history union, queries moved by the events regeneration (the "
        "S-series replay re-based) and new queries (l36/l37/l38/s2b/l39) "
        "band on the r10 capture alone, x1.5 slack. j12_recursive: the "
        "4-5 s level-loop floor is DECLARED (materialized sequence + "
        "BROADCAST + single-task levels is already the minimal per-level "
        "plan; see Joins.scala j12 comment) and banded at that floor."),
    "_canary": old["_canary"],
    "bands": bands,
}
json.dump(out, open("BANDS.json", "w"), indent=1)
print(f"{len(bands)} bands; re-based (moved): {moved}")
print(f"new: {fresh}")
