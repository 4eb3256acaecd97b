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
- A query with an old band but ABSENT from the capture (errored, or a
  partial capture) KEEPS its old band — coverage is never silently lost.
- extra_p50s.json (optional): {"name": p50} for queries measured outside
  the committed capture (e.g. added after it) — treated as new.
The canary band is preserved verbatim. Refuses a dirty capture
(n_failed > 0 or canary outside the committed band) — the policy's
"clean capture" precondition, enforced rather than assumed.
"""
import json, sys

bench = json.load(open("BENCH.json"))
old = json.load(open("BANDS.json"))
if bench.get("n_failed", len(bench.get("errors", {}))) or bench.get("errors"):
    sys.exit(f"REFUSING: capture has failures: {bench.get('errors')}")
clo, chi = old["_canary"]
canary = bench.get("canary", {})
for side in ("start_sec", "end_sec"):
    if not (clo <= canary.get(side, clo) <= chi):
        sys.exit(f"REFUSING: canary {side}={canary.get(side)} outside "
                 f"the committed [{clo}, {chi}] band — contended capture")
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
kept = sorted(set(old["bands"]) - set(p50s))
for q in kept:  # absent from the capture: keep coverage, loudly
    bands[q] = old["bands"][q]

out = {
    "_comment": (
        "per-query p50 bands [lo,hi] sec at sf0.1, refreshed from the latest "
        "clean (canary-in-band) BENCH.json: in-band queries keep the history "
        "union, moved/new queries band on the capture alone, x1.5 slack. "
        "EDIT the capture details into this comment after each refresh."),
    "_canary": old["_canary"],
    "bands": bands,
}
json.dump(out, open("BANDS.json", "w"), indent=1)
print(f"{len(bands)} bands; re-based (moved): {moved}")
print(f"new: {fresh}")
if kept:
    print(f"KEPT OLD BAND (absent from capture — investigate): {kept}")
