#!/usr/bin/env python3
"""Merge per-JVM SkewProbe outputs into one SKEW_r{N}.json, stamping
each row with the probe decade and the adversary that produced it
(the per-JVM measurement protocol writes one file per query)."""
import json, sys

out = sys.argv[1]
rows = []
for spec in sys.argv[2:]:
    # spec: path:sf_label:adversary
    path, sf, adv = spec.rsplit(":", 2)  # rsplit: paths may contain colons
    for r in json.load(open(path)):
        rows.append({"sf": sf, "adversary": adv, **r})
json.dump(rows, open(out, "w"), indent=1)
print(f"wrote {out}: {len(rows)} rows")
