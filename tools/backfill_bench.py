#!/usr/bin/env python3
"""Recover per-query timings from recorded bench tails (ADVICE round-4).

BENCH_r01-r04 captured only the last ~2000 chars of stdout, so the driver's
`parsed` stayed null; the raw tails still carry most of the per-query map.
This extracts every `"name": seconds` pair from each round's tail (plus the
full map from BENCH_DETAIL.json for rounds that wrote one) into
BENCH_HISTORY.json: {round: {query: seconds}} — the round-over-round
comparison the regression analysis in VERDICT r4 did by hand.

Usage: python3 tools/backfill_bench.py   (run from the repo root)
"""
import glob
import json
import re

pair = re.compile(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)')
history = {}

for path in sorted(glob.glob("BENCH_r*.json")):
    rnd = path[len("BENCH_"):-len(".json")]
    doc = json.load(open(path))
    qs = {}
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        qs.update(parsed["queries"])
    tail = doc.get("tail") or ""
    # the first pair in a truncated tail may open mid-number — drop it
    # unless the tail happens to start exactly at a quote
    matches = pair.findall(tail)
    if matches and not tail.startswith('"') and tail[:1] != "{":
        matches = matches[1:]
    for name, sec in matches:
        if name not in ("value", "sf", "n"):
            qs.setdefault(name, float(sec))
    if qs:
        history[rnd] = dict(sorted(qs.items()))

try:
    detail = json.load(open("BENCH_DETAIL.json"))
    history["detail_latest"] = dict(sorted(detail["queries"].items()))
except (FileNotFoundError, KeyError):
    pass

json.dump(history, open("BENCH_HISTORY.json", "w"), indent=1)
for rnd, qs in history.items():
    print(f"{rnd}: {len(qs)} queries recovered, "
          f"sum {sum(qs.values()):.1f}s")
