#!/usr/bin/env python3
"""Render SCALING.md's results tables from scaling_result.json.

Emits (to stdout) the main results table and the tier-vs-tier table,
with wall-time and shuffle-write exponents computed over each query's
widest measured span. Run after `sbt "runMain graft.ScalingBench"`;
paste the output into SCALING.md so the committed narrative can never
drift from the committed data (the round-7 verdict's "stale SCALING.md"
finding is structurally prevented by generating, not transcribing).
"""
import json
import math
import sys

PATH = sys.argv[1] if len(sys.argv) > 1 else "scaling_result.json"
rows = json.load(open(PATH))

by_q = {}
for r in rows:
    by_q.setdefault(r["query"], {})[r["scale"]] = r

TIER = ["q39_stratified_sample", "q209_stratified_bottomk",
        "q145_grouped_quantiles", "q207_kll_grouped"]
MAIN = [q for q in by_q if q not in TIER]
ORDER = ["q41_ngram_jaccard", "q45_simhash_pairs", "q45b_simhash_wide",
         "q45c_simhash_assign", "q48_dedup_apply", "q53_embed_neardup",
         "q66_winnow_pairs", "q67_semantic_dedup", "q113_ensemble_dedup",
         "q124_triangles", "q131_graph_components",
         "q219_embed_autotune", "q220_ivf_decon", "q222_ivf_semdedup"]


def exp(v1, vN, n):
    if not v1 or not vN or v1 <= 0 or vN <= 0:
        return None
    return math.log(vN / v1) / math.log(n)


def fmt(x, nd=2):
    return "" if x is None else f"{x:.{nd}f}"


def mb(r):
    return r.get("shuffle_write_mb")


print("| query | rows ×1 | ×64 | row growth | t×1 s | ×4 | ×16 | ×64 |"
      " wall exp | shW ×1 MB | ×64 | shW exp |")
print("|---|---|---|---|---|---|---|---|---|---|---|---|")
for q in [q for q in ORDER if q in MAIN] + sorted(set(MAIN) - set(ORDER)):
    p = by_q[q]
    scales = sorted(p)
    base, top = scales[0], scales[-1]
    # exponents fit over the widest span PRESENT — a partial matrix
    # (e.g. SPARK_GRAFT_SCALES=4,16,64 or a merged re-run) must render,
    # not crash
    r1, rN = p[base], p[top]
    span = top / base
    growth = (f"×{rN['rows'] / r1['rows']:.1f}"
              if r1["rows"] and top > base else "—")
    we = exp(r1["sec"], rN["sec"], span) if top > base else None
    se = (exp(mb(r1), mb(rN), span)
          if top > base and mb(r1) and mb(rN) else None)
    cells = [q,
             f"{r1['rows']:,}".replace(",", " ") + ("" if base == 1 else f" (×{base})"),
             f"{rN['rows']:,}".replace(",", " ") if top >= 64 else "",
             growth,
             fmt(p[1]["sec"]) if 1 in p else "",
             fmt(p[4]["sec"]) if 4 in p else "",
             fmt(p[16]["sec"]) if 16 in p else "",
             fmt(p[64]["sec"], 1) if 64 in p else "",
             f"**{we:.2f}**" if we is not None else "",
             fmt(mb(r1), 1) if mb(r1) is not None else "",
             fmt(mb(rN), 1) if top >= 64 and mb(rN) is not None else "",
             f"**{se:.2f}**" if se is not None else ""]
    print("| " + " | ".join(cells) + " |")

print()
print("| query | t×1 s | ×4 | ×16 | ×64 | shW ×1 MB | ×16 | ×64 |")
print("|---|---|---|---|---|---|---|---|")
for q in TIER:
    if q not in by_q:
        continue
    p = by_q[q]
    cells = [q] + [fmt(p[s]["sec"]) if s in p else "" for s in (1, 4, 16, 64)]
    cells += [fmt(mb(p[s]), 2) if s in p and mb(p[s]) is not None else ""
              for s in (1, 16, 64)]
    print("| " + " | ".join(cells) + " |")

print()
octaves = []
for q, p in by_q.items():
    s = sorted(p)
    for a, b in zip(s, s[1:]):
        w = exp(p[a]["sec"], p[b]["sec"], b / a)
        octaves.append((q, a, b, w))
print("top-octave wall exps (16->64 where present):")
for q, a, b, w in octaves:
    if b == 64:
        print(f"  {q:26s} {a}->{b}: {w:.2f}")
