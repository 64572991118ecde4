#!/usr/bin/env python
"""Compare two bench records with bound-aware regression classification.

The driver stores one ``BENCH_r{N}.json`` per round ({"rc", "parsed", ...});
bench.py itself emits one-line aggregates ({"metric", "value", ...,
"extra"}). This tool loads any two such records (driver file, raw bench
line, or a file of bench snapshot lines — the last parseable line wins) and
reports per-metric deltas, classifying each row:

  device        — device-bound metric: a delta is a real change
  host-link     — tagged (or known) link-bound row: the tunnel's
                  minute-scale bandwidth drift swings these 2-10x
                  (BASELINE.md sparse-transport row measured 57-667
                  songs/s at one HEAD), so a delta here is WEATHER unless
                  it escapes BOTH runs' min/max spread envelopes
  compile/cache — one-time costs, not throughput

Exit status: 0 always (reporting tool); the JSON line carries
``regressions`` for anything device-bound moving worse by more than
``--threshold`` (default 10%).

    python scripts/bench_compare.py BENCH_r03.json BENCH_r05.json
"""

from __future__ import annotations

import argparse
import json
import sys

# rows that ride the tunneled device->host link even when the record
# predates the per-row "bound"/spread tags (r5) — matched by prefix
LINK_BOUND_PREFIXES = ("serving_service",)
COMPILE_PREFIXES = ("compile_", "train_compile")
# higher-is-better metrics; everything else numeric defaults to
# lower-is-better (latencies, ms/step)
HIGHER_BETTER_SUBSTR = ("per_sec", "per_chip", "sweeps", "mfu", "util",
                        "vs_baseline")


def is_higher_better(name: str) -> bool:
    # *_batch rows are VMEM-gate CAPACITIES (serving_batch shrinking is a
    # capacity regression, not an improvement); suffix-matched so latency
    # rows like gen_per_song_s_at_batch8 stay lower-is-better
    return (any(s in name for s in HIGHER_BETTER_SUBSTR)
            or name.endswith("_batch"))


def load_record(path: str) -> dict:
    """Return the bench aggregate {"metric", ..., "extra"} from any of the
    accepted shapes."""
    with open(path) as f:
        text = f.read()
    # driver files are one pretty-printed JSON object; bench stdout is one
    # JSON snapshot per line (last parseable wins)
    best = None
    try:
        best = json.loads(text)
    except json.JSONDecodeError:
        pass
    for line in ([] if best is not None else text.splitlines()):
        line = line.strip()
        if not line or not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        best = rec
    if best is None:
        raise SystemExit(f"{path}: no parseable JSON record")
    if "parsed" in best and isinstance(best.get("parsed"), (dict,
                                                           type(None))):
        if best["parsed"] is None:
            raise SystemExit(f"{path}: driver record has parsed=null "
                             f"(rc={best.get('rc')}) — nothing to compare")
        best = best["parsed"]
    if "extra" not in best:
        raise SystemExit(f"{path}: not a bench record (no 'extra')")
    return best


def flatten(rec: dict) -> dict:
    """Numeric leaves of the aggregate, keyed by metric name. Spread/bound
    annotations and sections are kept separately by callers."""
    out = {}
    ex = rec.get("extra", {})
    for k, v in ex.items():
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            out[k] = float(v)
        elif k == "mfu" and isinstance(v, dict):
            for mk, mv in v.items():
                if isinstance(mv, (int, float)) and not isinstance(mv,
                                                                   bool):
                    out[f"mfu.{mk}"] = float(mv)
    # legacy records kept the headline only at the top level
    if "gen_latency_64bar_5track_s" not in out and rec.get(
            "metric") == "gen_latency_64bar_5track":
        out["gen_latency_64bar_5track_s"] = float(rec["value"])
    return out


def classify(name: str, extra_a: dict, extra_b: dict) -> str:
    if any(name.startswith(p) for p in COMPILE_PREFIXES):
        return "compile/cache"
    bound = (extra_b.get(f"{name.rsplit('_songs_per_sec', 1)[0]}_bound")
             or extra_b.get("serving_service_musical_bound")
             if name.startswith("serving_service_musical") else None)
    if bound == "host-link" or any(name.startswith(p)
                                   for p in LINK_BOUND_PREFIXES):
        return "host-link"
    return "device"


def spread_of(name: str, rec: dict):
    base = name.rsplit("_songs_per_sec", 1)[0]
    sp = rec.get("extra", {}).get(f"{base}_spread")
    if isinstance(sp, dict) and "min" in sp and "max" in sp:
        return float(sp["min"]), float(sp["max"])
    return None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__, allow_abbrev=False)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.10,
                    help="relative change flagged as a regression "
                         "(device-bound rows only)")
    args = ap.parse_args(argv)

    rec_a, rec_b = load_record(args.old), load_record(args.new)
    fa, fb = flatten(rec_a), flatten(rec_b)
    rows, regressions = [], []
    for name in sorted(set(fa) & set(fb)):
        a, b = fa[name], fb[name]
        if a == 0:
            if b != 0:
                # a previously-broken/absent measurement came back — show
                # it instead of silently dropping the row
                rows.append({"metric": name, "old": a, "new": b,
                             "rel_change": None, "bound": classify(
                                 name, rec_a.get("extra", {}),
                                 rec_b.get("extra", {})),
                             "verdict": "recovered(old=0)"})
            continue
        higher = is_higher_better(name)
        rel = (b - a) / abs(a)
        improved = rel > 0 if higher else rel < 0
        cls = classify(name, rec_a.get("extra", {}), rec_b.get("extra", {}))
        verdict = "improved" if improved else "regressed"
        if abs(rel) <= args.threshold:
            verdict = "~same"
        if cls == "host-link" and verdict == "regressed":
            # only a move outside BOTH runs' spread envelopes counts
            sa, sb = spread_of(name, rec_a), spread_of(name, rec_b)
            if sa and sb and (sb[1] < sa[0] if higher else sb[0] > sa[1]):
                verdict = "regressed(beyond-spread)"
            else:
                verdict = "link-weather"
        if cls == "compile/cache" and verdict == "regressed":
            verdict = "one-time-cost"
        rows.append({"metric": name, "old": a, "new": b,
                     "rel_change": round(rel, 3), "bound": cls,
                     "verdict": verdict})
        if verdict.startswith("regressed") and cls == "device":
            regressions.append(name)
    w = max((len(r["metric"]) for r in rows), default=10)
    for r in rows:
        rel = ("   n/a " if r["rel_change"] is None
               else f"{r['rel_change']:>+7.1%}")
        print(f"# {r['metric']:<{w}}  {r['old']:>12.4g} -> "
              f"{r['new']:>12.4g}  {rel}  "
              f"[{r['bound']}] {r['verdict']}", file=sys.stderr)
    print(json.dumps({"n_compared": len(rows),
                      "regressions": regressions,
                      "rows": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
