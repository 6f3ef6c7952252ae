#!/usr/bin/env python3
"""Bench-artifact comparator + ambient-load adjudicator (dev tool only).

Usage:
  python3 tools/benchdiff.py OLD.json NEW.json [--ratio 2.0] [--spot SPOT.json]

Compares two Bench artifacts (the one-line JSON `graft.Bench` writes)
and lists every query whose per-query MIN moved by more than --ratio in
either direction. For each mover it prints the raw runs and the per-run
load averages from NEW (the self-defending columns Bench records), so a
reader can tell a code regression from ambient load without
re-measuring.

Adjudication: pass --spot SPOT.json (a Bench artifact produced by
tools/spotbench.sh re-running just the movers on an idle box). Each
mover present in SPOT is classified:

  improvement          the min got FASTER >ratio: listed, never gates
  load-artifact        spot min <= 1.5 x the OLD min (the idle re-run
                       returned to the old cost: the NEW number was
                       contamination)
  confirmed-regression otherwise (the idle re-run reproduces the
                       slowdown: it is real)

Output is one JSON object (movers + verdicts + numbers) on stdout —
commit it beside the bench artifact at round close so the adjudication
is part of the record. Exit code: 0 when every mover is adjudicated
load-artifact or no movers exist; 1 when any mover is unadjudicated or
confirmed — the round-close step must then look.
"""
import sys, json


def load(path):
    """Accepts Bench's own one-line artifact (bench_out.json) or the
    round driver's wrapper ({"n","rc","tail","parsed",...}) when its
    "parsed" payload survived stdout truncation."""
    with open(path) as f:
        d = json.loads(f.read())
    if "queries" in d:
        return d
    p = d.get("parsed")
    if isinstance(p, dict) and "queries" in p:
        return p
    sys.exit(f"{path}: driver wrapper with no parsed payload "
             f"(truncated tail) — compare the committed bench_out.json "
             f"from that round instead")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {}
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--ratio":
            opts["ratio"] = float(next(it))
        elif a == "--spot":
            opts["spot"] = next(it)
    if len(args) < 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    ratio = opts.get("ratio", 2.0)
    spot = load(opts["spot"]) if "spot" in opts else None

    movers = []
    skipped_old = []
    for q, nv in sorted(new["queries"].items()):
        ov = old["queries"].get(q)
        if ov is not None and ov <= 0 < nv:
            # OLD failed, NEW succeeded: not a ratio, but absence must
            # not read as "no change" — logged, never gates
            skipped_old.append(q)
            continue
        if ov is None or ov <= 0 or nv <= 0:
            continue  # new query, or a failure — failures live in "errors"
        r = nv / ov
        if r > ratio or r < 1.0 / ratio:
            m = {"query": q, "old_min": ov, "new_min": nv,
                 "ratio": round(r, 3),
                 "new_runs": new.get("runs", {}).get(q),
                 "new_loads": new.get("loads", {}).get(q),
                 "flagged_load_suspect": q in new.get("load_suspect", [])}
            if r < 1:
                # got FASTER: good news, listed for the record but
                # never gates — only slowdowns need adjudication, so a
                # spot result (even a failed one) never overrides this
                m["verdict"] = "improvement"
            if spot and q in spot.get("queries", {}):
                sv = spot["queries"][q]
                m["spot_min"] = sv
                if r > 1 and sv <= 0:
                    m["verdict"] = "spot-run-failed"
                elif r > 1 and sv <= 1.5 * ov:
                    m["verdict"] = "load-artifact"
                elif r > 1:
                    m["verdict"] = "confirmed-regression"
            movers.append(m)
    if skipped_old:
        print(f"NOTE: {len(skipped_old)} queries failed in OLD but "
              f"succeed in NEW (no ratio computable): {skipped_old}",
              file=sys.stderr)

    if old.get("sf") != new.get("sf"):
        print(f"WARNING: comparing different scale factors "
              f"({old.get('sf')} vs {new.get('sf')}) — ratios are not "
              f"regressions", file=sys.stderr)
    out = {"ratio_threshold": ratio,
           "old_sf": old.get("sf"), "new_sf": new.get("sf"),
           "old_total": old.get("value"), "new_total": new.get("value"),
           "n_movers": len(movers), "movers": movers,
           "new_errors": new.get("errors", []),
           "new_load_suspect": new.get("load_suspect", [])}
    print(json.dumps(out, indent=1))
    bad = [m for m in movers
           if m.get("verdict") not in ("load-artifact", "improvement")]
    sys.exit(1 if bad or out["new_errors"] else 0)


if __name__ == "__main__":
    main()
