#!/usr/bin/env python3
"""Triage two Bench JSON artifacts: real regression vs box load.

Usage: python3 tools/bench_triage.py <old.json> <new.json> [threshold]

For each query, compare the min-wall seconds (the headline) and — when
both artifacts carry it (round 19+) — the executor-CPU seconds for the
min-wall rep (`queries_cpu`). Classification per query whose wall grew
past the threshold (default 1.5x + 50 ms):

  REGRESSION  wall up AND cpu up         -> the work itself grew
  LOAD?       wall up, cpu flat          -> box load (or a driver-side
                                            regression: re-run idle
                                            before dismissing)
  WALL-ONLY   wall up, no cpu in an      -> older artifact; judge by an
              artifact                      idle re-run

Exit code 1 if any REGRESSION rows exist, else 0 (LOAD? rows are
informational: two consecutive rounds of 40-90x phantom wall spikes on
untouched code motivated this tool).

Accepts either the big line ({"metric":"total",...}) or a file whose
first/only JSON object is that line.
"""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    for line in txt.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("metric") == "total" and "queries" in d:
            return d
    # driver artifact shape: {"tail": "<truncated bench stdout>"} — the
    # capture keeps the END of the big line, so the later maps
    # (queries_median, queries_cpu) usually survive intact while the
    # front "queries" map may be cut. Extract whatever labeled maps are
    # whole and fall back to the median as the wall number (say so).
    try:
        d = json.loads(txt)
    except json.JSONDecodeError:
        d = None
    if d is not None and isinstance(d.get("tail"), str):
        t, maps = d["tail"], {}
        # the tail embeds complete compact lines even when the big line
        # is cut — a full "total" line wins if one survived
        for line in t.splitlines():
            line = line.strip()
            if not line.startswith("{") and "{" in line:
                line = line[line.find("{"):]  # strip an [info] prefix
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("metric") == "total" and "queries" in e:
                return e
            if e.get("metric") == "load_suspects":
                print(f"note: {path} carries the load_suspects line "
                      "(median>>min with flat cpu = box load):",
                      file=sys.stderr)
                print(json.dumps(e.get("top", {}), indent=2),
                      file=sys.stderr)
        for key in ("queries", "queries_median", "queries_cpu"):
            i = t.find(f'"{key}":{{')
            if i < 0:
                continue
            j = t.find("}", i)
            if j < 0:
                continue
            try:
                maps[key] = json.loads(t[i + len(key) + 3 : j + 1])
            except json.JSONDecodeError:
                pass  # the map itself was cut — skip it
        wall = maps.get("queries") or maps.get("queries_median")
        if wall:
            if "queries" not in maps:
                print(f"note: {path} carries no intact min map; "
                      "using the MEDIAN as wall", file=sys.stderr)
            return {"metric": "total",
                    "value": sum(v for v in wall.values() if v >= 0),
                    "queries": wall,
                    "queries_cpu": maps.get("queries_cpu", {})}
    raise SystemExit(f"{path}: no bench 'total' line or intact driver tail")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = 0.05  # ignore sub-50ms wall jitter on tiny queries
    # CPU needs a higher floor: executor CPU time itself wobbles
    # ~50-100ms run-to-run on small queries (measured: two idle runs of
    # unchanged code differ by up to 80ms cpu), so a REGRESSION verdict
    # requires growth a wobble cannot produce
    cpu_floor = 0.15
    rows = []
    for q, w_new in sorted(new["queries"].items()):
        w_old = old["queries"].get(q)
        if w_old is None or w_old < 0 or w_new < 0:
            continue
        if w_new <= max(ratio * w_old, w_old + floor):
            continue
        c_old = old.get("queries_cpu", {}).get(q)
        c_new = new.get("queries_cpu", {}).get(q)
        if c_old is None or c_new is None or c_old < 0 or c_new < 0:
            verdict = "WALL-ONLY"
        elif c_new > max(ratio * c_old, c_old + cpu_floor):
            verdict = "REGRESSION"
        else:
            verdict = "LOAD?"
        rows.append((w_new / max(w_old, 1e-9), q, w_old, w_new,
                     c_old, c_new, verdict))
    rows.sort(reverse=True)
    if not rows:
        print(f"ok: no query grew past {ratio}x "
              f"(old total={old['value']:.1f}s new total={new['value']:.1f}s)")
        return 0
    print(f"{'query':34} {'wall old':>9} {'wall new':>9} "
          f"{'cpu old':>8} {'cpu new':>8}  verdict")
    for r, q, wo, wn, co, cn, v in rows:
        fmt = lambda x: f"{x:8.3f}" if x is not None else "     n/a"
        print(f"{q:34} {wo:9.3f} {wn:9.3f} {fmt(co)} {fmt(cn)}  "
              f"{v}  ({r:.1f}x)")
    n_reg = sum(1 for r in rows if r[-1] == "REGRESSION")
    print(f"\n{len(rows)} grew past {ratio}x; {n_reg} with CPU growth "
          f"(REGRESSION), {len(rows) - n_reg} wall-only.")
    return 1 if n_reg else 0


if __name__ == "__main__":
    sys.exit(main())
