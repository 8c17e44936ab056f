#!/usr/bin/env python3
"""Triage two Bench JSON artifacts: real regression vs box load.

Usage: python3 tools/bench_triage.py <old.json|log> <new.json|log> [threshold]

For each query, compare the min-wall seconds (the headline) and — when
both artifacts carry it (round 19+) — the executor-CPU seconds for the
min-wall rep (`queries_cpu`). Classification per query whose wall grew
past the threshold (default 1.5x + 50 ms):

  REGRESSION  wall up AND cpu up (>=150 ms) -> the work itself grew
  LOAD?       wall up, cpu flat             -> box load (or a driver-side
                                               regression: re-run idle
                                               before dismissing)
  WALL-ONLY   wall up, no cpu in an         -> older artifact; judge by
              artifact                         an idle re-run

A query that FAILED in the new artifact (sentinel -1) is reported as
FAILED and counts as a regression — a crash must never read as a clean
pass here any more than in the bench output itself.

Inputs: bench stdout (raw or sbt-prefixed "[info] {...}" lines), or a
driver artifact {"tail": "<truncated stdout>"}. A truncated tail cannot
carry the full 112-entry maps; when only the compact `load_suspects`
line survives, the tool triages THOSE queries against the other (full)
artifact and says the coverage is partial.

Exit codes: 0 clean / 1 regression or new failure / 2 unusable input.
"""
import json
import sys


def _lines(txt):
    for line in txt.splitlines():
        line = line.strip()
        if not line.startswith("{") and "{" in line:
            line = line[line.find("{"):]  # strip an [info]-style prefix
        if not line:
            continue
        try:
            yield json.loads(line)
        except json.JSONDecodeError:
            continue


def load(path):
    """Return {"queries": {...}, "queries_cpu": {...}, "partial": bool}."""
    with open(path) as f:
        txt = f.read()
    for d in _lines(txt):
        if d.get("metric") == "total" and "queries" in d:
            d["partial"] = False
            return d
    # driver artifact shape: {"tail": "<truncated bench stdout>"}
    try:
        d = json.loads(txt)
    except json.JSONDecodeError:
        d = None
    if d is not None and isinstance(d.get("tail"), str):
        t = d["tail"]
        suspects = None
        for e in _lines(t):
            if e.get("metric") == "total" and "queries" in e:
                e["partial"] = False
                return e
            if e.get("metric") == "load_suspects":
                suspects = e.get("top", {})
        # salvage any labeled map that survived whole (sub-~3k tails cut
        # them all; bigger captures may keep the later ones)
        maps = {}
        for key in ("queries", "queries_median", "queries_cpu"):
            i = t.find(f'"{key}":{{')
            j = t.find("}", i) if i >= 0 else -1
            if j >= 0:
                try:
                    maps[key] = json.loads(t[i + len(key) + 3 : j + 1])
                except json.JSONDecodeError:
                    pass  # the map itself was cut
        wall = maps.get("queries") or maps.get("queries_median")
        if wall:
            if "queries" not in maps:
                print(f"note: {path}: no intact min map; using the "
                      "MEDIAN as wall", file=sys.stderr)
            return {"queries": wall,
                    "queries_cpu": maps.get("queries_cpu", {}),
                    "partial": False}
        if suspects:
            print(f"note: {path}: tail keeps only the load_suspects "
                  f"line — triaging those {len(suspects)} queries only",
                  file=sys.stderr)
            return {"queries": {q: v["min"] for q, v in suspects.items()},
                    "queries_cpu":
                        {q: v["cpu"] for q, v in suspects.items()},
                    "partial": True}
    print(f"{path}: no bench 'total' line, intact map, or load_suspects "
          "line", file=sys.stderr)
    sys.exit(2)


def main():
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = 0.05  # ignore sub-50ms wall jitter on tiny queries
    # CPU needs a higher floor: executor CPU time itself wobbles
    # ~50-100ms run-to-run on small queries (measured: two idle runs of
    # unchanged code differ by up to 80ms cpu), so a REGRESSION verdict
    # requires growth a wobble cannot produce
    cpu_floor = 0.15
    partial = old.get("partial") or new.get("partial")
    rows, failed_new = [], []
    for q, w_new in sorted(new["queries"].items()):
        w_old = old["queries"].get(q)
        if w_old is None:
            continue
        if w_new < 0:
            failed_new.append(q)  # crashed in new — never a clean skip
            continue
        if w_old < 0:
            print(f"note: {q} failed in the OLD artifact, runs now",
                  file=sys.stderr)
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
    n_both = len(set(new["queries"]) & set(old["queries"]))
    scope = (f"{n_both} compared queries"
             + (" (PARTIAL — suspects-only artifact)" if partial else ""))
    for q in failed_new:
        print(f"FAILED in new artifact: {q}")
    if rows:
        print(f"{'query':34} {'wall old':>9} {'wall new':>9} "
              f"{'cpu old':>8} {'cpu new':>8}  verdict")
        for r, q, wo, wn, co, cn, v in rows:
            fmt = lambda x: f"{x:8.3f}" if x is not None and x >= 0 \
                else "     n/a"
            print(f"{q:34} {wo:9.3f} {wn:9.3f} {fmt(co)} {fmt(cn)}  "
                  f"{v}  ({r:.1f}x)")
    n = {v: sum(1 for r in rows if r[-1] == v)
         for v in ("REGRESSION", "LOAD?", "WALL-ONLY")}
    if not rows and not failed_new:
        print(f"ok: no query grew past {ratio}x over {scope}")
        return 0
    print(f"\n{len(rows)} grew past {ratio}x over {scope}: "
          f"{n['REGRESSION']} REGRESSION (cpu grew), {n['LOAD?']} LOAD? "
          f"(cpu flat), {n['WALL-ONLY']} wall-only (no cpu data); "
          f"{len(failed_new)} failed in new.")
    return 1 if n["REGRESSION"] or failed_new else 0


if __name__ == "__main__":
    sys.exit(main())
