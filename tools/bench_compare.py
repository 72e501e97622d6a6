#!/usr/bin/env python3
"""Compare a bench run against the committed per-key baseline (dev-only).

Usage: python3 tools/bench_compare.py <bench_json_or_raw_tail> [baseline]

<bench_json_or_raw_tail> is either a BENCH_r{N}.json (driver artifact with a
"tail" field) or a raw file containing Bench stdout lines; the per-key times
are taken from the LAST "steady_slowest80" (driver tail) or "steady_detail"
(local full run) line found. [baseline] defaults to
src/test/resources/bench_baseline.txt (lines of `<key> <seconds>`, the
min-across-sessions honest-action steady time per key).

Prints keys whose ratio to baseline exceeds the session variance band
(default 2.0x — the same-tree local band measured r10 was ~±40% per key,
and whole-session totals have drifted 1.25x with no code change; override
with BENCH_BAND). Exit 0 always: the report is a triage aid, not a gate —
per-key ratios on a different host need human judgment.
"""
import json, os, re, sys


def load_times(path):
    text = open(path).read()
    # BENCH_r{N}.json wraps the stdout tail in a JSON field
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
    except ValueError:
        pass
    best = None
    dec = json.JSONDecoder()
    for m in re.finditer(r'\{"metric":"(steady_detail|steady_slowest80)"', text):
        try:
            doc = dec.raw_decode(text, m.start())[0]
        except ValueError:
            # the archived tail can clip the first line — keep looking
            continue
        # prefer the full per-key line over the slowest-80 digest; within a
        # metric, later lines win (a re-run appends below an earlier one)
        if best is None or doc["metric"] == "steady_detail" or \
                best["metric"] == doc["metric"]:
            best = doc
    if best is None:
        sys.exit(f"no parseable steady_detail/steady_slowest80 line in {path}")
    return best["queries"]


def main(argv):
    bench = load_times(argv[1])
    base_path = argv[2] if len(argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "src", "test", "resources",
        "bench_baseline.txt")
    baseline = {}
    for line in open(base_path):
        line = line.split("#")[0].strip()
        if line:
            k, v = line.split()
            baseline[k] = float(v)
    band = float(os.environ.get("BENCH_BAND", "2.0"))
    rows = []
    for k, t in bench.items():
        # bench lines shorten keys to their qNN prefix
        full = [b for b in baseline if b == k or b.startswith(k + "_")]
        if len(full) != 1:
            print(f"?? {k}: no unique baseline key")
            continue
        b = baseline[full[0]]
        rows.append((t / b if b > 0 else float("inf"), full[0], t, b))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > band]
    for ratio, k, t, b in flagged:
        print(f"SLOW {k}: {t:.2f}s vs baseline {b:.2f}s ({ratio:.2f}x)")
    fast = [r for r in rows if r[0] < 1 / band]
    for ratio, k, t, b in fast:
        print(f"FAST {k}: {t:.2f}s vs baseline {b:.2f}s ({ratio:.2f}x)")
    print(f"== {len(rows)} keys compared, {len(flagged)} above {band}x band, "
          f"median ratio {sorted(r[0] for r in rows)[len(rows)//2]:.2f} ==")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
