"""Regenerate bench_expected.json from committed detail records.

r13 (VERDICT r12 item 7): the expected-median file was refreshed by
hand at round close (min over the round's quiet runs) — an unscripted
step on the record's integrity path. This script makes the refresh
deterministic and guarded:

  python tools/refresh_expected.py [--write] [--force] \
      [detail.json ...]

- Inputs default to the newest two committed ``BENCH_DETAIL_r*.json``
  plus ``bench_detail.json`` if present (the round's working run).
- ``expected[key]`` = min of the per-key medians (``queries_med``
  falling back to ``queries``) across the inputs — the quiet-host
  floor, matching every prior round's hand methodology.
- ``factors[key]`` = 1.5 for keys STABLE across >=2 inputs (max/min
  median ratio <= STABLE_RATIO): r12's graph_adamic_adar drifted
  1.88x — under the uniform 2.0 re-measure band — exactly because
  stability earned no tighter band. Known-variance keys (ratio above
  the threshold) keep the default band by omission.
- DRIFT GUARD: if any key's new expectation moves > DRIFT_FACTOR x
  (either direction) vs the committed bench_expected.json, the script
  exits 1 and lists the keys — a drift that large needs a SURVEY
  continuity note (or --force) before it silently redefines the band.

Without --write it prints the would-be file and the drift report only.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXPECTED_PATH = os.path.join(REPO, "bench_expected.json")
STABLE_RATIO = 1.35
STABLE_FACTOR = 1.5
DRIFT_FACTOR = 1.5
#: scaling/throughput keys are rows-per-sec (bigger is better) and the
#: headline family has its own HEADLINE_FACTOR band — exclude both
#: from the factors map; expectations still refresh for re-measure.
NO_TIGHT_BAND = re.compile(r"^(rows_per_sec_|feature_pipeline_)")


def default_inputs() -> list[str]:
    committed = sorted(
        glob.glob(os.path.join(REPO, "BENCH_DETAIL_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )[-2:]
    working = os.path.join(REPO, "bench_detail.json")
    if os.path.exists(working):
        # a working file byte-identical to a committed record must not
        # count twice — it would fake the >=2-record stability test
        # for keys that have only one round of history
        with open(working, "rb") as f:
            wbytes = f.read()
        if all(open(p, "rb").read() != wbytes for p in committed):
            committed.append(working)
    return committed


def medians(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    out: dict[str, float] = {}
    for src in (d.get("queries") or {}, d.get("queries_med") or {}):
        for k, v in src.items():
            if isinstance(v, (int, float)) and v > 0:
                out[k] = float(v)  # queries_med wins where present
    return out


def build(inputs: list[str]) -> dict:
    per_file = [(p, medians(p)) for p in inputs]
    keys = sorted({k for _, m in per_file for k in m})
    expected, factors = {}, {}
    for k in keys:
        vals = [m[k] for _, m in per_file if k in m]
        expected[k] = round(min(vals), 3)
        if (
            len(vals) >= 2
            and max(vals) / min(vals) <= STABLE_RATIO
            and not NO_TIGHT_BAND.match(k)
        ):
            factors[k] = STABLE_FACTOR
    return {
        "_comment": (
            "quiet-host expected medians (sec) per bench key; min over "
            "the last committed detail records (tools/refresh_expected.py). "
            "A key reading > factor x expected triggers an automatic "
            "re-measure (budget-capped). 'factors' tightens the band to "
            f"{STABLE_FACTOR} for keys stable (<= {STABLE_RATIO}x spread) "
            "across the input records; unlisted keys use OUTLIER_FACTOR."
        ),
        "sf": "0.1",
        "source": "min(" + ", ".join(os.path.basename(p) for p in inputs) + ")",
        "expected": expected,
        "factors": factors,
    }


def drift_report(new_expected: dict) -> list[str]:
    try:
        with open(EXPECTED_PATH) as f:
            old = json.load(f).get("expected", {}) or {}
    except (OSError, ValueError):
        return []
    bad = []
    for k, nv in new_expected.items():
        ov = old.get(k)
        if not ov:
            continue
        r = max(nv / ov, ov / nv)
        if r > DRIFT_FACTOR:
            bad.append(f"{k}: {ov} -> {nv} ({r:.2f}x)")
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="*", help="detail json records")
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    inputs = args.inputs or default_inputs()
    if not inputs:
        print("no detail records found", file=sys.stderr)
        return 1
    payload = build(inputs)
    bad = drift_report(payload["expected"])
    if bad and not args.force:
        print(
            f"DRIFT GUARD: {len(bad)} key(s) moved > {DRIFT_FACTOR}x vs the "
            "committed expectations — add a SURVEY continuity note and "
            "re-run with --force:",
            file=sys.stderr,
        )
        for line in bad:
            print("  " + line, file=sys.stderr)
        return 1
    if args.write:
        with open(EXPECTED_PATH, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=False)
            f.write("\n")
        print(
            f"wrote {EXPECTED_PATH}: {len(payload['expected'])} expectations, "
            f"{len(payload['factors'])} tightened bands"
            + (f", {len(bad)} forced drifts" if bad else "")
        )
    else:
        print(json.dumps(payload, indent=1))
        if bad:
            print(f"({len(bad)} drift(s) would need --force)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
