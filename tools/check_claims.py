"""Verify the numeric claims committed in PARITY.md / BASELINE.md against
the latest bench artifact (round-3 VERDICT item 4: committed prose had
drifted from the recorded run — 73,700 vs 84,046 solves/s, 1.66x vs 0.985x).

Claims live in machine-readable blocks::

    <!-- claims:begin -->
    | key | claimed | rel_tol |
    |---|---|---|
    | cartpole.solves_per_s | 84046 | 0.30 |
    | fused_pipeline.vs_xla | 0.97 | 0.15 |
    | quadrotor_replan.meets_1khz | true | exact |
    <!-- claims:end -->

``key`` is a dotted path into bench_details.json.  ``rel_tol`` is the
allowed relative deviation (steady-state tunnel timings jitter run to run);
``exact`` for booleans/counts.  CI runs this after bench.py (run_ci.sh), so
a claim that no longer matches the measured artifact fails the build.

Usage: python tools/check_claims.py [--details bench_details.json] FILES...
"""

from __future__ import annotations

import argparse
import json
import re
import sys

_BLOCK = re.compile(
    r"<!--\s*claims:begin\s*-->(.*?)<!--\s*claims:end\s*-->", re.S
)
_ROW = re.compile(r"^\|\s*([\w.\[\]]+)\s*\|\s*([^|]+?)\s*\|\s*([^|]+?)\s*\|\s*$")


def _lookup(details, path: str):
    cur = details
    for part in path.split("."):
        m = re.fullmatch(r"(\w+)\[(\d+)\]", part)
        if m:
            cur = cur[m.group(1)][int(m.group(2))]
        else:
            cur = cur[part]
    return cur


def _parse_value(s: str):
    s = s.strip()
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    return float(s.replace(",", ""))


def check_file(path: str, details) -> list[str]:
    text = open(path).read()
    errors = []
    n_claims = 0
    for block in _BLOCK.findall(text):
        for line in block.splitlines():
            m = _ROW.match(line.strip())
            if not m or m.group(1) == "key" or set(m.group(2)) <= {"-"}:
                continue
            key, claimed_s, tol_s = m.groups()
            n_claims += 1
            try:
                actual = _lookup(details, key)
            except (KeyError, IndexError, TypeError):
                errors.append(f"{path}: claim key {key!r} not in bench artifact")
                continue
            claimed = _parse_value(claimed_s)
            if tol_s.strip() == "exact":
                if actual != claimed:
                    errors.append(
                        f"{path}: {key} claimed {claimed!r}, measured {actual!r}"
                    )
            else:
                tol = float(tol_s)
                if not isinstance(actual, (int, float)) or isinstance(actual, bool):
                    errors.append(
                        f"{path}: {key} claimed numeric but artifact has {actual!r}"
                    )
                elif abs(actual - claimed) > tol * max(abs(claimed), 1e-30):
                    errors.append(
                        f"{path}: {key} claimed {claimed:g}, measured "
                        f"{actual:g} (rel dev "
                        f"{abs(actual - claimed) / max(abs(claimed), 1e-30):.2f} "
                        f"> tol {tol:g})"
                    )
    if n_claims == 0:
        errors.append(f"{path}: no claims block found (claims:begin/claims:end)")
    return errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--details", default="bench_details.json")
    ap.add_argument("files", nargs="+")
    args = ap.parse_args()
    details = json.load(open(args.details))
    errors = []
    for f in args.files:
        errors += check_file(f, details)
    for e in errors:
        print(f"CLAIM DRIFT: {e}", file=sys.stderr)
    if errors:
        sys.exit(1)
    print(f"claims check OK ({', '.join(args.files)} vs {args.details})")


if __name__ == "__main__":
    main()
