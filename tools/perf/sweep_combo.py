"""Bench combinations of winning libtpu flags on the supervised step.

After sweep_flags.py identifies individually-winning candidates, this
runs the tuned baseline plus each requested flag COMBINATION (flags are
not independent: the scheduler/fusion knobs interact), bracketed by
controls.  Combos are given on the command line as comma-joined
flag=value strings; with no args it runs a small built-in ladder you
edit in place after reading the single-flag sweep.

Usage:
    python tools/perf/sweep_combo.py "FLAG1=V1,FLAG2=V2" "FLAG1=V1" ...
"""

from __future__ import annotations

import sys

from sweep_flags import run_one

DEFAULT_COMBOS: list[str] = []


def main() -> None:
    combos = sys.argv[1:] or DEFAULT_COMBOS
    print(f"control(baseline): {run_one(None)}", flush=True)
    for combo in combos:
        extra = " ".join(part.strip() for part in combo.split(",") if part.strip())
        print(f"[{extra}]: {run_one(extra)}", flush=True)
    print(f"control(baseline,repeat): {run_one(None)}", flush=True)


if __name__ == "__main__":
    main()
