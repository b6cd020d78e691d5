"""Sweep accepted libtpu flags one at a time on the supervised step.

Each candidate runs exp_b.py (variant `base`, B=128 @ 512px — the
production step) in a subprocess with LIBTPU_INIT_ARGS = tuned baseline
(scoped VMEM 56 MB, BASELINE.md r3s9) + the candidate flag.  A control
(baseline only) runs first and last to bracket session noise (the axon
tunnel's dispatch latency drifts a few ms).

Usage: python tools/perf/sweep_flags.py [start_idx] [end_idx]
Prints one line per run: `<flag>=<value>: <ms> ms/step  <t/s>`.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

BASE = "--xla_tpu_scoped_vmem_limit_kib=57344"

# (flag, value) — drawn from the probe-accepted set (probe_libtpu_flags.py,
# all 25 ACCEPTED on this libtpu).  Values chosen to flip plausible
# defaults or scale cost-model knobs in the direction that could help a
# memory-bound conv+BN workload.
CANDIDATES = [
    ("--xla_tpu_enable_experimental_fusion_cost_model", "true"),
    ("--xla_tpu_rwb_fusion", "false"),
    ("--xla_tpu_enable_aggressive_loop_fusion", "true"),
    ("--xla_tpu_use_bundle_aware_cost_model_for_fusions", "true"),
    ("--xla_tpu_async_copy_bandwidth_scaling_factor", "2.0"),
    ("--xla_tpu_async_copy_bandwidth_scaling_factor", "0.5"),
    ("--xla_tpu_msa_preferred_overlap_to_async_copy_ratio", "3.0"),
    ("--xla_tpu_prefetch_interval_picker_size_override", "268435456"),
    ("--xla_tpu_enable_latency_hiding_scheduler", "true"),
    ("--xla_latency_hiding_scheduler_rerun", "2"),
    ("--xla_tpu_enable_dot_strength_reduction", "false"),
    ("--xla_tpu_dot_dot_fusion", "false"),
    ("--xla_tpu_dot_dot_fusion_duplicated", "true"),
    ("--xla_tpu_vector_load_fusion_window", "2048"),
    ("--xla_tpu_vector_store_fusion_window", "1024"),
    ("--xla_tpu_reduce_loop_fusion_dup_with_unfusable_user", "true"),
    ("--xla_tpu_sliced_prefetch_max_slices", "4"),
    ("--xla_tpu_copy_fusion_pad_unpad_ratio", "300"),
    ("--xla_tpu_enable_vmem_to_vmem_dmas", "true"),
    ("--xla_tpu_licm_size_inflation_ratio", "2.0"),
    ("--xla_tpu_use_repeated_instance_for_preferred_prefetch_time", "true"),
    ("--xla_tpu_memory_limit_slack_slop_factor", "90"),
    ("--xla_tpu_alternate_memory_benefit_scaling_factor", "2.0"),
]

STEP_RE = re.compile(r"base B=128: ([0-9.]+) ms/step\s+([0-9.]+) tiles/s")


def run_one(extra: str | None, timeout: float = 900.0) -> str:
    env = dict(os.environ)
    env["UDA_TPU_NO_TUNED_FLAGS"] = "1"  # we set flags explicitly
    env["LIBTPU_INIT_ARGS"] = BASE + (f" {extra}" if extra else "")
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "exp_b.py"),
             "base", "128"],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return "TIMEOUT"
    m = STEP_RE.search(out.stdout)
    if not m:
        tail = (out.stdout + out.stderr).strip().splitlines()[-3:]
        return "FAIL: " + " | ".join(tail)
    return f"{m.group(1)} ms/step  {m.group(2)} tiles/s"


def main() -> None:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else len(CANDIDATES)
    print(f"control(baseline): {run_one(None)}", flush=True)
    for flag, value in CANDIDATES[start:end]:
        print(f"{flag}={value}: {run_one(f'{flag}={value}')}", flush=True)
    print(f"control(baseline,repeat): {run_one(None)}", flush=True)


if __name__ == "__main__":
    main()
