"""Probe which candidate LIBTPU_INIT_ARGS flags this libtpu build accepts.

libtpu hard-aborts at init ("Unknown flag in LIBTPU_INIT_ARGS: ...") for
flags it does not know, so existence can be probed cheaply: spawn a
subprocess that sets the candidate flag and touches the backend; exit
code 0 => flag exists (with that value), crash => unknown.  Each probe
costs one backend init (~5-10 s on the axon tunnel).

Usage: python tools/perf/probe_libtpu_flags.py [--quick]
Prints one line per candidate: ACCEPTED / REJECTED / TIMEOUT.
"""

from __future__ import annotations

import subprocess
import sys

# candidate -> probe value (a value the flag would plausibly accept).
# Drawn from public XLA:TPU option names; most will be rejected — that
# is the point of probing.
CANDIDATES = [
    # scoped VMEM (known-good; positive control)
    ("--xla_tpu_scoped_vmem_limit_kib", "57344"),
    # fusion / cost model
    ("--xla_tpu_enable_experimental_fusion_cost_model", "true"),
    ("--xla_tpu_rwb_fusion", "false"),
    ("--xla_tpu_use_repeated_instance_for_preferred_prefetch_time", "true"),
    ("--xla_tpu_enable_aggressive_loop_fusion", "true"),
    # memory-space assignment / prefetch aggressiveness
    ("--xla_tpu_async_copy_bandwidth_scaling_factor", "1.0"),
    ("--xla_tpu_memory_limit_slack_slop_factor", "95"),
    ("--xla_tpu_msa_preferred_overlap_to_async_copy_ratio", "1.5"),
    ("--xla_tpu_prefetch_interval_picker_size_override", "268435456"),
    ("--xla_tpu_alternate_memory_benefit_scaling_factor", "1.0"),
    # scheduling
    ("--xla_tpu_enable_latency_hiding_scheduler", "true"),
    ("--xla_latency_hiding_scheduler_rerun", "1"),
    ("--xla_tpu_enable_dot_strength_reduction", "true"),
    ("--xla_tpu_licm_size_inflation_ratio", "1.0"),
    # conv precision / layout
    ("--xla_jf_conv_full_precision", "false"),
    ("--xla_tpu_use_bundle_aware_cost_model_for_fusions", "true"),
    ("--xla_tpu_dot_dot_fusion", "true"),
    ("--xla_tpu_dot_dot_fusion_duplicated", "false"),
    ("--xla_tpu_vector_load_fusion_window", "1024"),
    ("--xla_tpu_vector_store_fusion_window", "256"),
    ("--xla_tpu_allocate_scoped_vmem_at_same_offset", "true"),
    ("--xla_tpu_reduce_loop_fusion_dup_with_unfusable_user", "false"),
    ("--xla_tpu_sliced_prefetch_max_slices", "0"),
    ("--xla_tpu_copy_fusion_pad_unpad_ratio", "0"),
    ("--xla_tpu_enable_vmem_to_vmem_dmas", "true"),
]

PROBE = (
    "import jax; d = jax.devices(); "
    "print('OK', d[0].device_kind)"
)


def probe(flag: str, value: str, timeout: float = 120.0) -> str:
    import os
    env = dict(os.environ)
    env["LIBTPU_INIT_ARGS"] = f"{flag}={value}"
    env.pop("JAX_PLATFORMS", None)
    try:
        r = subprocess.run([sys.executable, "-c", PROBE], env=env,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return "TIMEOUT"
    if r.returncode == 0 and "OK" in r.stdout:
        return "ACCEPTED"
    tail = (r.stderr or r.stdout).strip().splitlines()
    reason = tail[-1][:120] if tail else "no output"
    return f"REJECTED ({reason})"


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    todo = CANDIDATES[:3] if quick else CANDIDATES
    for flag, value in todo:
        print(f"{flag}={value}: {probe(flag, value)}", flush=True)
