"""Tuned libtpu compiler defaults, applied at package import.

XLA:TPU exposes compiler knobs only through the ``LIBTPU_INIT_ARGS``
environment variable, read once when libtpu initializes (i.e. at the
first JAX backend touch).  This module appends the framework's
measured-good flags to that variable, best-effort:

- ``--xla_tpu_scoped_vmem_limit_kib=57344``: caps the VMEM the
  compiler may assign to one fusion's operands/outputs.  Swept on a
  v5e at the production shape (supervised step, B=128 @ 512px,
  BASELINE.md r3s8): default = 319.9 ms/step; 32 MB = 310.6; 48 MB =
  306.0; **56 MB = 305.9 (+4.6%)**; 64 MB = 306.1; 80 MB = 309.3;
  100 MB = 311.8; 128 MB = 314.4.  The 48-64 MB plateau lets the
  conv+BN-stat kOutput fusions hold bigger operand tiles without
  starving double-buffering; verified to carry over (BASELINE.md
  r3s9): adversarial 434.4 ms (was 454.1), GRL 570.0 (was 591.1),
  inference 158.8 vs a same-session 161.2 no-flag control, and the
  HBM-bound phase-3 programs unharmed (955.5 ms, was 964.7).

Rules (tested in tests/test_tpu_flags.py):

- If the user already sets a flag in ``LIBTPU_INIT_ARGS``, their value
  wins (we never override, only append missing flags).
- ``UDA_TPU_NO_TUNED_FLAGS=1`` disables the whole mechanism.
- Appending after libtpu has already initialized is harmless (the env
  var is simply not re-read); for the flags to take effect, import
  this package (or any of its modules) before the first JAX device
  touch, which every CLI entry point in the package does.

The reference has no analogue (CUDA/torch tune via code, not env);
this is TPU-deployment plumbing the framework owns so users don't
have to.
"""

from __future__ import annotations

import os

# flag -> tuned value (see module docstring for the measurement trail)
TUNED_LIBTPU_FLAGS = {
    "--xla_tpu_scoped_vmem_limit_kib": "57344",
}


def apply_tuned_tpu_flags(env=os.environ) -> str:
    """Append missing tuned flags to ``LIBTPU_INIT_ARGS`` in ``env``.

    Returns the resulting value (also written back to ``env``), or the
    unchanged current value when the opt-out is set.
    """
    if env.get("UDA_TPU_NO_TUNED_FLAGS") == "1":
        return env.get("LIBTPU_INIT_ARGS", "")
    current = env.get("LIBTPU_INIT_ARGS", "")
    parts = [current] if current else []
    for flag, value in TUNED_LIBTPU_FLAGS.items():
        if flag not in current:
            parts.append(f"{flag}={value}")
    merged = " ".join(parts)
    env["LIBTPU_INIT_ARGS"] = merged
    return merged
