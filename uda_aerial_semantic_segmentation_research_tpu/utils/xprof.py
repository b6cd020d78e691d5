"""XLA-trace analysis: per-op-category time breakdown from xplane files.

The reference has no profiling at all (SURVEY.md section 5.1); this is
the read side of ``utils.profiling.trace`` -- it aggregates a captured
TensorBoard-profile trace (``*.xplane.pb``) into the per-category
ms/step table used for the roofline accounting in BASELINE.md.

Categories are TPU-specific op families (convolutions, BatchNorm
statistics reduces, elementwise fusions, Pallas custom-calls, CLAHE's
``while`` scan, async DMA slices) rather than raw HLO names.  Two
pitfalls this module handles that naive aggregation gets wrong:

- ``%convert_reduce_fusion`` (BatchNorm statistics) contains the
  substring "conv": substring matching miscounts the largest
  memory-bound bucket as MXU time.
- Async ops (``slice-start``/``copy-start`` on the async line) overlap
  the compute queue; summing them into the total double-counts
  wall-clock.  They are reported separately.

CLI::

    python -m uda_aerial_semantic_segmentation_research_tpu.utils.xprof \
        /tmp/trace_dir [n_steps]

``n_steps`` defaults to counting ``%while`` occurrences (one CLAHE scan
per augmented training step); pass it explicitly for steps without a
scan (e.g. inference).
"""

from __future__ import annotations

import collections
import glob
import re
import sys
from typing import Dict, Optional, Tuple


def _load_xspace(trace_dir: str):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError as e:  # pragma: no cover - env without tensorflow
        raise ImportError(
            "xprof analysis needs the tensorflow xplane protos "
            "(tensorflow.tsl.profiler.protobuf.xplane_pb2)") from e

    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def categorize(name: str) -> str:
    """HLO op name -> TPU op-family category."""
    head = name.split(" = ")[0]
    rest = name.split(" = ", 1)[1] if " = " in name else ""
    if head.startswith(("%slice-start", "%copy-start", "%slice-done",
                        "%copy-done", "%all-reduce-start")):
        return "async-dma"
    if head.startswith("%while"):
        return "while(scan)"
    # BEFORE the conv check: "%convert_reduce..." contains "conv"
    if head.startswith("%convert_reduce"):
        return "bn-stats reduce"
    if head.startswith(("%convolution", "%conv")):
        return "conv"
    if head.startswith("%select-and-scatter"):
        return "maxpool-bwd"
    if head.startswith("%broadcast"):
        return "broadcast"
    if head.startswith("%reduce"):
        return "reduce"
    if head.startswith("%custom-call") or "dihedral" in head or "ce_fwd" in head:
        return "custom-call(pallas)"
    if head.startswith("%fusion"):
        # kernel-gradient convs produce (k, k, Cin, Cout) f32 tuples
        if re.match(r"\(f32\[[137],[137],", rest):
            return "conv(kernel-grad)"
        return "fusion"
    if head.startswith(("%transpose", "%copy")):
        return "layout-copy"
    if head.startswith("%dot"):
        return "dot"
    return "other"


def analyze(trace_dir: str, n_steps: Optional[int] = None
            ) -> Dict[str, Dict[str, float]]:
    """Aggregate the newest trace under ``trace_dir``.

    Returns {plane_name: {category: ms_per_step}} with two synthetic
    keys per plane: ``total(compute)`` (non-async sum -- comparable to
    wall-clock step time) and ``total(async-dma)`` (overlapped queue).
    """
    xs = _load_xspace(trace_dir)
    out: Dict[str, Dict[str, float]] = {}
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg: collections.Counter = collections.Counter()
        cnt: collections.Counter = collections.Counter()
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                agg[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        steps = n_steps
        if steps is None:
            whiles = [cnt[n] for n in cnt if n.startswith("%while")]
            steps = max(whiles, default=1)
        cat: collections.Counter = collections.Counter()
        for name, ms in agg.items():
            cat[categorize(name)] += ms
        result = {k: v / steps for k, v in cat.items()}
        async_ms = result.pop("async-dma", 0.0)
        result["total(compute)"] = sum(result.values())
        result["total(async-dma)"] = async_ms
        result["steps"] = float(steps)
        out[plane.name] = result
    return out


def top_ops(trace_dir: str, n: int = 25, n_steps: Optional[int] = None
            ) -> Dict[str, list]:
    """Top individual ops by total time, per TPU plane."""
    xs = _load_xspace(trace_dir)
    out: Dict[str, list] = {}
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg: collections.Counter = collections.Counter()
        cnt: collections.Counter = collections.Counter()
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                agg[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        steps = n_steps
        if steps is None:
            whiles = [cnt[k] for k in cnt if k.startswith("%while")]
            steps = max(whiles, default=1)
        out[plane.name] = [(ms / steps, name) for name, ms in
                           agg.most_common(n)]
    return out


def main(argv: Tuple[str, ...] = tuple(sys.argv[1:])) -> int:
    if not argv:
        print(__doc__)
        return 2
    trace_dir = argv[0]
    n_steps = int(argv[1]) if len(argv) > 1 else None
    for plane, cats in analyze(trace_dir, n_steps).items():
        steps = cats.pop("steps")
        print(f"== {plane} ({steps:.0f} steps)")
        for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {v:8.2f} ms/step  {k}")
    print("-- top ops --")
    for plane, ops in top_ops(trace_dir, 15, n_steps).items():
        for ms, name in ops:
            print(f"  {ms:7.2f}  {name[:120]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
