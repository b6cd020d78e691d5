#!/bin/bash
# Serial TPU measurement chain for round-3 session-3 (LaneBN).
# Usage: bash /tmp/r3s3_chain.sh [phase]   phase in {ab, bench, prof, all}
set -x
cd /root/repo
PH=${1:-ab}

if [ "$PH" = "ab" ] || [ "$PH" = "all" ]; then
  # 1. LaneBN ON (new default, XLA reshape path) at bench shape
  timeout 1100 python /tmp/exp_b.py base 128
  # 2. Control: LaneBN OFF (r3s2 production = 342.8 ms)
  UDA_TPU_LANE_BN=0 timeout 1100 python /tmp/exp_b.py base 128
  # 3. Plan-B Pallas stat kernels
  UDA_TPU_LANE_BN=pallas timeout 1100 python /tmp/exp_b.py base 128
  # 4. Batch headroom retry with LaneBN
  timeout 1100 python /tmp/exp_b.py base 192
fi

if [ "$PH" = "bench" ] || [ "$PH" = "all" ]; then
  timeout 1400 python bench.py 2>/dev/null | tail -1
  timeout 1400 python bench.py --mode infer 2>/dev/null | tail -1
  timeout 1400 python bench.py --mode adv 2>/dev/null | tail -1
  timeout 1600 python bench.py --mode unsup 2>/dev/null | tail -1
fi

if [ "$PH" = "prof" ] || [ "$PH" = "all" ]; then
  rm -rf /tmp/trace_lanebn && mkdir -p /tmp/trace_lanebn
  timeout 1100 python /tmp/profstep.py_lanebn 2>/dev/null || \
    timeout 1100 python - <<'EOF'
import sys
sys.argv = ["profstep"]
exec(open("/tmp/profstep.py").read().replace("/tmp/trace_full", "/tmp/trace_lanebn"))
EOF
  python /tmp/parse6.py /tmp/trace_lanebn 3 | head -40
fi
echo "=== chain $PH done $(date -u) ==="
