#!/usr/bin/env bash
# Workspace scaffold (reference analogue: setup.sh:15-20 -- venv + dirs).
# This environment ships its interpreter + deps; we only lay out dirs and
# install the package in editable mode when pip is usable.
set -e

for d in logs checkpoints data/source data/target results/plots results/metrics; do
  mkdir -p "$d"
done

if python -c "import pip" 2>/dev/null; then
  pip install -e . 2>/dev/null || echo "editable install skipped (offline env)"
fi

echo "Workspace ready. Try:"
echo "  python -m uda_aerial_semantic_segmentation_research_tpu.test_system"
