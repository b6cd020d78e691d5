"""Observability utilities: StepTimer and the xprof trace analyzer."""

import pytest


pytestmark = pytest.mark.smoke


def test_step_timer_summary():
    from uda_aerial_semantic_segmentation_research_tpu.utils.profiling import (
        StepTimer,
    )

    t = StepTimer(items_per_step=4, warmup=1)
    for dt in (0.5, 0.010, 0.012, 0.011, 0.013):  # first sample = warmup
        t.record(dt)
    s = t.summary()
    assert s["steps"] == 4
    assert 9.0 < s["step_ms_p50"] < 14.0
    assert 250 < s["items_per_sec"] < 450


def test_xprof_categorize_pitfalls():
    """The two documented aggregation pitfalls: BatchNorm-stat fusions
    contain the substring "conv" but are NOT MXU time, and async DMA
    ops must not land in a compute bucket."""
    from uda_aerial_semantic_segmentation_research_tpu.utils.xprof import (
        categorize,
    )

    bn = ("%convert_reduce_fusion.6 = (f32[16]{0}, f32[16]{0}, "
          "bf16[128,512,512,16]{0,3,2,1}) fusion(...)")
    assert categorize(bn) == "bn-stats reduce"

    conv = "%convolution.42 = bf16[128,256,256,64]{0,3,2,1} convolution(...)"
    assert categorize(conv) == "conv"

    kgrad = ("%fusion.1414 = (f32[3,3,128,32]{2,3,1,0}, "
             "f32[3,3,128,32]{2,3,1,0}) fusion(...)")
    assert categorize(kgrad) == "conv(kernel-grad)"

    dma = ("%slice-start.5 = ((bf16[64,512,512,3]{2,1,3,0}), "
           "bf16[16,512,512,3]{2,1,3,0}, s32[]) async-start(...)")
    assert categorize(dma) == "async-dma"

    scan = "%while.17 = (s32[], bf16[4,5,512,512,3]) while(...)"
    assert categorize(scan) == "while(scan)"

    fusion = "%fusion.14 = bf16[524288,512]{1,0} fusion(...)"
    assert categorize(fusion) == "fusion"


def test_xprof_missing_trace():
    from uda_aerial_semantic_segmentation_research_tpu.utils.xprof import (
        analyze,
    )

    with pytest.raises(FileNotFoundError):
        analyze("/nonexistent/trace/dir")
