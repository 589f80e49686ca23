"""Analytic FLOPs golden tests.

Golden values were produced by executing the reference implementation
(/root/reference/flops_calculation.py) directly; our formulas must agree
exactly since its MACs grids are the pruned-latency expectation oracle."""

import pytest

from edgevisiontransformer_tpu.utils.flops import (
    MODEL_FLOPS,
    model_macs,
    pruned_deit_flops,
    pruned_deit_grids,
    swin_flops,
    vit_flops,
)


def test_deit_flops_golden():
    assert vit_flops(h=192, l=12) == 2548260836
    assert vit_flops(h=384, l=12) == 9280129484
    assert vit_flops(h=768, l=12) == 35294731676


def test_pruned_deit_flops_golden():
    assert pruned_deit_flops("tiny", 2, 0.3) == 1767230696
    # unpruned == head_size-expressed full model (head_size 64 * 3 = 192 = h)
    assert pruned_deit_flops("tiny", 3, 0.0) == vit_flops(
        h=192, l=12, heads=3, head_size=64
    )


def test_swin_flops_golden():
    assert swin_flops((2, 2, 6, 2), 96, 4.0, 3) == 4555068960


def test_macs_close_to_published():
    # draw.py anchors: deit_tiny 1.28 GMACs, deit_small 4.64, deit_base 17.7
    assert abs(model_macs("deit_tiny") / 1e9 - 1.28) < 0.01
    assert abs(model_macs("deit_small") / 1e9 - 4.64) < 0.01
    assert abs(model_macs("deit_base") / 1e9 - 17.7) < 0.06


def test_grids_monotone():
    g = pruned_deit_grids()
    ffn = g["ffn_only"]["tiny"]
    assert all(a >= b for a, b in zip(ffn, ffn[1:]))  # more sparsity, fewer MACs
    heads = g["head_only"]["tiny"]
    assert all(a <= b for a, b in zip(heads, heads[1:]))  # more heads, more MACs
    assert set(MODEL_FLOPS) >= {"deit_tiny", "swin_tiny", "swin_base"}


def test_t2t_flops_close_to_published():
    # draw.py anchors: t2t_vit_7 1.1 GMACs, t2t_vit_14 4.8 GMACs
    assert abs(model_macs("t2t_vit_7") / 1e9 - 1.1) < 0.1
    assert abs(model_macs("t2t_vit_14") / 1e9 - 4.8) < 0.1
    assert model_macs("t2t_vit_10") < model_macs("t2t_vit_12")
