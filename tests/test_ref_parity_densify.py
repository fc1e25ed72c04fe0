"""Reference-executed densify parity as CI: the reference's OWN
densification_and_pruning (train.py:351-714, optimizer.py:143-416) runs
under the Warp shim head-to-head with gstpu in the frozen exact-match
regime (scripts/compare_ref_training.py --densify --frozen), and per-event
Gaussian counts must agree EXACTLY — masks are bit-deterministic there, so
any mismatch is densify logic, not f32 state drift."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

pytestmark = pytest.mark.slow


def test_frozen_densify_counts_match_reference_exactly(tmp_path):
    from gstpu import densify
    from scripts.compare_ref_training import pin_densify_noise, run_compare
    from tests.warp_shim import warpstub as wp

    saved = (wp.randf, wp.oob_read_zero, wp.oob_write_drop,
             densify.clone_position_noise, densify.split_position_jitter)
    try:
        # 2 events at iterations 2 and 4: 120 -> 238 -> 474 on both sides
        # (clones+splits+Q16 prune drop; see the harness docstring)
        result = run_compare(iterations=5, num_points=120,
                             workdir=str(tmp_path), densify=True,
                             frozen=True, write_golden=False)
    finally:
        (wp.randf, wp.oob_read_zero, wp.oob_write_drop,
         densify.clone_position_noise, densify.split_position_jitter) = saved

    assert result["counts_match"] is True, result
    assert result["n_topology_changes"] >= 2
    assert result["ref_final_n"] == result["gstpu_final_n"]
    # frozen params: the two sides render the SAME growing point set, so
    # the final train PSNRs (same renderer, each side's own params) agree
    assert abs(result["ref_train_psnr"] - result["gstpu_train_psnr"]) < 1e-3
