"""PrintedDataset real-scan workload (BASELINE config 5's real-scan
half, PostProcessing.ipynb cells 8-11): the protocol driver must add
the 0.3-sigma preprocessing noise, denoise with the notebook's "Ours"
recipe, and improve sCD against the 4x-sampled gt on the smallest scan."""

import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # tier-2: full scan denoise

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/PrintedDataset")


@pytest.mark.skipif(
    not (REF / "noisy" / "Nut.obj").exists(),
    reason="reference assets not mounted",
)
def test_nut_scan_improves_scd():
    sys.path.insert(0, str(REPO / "examples"))
    try:
        from printed_dataset import paired_models, run_scan
    finally:
        sys.path.pop(0)

    assert "Nut" in paired_models()
    row = run_scan("Nut", seed=0, iterations=2)
    assert row["n_points"] == 4733
    # The notebook's own improvements are x1.2-1.4 in sCD; the accept
    # mask guarantees we can't drift far, so CD stays within 5%.
    assert row["sCD_denoised"] < 0.95 * row["sCD_noisy"], row
    assert row["CD_denoised"] < 1.05 * row["CD_noisy"], row
