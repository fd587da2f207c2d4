"""Re-run one row of the recorded classical-parity table (docs/PARITY.md)
and assert it reproduces.

BASELINE.md pins "CD & sCD within 1% of the reference CPU pipeline" on
the named trio; reference-parity of the pipeline math itself is pinned
step-by-step by the float64 oracle suite (tests/test_denoise.py). This
test guards the *recorded artifact*: the fandisk_1 run of
examples/classical_parity.py must keep producing the committed numbers
(within 1%, the BASELINE tolerance) on this exact code path
(kNN -> PVT + wavefront orientation -> until-minimum-error driver,
Processor.py:141-185 semantics).
"""

import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # tier-2: heavy engine/e2e (pytest.ini)

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/common-3d-test-models-master")

# Committed row (docs/PARITY.md): fandisk_1, recorded on CPU.
EXPECTED = {
    "n_points": 6475,
    "iterations": 7,
    "CD_noisy": 1.2111826072214171e-4,
    "CD_denoised": 1.1534466466400772e-4,
    "sCD_noisy": 1.2111826072214171e-4,
    "sCD_denoised": 1.1534466466400772e-4,
}


@pytest.mark.skipif(
    not (REF / "Generated_Noise/fandisk_1.obj").exists(),
    reason="reference assets not mounted",
)
def test_fandisk_1_row_reproduces():
    sys.path.insert(0, str(REPO / "examples"))
    try:
        from classical_parity import score_run
    finally:
        sys.path.pop(0)

    # The recorded run scanned 24 iterations and picked 7; a 12-deep
    # scan finds the same minimum at half the CPU cost.
    row = score_run(
        REF / "Generated_Noise/fandisk_1.obj", REF / "fandisk.obj",
        max_iterations=12,
    )
    assert row["n_points"] == EXPECTED["n_points"]
    # The recorded argmin is 7, but the until-minimum selection sits on
    # a shallow error valley: reduction-order drift across XLA versions
    # can move it by +-1 without the CDs leaving the 1% band — pin a
    # range, not the exact integer (advisor round 3).
    assert EXPECTED["iterations"] - 1 <= row["iterations"] <= EXPECTED["iterations"] + 1
    for key in ("CD_noisy", "CD_denoised", "sCD_noisy", "sCD_denoised"):
        assert row[key] == pytest.approx(EXPECTED[key], rel=0.01), key
    # The driver must not have made things worse than the noisy input.
    assert row["CD_denoised"] <= row["CD_noisy"]
