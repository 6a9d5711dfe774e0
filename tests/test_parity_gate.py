"""Anchor-subset parity gate: the per-physics-commit accuracy tripwire.

Round 4 shipped physics changes that moved attached-range CD by +30 pp
without anyone noticing, because accuracy was only measured by the full
TPU parity harness, which was never re-run (VERDICT r4). This test runs a
small alpha grid through the PRODUCT path (``solve_polar``) on the test
CPU backend against the vendored XFOIL anchors
(``bench/data/xfoil_truth.json``: 0012/2412 @ 1e6, alpha 0/4) with bounds
wide enough for CPU/TPU basin wiggle (~±25% on CD) but far tighter than
any real regression — the round-4 bug pushed 0012@4 CD to +40%, which
this test catches cold.

Slow tier: two coupled-solver compiles (cached across runs).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from airfoil_tpu.models import naca4
from airfoil_tpu.polar.sweep import MODE_VISCOUS, solve_polar

_GRID = np.arange(0.0, 4.01, 0.5, dtype=np.float32)


def _polar(digits):
    coords = np.asarray(naca4(*digits, 100), np.float32)
    return solve_polar(coords, _GRID, 1e6)


@pytest.fixture(scope="module")
def polar2412():
    return _polar((2, 4, 12))


@pytest.fixture(scope="module")
def polar0012():
    return _polar((0, 0, 12))


def _at(res, alpha):
    i = int(np.argmin(np.abs(np.asarray(res.alpha) - alpha)))
    assert abs(float(res.alpha[i]) - alpha) < 1e-6
    return (float(res.cl[i]), float(res.cd[i]), int(res.mode[i]),
            bool(res.converged[i]))


class TestAnchorSubset:
    def test_2412_alpha0(self, polar2412):
        cl, cd, mode, conv = _at(polar2412, 0.0)
        assert conv and mode == MODE_VISCOUS
        # XFOIL: CL 0.247, CD 0.0058.
        assert abs(cl - 0.247) < 0.04
        assert 0.0044 < cd < 0.0073

    def test_2412_alpha4(self, polar2412):
        cl, cd, mode, conv = _at(polar2412, 4.0)
        assert conv and mode == MODE_VISCOUS
        # XFOIL: CL 0.680, CD 0.0064.
        assert abs(cl - 0.680) < 0.05
        assert 0.0048 < cd < 0.0080

    def test_0012_alpha0(self, polar0012):
        cl, cd, mode, conv = _at(polar0012, 0.0)
        assert conv and mode == MODE_VISCOUS
        # XFOIL: CL 0, CD 0.00512. (Round-3 state sits ~+15%; the bound
        # is a REGRESSION tripwire, not the accuracy target.)
        assert abs(cl) < 0.02
        assert 0.0040 < cd < 0.0066

    def test_0012_alpha4(self, polar0012):
        cl, cd, mode, conv = _at(polar0012, 4.0)
        assert conv and mode == MODE_VISCOUS
        # XFOIL: CL 0.442, CD 0.0060. The round-4 regression served
        # 0.00843 (+40%) here — this bound is the tripwire that was
        # missing.
        assert abs(cl - 0.442) < 0.04
        assert 0.0048 < cd < 0.0075
