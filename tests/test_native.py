"""Differential tests: native C++ geometry paths vs the Python source of
truth, across the whole synthetic corpus."""

import numpy as np
import pytest

from airfoil_tpu.bench.corpus import generate_corpus
from airfoil_tpu.geometry import AirfoilParseError, parse_dat_text
from airfoil_tpu.lbm.masks import _panelise, _rotate, rasterize_airfoil
from airfoil_tpu.config import LBMConfig
from airfoil_tpu.models import naca4
from airfoil_tpu.native import (
    native_available,
    parse_dat_native,
    raster_mask_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain in this environment")


class TestParserParity:
    def test_corpus_differential(self, tmp_path):
        files = generate_corpus(str(tmp_path), n=60, seed=7)
        mismatches = []
        for path in files:
            text = open(path, errors="ignore").read()
            try:
                py = parse_dat_text(text)
                py_err = None
            except AirfoilParseError as e:
                py, py_err = None, e.detail
            try:
                nat = parse_dat_native(text)
                nat_err = None
            except AirfoilParseError as e:
                nat, nat_err = None, e.detail
            if (py is None) != (nat is None):
                mismatches.append((path, "error-status", py_err, nat_err))
                continue
            if py is None:
                if py_err != nat_err:
                    mismatches.append((path, "error-text", py_err, nat_err))
                continue
            pc, pf = py
            nc, nf = nat
            if not np.allclose(np.asarray(pc), np.asarray(nc), atol=1e-12):
                mismatches.append((path, "coords", len(pc), len(nc)))
            elif pf != nf:
                mismatches.append((path, "fixes", pf, nf))
        assert not mismatches, mismatches[:3]

    def test_error_message_parity(self):
        text = "junk\n0.5 0.1\n0.4 0.05\n"
        with pytest.raises(AirfoilParseError) as py:
            parse_dat_text(text)
        with pytest.raises(AirfoilParseError) as nat:
            parse_dat_native(text)
        assert str(py.value) == str(nat.value)


class TestRasterParity:
    def test_mask_differential(self):
        cfg = LBMConfig(nx=160, ny=80)
        for alpha in (0.0, 6.0, 18.0, -10.0):
            coords = naca4(2, 4, 12, 50)
            py_mask = rasterize_airfoil(coords, alpha, cfg)
            xp, yp = _panelise(_rotate(np.asarray(coords, float), alpha))
            nat_mask = raster_mask_native(
                xp, yp, cfg.nx, cfg.ny,
                (cfg.dx0, cfg.dx1, cfg.dy0, cfg.dy1))
            np.testing.assert_array_equal(py_mask, nat_mask,
                                          err_msg=f"alpha={alpha}")
