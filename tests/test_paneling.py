"""Tests for the differentiable paneling stage."""

import numpy as np

from airfoil_tpu.models import naca4
from airfoil_tpu.paneling import (
    repanel,
    panel_geometry,
    rotate_about_quarter_chord,
    smooth_geometry,
)


class TestRepanel:
    def test_node_count_and_endpoints(self, naca0012):
        for spacing in ["airfoil", "cosine", "uniform"]:
            xp, yp = repanel(naca0012, 160, spacing=spacing)
            assert xp.shape == (161,)
            np.testing.assert_allclose(xp[0], naca0012[0, 0], atol=1e-6)
            np.testing.assert_allclose(xp[-1], naca0012[-1, 0], atol=1e-6)

    def test_airfoil_spacing_clusters_at_le(self, naca0012):
        xp, yp = repanel(naca0012, 160, spacing="airfoil")
        pan = panel_geometry(xp, yp)
        le = int(np.argmin(np.array(xp)))
        # Panels adjacent to the LE are much finer than mid-surface panels.
        assert float(pan.length[le]) < 0.1 * float(pan.length[le // 2])

    def test_normals_point_inward(self, naca0012):
        xp, yp = repanel(naca0012, 160)
        pan = panel_geometry(xp, yp)
        # Midpoint + small step along the normal must move toward the
        # camber line (|y| decreases on the upper surface front half).
        i = int(np.argmin(np.abs(np.array(pan.xm) - 0.5)))  # upper mid-chord
        assert float(pan.ym[i]) > 0
        assert float(pan.ny[i]) < 0, "inward normal on upper surface points down"

    def test_arc_length_preserved(self, naca2412):
        xp, yp = repanel(naca2412, 200)
        pan = panel_geometry(xp, yp)
        orig = np.sum(np.hypot(np.diff(naca2412[:, 0]), np.diff(naca2412[:, 1])))
        assert abs(float(pan.s[-1]) - orig) / orig < 5e-3


class TestRotate:
    def test_rotation_pivot_fixed(self, naca0012):
        rot = rotate_about_quarter_chord(np.array([[0.25, 0.0]]), 12.0)
        np.testing.assert_allclose(np.array(rot), [[0.25, 0.0]], atol=1e-7)

    def test_positive_alpha_pitches_nose_up(self, naca0012):
        rot = np.array(rotate_about_quarter_chord(naca0012, 10.0))
        le = np.argmin(naca0012[:, 0])
        assert rot[le, 1] > naca0012[le, 1], "LE should move up at +alpha"


class TestSmooth:
    def test_smoothing_reduces_roughness(self, naca0012):
        rng = np.random.default_rng(0)
        noisy = naca0012.copy()
        noisy[1:-1, 1] += rng.normal(0, 5e-4, size=len(noisy) - 2)
        xp, yp = repanel(noisy, 160)
        xs, ys = smooth_geometry(xp, yp, passes=10)

        def roughness(y):
            d2 = np.diff(np.array(y), 2)
            return float(np.sum(d2 * d2))

        assert roughness(ys) < 0.5 * roughness(yp)

    def test_endpoints_pinned(self, naca0012):
        xp, yp = repanel(naca0012, 160)
        xs, ys = smooth_geometry(xp, yp, passes=20)
        np.testing.assert_allclose(
            [float(xs[0]), float(ys[0]), float(xs[-1]), float(ys[-1])],
            [float(xp[0]), float(yp[0]), float(xp[-1]), float(yp[-1])],
            atol=1e-7,
        )
