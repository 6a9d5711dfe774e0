"""Flow-field visualisation builders (reference Airfoil_Analysis.py:219-569).

plotly is an optional frontend dependency; builders that need it skip when
it is absent (matplotlib-based heatmap always runs).
"""

import numpy as np
import pytest

from airfoil_tpu.inviscid.flowfield import compute_flow_field
from airfoil_tpu.models import naca4


@pytest.fixture(scope="module")
def field():
    return compute_flow_field(np.asarray(naca4(2, 4, 12, 60)), 5.0,
                              grid_res=90, n_panels=100)


class TestFlowField:
    def test_speed_grid_and_streamlines(self, field):
        assert field.speed.shape == (90, 90)
        assert len(field.streamlines) >= 10       # reference seeds 22
        # Interior masked to zero speed; free stream ~1 at the border.
        assert abs(float(field.speed[0, 0]) - 1.0) < 0.2
        assert float(field.cl) == pytest.approx(0.856, abs=0.05)


class TestHeatmap:
    def test_png_renders_fixed_scale(self, field):
        from airfoil_tpu.ui.flowviz import render_heatmap_png

        b64 = render_heatmap_png(field, dpi=60)
        assert len(b64) > 5000
        import base64

        png = base64.b64decode(b64)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"


class TestPlotlyBuilders:
    def test_animation_and_overlay(self, field):
        pytest.importorskip("plotly")
        from airfoil_tpu.ui.flowviz import (
            build_bl_overlay, build_flow_animation)

        fig = build_flow_animation(field, n_frames=10)
        assert len(fig.frames) == 10
        bl = {
            "upper": [{"x": 0.1 * i, "y": 0.05, "dstar": 0.002 * i,
                       "theta": 0.001, "cf": 0.002, "H": 1.5}
                      for i in range(1, 10)],
            "lower": [{"x": 0.1 * i, "y": -0.04, "dstar": 0.001 * i,
                       "theta": 0.001, "cf": 0.002, "H": 1.5}
                      for i in range(1, 10)],
            "transition_upper_x": 0.4,
            "transition_lower_x": 0.7,
        }
        traces = build_bl_overlay(np.asarray(naca4(2, 4, 12, 60)), bl)
        assert len(traces) == 4
