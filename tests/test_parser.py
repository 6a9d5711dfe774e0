"""Unit tests for the geometry parsing/repair layer.

These port the semantics of the reference's executable spec
(reference test_main.py: TestParseDatFile, TestDetectAndMergeSections) onto
this framework's API: ``parse_dat_file`` returns ``(coords, fixes)`` and
raises :class:`AirfoilParseError` instead of an HTTP exception.
"""

import pytest

from airfoil_tpu.geometry import (
    AirfoilParseError,
    parse_dat_file,
    parse_dat_text,
    detect_and_merge_sections,
    is_multi_element,
    count_le_passes,
)
from tests.conftest import write_dat


def naca0012_selig_lines():
    """Minimal NACA 0012 in Selig format (TE -> upper -> LE -> lower -> TE)."""
    return [
        "NACA 0012",
        "1.000000  0.001260",
        "0.933013  0.005740",
        "0.750000  0.015970",
        "0.500000  0.030230",
        "0.250000  0.041210",
        "0.066987  0.031530",
        "0.000000  0.000000",
        "0.066987 -0.031530",
        "0.250000 -0.041210",
        "0.500000 -0.030230",
        "0.750000 -0.015970",
        "0.933013 -0.005740",
        "1.000000 -0.001260",
    ]


class TestParseDatFile:
    def test_parses_valid_selig(self, tmp_path):
        path = write_dat(tmp_path, naca0012_selig_lines())
        coords, fixes = parse_dat_file(path)
        assert len(coords) >= 10
        assert all(0.0 <= pt[0] <= 1.0 for pt in coords)
        # header line was skipped -> one fix reported
        assert any("Non-coordinate" in f for f in fixes)

    def test_skips_header_line(self, tmp_path):
        xs = [1, 0.75, 0.5, 0.25, 0, 0.25, 0.5, 0.75, 1, 0.5]
        ys = [0, 0.01, 0.02, 0.03, 0, -0.03, -0.02, -0.01, 0, 0]
        lines = ["NACA 0012"] + [f"{x:.4f}  {y:.4f}" for x, y in zip(xs, ys)]
        path = write_dat(tmp_path, lines)
        coords, _ = parse_dat_file(path)
        assert all(isinstance(pt[0], float) for pt in coords)

    def test_skips_blank_lines(self, tmp_path):
        lines = naca0012_selig_lines()
        lines = lines[:5] + ["", "  "] + lines[5:]
        path = write_dat(tmp_path, lines)
        coords, _ = parse_dat_file(path)
        assert len(coords) >= 10

    def test_rejects_out_of_range_coords(self, tmp_path):
        lines = ["2.0  0.5", "3.0  0.1", "-2.0  0.0"]
        path = write_dat(tmp_path, lines)
        with pytest.raises(AirfoilParseError):
            parse_dat_file(path)

    def test_rejects_too_few_points(self, tmp_path):
        lines = ["0.5  0.01", "0.3  0.02"]
        path = write_dat(tmp_path, lines)
        with pytest.raises(AirfoilParseError):
            parse_dat_file(path)

    def test_handles_tab_separated(self, tmp_path):
        xs = [1, 0.75, 0.5, 0.25, 0, 0.25, 0.5, 0.75, 1, 0.5, 0.3]
        ys = [0, 0.01, 0.02, 0.03, 0, -0.03, -0.02, -0.01, 0, 0, 0]
        lines = ["NACA 0012"] + [f"{x:.4f}\t{y:.4f}" for x, y in zip(xs, ys)]
        path = write_dat(tmp_path, lines)
        coords, _ = parse_dat_file(path)
        assert len(coords) >= 10

    def test_file_not_found_raises(self):
        with pytest.raises(AirfoilParseError):
            parse_dat_file("/nonexistent/path/file.dat")

    def test_fix_messages_count_skipped(self, tmp_path):
        lines = ["header one", "# comment"] + naca0012_selig_lines()[1:] + ["5.0 3.0"]
        path = write_dat(tmp_path, lines)
        _, fixes = parse_dat_file(path)
        assert any("2 header/comment line(s)" in f for f in fixes)
        assert any("1 point(s) outside valid bounds" in f for f in fixes)

    def test_clean_file_reports_noop(self):
        # Selig loop with no header at all -> explicit no-op message
        text = "\n".join(l for l in naca0012_selig_lines()[1:])
        coords, fixes = parse_dat_text(text)
        assert fixes == ["No changes made — file was already in valid Selig format"]


class TestDetectAndMergeSections:
    def test_selig_single_section_passthrough(self):
        data = [
            [1.0, 0.001], [0.75, 0.016], [0.5, 0.030], [0.25, 0.041],
            [0.0, 0.0],
            [0.25, -0.041], [0.5, -0.030], [0.75, -0.016], [1.0, -0.001],
        ]
        result, fixes = detect_and_merge_sections(data)
        assert result == data
        assert fixes == []

    def test_lednicer_format_detected(self):
        upper = [[0.0, 0.0], [0.25, 0.041], [0.5, 0.030], [0.75, 0.016], [1.0, 0.001]]
        lower = [[0.0, 0.0], [0.25, -0.041], [0.5, -0.030], [0.75, -0.016], [1.0, -0.001]]
        result, fixes = detect_and_merge_sections(upper + lower)
        assert any("Lednicer format detected" in f for f in fixes)
        # merged loop: TE -> upper -> LE -> lower -> TE
        assert result[0][0] == 1.0 and result[-1][0] == 1.0
        xs = [pt[0] for pt in result]
        le_idx = xs.index(min(xs))
        assert result[le_idx - 1][1] > 0, "point before LE must be upper surface"

    def test_naca6series_closed_te_regression(self):
        """Closed Selig loop with first == last == (1.0, 0.0): the parser
        must keep every point so the trailing edge stays closed."""
        data = [
            [1.00000, 0.00000],
            [0.50000, 0.05915],
            [0.10000, 0.03555],
            [0.00435, 0.00819],
            [0.00000, 0.00000],
            [0.00565, -0.00719],
            [0.10000, -0.02521],
            [0.50000, -0.03709],
            [1.00000, 0.00000],
        ]
        result, _ = detect_and_merge_sections(data)
        assert len(result) == len(data), "No point should be dropped"
        assert result[-1][0] == 1.0 and abs(result[-1][1]) < 1e-6

    def test_preserves_closed_trailing_edge(self):
        data = [
            [1.0, 0.0], [0.75, 0.016], [0.5, 0.030], [0.25, 0.041],
            [0.0, 0.0],
            [0.25, -0.041], [0.5, -0.030], [0.75, -0.016], [1.0, 0.0],
        ]
        result, _ = detect_and_merge_sections(data)
        assert len(result) == len(data)
        assert (abs(result[0][0] - result[-1][0]) < 0.001
                and abs(result[0][1] - result[-1][1]) < 0.001)

    def test_reversed_selig_corrected(self):
        data_reversed = [
            [1.0, -0.001], [0.75, -0.016], [0.5, -0.030], [0.25, -0.041],
            [0.0, 0.0],
            [0.25, 0.041], [0.5, 0.030], [0.75, 0.016], [1.0, 0.001],
        ]
        result, fixes = detect_and_merge_sections(data_reversed)
        assert any("Winding order corrected" in f for f in fixes)
        xs = [pt[0] for pt in result]
        le_idx = xs.index(min(xs))
        assert le_idx > 0
        assert result[le_idx - 1][1] >= 0, \
            "point before LE should be on upper surface after correction"

    def test_correct_winding_untouched(self):
        data = [
            [1.0, 0.001], [0.75, 0.016], [0.5, 0.030], [0.25, 0.041],
            [0.0, 0.0],
            [0.25, -0.041], [0.5, -0.030], [0.75, -0.016], [1.0, -0.001],
        ]
        result, fixes = detect_and_merge_sections(data)
        assert result == data
        assert not any("Winding" in f for f in fixes)

    def test_lednicer_removes_duplicate_le(self):
        upper = [[0.0, 0.0], [0.25, 0.041], [0.5, 0.030], [0.75, 0.016], [1.0, 0.001]]
        lower = [[0.0, 0.0], [0.25, -0.041], [0.5, -0.030], [0.75, -0.016], [1.0, -0.001]]
        result, fixes = detect_and_merge_sections(upper + lower)
        le_count = sum(
            1 for pt in result if abs(pt[0]) < 0.001 and abs(pt[1]) < 0.001
        )
        assert le_count <= 1
        assert any("Duplicate leading-edge" in f for f in fixes)

    def test_lednicer_reversed_sections(self):
        """Lednicer variant where both sections run TE->LE gets normalised."""
        upper = [[1.0, 0.001], [0.75, 0.016], [0.5, 0.030], [0.25, 0.041], [0.0, 0.0]]
        lower = [[1.0, -0.001], [0.75, -0.016], [0.5, -0.030], [0.25, -0.041], [0.0, 0.0]]
        # section break: lower starts at 1.0... that's not < 0.01.
        # Construct the break the way UIUC files do: upper LE->TE, lower LE->TE
        # but with upper reversed (TE->LE) so the break occurs at lower start.
        data = upper[::-1] + lower[::-1]  # upper LE->TE? no: upper[::-1] is LE->TE
        result, fixes = detect_and_merge_sections(data)
        xs = [pt[0] for pt in result]
        le_idx = xs.index(min(xs))
        # proper Selig: starts and ends near TE with LE in the middle
        assert xs[0] > 0.9 and xs[-1] > 0.9 and 0 < le_idx < len(xs) - 1


class TestMultiElement:
    def test_single_element_one_pass(self, naca0012):
        assert count_le_passes(naca0012.tolist()) == 1
        assert not is_multi_element(naca0012.tolist())

    def test_two_elements_detected(self, naca0012):
        loop = naca0012.tolist()
        assert is_multi_element(loop + loop)
