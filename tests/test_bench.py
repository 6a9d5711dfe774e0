"""Benchmark suite tests: corpus generation, raw-vs-parsed discrimination,
and the classifiers (small corpus; the solver chunks run on CPU)."""

import csv
import os

import numpy as np
import pytest

from airfoil_tpu.bench.corpus import generate_corpus
from airfoil_tpu.bench.classify_failures import classify_failure
from airfoil_tpu.bench.classify_repairs import classify_repairs
from airfoil_tpu.bench.parser_benchmark import (
    raw_coords_from_file,
    run_benchmark,
)
from airfoil_tpu.models import naca4


class TestCorpus:
    def test_deterministic(self, tmp_path):
        a = generate_corpus(str(tmp_path / "a"), n=12, seed=3)
        b = generate_corpus(str(tmp_path / "b"), n=12, seed=3)
        for pa, pb in zip(a, b):
            assert open(pa).read() == open(pb).read()

    def test_class_mix(self, tmp_path):
        # Filenames are af####_<geometry-family>_<format-kind>.dat.
        paths = generate_corpus(str(tmp_path / "c"), n=60, seed=0)
        kinds = [os.path.basename(p)[:-4].rsplit("_", 1)[1] for p in paths]
        assert sum(k == "lednicer" for k in kinds) > 15
        assert any(k == "multi" for k in kinds) or len(paths) < 60
        geos = {os.path.basename(p).split("_", 1)[1].rsplit("_", 1)[0]
                for p in paths}
        # Hard-geometry families actually appear alongside NACA4.
        assert len(geos) >= 4


class TestRawTokenizer:
    def test_reads_all_numeric_pairs(self, tmp_path):
        p = tmp_path / "x.dat"
        p.write_text("HEADER\n 31.  30.\n 1.0 0.0\n 0.0 0.0\n")
        coords = raw_coords_from_file(str(p))
        # Includes the Lednicer point-count line — deliberately no repairs.
        assert coords == [[31.0, 30.0], [1.0, 0.0], [0.0, 0.0]]


@pytest.mark.slow
class TestBenchmarkRun:
    def test_small_run_shows_uplift(self, tmp_path):
        files = generate_corpus(str(tmp_path / "corpus"), n=16, seed=2)
        summary = run_benchmark(files, str(tmp_path / "out"))
        assert summary["n_files"] == 16
        assert summary["parsed_converged"] > summary["raw_converged"], \
            "the parser must rescue files"
        assert summary["regressed"] <= 1
        assert os.path.exists(tmp_path / "out" / "benchmark_results.csv")
        with open(tmp_path / "out" / "benchmark_results.csv") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 16


class TestClassifiers:
    def test_failure_categories(self):
        assert classify_failure([[0.5, 0.1]] * 4) == "too_few_points"
        loop = naca4(0, 0, 12, 30).tolist()
        assert classify_failure(loop + loop) == "multi_element"
        # A raw two-section Lednicer stream counts two LE passes, so the
        # pass-counting probe (which runs first) labels it multi_element —
        # the reference's classifier behaves identically
        # (classify_failures.py:72-84 runs before the Lednicer check).
        led = naca4(0, 0, 12, 30)
        le = np.argmin(led[:, 0])
        two_sec = np.vstack([led[: le + 1][::-1], led[le:]]).tolist()
        assert classify_failure(two_sec) == "multi_element"
        fat = naca4(0, 0, 35, 30).tolist()
        assert classify_failure(fat) == "extreme_geometry"
        assert classify_failure(loop) == "convergence_failure"

    def test_repair_flags_from_fixes_log(self, tmp_path):
        c = naca4(2, 4, 12, 30)
        le = np.argmin(c[:, 0])
        upper = c[: le + 1][::-1]
        lower = c[le:]
        lines = ["HEADER", f" {len(upper)}.  {len(lower)}."]
        lines += [f" {x:.5f} {y:.5f}" for x, y in upper]
        lines += [f" {x:.5f} {y:.5f}" for x, y in lower]
        p = tmp_path / "led.dat"
        p.write_text("\n".join(lines))
        flags = classify_repairs(str(p))
        assert flags["lednicer_to_selig"]
        assert flags["le_dedup"]
        assert flags["line_skip"]
        assert flags["range_filter"]  # the point-count line is out-of-range
        assert not flags["winding_fixed"]


class TestParityHarness:
    def test_anchor_alphas_exact_grid_membership(self):
        """Every vendored anchor alpha must land bit-exactly on the polar
        grid the parity harness builds (union of the 0.5-degree sweep and
        the anchors) — the lookup asserts exact membership, never a silent
        nearest-match snap."""
        import numpy as np

        from airfoil_tpu.bench.parity import load_truth

        anchors = load_truth()
        groups = {}
        for (name, re_, alpha) in anchors:
            groups.setdefault((name, re_), []).append(alpha)
        for (_name, _re), alphas in groups.items():
            hi = max(9.0, max(alphas))
            grid = sorted(set(np.arange(-2.0, hi + 0.01, 0.5).tolist())
                          | set(alphas))
            garr = np.asarray(grid)
            for a in alphas:
                assert (np.abs(garr - a) < 1e-9).sum() == 1

    def test_fractional_anchor_would_be_caught(self):
        """A fractional alpha NOT on the grid raises instead of snapping."""
        import numpy as np

        garr = np.asarray(sorted(set(np.arange(-2.0, 9.01, 0.5).tolist())))
        a = 4.27
        matches = np.nonzero(np.abs(garr - a) < 1e-9)[0]
        assert matches.size == 0  # the harness's assert would fire
