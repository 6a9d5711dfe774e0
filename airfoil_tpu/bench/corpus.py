"""Synthetic benchmark corpus generator.

The reference benchmark downloads the 1,000-airfoil UIUC database
(airfoil_parser_benchmark.py:171-288); this environment has no network
egress, so the corpus generator synthesises a deterministic population of
``.dat`` files reproducing the difficulty classes observed in the
reference's result data (benchmark/repair_classification.csv aggregates:
630 Lednicer, 598 LE-dup, 630 range-filter/line-skip, plus the
failure-class tail of multi-element / non-monotone / extreme-geometry
files). Point a real UIUC directory at the benchmark CLI to run on the
genuine database instead.
"""

from __future__ import annotations

import os

import numpy as np

from airfoil_tpu.models import naca4

__all__ = ["generate_corpus"]


def _selig_lines(coords, header=None, fmt="{:.6f} {:.6f}"):
    lines = [] if header is None else [header]
    lines += [fmt.format(x, y) for x, y in coords]
    return lines


def _lednicer_lines(coords, header="LEDNICER STYLE", dup_le=True):
    """Two LE->TE sections with point counts, UIUC Lednicer style."""
    le = int(np.argmin(coords[:, 0]))
    upper = coords[: le + 1][::-1]
    lower = coords[le:] if dup_le else coords[le + 1:]
    lines = [header, "", f" {len(upper)}.  {len(lower)}.", ""]
    lines += [f" {x:.5f}  {y:.5f}" for x, y in upper]
    lines.append("")
    lines += [f" {x:.5f}  {y:.5f}" for x, y in lower]
    return lines


def generate_corpus(out_dir: str, n: int = 200, seed: int = 0) -> list[str]:
    """Write ``n`` synthetic .dat files; returns the file paths.

    Population (matching the reference's observed class mix, scaled):
    ~55% Lednicer with headers (the dominant UIUC class), ~20% clean
    Selig, ~10% Selig with noise/headers/stray points, ~5% reversed
    winding, ~4% closed-TE 6-series style, ~3% multi-element, ~3%
    degenerate (too few points / non-monotone).
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n):
        m = rng.uniform(0, 6)
        p = rng.uniform(2, 6)
        t = rng.uniform(6, 21)
        npt = int(rng.integers(25, 80))
        coords = naca4(m, p, t, npt)
        u = rng.random()
        name = f"af{i:04d}"
        if u < 0.55:
            lines = _lednicer_lines(coords, header=f"{name.upper()} AIRFOIL")
            kind = "lednicer"
        elif u < 0.75:
            lines = _selig_lines(coords, header=f"{name} section")
            kind = "selig"
        elif u < 0.85:
            noisy = coords.copy()
            noisy[:, 1] += rng.normal(0, 2e-4, len(noisy))
            lines = _selig_lines(noisy, header=f"{name} (noisy)")
            lines.insert(1, "# comment line")
            lines.append(f"{rng.uniform(5, 9):.3f} {rng.uniform(2, 4):.3f}")
            kind = "noisy"
        elif u < 0.90:
            lines = _selig_lines(coords[::-1], header=f"{name} reversed")
            kind = "reversed"
        elif u < 0.94:
            closed = np.vstack([coords, coords[:1]])
            closed[0, 1] = closed[-1, 1] = 0.0
            closed[0, 0] = closed[-1, 0] = 1.0
            lines = _selig_lines(closed, header=f"{name} closed TE")
            kind = "closed_te"
        elif u < 0.97:
            flap = coords * 0.35 + np.array([1.05, -0.05])
            lines = _selig_lines(np.vstack([coords, flap]),
                                 header=f"{name} two-element")
            kind = "multi"
        else:
            if rng.random() < 0.5:
                lines = _selig_lines(coords[:5], header=f"{name} truncated")
                kind = "too_few"
            else:
                shuffled = coords.copy()
                rng.shuffle(shuffled[5:-5])
                lines = _selig_lines(shuffled, header=f"{name} scrambled")
                kind = "non_monotone"
        path = os.path.join(out_dir, f"{name}_{kind}.dat")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        paths.append(path)
    return paths
