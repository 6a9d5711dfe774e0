"""Benchmark & diagnostics suite.

TPU-native re-creation of the reference's ``benchmark/`` tooling
(SURVEY.md section 2, L6): the parser-robustness benchmark over an airfoil
corpus, the failure/repair classifiers, and a parity harness against XFOIL
ground truth. The key structural change: instead of one subprocess per
airfoil per path (reference airfoil_parser_benchmark.py:484-560), airfoils
are batched and solved in chunked vmap dispatches.
"""

from airfoil_tpu.bench.corpus import generate_corpus
from airfoil_tpu.bench.parser_benchmark import run_benchmark
from airfoil_tpu.bench.classify_failures import classify_failure
from airfoil_tpu.bench.classify_repairs import classify_repairs

__all__ = [
    "generate_corpus",
    "run_benchmark",
    "classify_failure",
    "classify_repairs",
]
