"""Golden parity vs the reference binary (skipped when it is not built).

Build it first with: bash tools/build_reference.sh
These are small smoke-scale versions of tools/parity.py runs; the full
battery lives there.
"""

import os
import sys

import pytest

REF = "/tmp/colbuild/columba"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference binary not built"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(level, args_list, wd):
    from tools import parity

    rc = parity.main(args_list + ["--level", level, "--wd", wd,
                                  "--reads", "60", "--genome", "60000"])
    assert rc == 0, f"parity mismatch for {args_list}"


@pytest.mark.parametrize("spec", [
    ["--mode", "all", "--metric", "hamming", "-e", "2"],
    ["--mode", "all", "--metric", "edit", "-e", "2", "--edits"],
    ["--mode", "best", "--metric", "edit", "--edits"],
])
def test_parity_smoke(tmp_path, spec):
    _run("positions", spec, str(tmp_path))


@pytest.mark.parametrize("mode", ["best", "all"])
def test_parity_smoke_paired(tmp_path, mode):
    _run("cigar",
         ["--mode", mode, "--metric", "edit", "--edits", "--paired"],
         str(tmp_path))


@pytest.mark.parametrize("spec", [
    ["--mode", "all", "--metric", "edit", "-e", "2", "--edits"],
    ["--mode", "best", "--metric", "edit", "--edits"],
    ["--mode", "all", "--metric", "hamming", "-e", "2"],
])
def test_parity_cross_boundary(tmp_path, spec):
    """Multi-sequence FASTA with half the reads sampled across record
    boundaries: exercises cross-boundary occurrence trimming +
    re-verification (reference: src/indexinterface.cpp:799-897)."""
    _run("cigar" if "hamming" not in spec else "positions",
         spec + ["--seqs", "4"], str(tmp_path))


def test_parity_paired_best_multimap(tmp_path):
    """Repeat-heavy workload: pairs multi-map with different total
    distances, so PE BEST emission (best stratum only, stratum MAPQ on
    every best record) is actually exercised."""
    _run("cigar",
         ["--mode", "best", "--metric", "edit", "--edits", "--paired",
          "--repeats", "6"],
         str(tmp_path))
