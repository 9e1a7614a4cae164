"""CLI option coverage: the reference's aligner flags on small workloads.

Covers the option surface the other suites don't reach: -K (k-mer size),
-b, -c/-d scheme sources, -nC, -l/-v, -D plumbing
(reference: src/parameters/alignparameters.cpp).
"""

import os

import numpy as np
import pytest

from columba_tpu import cli

SCHEMES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "schemes")


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    wd = tmp_path_factory.mktemp("cliwl")
    rng = np.random.default_rng(11)
    seq = "".join(rng.choice(list("ACGT"), 40000))
    fa = wd / "g.fa"
    fa.write_text(">c1\n" + seq + "\n")
    idx = str(wd / "i.cidx")
    cli.main(["build", "-r", idx, "-f", str(fa)])
    fq = wd / "r.fq"
    with open(fq, "w") as f:
        for i in range(16):
            p = int(rng.integers(0, 39000))
            f.write(f"@r{i}\n{seq[p:p+100]}\n+\n{'I' * 100}\n")
    return wd, idx, str(fq)


def _body(path):
    return [ln for ln in open(path) if not ln.startswith("@")]


def test_kmer_size_and_batch(workload):
    wd, idx, fq = workload
    out = str(wd / "o1.sam")
    cli.main(["align", "-r", idx, "-f", fq, "-o", out, "-a", "all",
              "-e", "1", "-K", "6", "-b", "8"])
    assert len(_body(out)) == 16


def test_no_cigar_and_logfile(workload):
    wd, idx, fq = workload
    out = str(wd / "o2.sam")
    log = str(wd / "run.log")
    cli.main(["align", "-r", idx, "-f", fq, "-o", out, "-a", "all",
              "-e", "1", "-nC", "-l", log, "-v", "-t", "2", "-R"])
    assert all(ln.split("\t")[5] == "*" for ln in _body(out))
    assert os.path.getsize(log) > 0


def test_custom_scheme_folder(workload):
    wd, idx, fq = workload
    out = str(wd / "o3.sam")
    cli.main(["align", "-r", idx, "-f", fq, "-o", out, "-a", "all",
              "-e", "1", "-c", os.path.join(SCHEMES, "kuch_k+1")])
    assert len(_body(out)) == 16


def test_dynamic_selection_folder(workload):
    wd, idx, fq = workload
    multi = wd / "multi" / "1"
    multi.mkdir(parents=True)
    text = open(os.path.join(SCHEMES, "kuch_k+1", "1", "searches.txt")).read()
    (multi / "scheme1.txt").write_text(text)
    (multi / "scheme2.txt").write_text(text)
    out = str(wd / "o4.sam")
    cli.main(["align", "-r", idx, "-f", fq, "-o", out, "-a", "all",
              "-e", "1", "-d", str(wd / "multi")])
    assert len(_body(out)) == 16


def test_discordant_flag_plumbing(workload):
    from columba_tpu.search import paired

    # default matches the reference: no discordant pairing without -D
    assert paired.PairedConfig().discordant is False
