"""Paired-end mapping: pairing windows, orientations, inference, SAM."""

import numpy as np
import pytest

from columba_tpu.core import alphabet
from columba_tpu.index.fmindex import FMIndex
from columba_tpu.search import paired, strategy


@pytest.fixture(scope="module")
def pe_setup(small_index, rng):
    genome, arrays = small_index
    index = FMIndex.from_arrays(arrays)
    m, insert = 50, 200
    n = len(genome)
    r1, r2, positions = [], [], []
    for _ in range(16):
        p = int(rng.integers(0, n - insert - 10))
        frag = genome[p:p + insert]
        r1.append(frag[:m].copy())                      # fwd
        r2.append(alphabet.revcomp(frag[-m:]).copy())   # rc (FR orientation)
        positions.append(p)
    return genome, arrays, index, np.stack(r1), np.stack(r2), positions, m, insert


def test_pair_all_fr(pe_setup):
    genome, arrays, index, r1, r2, positions, m, insert = pe_setup
    pcfg = paired.PairedConfig(orientation="fr", min_insert=100,
                               max_insert=300, infer=False)
    mapped = paired.map_pairs_all(
        index, r1, r2, "kuch1", 1, "edit", pcfg, arrays.seq_starts,
    )
    for i, mp in enumerate(mapped):
        assert mp.pairs, f"pair {i} not concordantly mapped"
        best = min(mp.pairs, key=lambda p: p.total_distance)
        assert best.total_distance == 0
        assert abs(best.up.begin - positions[i]) <= 1
        assert abs(best.fragment - insert) <= 2


def test_pair_inference(pe_setup):
    genome, arrays, index, r1, r2, positions, m, insert = pe_setup
    cfg = strategy.MappingConfig(scheme_name="kuch1", metric="edit")
    pcfg = paired.infer_parameters(index, r1, r2, cfg, arrays.seq_starts)
    assert pcfg.orientation == "fr"
    assert pcfg.min_insert <= insert <= pcfg.max_insert


def test_pair_sam_emission(pe_setup):
    genome, arrays, index, r1, r2, positions, m, insert = pe_setup
    from columba_tpu.io.fastq import ReadRecord

    pcfg = paired.PairedConfig(orientation="fr", min_insert=100,
                               max_insert=300, infer=False)
    mapped = paired.map_pairs_all(
        index, r1, r2, "kuch1", 1, "edit", pcfg, arrays.seq_starts,
    )
    recs1 = [ReadRecord(f"p{i}", r1[i], "I" * m) for i in range(len(r1))]
    recs2 = [ReadRecord(f"p{i}", r2[i], "I" * m) for i in range(len(r2))]
    lines = paired.emit_sam_paired(recs1, recs2, mapped, arrays, kb=1)
    primaries = [l.split("\t") for l in lines if not int(l.split("\t")[1]) & 0x100]
    assert len(primaries) == 2 * len(r1)
    for f in primaries:
        flag = int(f[1])
        assert flag & 0x1 and flag & 0x2  # paired + proper
        assert f[6] == "="
        tlen = int(f[8])
        assert abs(abs(tlen) - insert) <= 2


def test_pair_one_side_garbage(pe_setup, rng):
    genome, arrays, index, r1, r2, positions, m, insert = pe_setup
    junk = rng.integers(0, 4, size=(len(r1), m)).astype(np.uint8)
    pcfg = paired.PairedConfig(orientation="fr", min_insert=100,
                               max_insert=300, infer=False)
    mapped = paired.map_pairs_all(
        index, r1, junk, "kuch1", 1, "edit", pcfg, arrays.seq_starts,
    )
    for mp in mapped:
        assert not mp.pairs and not mp.discordant
        assert mp.unpaired1  # read1 still maps alone
