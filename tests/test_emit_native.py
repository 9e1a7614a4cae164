"""Byte-parity of the native (C++) SAM emitter vs the pure-Python path.

The native emitter (columba_tpu/native/emit.cpp via io/emit.py) must
produce byte-identical SAM to strategy.emit_sam for every configuration:
plain / XA-folded, with / without CIGAR, with / without unmapped records,
kb 0..4, multi-sequence texts with boundary-trimmed occurrences, reads
with N characters, and repeat-heavy multimaps.
"""

import numpy as np
import pytest

from columba_tpu.core import alphabet
from columba_tpu.index.build import build_index_from_codes, decoded_text
from columba_tpu.index.fmindex import FMIndex
from columba_tpu.io import emit
from columba_tpu.io.fastq import ReadRecord
from columba_tpu.search import pipeline
from columba_tpu.search.scheme import get_scheme
from columba_tpu.search.strategy import MappedRead, emit_sam

from .conftest import make_genome, sample_reads

pytestmark = pytest.mark.skipif(not emit.available(),
                                reason="native emit lib unavailable")


@pytest.fixture(scope="module")
def fm3(rng):
    """Multi-sequence genome (3 seqs) with repeats, plus its index."""
    seqs = [make_genome(rng, 900), make_genome(rng, 700),
            make_genome(rng, 500)]
    # plant a shared repeat so multimaps + redundancy filtering trigger
    rep = make_genome(rng, 80)
    seqs[0][100:180] = rep
    seqs[1][300:380] = rep
    seqs[2][50:130] = rep
    genome = np.concatenate(seqs)
    starts = np.array([0, 900, 1600, 2100], dtype=np.int64)
    arrays = build_index_from_codes(
        genome, sa_sparseness=1,
        seq_names=["chrA", "chrB", "chrC"], seq_starts=starts)
    return genome, arrays, FMIndex.from_arrays(arrays)


def _records(reads, rng):
    recs = []
    for i, r in enumerate(reads):
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40,
                                                              len(r)))
        recs.append(ReadRecord(f"read{i}", r, qual))
    return recs


def _mapped_from_occs(occs, n_reads):
    out = [MappedRead() for _ in range(n_reads)]
    for o in occs:
        out[o.read_id].occs.append(o)
    for mr in out:
        if mr.occs:
            mr.best = min(o.distance for o in mr.occs)
            mr.n_best = sum(1 for o in mr.occs if o.distance == mr.best)
    return out


def _both(fm3, recs, reads, occs, kb, **kw):
    genome, arrays, index = fm3
    mapped = _mapped_from_occs(occs, len(reads))
    want = "".join(emit_sam(recs, mapped, arrays, index, kb, **kw))
    names_buf, name_offs = emit.pack_strings([r.name for r in recs])
    quals_buf, qual_offs = emit.pack_strings([r.qual for r in recs])
    got = emit.emit_sam_native(
        np.ascontiguousarray(reads), names_buf, name_offs, quals_buf,
        qual_offs, occs, arrays, decoded_text(arrays), kb,
        xa_tag=kw.get("xa_tag", False),
        unmapped_records=kw.get("unmapped_records", True),
        with_cigar=kw.get("with_cigar", True), n_threads=3)
    assert got is not None
    assert got.decode() == want


@pytest.mark.parametrize("k,metric", [(0, "hamming"), (2, "hamming"),
                                      (2, "edit"), (3, "edit")])
@pytest.mark.parametrize("kw", [
    dict(),
    dict(xa_tag=True),
    dict(with_cigar=False),
    dict(unmapped_records=False),
])
def test_parity_modes(fm3, rng, k, metric, kw):
    genome, arrays, index = fm3
    reads = sample_reads(rng, genome, num=24, length=60, max_err=k,
                         edits=(metric == "edit"))
    # a few reads with Ns and a few junk reads (unmapped)
    reads[0][5] = 4
    reads[1][:] = rng.integers(0, 4, 60)
    recs = _records(reads, rng)
    scheme = get_scheme("kuch1" if k else "pigeon", k)
    occs, _ = pipeline.match_all(index, reads, scheme, metric=metric)
    kb = k if metric == "edit" else 0
    occs = pipeline.apply_boundary_trim(occs, reads, arrays, kb, k)
    _both(fm3, recs, reads, occs, kb, **kw)


def test_parity_multimap(fm3, rng):
    """Reads inside the planted repeat -> 3+ occurrences each."""
    genome, arrays, index = fm3
    reads = np.stack([genome[110:160], genome[1310:1360],
                      alphabet.revcomp(genome[60:110])])
    recs = _records(reads, rng)
    occs, _ = pipeline.match_all(index, reads, get_scheme("kuch1", 2),
                                 metric="edit")
    occs = pipeline.apply_boundary_trim(occs, reads, arrays, 2, 2)
    _both(fm3, recs, reads, occs, 2)
    _both(fm3, recs, reads, occs, 2, xa_tag=True)


def test_parity_boundary(fm3, rng):
    """Reads sampled across sequence boundaries exercise trimming."""
    genome, arrays, index = fm3
    rows = []
    for b in (900, 1600):
        for off in (-40, -25, -10):
            rows.append(genome[b + off: b + off + 50])
    reads = np.stack(rows)
    recs = _records(reads, rng)
    occs, _ = pipeline.match_all(index, reads, get_scheme("kuch1", 2),
                                 metric="edit")
    occs = pipeline.apply_boundary_trim(occs, reads, arrays, 2, 2)
    _both(fm3, recs, reads, occs, 2)


def test_parity_fuzz(fm3, rng):
    """Randomized fuzz over many batches."""
    genome, arrays, index = fm3
    for trial in range(6):
        k = int(rng.integers(1, 4))
        n = int(rng.integers(1, 30))
        mlen = int(rng.integers(30, 90))
        reads = sample_reads(rng, genome, num=n, length=mlen, max_err=k,
                             edits=True)
        nnoise = int(rng.integers(0, max(1, n // 3)))
        for j in range(nnoise):
            reads[j] = rng.integers(0, 4, mlen)
        recs = _records(reads, rng)
        occs, _ = pipeline.match_all(index, reads, get_scheme("kuch1", k),
                                     metric="edit")
        occs = pipeline.apply_boundary_trim(occs, reads, arrays, k, k)
        _both(fm3, recs, reads, occs, k)
        _both(fm3, recs, reads, occs, k, xa_tag=True)
