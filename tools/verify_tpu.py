import os, sys, tempfile
import numpy as np

tmp = tempfile.mkdtemp(prefix="ver_")
rng = np.random.default_rng(7)
codes = rng.integers(0, 4, size=200_000).astype(np.uint8)
seq = "".join("ACGT"[c] for c in codes)
# sprinkle some Ns into the FASTA text
sl = list(seq); sl[1000:1005] = "N"*5; seq = "".join(sl)
fa = os.path.join(tmp, "g.fa")
with open(fa, "w") as f:
    f.write(">chr1\n")
    for i in range(0, len(seq), 70):
        f.write(seq[i:i+70] + "\n")

import columba_tpu
from columba_tpu.index.build import load_index
from columba_tpu.index.fmindex import FMIndex
from columba_tpu.core import alphabet

idxd = os.path.join(tmp, "idx.cidx")
columba_tpu.build_index(fa, out_dir=idxd)
arrays = load_index(idxd)
index = FMIndex.from_arrays(arrays)
import jax
print("devices:", jax.devices())

# sample reads from the genome (skip the N region), inject 1 error each
m, B = 100, 64
starts = rng.integers(2000, 199_000 - m, size=B)
reads = np.zeros((B, m), np.uint8)
for i, s in enumerate(starts):
    r = codes[s:s+m].astype(np.uint8)
    j = int(rng.integers(0, m))
    r[j] = (r[j] + 1 + int(rng.integers(0, 3))) % 4
    if i % 2:
        r = 3 - r[::-1]
    reads[i] = r

from columba_tpu.search import pipeline
from columba_tpu.search.scheme import get_scheme
occs, stats = pipeline.match_all(index, reads, get_scheme("kuch1", 2),
                                 metric="edit")
found = {i: set() for i in range(B)}
for o in occs:
    found[o.read_id].add(o.begin)
ok = 0
for i, s in enumerate(starts):
    hit = any(abs(p - s) <= 2 for p in found[i])
    ok += hit
    if not hit:
        print("MISS", i, s, sorted(found[i])[:5])
print(f"recall: {ok}/{B}")
assert ok == B, "lossless recall failed"

# mutated beyond k must drop out at k=0
r0 = codes[5000:5100].astype(np.int32).copy()
r0[10] = (r0[10] + 1) % 4; r0[50] = (r0[50] + 2) % 4; r0[90] = (r0[90] + 1) % 4
occ0, _ = pipeline.match_all(index, r0[None, :].astype('uint8'),
                             get_scheme("kuch1", 0), metric="edit")
assert not [o for o in occ0 if o.read_id == 0], "k=0 false positive"
print("k=0 dropout OK")
print("VERIFY PASS")

# dense-SA (sa_sparseness=1) locate fast path, end-to-end on TPU
from columba_tpu.index.build import build_index_from_codes
arr1 = build_index_from_codes(codes, sa_sparseness=1)
idx1 = FMIndex.from_arrays(arr1)
occs1, _ = pipeline.match_all(idx1, reads, get_scheme("kuch1", 2),
                              metric="edit")
f1 = {i: set() for i in range(B)}
for o in occs1:
    f1[o.read_id].add(o.begin)
ok1 = sum(any(abs(p - s) <= 2 for p in f1[i]) for i, s in enumerate(starts))
print(f"dense-SA recall: {ok1}/{B}")
assert ok1 == B
print("VERIFY PASS (dense SA)")

# static-slice k-mer seeding path (kmer_table= + seeded schedule), on TPU
from columba_tpu.index.kmer import build_kmer_table
kt8 = build_kmer_table(idx1, 8)
occs2, _ = pipeline.match_all(idx1, reads, get_scheme("kuch1", 2),
                              metric="edit", kmer_table=kt8)
f2 = {i: set() for i in range(B)}
for o in occs2:
    f2[o.read_id].add(o.begin)
ok2 = sum(any(abs(p - s) <= 2 for p in f2[i]) for i, s in enumerate(starts))
print(f"seeded recall: {ok2}/{B}")
assert ok2 == B
k1 = {(o.read_id, o.strand, o.end, o.distance) for o in occs1}
k2 = {(o.read_id, o.strand, o.end, o.distance) for o in occs2}
assert k1 == k2, "seeded != unseeded occurrence set"
print("VERIFY PASS (seeded)")
