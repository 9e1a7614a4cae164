"""Paired-end mapping: orientation handling, pairing, inference.

Host-side orchestration over the batched device pipeline, mirroring the
reference's PE logic:
  - orientation combinations (reference: src/searchstrategy.h:790-861
    processCombFR/FF/RF): FR pairs (read1 fwd upstream, read2-RC downstream)
    and (read2 fwd upstream, read1-RC downstream); FF/RF analogous.
  - pairing by fragment-size window over begin/end positions
    (reference: src/searchstrategy.cpp:1281-1343 ``pairOccurrences``:
    fragment = downstream.end - upstream.begin in [min, max], same sequence).
  - discordant fallback and one/both-unmapped records
    (reference: src/searchstrategy.cpp:1518-1645).
  - insert-size/orientation inference from the first unambiguously mapped
    pairs: median/MAD outlier removal then mean +/- 6 sigma
    (reference: src/parallel.cpp:402-465).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import numpy as np

from columba_tpu.search import pipeline, strategy
from columba_tpu.search.scheme import get_scheme

INFERENCE_PAIRS = 750   # reference: src/definitions.h:57
INFERENCE_MAX_READS = 10000


@dataclass
class PairedConfig:
    orientation: str = "fr"      # fr | ff | rf
    min_insert: int = 0
    max_insert: int = 500
    infer: bool = True
    # discordant pairing requires the -D flag, matching the reference
    # (src/parameters/alignparameters.cpp:691-716, default disallowed)
    discordant: bool = False
    max_discordant: int = 100000


@dataclass
class PairedOcc:
    up: pipeline.Occurrence
    down: pipeline.Occurrence
    up_is_read1: bool

    @property
    def total_distance(self):
        return self.up.distance + self.down.distance

    @property
    def fragment(self):
        return self.down.end - self.up.begin


@dataclass
class MappedPair:
    pairs: list = field(default_factory=list)       # concordant PairedOccs
    discordant: list = field(default_factory=list)  # discordant PairedOccs
    unpaired1: list = field(default_factory=list)   # Occurrences of read1
    unpaired2: list = field(default_factory=list)


def _occs_by_strand(mapped: list[strategy.MappedRead]):
    """mapped reads -> per read [occs_fwd, occs_rc]."""
    out = []
    for mr in mapped:
        fwd = [o for o in mr.occs if o.strand == 0]
        rc = [o for o in mr.occs if o.strand == 1]
        out.append((fwd, rc))
    return out


def pair_occurrences(
    up: list[pipeline.Occurrence],
    down: list[pipeline.Occurrence],
    min_frag: int,
    max_frag: int,
    up_is_read1: bool,
    seq_starts: np.ndarray,
) -> list[PairedOcc]:
    """Window pairing of sorted occurrence lists (reference pairOccurrences)."""
    if not up or not down:
        return []
    down_sorted = sorted(down, key=lambda o: o.end)
    ends = [o.end for o in down_sorted]
    out = []
    for u in up:
        import bisect

        i = bisect.bisect_left(ends, u.begin)
        for d in down_sorted[i:]:
            frag = d.end - u.begin
            if frag > max_frag:
                break
            if frag < min_frag:
                continue
            su = np.searchsorted(seq_starts, u.begin, side="right")
            sd = np.searchsorted(seq_starts, d.begin, side="right")
            if su != sd:
                continue
            out.append(PairedOcc(u, d, up_is_read1))
    return out


def map_pairs_all(
    index,
    reads1: np.ndarray,
    reads2: np.ndarray,
    scheme_name: str,
    k: int,
    metric: str,
    pcfg: PairedConfig,
    seq_starts: np.ndarray,
    kmer_table=None,
) -> list[MappedPair]:
    """ALL-mode paired mapping of a batch of pairs."""
    scheme = get_scheme(scheme_name, k)
    occ1, _ = pipeline.match_all(index, reads1, scheme, metric=metric,
                                 kmer_table=kmer_table)
    occ2, _ = pipeline.match_all(index, reads2, scheme, metric=metric,
                                 kmer_table=kmer_table)
    R = len(reads1)
    per1 = [[[], []] for _ in range(R)]
    per2 = [[[], []] for _ in range(R)]
    for o in occ1:
        per1[o.read_id][o.strand].append(o)
    for o in occ2:
        per2[o.read_id][o.strand].append(o)

    out = []
    for i in range(R):
        mp = MappedPair()
        combos = _orientation_combos(pcfg.orientation, per1[i], per2[i])
        for up, down, up_is_1 in combos:
            mp.pairs.extend(
                pair_occurrences(up, down, pcfg.min_insert, pcfg.max_insert,
                                 up_is_1, seq_starts)
            )
        if not mp.pairs and pcfg.discordant:
            mp.discordant = _pair_discordantly(per1[i], per2[i],
                                               pcfg.max_discordant)
        if not mp.pairs and not mp.discordant:
            mp.unpaired1 = per1[i][0] + per1[i][1]
            mp.unpaired2 = per2[i][0] + per2[i][1]
        out.append(mp)
    return out


def _orientation_combos(orientation, p1, p2):
    """(upstream occs, downstream occs, up_is_read1) per orientation
    (reference processCombFR/FF/RF)."""
    f1, rc1 = p1
    f2, rc2 = p2
    if orientation == "fr":
        return [(f1, rc2, True), (f2, rc1, False)]
    if orientation == "rf":
        return [(rc1, f2, True), (rc2, f1, False)]
    # ff
    return [(f1, f2, True), (rc2, rc1, False)]


def _pair_discordantly(p1, p2, cap):
    """Best-distance cross product, capped (reference pairDiscordantly)."""
    occs1 = p1[0] + p1[1]
    occs2 = p2[0] + p2[1]
    if not occs1 or not occs2:
        return []
    b1 = min(o.distance for o in occs1)
    b2 = min(o.distance for o in occs2)
    best1 = [o for o in occs1 if o.distance == b1]
    best2 = [o for o in occs2 if o.distance == b2]
    out = []
    for u in best1:
        for d in best2:
            if len(out) >= cap:
                return out
            out.append(PairedOcc(u, d, True))
    return out


def infer_parameters(
    index,
    reads1: np.ndarray,
    reads2: np.ndarray,
    cfg: strategy.MappingConfig,
    seq_starts: np.ndarray,
    kmer_table=None,
    pcfg_in: "PairedConfig | None" = None,
) -> PairedConfig:
    """Infer orientation + insert-size window from unambiguous pairs
    (reference: src/parallel.cpp:402-465). Non-inferred settings
    (discordant policy) carry over from ``pcfg_in``."""
    n = min(len(reads1), INFERENCE_MAX_READS)
    m1 = strategy.map_batch_best(index, reads1[:n], cfg)
    m2 = strategy.map_batch_best(index, reads2[:n], cfg)
    frags, oris = [], []
    for a, b in zip(m1, m2):
        if len(a.occs) != 1 or len(b.occs) != 1:
            continue
        oa, ob = a.occs[0], b.occs[0]
        sa = np.searchsorted(seq_starts, oa.begin, side="right")
        sb = np.searchsorted(seq_starts, ob.begin, side="right")
        if sa != sb:
            continue
        lo, hi = (oa, ob) if oa.begin <= ob.begin else (ob, oa)
        frags.append(hi.end - lo.begin)
        if oa.strand == ob.strand:
            oris.append("ff")
        elif lo.strand == 0:
            oris.append("fr")
        else:
            oris.append("rf")
        if len(frags) >= INFERENCE_PAIRS:
            break
    if len(frags) < 20:
        return replace(pcfg_in, infer=False) if pcfg_in else PairedConfig()
    frags = np.array(frags, dtype=np.float64)
    med = np.median(frags)
    mad = np.median(np.abs(frags - med)) or 1.0
    keep = frags[np.abs(frags - med) <= 3 * 1.4826 * mad]
    mean, std = keep.mean(), keep.std() or 1.0
    ori = max(set(oris), key=oris.count)
    return PairedConfig(
        orientation=ori,
        min_insert=max(0, int(mean - 6 * std)),
        max_insert=int(mean + 6 * std),
        infer=False,
        discordant=pcfg_in.discordant if pcfg_in else False,
        max_discordant=pcfg_in.max_discordant if pcfg_in else 100000,
    )


def emit_sam_paired(
    recs1, recs2, mapped: list[MappedPair], arrays, kb: int, counters=None
) -> list[str]:
    """SAM lines for a batch of pairs: primary = best total distance,
    others secondary (reference: src/searchstrategy.cpp:1904-1980)."""
    from columba_tpu.core import alphabet
    from columba_tpu.index.build import unpack_2bit
    from columba_tpu.io import sam

    genome = unpack_2bit(arrays.text, arrays.n)
    starts = arrays.seq_starts
    lines = []

    # first pass: collect every (occurrence, record) traceback task and
    # run ONE batched DP (see sam.traceback_batch)
    tasks, keymap = [], {}

    def collect(o, rec):
        key = (id(o), id(rec))
        if key not in keymap:
            seq_codes = (rec.codes if o.strand == 0
                         else alphabet.revcomp(rec.codes))
            w_lo = max(0, o.end - len(rec.codes) - kb)
            keymap[key] = len(tasks)
            tasks.append((seq_codes, genome[w_lo:o.end], w_lo))

    for i, (r1, r2) in enumerate(zip(recs1, recs2)):
        mp = mapped[i]
        cands = sorted(mp.pairs or mp.discordant,
                       key=lambda p: (p.total_distance, p.up.begin))
        for p in cands[:101]:  # emission stops at rank 100
            o1 = p.up if p.up_is_read1 else p.down
            o2 = p.down if p.up_is_read1 else p.up
            collect(o1, r1)
            collect(o2, r2)
        if not cands:
            # only the best unpaired occurrence per side is emitted
            for rec, occs in ((r1, mp.unpaired1), (r2, mp.unpaired2)):
                if occs:
                    collect(min(occs, key=lambda o: (o.distance, o.begin)),
                            rec)
    tb = sam.traceback_batch([t[0] for t in tasks],
                             [t[1] for t in tasks], kb)
    if counters is not None:
        counters.cigars_computed += len(tasks)

    def finalize(o, rec):
        ti = keymap[(id(o), id(rec))]
        seq_codes, _, w_lo = tasks[ti]
        begin, cigar, ed = tb[ti]
        begin += w_lo
        sidx = int(np.searchsorted(starts, begin, side="right") - 1)
        sidx = max(0, min(sidx, len(arrays.seq_names) - 1))
        pos1 = begin - int(starts[sidx]) + 1
        return seq_codes, begin, cigar, ed, sidx, pos1

    for i, (r1, r2) in enumerate(zip(recs1, recs2)):
        mp = mapped[i]
        cands = sorted(mp.pairs, key=lambda p: (p.total_distance,
                                                p.up.begin))
        proper = bool(cands)
        if not cands:
            cands = sorted(mp.discordant,
                           key=lambda p: (p.total_distance, p.up.begin))
        if cands:
            n_best = sum(1 for p in cands
                         if p.total_distance == cands[0].total_distance)
            mq = sam.mapq(n_best)
            for rank_i, p in enumerate(cands):
                o1 = p.up if p.up_is_read1 else p.down
                o2 = p.down if p.up_is_read1 else p.up
                s1, b1, c1, e1, x1, pos1 = finalize(o1, r1)
                s2, b2, c2, e2, x2, pos2 = finalize(o2, r2)
                tlen = (p.down.end - p.up.begin)
                t1 = tlen if o1.begin <= o2.begin else -tlen
                base = 0x1 | (0x2 if proper else 0)
                sec = 0x100 if rank_i > 0 else 0
                f1 = base | 0x40 | sec | (0x10 if o1.strand else 0) | (0x20 if o2.strand else 0)
                f2 = base | 0x80 | sec | (0x10 if o2.strand else 0) | (0x20 if o1.strand else 0)
                q1 = r1.qual if o1.strand == 0 else r1.qual[::-1]
                q2 = r2.qual if o2.strand == 0 else r2.qual[::-1]
                mqi = mq if rank_i == 0 else 0
                lines.append(
                    f"{r1.name}\t{f1}\t{arrays.seq_names[x1]}\t{pos1}\t{mqi}\t{c1}"
                    f"\t=\t{pos2}\t{t1}\t{alphabet.decode(s1)}\t{q1}"
                    f"\tAS:i:{e1}\tNM:i:{e1}\tPG:Z:Columba\n")
                lines.append(
                    f"{r2.name}\t{f2}\t{arrays.seq_names[x2]}\t{pos2}\t{mqi}\t{c2}"
                    f"\t=\t{pos1}\t{-t1}\t{alphabet.decode(s2)}\t{q2}"
                    f"\tAS:i:{e2}\tNM:i:{e2}\tPG:Z:Columba\n")
                if rank_i >= 100:
                    break
            continue
        # unpaired / unmapped handling
        for rec, occs, first in ((r1, mp.unpaired1, True), (r2, mp.unpaired2, False)):
            fbit = 0x40 if first else 0x80
            if occs:
                o = min(occs, key=lambda o: (o.distance, o.begin))
                s, b, c, e, x, pos1 = finalize(o, rec)
                flag = 0x1 | fbit | 0x8 | (0x10 if o.strand else 0)
                q = rec.qual if o.strand == 0 else rec.qual[::-1]
                lines.append(
                    f"{rec.name}\t{flag}\t{arrays.seq_names[x]}\t{pos1}\t"
                    f"{sam.mapq(sum(1 for t in occs if t.distance == o.distance))}\t{c}"
                    f"\t*\t0\t0\t{alphabet.decode(s)}\t{q}"
                    f"\tAS:i:{e}\tNM:i:{e}\tPG:Z:Columba\n")
            else:
                flag = 0x1 | fbit | 0x4 | 0x8
                lines.append(
                    f"{rec.name}\t{flag}\t*\t0\t0\t*\t*\t0\t0\t"
                    f"{alphabet.decode(rec.codes)}\t{rec.qual}\tPG:Z:Columba\n")
    return lines
