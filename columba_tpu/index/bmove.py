"""Run-length-compressed bidirectional move-structure index (b-move, RLC).

TPU-native re-design of the reference's BMove back-end
(reference: src/bmove/bmove.{h,cpp}, src/bmove/moverepr.{h,cpp}): the
BWT is represented by its maximal equal-character runs; LF is an O(1)
table step plus a short fast-forward, so index size scales with the number
of runs r instead of the text length n.

Differences from the reference, by design (TPU-first, not a port):

* One **fused row per run interval** (start/end, LF destination pos+run,
  char, SA samples at head and tail, next/previous run of each character,
  per-character cumulative counts) so a single 80-byte row gather serves a
  whole endpoint query; the reference scatters this state over separate
  bit-packed structures (moverepr.h) walked pointer-by-pointer.
* "Walk to the next run of c" (reference moverepr.cpp:313-330) becomes a
  precomputed per-run table lookup -- O(r) extra ints buy away the only
  data-dependent loop in the hot path.
* Locate is a batched LF-walk to the nearest SA sample, where samples sit
  at every run boundary (the reference's .smpf/.smpl) AND at every
  LOCATE_STRIDE-th BWT row, so every walk is bounded by LOCATE_STRIDE
  steps regardless of run length. The reference instead enumerates
  occurrences by a sequential toehold + phi-walk bounded by PLCP
  (bmove.cpp:503-547, plcp.h:59-130) — a pointer chase over the occurrence
  list, the exact shape a TPU cannot batch; bounded per-row LF-walks are
  uniform lanes. Cost: n/16 bytes of samples on top of the n/4-byte text.
* The packed 2-bit text is kept (0.25 B/base) so the in-text verification
  and CIGAR paths are shared with the Vanilla back-end; the reference's
  textless matchedStr machinery (indexinterface.h:294-304) exists to save
  that memory and costs per-node string state -- hostile to a frontier
  executor. Text can be dropped for very large pan-genomes at the cost of
  in-index-only completion (distances from colMin sums, no CIGAR).

State convention: a frontier node's range vector widens from 4 to 8 ints:
``[f_lo, f_hi, r_lo, r_hi, f_run_lo, f_run_hi1, r_run_lo, r_run_hi1]``
where *_run_lo is the run interval containing *_lo and *_run_hi1 the one
containing *_hi - 1 (run hints; local to each direction's table).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from columba_tpu.index.build import (
    IndexArrays, INDEX_FORMAT_VERSION, pack_2bit, preprocess_fasta,
)
from columba_tpu.index.suffix import suffix_array

# fused row column indices
START, END, LF_POS, LF_RUN, CHAR, SA_FIRST, SA_LAST = 0, 1, 2, 3, 4, 5, 6
NEXT0, PREV0, CUM0 = 8, 12, 16
NCOLS = 20

# stride of the in-run SA sampling (power of two). Run-boundary samples
# alone make locate walk an expected (run length)/2 LF steps — degenerate
# on pan-genomes where RLC's r << n means huge runs; sampling every
# LOCATE_STRIDE-th BWT row bounds every walk at LOCATE_STRIDE steps for
# n/16 bytes (the RLC flavor already keeps the n/4-byte packed text for
# verification, see the module docstring; the reference instead pays a
# phi/PLCP structure + sequential enumeration, src/bmove/plcp.h:59-130,
# bmove.cpp:503-547).
LOCATE_STRIDE = 64


def _runs_of_direction(codes: np.ndarray, sa_method: str,
                       want_stride: bool = False):
    """Move-table arrays for one direction. codes: clean 0..3 text."""
    n = len(codes)
    big = n + 1
    sa = suffix_array(codes, method=sa_method)
    sa_full = np.empty(big, dtype=np.int64)
    sa_full[0] = n
    sa_full[1:] = sa
    prev = sa_full - 1
    bwt5 = np.where(prev < 0, 4, codes[np.clip(prev, 0, n - 1)]).astype(np.uint8)

    # maximal runs
    bounds = np.flatnonzero(np.diff(bwt5.astype(np.int16))) + 1
    starts = np.concatenate([[0], bounds]).astype(np.int64)
    ends = np.concatenate([bounds, [big]]).astype(np.int64)
    R = len(starts)
    rchar = bwt5[starts].astype(np.int64)

    # per-char cumulative counts at run starts (occ_c(start), '$' excluded)
    cum = np.zeros((R, 4), dtype=np.int64)
    for c in range(4):
        lens_c = np.where(rchar == c, ends - starts, 0)
        cum[:, c] = np.concatenate([[0], np.cumsum(lens_c)[:-1]])

    # first F-column row per char, '$ACGT' order: '$'->0
    char_counts = np.bincount(codes, minlength=4).astype(np.int64)
    first = np.zeros(5, dtype=np.int64)
    first[4] = 0  # '$'
    first[0] = 1
    first[1:4] = 1 + np.cumsum(char_counts)[:3]

    lf_pos = first[rchar] + np.where(rchar < 4, cum[np.arange(R),
                                                    np.clip(rchar, 0, 3)], 0)
    lf_run = np.searchsorted(starts, lf_pos, side="right") - 1

    # next/prev run of char c
    nxt = np.full((R, 4), R, dtype=np.int64)
    prv = np.full((R, 4), -1, dtype=np.int64)
    for c in range(4):
        idx = np.flatnonzero(rchar == c)
        if len(idx):
            k = np.searchsorted(idx, np.arange(R), side="left")
            nxt[:, c] = np.where(k < len(idx), idx[np.clip(k, 0, len(idx) - 1)], R)
            k2 = np.searchsorted(idx, np.arange(R), side="right") - 1
            prv[:, c] = np.where(k2 >= 0, idx[np.clip(k2, 0, None)], -1)

    # positions/counts/SA values are uint32 (build.MAX_N ceiling); run
    # indices share the table and are bit-cast back to int32 on device
    # (PREV = -1 round-trips as 0xFFFFFFFF)
    fused = np.zeros((R + 1, NCOLS), dtype=np.uint32)
    fused[:R, START] = starts
    fused[:R, END] = ends
    fused[:R, LF_POS] = lf_pos
    fused[:R, LF_RUN] = lf_run
    fused[:R, CHAR] = rchar
    fused[:R, SA_FIRST] = sa_full[starts]
    fused[:R, SA_LAST] = sa_full[ends - 1]
    fused[:R, NEXT0:NEXT0 + 4] = nxt.astype(np.uint32)
    fused[:R, PREV0:PREV0 + 4] = prv.astype(np.uint32)
    fused[:R, CUM0:CUM0 + 4] = cum
    # sentinel row R: empty interval at big (fast-forward terminator)
    fused[R, START] = big
    fused[R, END] = big
    fused[R, CHAR] = 4
    fused[R, NEXT0:NEXT0 + 4] = R
    fused[R, PREV0:PREV0 + 4] = R - 1
    fused[R, CUM0:CUM0 + 4] = cum[R - 1] + np.where(
        rchar[R - 1] == np.arange(4), ends[R - 1] - starts[R - 1], 0)
    sa_stride = (sa_full[::LOCATE_STRIDE].astype(np.uint32)
                 if want_stride else None)
    return fused, first.astype(np.uint32), R, sa_stride


@dataclass(frozen=True)
class BMoveArrays:
    """Host-side persisted arrays of one RLC index."""

    meta: dict
    fused_fwd: np.ndarray   # (R_f + 1, NCOLS) uint32
    fused_rev: np.ndarray   # (R_r + 1, NCOLS) uint32
    first_row: np.ndarray   # (5,) uint32: first F row per '$ACGT' char
    text: np.ndarray        # packed uint32 (2-bit), for verification
    sa_stride: np.ndarray   # uint32 SA at every LOCATE_STRIDE-th fwd row
    seq_starts: np.ndarray
    seq_names: list

    @property
    def n(self) -> int:
        return self.meta["n"]


def build_bmove_from_codes(
    codes: np.ndarray,
    seq_names=None,
    seq_starts=None,
    sa_method: str = "auto",
) -> BMoveArrays:
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    if codes.max(initial=0) > 3:
        raise ValueError("text contains non-ACGT codes; preprocess first")
    n = len(codes)
    from columba_tpu.index.build import MAX_N

    if n > MAX_N:
        raise ValueError(
            f"text length {n} exceeds the uint32 index ceiling {MAX_N}")
    fused_fwd, first, r_f, sa_stride = _runs_of_direction(
        codes, sa_method, want_stride=True)
    fused_rev, _, r_r, _ = _runs_of_direction(codes[::-1].copy(), sa_method)
    if seq_names is None:
        seq_names = ["seq0"]
        seq_starts = np.array([0, n], dtype=np.int64)
    meta = dict(
        format_version=INDEX_FORMAT_VERSION, flavor="rlc", n=n,
        runs_fwd=r_f, runs_rev=r_r, num_seqs=len(seq_names),
        locate_stride=LOCATE_STRIDE,
    )
    return BMoveArrays(
        meta=meta, fused_fwd=fused_fwd, fused_rev=fused_rev,
        first_row=first, text=pack_2bit(codes), sa_stride=sa_stride,
        seq_starts=np.asarray(seq_starts, dtype=np.int64),
        seq_names=list(seq_names),
    )


def build_bmove(fasta_paths, out_dir=None, seed=42, sa_method="auto"):
    """FASTA file(s) -> RLC index arrays (optionally persisted)."""
    if isinstance(fasta_paths, str):
        fasta_paths = [fasta_paths]
    codes, names, starts = preprocess_fasta(fasta_paths, seed=seed)
    idx = build_bmove_from_codes(codes, names, starts, sa_method=sa_method)
    if out_dir is not None:
        save_bmove(idx, out_dir)
    return idx


_BM_FIELDS = ["fused_fwd", "fused_rev", "first_row", "text", "sa_stride",
              "seq_starts"]


def save_bmove(idx: BMoveArrays, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in _BM_FIELDS:
        np.save(os.path.join(out_dir, name + ".npy"), getattr(idx, name))
    meta = dict(idx.meta)
    meta["seq_names"] = idx.seq_names
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_bmove(out_dir: str) -> BMoveArrays:
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("flavor") != "rlc":
        raise ValueError("not an RLC index (flavor mismatch)")
    if meta.get("format_version") != INDEX_FORMAT_VERSION:
        raise ValueError("index format mismatch; rebuild")
    seq_names = meta.pop("seq_names")
    try:
        arrs = {name: np.load(os.path.join(out_dir, name + ".npy"))
                for name in _BM_FIELDS}
    except FileNotFoundError as e:
        raise ValueError(
            f"RLC index at {out_dir} is missing {e.filename} "
            "(built by an older version?); rebuild it") from e
    return BMoveArrays(meta=meta, seq_names=seq_names, **arrs)


@dataclass(frozen=True)
class BMoveIndex:
    """Device-side RLC index (pytree of jnp arrays).

    The fwd and rev fused tables are concatenated so a mixed-direction
    frontier picks its table with a row offset, exactly like FMIndex's
    concatenated occ layout.
    """

    fused: jax.Array      # (R_f + R_r + 2, NCOLS) uint32
    first_row: jax.Array  # (5,) uint32
    text: jax.Array       # packed uint32 words (padded)
    sa_stride: jax.Array  # uint32 SA at every LOCATE_STRIDE-th fwd row
    n_arr: jax.Array      # (2,) uint32 [n, n+1]

    n: int = 0
    r_fwd: int = 0        # fwd intervals (rev table rows offset by r_fwd+1)
    r_rev: int = 0
    stride: int = LOCATE_STRIDE

    @staticmethod
    def from_arrays(arrays: BMoveArrays) -> "BMoveIndex":
        n = arrays.n
        text = np.concatenate([arrays.text, np.zeros(16, dtype=np.uint32)])
        fused = np.concatenate([arrays.fused_fwd, arrays.fused_rev])
        return BMoveIndex(
            fused=jnp.asarray(np.asarray(fused, dtype=np.uint32)),
            first_row=jnp.asarray(
                np.asarray(arrays.first_row, dtype=np.uint32)),
            text=jnp.asarray(text),
            sa_stride=jnp.asarray(
                np.asarray(arrays.sa_stride, dtype=np.uint32)),
            n_arr=jnp.asarray(np.asarray([n, n + 1], dtype=np.uint32)),
            n=n,
            r_fwd=arrays.meta["runs_fwd"],
            r_rev=arrays.meta["runs_rev"],
            stride=arrays.meta.get("locate_stride", LOCATE_STRIDE),
        )

    @property
    def num_rows(self) -> int:
        return self.n + 1

    @property
    def range_width(self) -> int:
        return 8

    def full_range(self, batch_shape=()) -> jax.Array:
        """Whole-index range pair + run hints."""
        big = self.n + 1
        r = jnp.array(
            [0, big, 0, big, 0, self.r_fwd - 1, 0, self.r_rev - 1],
            dtype=jnp.uint32)
        return jnp.broadcast_to(r, (*batch_shape, 8))


jax.tree_util.register_dataclass(
    BMoveIndex,
    data_fields=["fused", "first_row", "text", "sa_stride", "n_arr"],
    meta_fields=["n", "r_fwd", "r_rev", "stride"],
)
