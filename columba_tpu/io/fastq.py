"""FASTQ/FASTA read input: parsing, cleanup, fixed-shape batching.

Host-side analogue of the reference's reader pipeline
(reference: src/fastq.cpp:43-241 record parsing, :283-424 chunking): reads
are parsed, uppercased with non-ACGT -> N (reference src/reads.h:43-58
``cleanUpRecord``), and grouped into fixed-shape (B, m) code batches per
length class — the TPU substitute for adaptive chunk sizing (static shapes
compile once per length bucket).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass

import numpy as np

from columba_tpu.core import alphabet


@dataclass
class ReadRecord:
    name: str
    codes: np.ndarray  # uint8, 0..3 + 4 for N
    qual: str


def open_maybe_gz(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


def parse_reads(path: str):
    """Yield ReadRecord from FASTQ or FASTA (sniffed by first char)."""
    with open_maybe_gz(path) as f:
        first = f.read(1)
        f.seek(0)
        if first == "@":
            while True:
                h = f.readline()
                if not h:
                    return
                seq = f.readline().strip()
                f.readline()
                qual = f.readline().strip()
                yield ReadRecord(h[1:].split()[0].strip(), alphabet.encode(seq), qual)
        elif first == ">":
            name, parts = None, []
            for line in f:
                line = line.strip()
                if line.startswith(">"):
                    if name is not None:
                        seq = "".join(parts)
                        yield ReadRecord(name, alphabet.encode(seq), "I" * len(seq))
                    name = line[1:].split()[0]
                    parts = []
                else:
                    parts.append(line)
            if name is not None:
                seq = "".join(parts)
                yield ReadRecord(name, alphabet.encode(seq), "I" * len(seq))
        else:
            raise ValueError(f"unrecognized read file format: {path}")


def batches_by_length(records, batch_size: int):
    """Group records into fixed-shape batches per read length.

    Yields (records_list, codes (B, m)) with the final partial batch padded
    by repeating the last read (padding rows are dropped by the caller via
    len(records_list)).
    """
    buckets: dict[int, list[ReadRecord]] = {}
    for rec in records:
        m = len(rec.codes)
        buckets.setdefault(m, []).append(rec)
        bucket = buckets[m]
        if len(bucket) == batch_size:
            yield bucket, np.stack([r.codes for r in bucket])
            buckets[m] = []
    for m, bucket in sorted(buckets.items()):
        if not bucket:
            continue
        pad = [bucket[-1]] * (batch_size - len(bucket))
        yield bucket, np.stack([r.codes for r in bucket + pad])


def trim_records(records, start: int, end: int):
    """Trim reads to [start, end) (reference -T option,
    src/parameters/alignparameters.cpp TrimOption)."""
    for rec in records:
        yield ReadRecord(rec.name, rec.codes[start:end], rec.qual[start:end])
