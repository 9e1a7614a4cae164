"""Benchmark: END-TO-END reads/sec/chip for the headline config (100 bp,
k=2 edit, kucherov k+1, ALL mode), per BASELINE.md.

The measurement is the COMPLETE pipeline through the CLI — FASTQ parse,
device matching, locate/verify, host traceback, SAM emission to disk —
exactly what measure_reference times for the C++ binary (which likewise
pays index load, k-mer table population and SAM output). 1M reads so
fixed startup costs amortize below the noise floor; a warmup invocation
in the same process first populates jit caches the way a long-running
service would (and the persistent compile cache makes even that cheap
after the first machine boot).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
A secondary stderr line reports the device-stage-only rate for continuity
with round-1 numbers (bench_device_stage()).

vs_baseline compares against the reference C++ Columba (single thread) run
on the SAME genome/reads on this machine, if the reference binary can be
built offline (tools/build_reference.sh); the measurement is cached in
/tmp/columba_ref_baseline.json. Without it, vs_baseline is null.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = "/tmp/columba_tpu_bench"
GENOME_N = 128_000_000
READ_LEN = 100
NUM_READS = 100_000        # device-stage continuity workload
NUM_READS_E2E = 1_000_000  # end-to-end workload (startup amortized <5%)
K = 2
BATCH = 8192
ERR_RATE = 0.01


def build_workload():
    os.makedirs(CACHE_DIR, exist_ok=True)
    gpath = os.path.join(CACHE_DIR, "genome.npy")
    rpath = os.path.join(CACHE_DIR, "reads.npy")
    if os.path.exists(gpath) and os.path.exists(rpath):
        return np.load(gpath), np.load(rpath)
    rng = np.random.default_rng(20260817)
    genome = rng.integers(0, 4, size=GENOME_N).astype(np.uint8)
    starts = rng.integers(0, GENOME_N - READ_LEN - 8, size=NUM_READS)
    reads = np.zeros((NUM_READS, READ_LEN), dtype=np.uint8)
    from columba_tpu.core import alphabet

    for i, s in enumerate(starts):
        seq = genome[s:s + READ_LEN].copy()
        nerr = rng.poisson(ERR_RATE * READ_LEN)
        for _ in range(int(nerr)):
            j = int(rng.integers(0, READ_LEN))
            seq[j] = (seq[j] + 1 + rng.integers(0, 3)) % 4
        if rng.random() < 0.5:
            seq = alphabet.revcomp(seq)
        reads[i] = seq
    np.save(gpath, genome)
    np.save(rpath, reads)
    return genome, reads


def build_e2e_workload(genome):
    """1M-read FASTQ (vectorized sampling) + its truth-free text file."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    fq = os.path.join(CACHE_DIR, "e2e_reads.fq")
    fq_small = os.path.join(CACHE_DIR, "e2e_warmup.fq")
    if os.path.exists(fq) and os.path.exists(fq_small):
        return fq, fq_small
    from columba_tpu.core import alphabet

    rng = np.random.default_rng(20260819)
    R, m = NUM_READS_E2E, READ_LEN
    starts = rng.integers(0, GENOME_N - m - 8, size=R)
    reads = genome[starts[:, None] + np.arange(m)[None, :]]
    errs = rng.random((R, m)) < ERR_RATE
    reads = np.where(errs, (reads + rng.integers(1, 4, (R, m))) % 4, reads)
    flip = rng.random(R) < 0.5
    reads[flip] = alphabet.revcomp(reads[flip], axis=-1)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    qual = "I" * m
    with open(fq, "w") as f:
        for i in range(R):
            f.write(f"@r{i}\n{lut[reads[i]].tobytes().decode()}\n+\n{qual}\n")
    with open(fq_small, "w") as f:
        for i in range(16384):
            f.write(f"@w{i}\n{lut[reads[i]].tobytes().decode()}\n+\n{qual}\n")
    return fq, fq_small


def measure_e2e(idx_dir: str, fq: str, fq_small: str) -> float:
    """End-to-end FASTQ -> SAM through the CLI (in-process): warmup run
    populates jit caches, the timed run covers parse + device matching +
    traceback + SAM write for the full 1M reads."""
    from columba_tpu import cli

    def run(path, out):
        t0 = time.time()
        rc = cli.main(["align", "-r", idx_dir, "-f", path, "-o", out,
                       "-a", "all", "-e", str(K), "-S", "kuch1",
                       "-b", "16384"])
        assert rc == 0
        return time.time() - t0

    run(fq_small, os.path.join(CACHE_DIR, "warmup.sam"))
    dt = run(fq, os.path.join(CACHE_DIR, "e2e_out.sam"))
    print(f"[bench] e2e: {NUM_READS_E2E} reads in {dt:.1f}s",
          file=sys.stderr)
    return NUM_READS_E2E / dt


def build_index_cached(genome):
    from columba_tpu.index.build import build_index_from_codes, load_index, save_index

    # sa_sparseness=1 (dense SA): locate is a single gather instead of an
    # LF-walk. 4B/char of HBM (~512MB here) is the TPU-first tradeoff; the
    # reference exposes the same knob (columba_build -s 1).
    idx_dir = os.path.join(CACHE_DIR, "idx_s1.cidx")
    if os.path.exists(os.path.join(idx_dir, "meta.json")):
        try:
            return load_index(idx_dir)
        except ValueError:
            pass
    arrays = build_index_from_codes(genome, sa_sparseness=1)
    save_index(arrays, idx_dir)
    return arrays


def measure_tpu(arrays, reads) -> float:
    import jax
    import jax.numpy as jnp

    from columba_tpu.index.fmindex import FMIndex
    from columba_tpu.search import pipeline
    from columba_tpu.search.scheme import get_scheme

    index = FMIndex.from_arrays(arrays)
    from columba_tpu.index.kmer import build_kmer_table, table_k

    # K=12 seed table (256MB HBM): junk lanes die ~2 steps after the seed
    # and the drain gate opens at depth 16-12-1=3, so the exact loop's
    # early exit fires ~3 steps sooner than with the reference's K=10.
    # Disk-cached: the on-device build costs ~30s of warmup otherwise.
    kcache = os.path.join(CACHE_DIR, "kmer12.npy")
    if os.path.exists(kcache):
        kmer_table = jax.device_put(np.load(kcache))
    else:
        kmer_table = build_kmer_table(index, 12)
        np.save(kcache, np.asarray(kmer_table))
    scheme = get_scheme("kuch1", K)
    sched = pipeline.compile_cached(scheme, READ_LEN, "edit",
                                kmer_k=table_k(kmer_table))
    tables = pipeline.device_tables(sched)
    capacity = 4 * BATCH  # 2*BATCH rows x 3 searches x ~2/3 exact-prefix survival
    # locate/verify capacities scale with the batch (sized from measured
    # per-8192-batch peaks x1.5 headroom; the bench checks for spill and
    # warns, so an undersized capacity cannot pass silently)
    max_locate = 4 * BATCH
    max_verify = (3 * BATCH) // 2
    switchpoint = 4       # in-text crossover (reference default)
    split_step, capacity2 = 2, max(1024, capacity // 16)
    # two-stage exact loop off: the exact while_loop's all-dead early exit
    # already ends the loop by mid-depth on this workload, so mid-loop
    # compaction only adds overhead (measured, tools/ab_exact.py)
    ex_split, ex_cap = 0, 0

    # Feed path: 2-bit-pack reads on host (4 codes/byte; the remote-TPU
    # tunnel is ~1.3 GB/s with a ~0.3 ms/put floor), stage the WHOLE packed
    # read set in HBM once (N x m/4 bytes, ~2.5 MB), then each step slices
    # its batch on device and unpacks + revcomps as the first fused op. A
    # production input pipeline double-buffers host->HBM copies the same
    # way; staging once keeps the measurement about the chip, not the
    # tunnel artifact of this environment.
    mq = (READ_LEN + 3) // 4

    def pack_host(b):                       # (N, m) codes -> (N, mq) uint8
        N = b.shape[0]
        p = np.zeros((N, mq), np.uint8)
        for j in range(4):
            col = b[:, j::4].astype(np.uint8)
            p[:, :col.shape[1]] |= col << (2 * j)
        return p

    def _step(idx, pk_all, off, kt, tbl):
        pk = jax.lax.dynamic_slice(pk_all, (off, 0), (BATCH, mq))
        sh = (2 * jnp.arange(4, dtype=jnp.uint8))[None, None, :]
        u = (pk[:, :, None] >> sh) & 3                 # (B, mq, 4)
        fwd = u.reshape(BATCH, 4 * mq)[:, :READ_LEN].astype(jnp.int32)
        rc = jnp.flip(3 - fwd, axis=-1)
        rows = jnp.concatenate([fwd, rc])
        return pipeline.match_device_core(
            idx, rows, sched, tbl, capacity, max_locate, K, kt,
            None, None, switchpoint, max_locate, split_step, capacity2,
            max_verify, ex_split=ex_split, ex_cap=ex_cap,
        )

    step = jax.jit(_step)
    nbatch = len(reads) // BATCH
    packed_dev = jax.device_put(pack_host(reads))      # (N, mq), one-time
    offs = [jnp.int32(i * BATCH) for i in range(nbatch)]

    # warmup / compile, and collect per-batch health counters once
    t0 = time.time()
    outs = []
    last = None
    for i in range(nbatch):
        last = step(index, packed_dev, offs[i], kmer_table, tables)
        outs.append((last["overflow"], last["total"], last["n_unique"]))
    int(last["total"])  # value fetch: the only real fence on axon
    print(f"[bench] warmup+compile {time.time() - t0:.1f}s", file=sys.stderr)

    # Timed loop: dispatch pipelined. block_until_ready returns EARLY on
    # the remote-TPU (axon) path — even for full output dicts — so the only
    # trustworthy fence is a host VALUE fetch. Accumulate a device-side
    # checksum that data-depends on every batch's output and fetch it with
    # int(): that cannot complete before every step has actually run. Size
    # the window adaptively to >= 2 s so dispatch jitter can't dominate.
    def run_epochs(epochs):
        t0 = time.time()
        tot = jnp.zeros((), jnp.int32)
        for _ in range(epochs):
            for i in range(nbatch):
                out = step(index, packed_dev, offs[i], kmer_table, tables)
                tot = tot + out["total"] + out["n_unique"]
        chk = int(tot)
        return time.time() - t0, chk

    dt1, chk1 = run_epochs(1)
    epochs = max(1, int(2.0 / max(dt1, 1e-3)) + 1)
    print(f"[bench] probe epoch {dt1 * 1e3:.1f}ms chk={chk1} -> "
          f"{epochs} epochs", file=sys.stderr)
    dt, _ = run_epochs(epochs)
    n_done = epochs * nbatch * BATCH
    overflow = sum(int(o) for o, _, _ in outs)
    total_cands = sum(int(t) for _, t, _ in outs)
    # locate spill: stage_expand truncates at max_locate, and n_unique is
    # computed over surviving rows only — an undersized max_locate would
    # otherwise ALSO suppress the verify_spill signal (pipeline.py flags the
    # same case as locate_truncated)
    locate_spill = sum(max(int(t) - max_locate, 0) for _, t, _ in outs)
    verify_spill = sum(max(int(u) - max_verify, 0) for _, _, u in outs)
    print(f"[bench] {n_done} reads, {total_cands} candidates, "
          f"overflow={overflow}, locate_spill={locate_spill}, "
          f"verify_spill={verify_spill}", file=sys.stderr)
    if overflow or locate_spill or verify_spill:
        print("[bench] WARNING: frontier overflow / locate spill / verify "
              "spill (capacity too small)", file=sys.stderr)
    return n_done / dt


def measure_reference_e2e(fq: str) -> float | None:
    """Single-thread reference Columba, complete run on the 1M-read e2e
    FASTQ (cached). Same genome/index as measure_reference."""
    cache = "/tmp/columba_ref_baseline_e2e.json"
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f).get("reads_per_sec")
    binary = "/tmp/colbuild/columba"
    wd = os.path.join(CACHE_DIR, "ref")
    if not (os.path.exists(binary)
            and os.path.exists(os.path.join(wd, "idx.meta"))):
        return None
    try:
        t0 = time.time()
        subprocess.run(
            [binary, "-r", os.path.join(wd, "idx"), "-f", fq,
             "-o", os.path.join(wd, "out_e2e.sam"), "-a", "all",
             "-e", str(K), "-t", "1", "-p", "uniform", "-S", "kuch1"],
            check=True, timeout=7200, capture_output=True,
        )
        rps = NUM_READS_E2E / (time.time() - t0)
        with open(cache, "w") as f:
            json.dump({"reads_per_sec": rps}, f)
        return rps
    except Exception:
        return None


def measure_reference(genome, reads) -> float | None:
    """Single-thread reference Columba on the same workload (cached)."""
    cache = "/tmp/columba_ref_baseline.json"
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f).get("reads_per_sec")
    binary = "/tmp/colbuild/columba"
    builder = "/tmp/colbuild/columba_build"
    if not (os.path.exists(binary) and os.path.exists(builder)):
        script = os.path.join(HERE, "tools", "build_reference.sh")
        if os.path.exists(script):
            try:
                subprocess.run(["bash", script], check=True, timeout=900,
                               capture_output=True)
            except Exception:
                return None
        if not os.path.exists(binary):
            return None
    try:
        from columba_tpu.core import alphabet

        wd = os.path.join(CACHE_DIR, "ref")
        os.makedirs(wd, exist_ok=True)
        fa = os.path.join(wd, "genome.fa")
        if not os.path.exists(fa):
            with open(fa, "w") as f:
                f.write(">chr1\n")
                seq = alphabet.decode(genome)
                for i in range(0, len(seq), 70):
                    f.write(seq[i:i + 70] + "\n")
        fq = os.path.join(wd, "reads.fq")
        if not os.path.exists(fq):
            with open(fq, "w") as f:
                for i, r in enumerate(reads):
                    f.write(f"@r{i}\n{alphabet.decode(r)}\n+\n{'I' * len(r)}\n")
        if not os.path.exists(os.path.join(wd, "idx.meta")):
            subprocess.run([builder, "-r", os.path.join(wd, "idx"), "-f", fa],
                           check=True, timeout=1800, capture_output=True)
        t0 = time.time()
        subprocess.run(
            [binary, "-r", os.path.join(wd, "idx"), "-f", fq,
             "-o", os.path.join(wd, "out.sam"), "-a", "all", "-e", str(K),
             "-t", "1", "-p", "uniform", "-S", "kuch1"],
            check=True, timeout=3600, capture_output=True,
        )
        rps = len(reads) / (time.time() - t0)
        with open(cache, "w") as f:
            json.dump({"reads_per_sec": rps}, f)
        return rps
    except Exception:
        return None


def main():
    from columba_tpu import compile_cache

    compile_cache.enable()
    genome, reads = build_workload()
    arrays = build_index_cached(genome)
    # device-stage rate (round-1 continuity metric), reported on stderr
    dev_rate = measure_tpu(arrays, reads)
    print(f"[bench] device-stage rate: {dev_rate:,.0f} reads/s",
          file=sys.stderr)
    # headline: END-TO-END FASTQ -> SAM through the CLI
    idx_dir = os.path.join(CACHE_DIR, "idx_s1.cidx")
    fq, fq_small = build_e2e_workload(genome)
    value = measure_e2e(idx_dir, fq, fq_small)
    measure_reference(genome, reads)  # ensures the reference index exists
    ref = measure_reference_e2e(fq)
    vs = (value / ref) if ref else None
    print(json.dumps({
        "metric": "e2e_reads_per_sec_per_chip_100bp_k2_edit_kuch1_all",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3) if vs else None,
    }))


if __name__ == "__main__":
    main()
