"""RLC (b-move) backend throughput at bench scale on the real TPU.

Same workload/config as bench.py but on the run-length-compressed index
(no in-text crossover: the RLC index stores no text, matching the
reference b-move's getSwitchPoint()==0). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

CACHE = "/tmp/columba_tpu_bench/bmove.cidx"


def main():
    import jax
    import jax.numpy as jnp

    from columba_tpu.index.bmove import (
        BMoveIndex, build_bmove_from_codes, load_bmove, save_bmove)
    from columba_tpu.search import pipeline
    from columba_tpu.search.scheme import get_scheme

    genome, reads = bench.build_workload()
    if os.path.exists(os.path.join(CACHE, "meta.json")):
        arrays = load_bmove(CACHE)
    else:
        t0 = time.time()
        arrays = build_bmove_from_codes(genome)
        print(f"[rlc] build {time.time()-t0:.0f}s", file=sys.stderr)
        save_bmove(arrays, CACHE)
    index = BMoveIndex.from_arrays(arrays)

    B = bench.BATCH
    m = bench.READ_LEN
    sched = pipeline.compile_cached(get_scheme("kuch1", bench.K), m, "edit")
    tables = pipeline.device_tables(sched)
    capacity = 6 * B
    max_locate = 1 << 15
    max_verify = 12288

    def _step(idx, rows, tbl):
        # no crossover (no text), but errorful lanes still die in the band
        # phase: shrink the frontier after 2 band steps
        return pipeline.match_device_core(
            idx, rows, sched, tbl, capacity, max_locate, bench.K,
            split_step=2, capacity2=2 * B, max_verify=max_verify)

    step = jax.jit(_step)
    nbatch = len(reads) // B

    def rows_of(i):
        b = reads[i * B:(i + 1) * B].astype(np.int32)
        return jnp.asarray(np.concatenate([b, 3 - b[:, ::-1]]))

    dev_rows = [rows_of(i) for i in range(nbatch)]
    t0 = time.time()
    out = step(index, dev_rows[0], tables)
    int(out["total"])
    print(f"[rlc] warmup+compile {time.time()-t0:.1f}s", file=sys.stderr)

    def run_epochs(epochs):
        t0 = time.time()
        tot = jnp.zeros((), jnp.int32)
        for _ in range(epochs):
            for i in range(nbatch):
                o = step(index, dev_rows[i], tables)
                tot = tot + o["total"] + o["n_unique"]
        chk = int(tot)
        return time.time() - t0, chk

    dt1, chk = run_epochs(1)
    epochs = max(1, int(2.0 / max(dt1, 1e-3)) + 1)
    print(f"[rlc] probe {dt1*1e3:.0f}ms chk={chk} -> {epochs} epochs",
          file=sys.stderr)
    dt, _ = run_epochs(epochs)
    rps = epochs * nbatch * B / dt
    print(json.dumps({
        "metric": "rlc_reads_per_sec_per_chip_100bp_k2_edit_kuch1_all",
        "value": round(rps, 1), "unit": "reads/s"}))


if __name__ == "__main__":
    main()
