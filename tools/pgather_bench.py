"""Measure ops/pgather (Pallas DMA ring gather) vs XLA `table[idx]` at the
REAL hot-path shapes (VERDICT round-1 weak #5 / next #9): occ_all's fused
row gather — 64 B rows from a bench-scale table — at the executor's actual
lane counts, with chained dependencies so latency can't hide behind
batching that the real pipeline doesn't have.

Run on the real TPU:  python tools/pgather_bench.py
Appends one JSON line per (impl, lanes) to stdout; the PERF.md gather
section cites this experiment.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ROWS = 2_000_000       # bench-scale: 128 Mbp / 128 chars/block x 2 tables
C = 16                 # 64 B fused occ rows
CHAIN = 32             # chained gathers per timed step (LF-style)


def bench_one(impl: str, lanes: int, table, gather_fn) -> float:
    rng = np.random.default_rng(5)
    idx0 = jnp.asarray(rng.integers(0, ROWS, size=lanes, dtype=np.int32))

    @jax.jit
    def step(idx):
        def body(i, carry):
            idx, acc = carry
            rows = gather_fn(table, idx)
            acc = acc + rows[:, 0]
            # next indices depend on fetched data (chained, like LF)
            idx = (rows[:, 1] ^ rows[:, 2]).astype(jnp.uint32) % ROWS
            return idx, acc
        idx, acc = jax.lax.fori_loop(
            0, CHAIN, body, (idx, jnp.zeros(lanes, jnp.uint32)))
        return acc.sum()

    # warmup + fence with a VALUE fetch (axon: block_until_ready lies)
    int(step(idx0))
    t0 = time.time()
    reps = 0
    while time.time() - t0 < 2.0:
        chk = int(step(idx0))
        reps += 1
    dt = time.time() - t0
    rate = reps * CHAIN * lanes / dt
    print(json.dumps(dict(impl=impl, lanes=lanes,
                          mrows_per_s=round(rate / 1e6, 2),
                          gbps=round(rate * C * 4 / 1e9, 2), chk=chk)))
    return rate


def main():
    rng = np.random.default_rng(3)
    table = jnp.asarray(
        rng.integers(0, 2**31, size=(ROWS, C)).astype(np.uint32))

    def xla_gather(t, i):
        return t[i.astype(jnp.int32)]

    from columba_tpu.ops import pgather

    def pallas_gather(t, i):
        return pgather.gather_rows(t, i.astype(jnp.int32))

    for lanes in (8192, 49152, 262144):
        bench_one("xla", lanes, table, xla_gather)
    for lanes in (8192, 49152, 262144):
        try:
            bench_one("pallas_dma", lanes, table, pallas_gather)
        except Exception as e:
            print(json.dumps(dict(impl="pallas_dma", lanes=lanes,
                                  error=str(e)[:300])))


if __name__ == "__main__":
    main()
