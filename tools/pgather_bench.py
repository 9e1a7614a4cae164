"""Measure a Pallas DMA-ring gather vs XLA `table[idx]` at the REAL
hot-path shapes (VERDICT round-1 weak #5 / next #9): occ_all's fused row
gather — 64 B rows from a bench-scale table — at the executor's actual
lane counts, with chained dependencies so latency can't hide behind
batching the real pipeline doesn't have.

MEASURED RESULT (TPU v5e, 2026-08-19; docs/PERF.md cites this run): the
DMA ring LOSES to XLA's gather at every lane count —

    lanes    xla M rows/s    pallas_dma M rows/s
    8192         8.1                5.8
    49152       26.2               17.4
    262144      41.8               (Mosaic compile failure at this grid)

— while moving 8x the HBM bytes (Mosaic rejects partial-lane slices, so
each 64 B row costs an aligned 512 B group copy; see kernel docstring).
The library therefore ships NO Pallas gather (columba_tpu/ops/pgather.py
was deleted); rank.occ_all keeps the plain XLA row gather. The kernel
lives here so the experiment stays reproducible.

Run on the real TPU:  python tools/pgather_bench.py
Appends one JSON line per (impl, lanes) to stdout.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 2_000_000       # bench-scale: 128 Mbp / 128 chars/block x 2 tables
C = 16                 # 64 B fused occ rows
CHAIN = 32             # chained gathers per timed step (LF-style)
NSEM = 32              # in-flight DMA ring depth


# ---------------------------------------------------------------- kernel
# Mosaic constraint (measured): any ref with a minor dim of 16 is padded
# to 128 lanes and partial-lane slices are rejected ("Slice shape along
# dimension 1 must be aligned to tiling (128)"), so a per-row (1, 16) DMA
# cannot be expressed. The kernel therefore:
#   1. views the (T, 16) table as (T/8, 128): each DMA moves the aligned
#      8-row GROUP containing the wanted row (512 B, lane-aligned) into a
#      per-lane VMEM scratch slot, NSEM-deep semaphore ring;
#   2. after the chunk's DMAs land, selects each wanted 16-u32 sub-row
#      with vectorized static lane slices (8 variants x where-select).
def _gather_kernel(idx_ref, lo3_ref, table_ref, out_ref, scratch, sem):
    chunk = out_ref.shape[0]
    base = pl.program_id(0) * chunk

    def dma(i):
        g = idx_ref[base + i] >> 3            # aligned 8-row group
        return pltpu.make_async_copy(
            table_ref.at[g], scratch.at[i], sem.at[jnp.remainder(i, NSEM)])

    for i in range(NSEM):                     # warm the ring
        dma(i).start()

    def body(i, _):
        dma(i).wait()

        @pl.when(i + NSEM < chunk)
        def _():
            dma(i + NSEM).start()

        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    v = scratch[...]                          # (chunk, 128)
    sel = lo3_ref[...]                        # (chunk, 1) int32 in [0, 8)
    out = v[:, 0:16]
    for s in range(1, 8):
        out = jnp.where(sel == s, v[:, 16 * s:16 * (s + 1)], out)
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=("chunk",))
def gather_rows(table: jax.Array, idx: jax.Array,
                chunk: int = 2048) -> jax.Array:
    """table (T, 16) -> (N, 16) rows at idx ((N,) int32, clipped)."""
    N = idx.shape[0]
    T, Cw = table.shape
    tpad = -T % 8
    if tpad:
        table = jnp.pad(table, ((0, tpad), (0, 0)))
    table8 = table.reshape(-1, 8 * Cw)
    npad = -N % chunk
    idxp = jnp.clip(
        jnp.pad(idx, (0, npad)) if npad else idx, 0, T - 1
    ).astype(jnp.int32)
    lo3 = (idxp & 7)[:, None]
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=((N + npad) // chunk,),
            in_specs=[
                pl.BlockSpec((chunk, 1), lambda g, idx_ref: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (chunk, Cw), lambda g, idx_ref: (g, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((chunk, 8 * Cw), table.dtype),
                            pltpu.SemaphoreType.DMA((NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct((N + npad, Cw), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idxp, lo3, table8)
    return out[:N]


# ------------------------------------------------------------- measurement
def bench_one(impl: str, lanes: int, table, gather_fn) -> float:
    rng = np.random.default_rng(5)
    idx0 = jnp.asarray(rng.integers(0, ROWS, size=lanes, dtype=np.uint32))

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

    for lanes in (8192, 49152, 262144):
        bench_one("xla", lanes, table, xla_gather)
    for lanes in (8192, 49152, 262144):
        try:
            bench_one("pallas_dma", lanes, table, gather_rows)
        except Exception as e:
            print(json.dumps(dict(impl="pallas_dma", lanes=lanes,
                                  error=str(e)[:300])))


if __name__ == "__main__":
    main()
