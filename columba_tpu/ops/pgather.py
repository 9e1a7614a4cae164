"""Pallas DMA-pipelined random row gather from HBM.

XLA's gather HLO moves random 48-64B occ rows at ~1 GB/s on TPU (measured
in tools/microbench.py) — far under the DMA engines' capability. This
kernel keeps a ring of outstanding async copies per grid step so row
fetches overlap instead of serializing: indices arrive via scalar prefetch
(SMEM), each row is DMA'd HBM -> VMEM output block directly, and a
semaphore ring of depth NSEM bounds in-flight copies.

Used by the hot gather paths (ops/rank.occ_all row fetch) when the table
is large enough for the XLA gather to fall off a cliff; falls back to
`table[idx]` on CPU (tests run with interpret=False on TPU only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSEM = 32  # in-flight DMA ring depth


def _gather_kernel(idx_ref, table_ref, out_ref, sem):
    chunk = out_ref.shape[0]
    base = pl.program_id(0) * chunk

    def dma(i):
        r = idx_ref[base + i]
        return pltpu.make_async_copy(
            table_ref.at[r], out_ref.at[i], sem.at[jnp.remainder(i, NSEM)])

    # warm the ring, then steady-state: wait slot i, reissue i+NSEM
    for i in range(NSEM):
        dma(i).start()

    def body(i, _):
        dma(i).wait()

        @pl.when(i + NSEM < chunk)
        def _():
            dma(i + NSEM).start()

        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def gather_rows(table: jax.Array, idx: jax.Array, chunk: int = 2048,
                interpret: bool = False) -> jax.Array:
    """table (T, C) -> (N, C) rows at idx ((N,) int32, clipped to range).

    N is padded up to a multiple of `chunk`; C should keep rows 32B-aligned
    (C=8/16 uint32) for clean DMA.
    """
    N = idx.shape[0]
    C = table.shape[1]
    npad = -N % chunk
    idxp = jnp.clip(
        jnp.pad(idx, (0, npad)) if npad else idx, 0, table.shape[0] - 1
    ).astype(jnp.int32)
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=((N + npad) // chunk,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (chunk, C), lambda g, idx_ref: (g, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct((N + npad, C), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idxp, table)
    return out[:N]
