"""Batched locate on the b-move index: LF-walk to a run-boundary sample.

Every run head and tail carries its SA value (the reference's .smpf/.smpl
samples, src/bmove/bmove.cpp:45-189), so SA[row] = SA[LF^t(row)] + t for
the first t at which the walk lands on a run boundary — expected t is half
the average run length. The reference instead maintains a toehold through
every extension and enumerates ranges by phi-walking (bmove.cpp:503-547);
that is a sequential pointer chase per occurrence list, while per-row
LF-walks are uniform lanes a TPU batches for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from columba_tpu.index.bmove import (
    BMoveIndex, START, END, LF_POS, LF_RUN, SA_FIRST, SA_LAST,
)


def run_of_rows(index: BMoveIndex, rows: jax.Array) -> jax.Array:
    """Binary-search the fwd run interval containing each row."""
    R = index.r_fwd
    steps = max(1, (R + 1).bit_length())
    lo = jnp.zeros_like(rows)
    hi = jnp.full_like(rows, R - 1)
    for _ in range(steps):
        mid = (lo + hi + 1) >> 1
        go = index.fused[mid, START] <= rows
        lo = jnp.where(go, mid, lo)
        hi = jnp.where(go, hi, mid - 1)
    return lo


def locate_rows(index: BMoveIndex, rows: jax.Array) -> jax.Array:
    """Text position for each fwd-BWT row (batched LF-walks)."""
    runs = run_of_rows(index, rows)

    def at_boundary(pos, run):
        row = index.fused[run]
        head = pos == row[..., START]
        tail = pos == row[..., END] - 1
        val = jnp.where(head, row[..., SA_FIRST], row[..., SA_LAST])
        return head | tail, val

    def cond(c):
        pos, run, steps, done, val = c
        return jnp.any(~done)

    def body(c):
        pos, run, steps, done, val = c
        row = index.fused[run]
        new_pos = row[..., LF_POS] + (pos - row[..., START])
        new_run = row[..., LF_RUN]
        # fast-forward (bounded by interval overlap)
        def ffc(cc):
            r, _ = cc
            return jnp.any(index.fused[r, END] <= jnp.where(done, 0, new_pos))

        def ffb(cc):
            r, it = cc
            adv = index.fused[r, END] <= jnp.where(done, 0, new_pos)
            return jnp.where(adv, r + 1, r), it + 1

        new_run, _ = jax.lax.while_loop(
            ffc, ffb, (jnp.where(done, 0, new_run), jnp.zeros((), jnp.int32)))
        pos = jnp.where(done, pos, new_pos)
        run = jnp.where(done, run, new_run)
        steps = jnp.where(done, steps, steps + 1)
        bnd, v = at_boundary(pos, run)
        nd = done | bnd
        val = jnp.where(done, val, jnp.where(bnd, v + steps, val))
        return pos, run, steps, nd, val

    bnd0, v0 = at_boundary(rows, runs)
    init = (rows, runs, jnp.zeros_like(rows), bnd0, jnp.where(bnd0, v0, 0))
    _, _, _, _, val = jax.lax.while_loop(cond, body, init)
    n = index.n_arr[0]
    # row for suffix '$' (pos n) maps to n; clamp like the FM path
    return jnp.minimum(val, n)
