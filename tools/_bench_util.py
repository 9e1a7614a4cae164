"""Shared timing helpers for the TPU tools.

`jax.block_until_ready` returns EARLY on the remote-TPU (axon) path —
even on full output pytrees — so the only trustworthy fence is a host
VALUE fetch that data-depends on every dispatched computation. These
helpers accumulate a scalar probe per call and fetch once at the end.
"""

from __future__ import annotations

import time


def probe(out):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return jnp.ravel(leaf)[0].astype(jnp.float32)


def timed(fn, *args, iters=6):
    """Mean seconds per call of fn(*args) (first call = warmup/compile)."""
    import jax.numpy as jnp

    float(probe(fn(*args)))
    tot = jnp.zeros((), jnp.float32)
    t0 = time.time()
    for _ in range(iters):
        tot = tot + probe(fn(*args))
    float(tot)
    return (time.time() - t0) / iters


def timed_batches(fn, args_list, iters=4):
    """Mean seconds per call of fn over a list of argument tuples."""
    import jax.numpy as jnp

    float(probe(fn(*args_list[0])))
    tot = jnp.zeros((), jnp.float32)
    t0 = time.time()
    for _ in range(iters):
        for a in args_list:
            tot = tot + probe(fn(*a))
    float(tot)
    return (time.time() - t0) / (iters * len(args_list))
