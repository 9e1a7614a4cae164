"""Batched rank/occ over 2-bit packed BWT words.

The TPU-native replacement for the reference's interleaved rank9 bitvector
query (reference: src/bitvec.h:356-372 ``BitvecIntl::rank``): a checkpoint
row gather + in-block popcount reduction, vectorized over a frontier of
positions, returning occ for *all four* characters at once (one gather serves
all 4 children of a frontier node).

Layout: BLOCK=128 chars per checkpoint, 8 uint32 words per block.
The '$' row is packed as code 0 (A); callers adjust via `dollar`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BLOCK = 128
WPB = 8  # words per block

# Python int literals, NOT a device array: a closure-captured jnp array
# indexed in-trace becomes an XLA constant operand, and ANY fusion that
# touches one falls off the fast-codegen path (~40x, measured on v5e).
_PAT = (0x00000000, 0x55555555, 0xAAAAAAAA, 0xFFFFFFFF)


def occ_all(fused: jax.Array, pos: jax.Array) -> jax.Array:
    """occ(c, pos) for c in A,C,G,T.

    fused: (blocks, 16) uint32 interleaved rows [4 ckpt | 8 packed words |
    4 pad] (see index.fmindex) — ONE 64B row gather serves the whole query;
    pos: (...,) int32 positions in [0, rows].
    Returns (..., 4) int32 counts of each code in words[0:pos) — counting the
    '$' slot as code 0 (callers subtract the dollar adjustment).
    """
    pos = pos.astype(jnp.int32)
    blk = pos >> 7
    row = fused[blk]  # (..., 16) uint32
    base = row[..., :4].astype(jnp.int32)
    wvals = row[..., 4:12]

    # chars of word w that lie before pos: r = clamp(pos - blk*128 - 16*w, 0, 16)
    r = pos[..., None] - (blk[..., None] << 7) - 16 * jnp.arange(WPB, dtype=jnp.int32)
    r = jnp.clip(r, 0, 16)
    # mask of 2r low bits (r==16 -> all ones)
    shift = jnp.minimum(2 * r, 31).astype(jnp.uint32)
    mask = jnp.where(
        r >= 16,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << shift) - jnp.uint32(1),
    )

    # count code c among masked 2-bit slots: both bits equal to pattern
    out = []
    for c in range(4):
        x = wvals ^ jnp.uint32(_PAT[c])
        hits = (~x) & ((~x) >> 1) & jnp.uint32(0x55555555) & mask
        out.append(jnp.sum(jax.lax.population_count(hits), axis=-1).astype(jnp.int32))
    return base + jnp.stack(out, axis=-1)


def occ_all_and_char(fused: jax.Array, pos: jax.Array):
    """occ_all(pos) plus the 2-bit code AT pos, from one block-row fetch."""
    pos = pos.astype(jnp.int32)
    blk = pos >> 7
    row = fused[blk]
    base = row[..., :4].astype(jnp.int32)
    wvals = row[..., 4:12]
    r = pos[..., None] - (blk[..., None] << 7) - 16 * jnp.arange(WPB, dtype=jnp.int32)
    rc = jnp.clip(r, 0, 16)
    shift = jnp.minimum(2 * rc, 31).astype(jnp.uint32)
    mask = jnp.where(
        rc >= 16, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << shift) - jnp.uint32(1)
    )
    out = []
    for c in range(4):
        x = wvals ^ jnp.uint32(_PAT[c])
        hits = (~x) & ((~x) >> 1) & jnp.uint32(0x55555555) & mask
        out.append(jnp.sum(jax.lax.population_count(hits), axis=-1).astype(jnp.int32))
    # decode char at pos: word index (pos>>4)&7, slot pos&15 (unrolled
    # selects — per-lane fancy indexing is slow on TPU)
    widx = (pos >> 4) & 7
    w = wvals[..., 0]
    for i in range(1, WPB):
        w = jnp.where(widx == i, wvals[..., i], w)
    char = ((w >> (2 * (pos.astype(jnp.uint32) & 15))) & 3).astype(jnp.int32)
    return base + jnp.stack(out, axis=-1), char


def cnt_dollar(dollar_row: jax.Array, pos: jax.Array) -> jax.Array:
    """Number of '$' in bwt[0:pos) (0 or 1)."""
    return (dollar_row < pos).astype(jnp.int32)


def occ_adjusted(words, ckpt, dollar_row, pos):
    """(occ for A,C,G,T with '$' slot removed, count of '$'), batched."""
    raw = occ_all(words, ckpt, pos)
    d = cnt_dollar(dollar_row, pos)
    raw = raw.at[..., 0].add(-d)
    return raw, d


def rank_bits(bits: jax.Array, bits_rank: jax.Array, pos: jax.Array) -> jax.Array:
    """rank1 over a packed marker bitvector (32 bits/word, 128/block)."""
    pos = pos.astype(jnp.int32)
    blk = pos >> 7
    base = bits_rank[blk]
    wvals = bits.reshape(-1, 4)[blk]  # one 16B row per lane
    r = jnp.clip(pos[..., None] - (blk[..., None] << 7) - 32 * jnp.arange(4, dtype=jnp.int32), 0, 32)
    shift = jnp.minimum(r, 31).astype(jnp.uint32)
    mask = jnp.where(
        r >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << shift) - jnp.uint32(1)
    )
    cnt = jnp.sum(jax.lax.population_count(wvals & mask), axis=-1).astype(jnp.int32)
    return base + cnt


def get_bit(bits: jax.Array, pos: jax.Array) -> jax.Array:
    w = bits[pos >> 5]
    return ((w >> (pos.astype(jnp.uint32) & 31)) & 1).astype(jnp.bool_)


def gather_codes(words: jax.Array, pos: jax.Array) -> jax.Array:
    """Gather single 2-bit codes at positions (no bounds check)."""
    w = words[pos >> 4]
    return ((w >> (2 * (pos.astype(jnp.uint32) & 15))) & 3).astype(jnp.int32)
