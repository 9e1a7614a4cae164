"""Lockstep frontier executor for search schemes.

TPU-native replacement of the reference's recursive DFS engine
(reference: src/indexinterface.cpp:377-527 ``recApproxMatchEdit``,
:1211-1304 ``recApproxMatchHamming``): a fixed-capacity frontier of
SA-interval nodes advances one text character per lockstep step, driven by
the static tables of search/schedule.py.

Per step, vectorized over all lanes:
  1. bidirectional extension of every node by all 4 characters
     (ops/extend.py — two occ gathers per node serve all 4 children);
  2. banded-DP row update of the active side's band (min-plus over the
     band, unrolled — the role of the reference's bit-parallel
     ``computeRow``, src/bitparallelmatrix.h:352-415);
  3. colMin accumulation (exact per-extent column minima — replaces the
     reference's cluster machinery);
  4. pruning by the scheme's U bound + empty-range cull;
  5. compaction into the fixed-capacity frontier via cumsum + scatter-drop.

The whole loop is one lax.scan -> a single XLA program; no host syncs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from columba_tpu.index.fmindex import FMIndex
from columba_tpu.ops import extend
from columba_tpu.search.schedule import INF, Schedule


@dataclass(frozen=True)
class FrontierResult:
    """Final frontier after a scheme run (candidate hits where done)."""

    ranges: jax.Array     # (C, 4) SA range pairs
    rid: jax.Array        # (C,) read row
    sid: jax.Array        # (C,) search id
    ed_lb: jax.Array      # (C,) colMin_back + colMin_fwd (exact-extent ED lower bound)
    done: jax.Array       # (C,) bool: completed candidate
    overflow: jax.Array   # () int32: lanes dropped by capacity (0 => lossless)
    nodes_visited: jax.Array  # () int32 total extensions (Counters analogue)


jax.tree_util.register_dataclass(
    FrontierResult,
    data_fields=["ranges", "rid", "sid", "ed_lb", "done", "overflow", "nodes_visited"],
    meta_fields=[],
)


def _dev_tables(sched: Schedule) -> dict:
    """Schedule tables as device arrays, stacked for lax.scan over steps."""
    return dict(
        active=jnp.asarray(sched.active.T),          # (T, S)
        side=jnp.asarray(sched.side.T),              # (T, S)
        ub=jnp.asarray(sched.ub.T),                  # (T, S)
        colo=jnp.asarray(sched.colo.T),              # (T, S)
        creset=jnp.asarray(sched.creset.T),          # (T, S)
        posw=jnp.asarray(np.swapaxes(sched.posw, 0, 1)),    # (T, S, BW)
        mvalid=jnp.asarray(np.swapaxes(sched.mvalid, 0, 1)),
        cvalid=jnp.asarray(np.swapaxes(sched.cvalid, 0, 1)),
        ex_pos=jnp.asarray(sched.ex_pos.T),          # (E, S)
        ex_dir=jnp.asarray(sched.ex_dir.T),          # (E, S)
        u_last=jnp.asarray(sched.u_last),            # (S,)
        colmin_init=jnp.asarray(sched.colmin_init),  # (S, 2)
    )


def _band_row_update(prev, pchars, mval, cval, bw):
    """One banded-DP row for all 4 extension chars.

    prev: (C, BW) previous row; pchars: (C, BW) pattern codes for the diag
    transition of each cell; mval/cval: (C, BW) validity masks.
    Returns (C, 4, BW) new rows (char-major).
    """
    up = jnp.concatenate(
        [prev[:, 1:], jnp.full((prev.shape[0], 1), INF, dtype=prev.dtype)], axis=1
    )
    rows = []
    for c in range(4):
        mis = jnp.where(mval & (pchars == c), 0, jnp.where(mval, 1, INF))
        nl = jnp.minimum(prev + mis, up + 1)
        # left-to-right deletion scan: D[o] = min(D[o-1] + 1, nl[o])
        d = nl[:, 0:1]
        cols = [d]
        for o in range(1, bw):
            d = jnp.minimum(nl[:, o:o + 1], d + 1)
            cols.append(d)
        row = jnp.concatenate(cols, axis=1) if bw > 1 else nl
        rows.append(jnp.where(cval, row, INF))
    return jnp.stack(rows, axis=1)


def run_scheme(
    index: FMIndex,
    reads: jax.Array,
    sched: Schedule,
    capacity: int,
    kmer_table: jax.Array | None = None,
) -> FrontierResult:
    """Execute one compiled scheme over a read batch.

    reads: (R, m) int32 codes (strands are separate rows).
    capacity: frontier size C (must be >= R * num_searches).
    kmer_table: optional (4^K, 4) seed table (index.kmer) matching the
    schedule's kmer_k; seeds the exact-prefix ranges with one gather.
    """
    R, m = reads.shape
    S = sched.num_searches
    C = int(capacity)
    assert C >= R * S, f"capacity {C} < initial nodes {R * S}"
    bw = sched.bw
    tables = _dev_tables(sched)

    # ---------------- exact prefix ----------------
    rid0, sid0 = jnp.meshgrid(
        jnp.arange(R, dtype=jnp.int32), jnp.arange(S, dtype=jnp.int32),
        indexing="ij",
    )
    rid0, sid0 = rid0.reshape(-1), sid0.reshape(-1)
    if sched.kmer_k > 0 and kmer_table is not None:
        from columba_tpu.index import kmer as kmer_mod

        kstart = jnp.asarray(sched.kmer_start)[sid0]          # (R*S,)
        offs = jnp.arange(sched.kmer_k, dtype=jnp.int32)
        wpos = jnp.clip(kstart[:, None], 0, m - sched.kmer_k) + offs
        wchars = reads[rid0[:, None], wpos]
        seeded = kmer_mod.lookup(kmer_table, wchars)          # (R*S, 4)
        ranges0 = jnp.where(
            (kstart >= 0)[:, None], seeded, index.full_range((R * S,))
        )
    else:
        assert sched.kmer_k == 0, "schedule compiled with kmer seeding but no table given"
        ranges0 = index.full_range((R * S,))

    def exact_step(rs, tab):
        ex_pos, ex_dir = tab  # (S,), (S,)
        pos = ex_pos[sid0]
        act = pos >= 0
        chars = reads[rid0, jnp.clip(pos, 0, m - 1)].astype(jnp.int32)
        new = extend.extend_char(index, rs, chars, ex_dir[sid0])
        return jnp.where(act[:, None], new, rs), None

    if sched.e_max > 0:
        ranges0, _ = jax.lax.scan(
            exact_step, ranges0, (tables["ex_pos"], tables["ex_dir"])
        )

    # ---------------- frontier init ----------------
    def pad(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((C - x.shape[0], *x.shape[1:]), fill, x.dtype)]
        )

    alive0 = ranges0[:, 1] > ranges0[:, 0]
    band_init = jnp.asarray(sched.band_init)[sid0]  # (R*S, 2, BW)
    state = dict(
        ranges=pad(ranges0),
        rid=pad(rid0),
        sid=pad(sid0),
        band=pad(band_init, INF),
        colmin=pad(tables["colmin_init"][sid0], INF),
        alive=pad(alive0, False),
    )
    overflow0 = jnp.zeros((), jnp.int32)
    visits0 = jnp.zeros((), jnp.int32)

    # ---------------- lockstep band steps ----------------
    def step(carry, tab):
        st, overflow, visits = carry
        sid = st["sid"]
        alive = st["alive"]
        act = tab["active"][sid] & alive          # (C,)
        sd = tab["side"][sid]                     # (C,)
        visits = visits + jnp.sum(act.astype(jnp.int32)) * 4

        # 1) extension (all 4 chars); inactive lanes query position 0
        rng = jnp.where(act[:, None], st["ranges"], 0)
        children = extend.extend_all(index, rng, sd)          # (C, 4ch, 4)

        # 2) band row update on the active side
        lane = jnp.arange(C)
        prev = st["band"][lane, sd]                           # (C, BW)
        pchars = reads[st["rid"][:, None], tab["posw"][sid]]  # (C, BW)
        newD = _band_row_update(
            prev, pchars.astype(jnp.int32), tab["mvalid"][sid],
            tab["cvalid"][sid], bw
        )                                                     # (C, 4ch, BW)

        # 3) colMin
        o = tab["colo"][sid]                                  # (C,)
        cm_sd = st["colmin"][lane, sd]
        cm_other = st["colmin"][lane, 1 - sd]
        cm_base = jnp.where(tab["creset"][sid], INF, cm_sd)
        acc = newD[lane[:, None], jnp.arange(4)[None, :], jnp.clip(o, 0, bw - 1)[:, None]]
        new_cm_sd = jnp.where(
            (o >= 0)[:, None], jnp.minimum(cm_base[:, None], acc), cm_sd[:, None]
        )                                                     # (C, 4ch)

        # 4) prune. colMin participates in the bound only inside its
        # accumulation window (where it is fresh for the current extent);
        # elsewhere it is stale from a previous extent and min-ing it in
        # would disable rowMin pruning entirely. Outside the window the
        # rowMin bound alone is lossless: any covered occurrence's alignment
        # path keeps a band cell <= U_phase until its completion rows, and
        # completion rows are exactly the window rows where colMin takes
        # over (deficit/surplus completions).
        width = children[..., 1] - children[..., 0]           # (C, 4ch)
        rowmin = jnp.min(newD, axis=-1)                       # (C, 4ch)
        col_contrib = jnp.where((o >= 0)[:, None], new_cm_sd, INF)
        bound = jnp.minimum(rowmin, col_contrib) + cm_other[:, None]
        child_alive = act[:, None] & (width > 0) & (bound <= tab["ub"][sid][:, None])

        # 5) expand: child slot 0 of inactive lanes passes the parent through
        def sel(child_val, parent_val):
            keep = act.reshape((C, 1) + (1,) * (child_val.ndim - 2))
            par = jnp.broadcast_to(
                parent_val[:, None], (C, 4) + parent_val.shape[1:]
            )
            return jnp.where(keep, child_val, par)

        ch_ranges = sel(children, st["ranges"])               # (C,4,4)
        new_band = st["band"][:, None, :, :].repeat(4, axis=1)  # (C,4,2,BW)
        new_band = new_band.at[lane[:, None], jnp.arange(4)[None, :], sd[:, None]].set(newD)
        ch_band = sel(new_band, st["band"])
        new_colmin = st["colmin"][:, None, :].repeat(4, axis=1)
        new_colmin = new_colmin.at[lane[:, None], jnp.arange(4)[None, :], sd[:, None]].set(new_cm_sd)
        ch_colmin = sel(new_colmin, st["colmin"])
        ch_alive = jnp.where(
            act[:, None],
            child_alive,
            jnp.concatenate([alive[:, None], jnp.zeros((C, 3), bool)], axis=1),
        )

        # 6) compact 4C -> C (cumsum + scatter-drop)
        flat_alive = ch_alive.reshape(-1)
        pos = jnp.cumsum(flat_alive.astype(jnp.int32)) - 1
        dest = jnp.where(flat_alive, pos, C)  # dead or overflow -> dropped
        dest = jnp.where(pos >= C, C, dest)
        n_alive = pos[-1] + 1
        overflow = overflow + jnp.maximum(n_alive - C, 0)

        def scatter(val, fill):
            flat = val.reshape(4 * C, *val.shape[2:])
            out = jnp.full((C + 1, *flat.shape[1:]), fill, flat.dtype)
            return out.at[dest].set(flat, mode="drop")[:C]

        rep = lambda v: jnp.broadcast_to(v[:, None], (C, 4)).reshape(-1)
        new_state = dict(
            ranges=scatter(ch_ranges, 0),
            rid=jnp.full((C + 1,), 0, jnp.int32).at[dest].set(rep(st["rid"]), mode="drop")[:C],
            sid=jnp.full((C + 1,), 0, jnp.int32).at[dest].set(rep(st["sid"]), mode="drop")[:C],
            band=scatter(ch_band, INF),
            colmin=scatter(ch_colmin, INF),
            alive=jnp.zeros((C + 1,), bool).at[dest].set(flat_alive, mode="drop")[:C],
        )
        return (new_state, overflow, visits), None

    if sched.t_max > 0:
        (state, overflow0, visits0), _ = jax.lax.scan(
            step, (state, overflow0, visits0),
            {k: tables[k] for k in
             ("active", "side", "ub", "colo", "creset", "posw", "mvalid", "cvalid")},
        )

    ed_lb = state["colmin"][:, 0] + state["colmin"][:, 1]
    done = state["alive"] & (ed_lb <= tables["u_last"][state["sid"]])
    return FrontierResult(
        ranges=state["ranges"],
        rid=state["rid"],
        sid=state["sid"],
        ed_lb=ed_lb,
        done=done,
        overflow=overflow0,
        nodes_visited=visits0,
    )
