"""Multi-chip data parallelism: sharded match equals single-device match."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from columba_tpu.core import alphabet
from columba_tpu.index.fmindex import FMIndex
from columba_tpu.search import pipeline
from columba_tpu.search.scheme import get_scheme

from tests.conftest import sample_reads


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_match_equals_single(small_index, rng):
    from columba_tpu.dist import mesh as dmesh

    genome, arrays = small_index
    index = FMIndex.from_arrays(arrays)
    m, k = 60, 2
    reads = sample_reads(rng, genome, num=16, length=m, max_err=k)
    rc = alphabet.revcomp(reads, axis=-1)
    batch = jnp.asarray(np.concatenate([reads, rc]).astype(np.int32))

    scheme = get_scheme("kuch1", k)
    sched = pipeline.compile_cached(scheme, m, "edit")
    mesh = dmesh.make_data_mesh(8)
    out_sh = dmesh.sharded_match(
        mesh, index, batch, sched,
        capacity_per_shard=1024, max_locate_per_shard=512, kb=k,
    )
    out_sh = {kk: np.asarray(v) for kk, v in out_sh.items()}

    out_1 = pipeline.match_device_core(
        index, batch, sched, pipeline.device_tables(sched),
        8 * 1024, 8 * 512, k,
    )
    out_1 = {kk: np.asarray(v) for kk, v in out_1.items()}

    assert int(out_sh["overflow"]) == 0
    assert int(out_sh["total"]) == int(out_1["total"])

    def occ_set(out):
        v = out["valid"]
        return set(zip(out["rid"][v].tolist(), out["win_start"][v].tolist()))

    assert occ_set(out_sh) == occ_set(out_1)
