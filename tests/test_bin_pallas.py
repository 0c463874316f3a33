"""Fused Pallas binning kernel vs the XLA slab path and the f64 native
oracle (all implement the exact expectation of the reference's 100-draw
MC binning, coal.cpp:2244-2298)."""

import numpy as np
import pytest

pytest.importorskip("jax")

from colate_tpu.pipeline.binning import bin_sites_analytic, bin_sites_analytic_native
from colate_tpu.pipeline.join import JoinedSites


def _sites(n=20000, nb=7, seed=0, age=0.0, sorted_blocks=True):
    g = np.random.default_rng(seed)
    ab = np.exp(g.uniform(np.log(1e-1), np.log(1e4), n))
    ae = ab * np.exp(g.uniform(0.05, 2.0, n))
    emp = g.uniform(size=n) < 0.15
    ab[emp] = age  # emp rows: age_begin <= age
    blocks = g.integers(0, nb, n)
    if sorted_blocks:
        blocks = np.sort(blocks)
    return JoinedSites(
        age_begin=ab, age_end=ae,
        w_shared=g.uniform(0, 2, n), w_notshared=g.uniform(0, 2, n),
        block_id=blocks.astype(np.int32), num_blocks=nb,
    )


def test_pallas_matches_xla_and_oracle():
    from colate_tpu.ops.bin_pallas import bin_sites_pallas

    sites = _sites()
    out = bin_sites_pallas(sites, interpret=None)
    if out is None:
        out = bin_sites_pallas(sites, interpret=True)
    ref = bin_sites_analytic(sites)
    for a, b in zip(out, ref):
        denom = max(np.abs(b).max(), 1e-300)
        assert np.abs(a - b).max() / denom < 2e-5
    oracle = bin_sites_analytic_native(sites)
    if oracle is not None:
        for a, b in zip(out, oracle):
            denom = max(np.abs(b).max(), 1e-300)
            assert np.abs(a - b).max() / denom < 5e-5


def test_pallas_handles_unsorted_blocks():
    from colate_tpu.ops.bin_pallas import bin_sites_pallas

    # block-aligned packing restarts chunks at every id change, so even
    # unsorted ids (worst case: a new padded chunk per site) bin exactly
    sites = _sites(n=4000, sorted_blocks=False)
    out = bin_sites_pallas(sites, interpret=True)
    assert out is not None
    ref = bin_sites_analytic(sites)
    for a, b in zip(out, ref):
        denom = max(np.abs(b).max(), 1e-300)
        assert np.abs(a - b).max() / denom < 2e-5


def test_pallas_whole_genome_block_count():
    """The flagship regression from VERDICT r4: ~125 blocks (a human
    genome of 30 Mb blocks + chromosome partials) must run the fused
    kernel, not bail to the XLA slab."""
    from colate_tpu.ops.bin_pallas import _nb_cap, bin_sites_pallas, supports

    assert supports(125) and supports(496)
    assert _nb_cap(125) == 256 and _nb_cap(496) == 512
    assert _nb_cap(3000) is None
    sites = _sites(n=30000, nb=125, seed=3)
    out = bin_sites_pallas(sites, interpret=True)
    assert out is not None
    ref = bin_sites_analytic(sites)
    for a, b in zip(out, ref):
        denom = max(np.abs(b).max(), 1e-300)
        assert np.abs(a - b).max() / denom < 2e-5


def test_pallas_block_aligned_shard_invariance():
    """Per-block results are bitwise identical however the site stream
    is split at block boundaries — the property the mesh psum parity
    relies on (parallel/mesh.py:_sharded_bin_pallas)."""
    from colate_tpu.pipeline.join import JoinedSites
    from colate_tpu.ops.bin_pallas import bin_sites_pallas

    sites = _sites(n=9000, nb=9, seed=7)
    whole = bin_sites_pallas(sites, interpret=True)
    # split at a block boundary, bin halves separately, add
    blk = np.asarray(sites.block_id)
    cut = int(np.searchsorted(blk, 5))
    parts = []
    for lo, hi in ((0, cut), (cut, len(sites))):
        sub = JoinedSites(
            age_begin=sites.age_begin[lo:hi], age_end=sites.age_end[lo:hi],
            w_shared=sites.w_shared[lo:hi],
            w_notshared=sites.w_notshared[lo:hi],
            block_id=sites.block_id[lo:hi], num_blocks=sites.num_blocks,
        )
        parts.append(bin_sites_pallas(sub, interpret=True))
    for w, a, b in zip(whole, parts[0], parts[1]):
        np.testing.assert_array_equal(w, a + b)


def test_pallas_empty_and_tiny():
    from colate_tpu.ops.bin_pallas import bin_sites_pallas

    empty = JoinedSites(
        age_begin=np.zeros(0), age_end=np.zeros(0), w_shared=np.zeros(0),
        w_notshared=np.zeros(0), block_id=np.zeros(0, np.int32), num_blocks=0,
    )
    out = bin_sites_pallas(empty, interpret=True)
    assert out is not None
    tiny = _sites(n=3, nb=1, seed=5)
    out = bin_sites_pallas(tiny, interpret=True)
    ref = bin_sites_analytic(tiny)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
