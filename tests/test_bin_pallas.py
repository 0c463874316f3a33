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


def test_pallas_declines_unsorted_blocks():
    from colate_tpu.ops.bin_pallas import bin_sites_pallas

    sites = _sites(n=4000, sorted_blocks=False)
    # unsorted ids are overwhelmingly likely to break a chunk's 8-block
    # span; either way the result must be correct or None
    out = bin_sites_pallas(sites, interpret=True)
    if out is not None:
        ref = bin_sites_analytic(sites)
        for a, b in zip(out, ref):
            denom = max(np.abs(b).max(), 1e-300)
            assert np.abs(a - b).max() / denom < 2e-5


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
