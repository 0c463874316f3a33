"""Mesh-sharded Pallas EM: per-device fused kernels over the bootstrap axis.

sharded_run_em(backend="pallas") gives every device of the mesh its own
lane-padded bootstrap shard and runs the fused kernel locally; replicate
lanes are mathematically independent, so the per-replicate results must
be BIT-EQUAL to the unsharded run_em_pallas (same kernel, same per-lane
math, different tile grouping).  Runs in interpret mode on the virtual
CPU mesh (conftest forces 8 CPU devices).
"""

import numpy as np

from colate_tpu.config import INITIAL_COAL_RATE
from colate_tpu.ops.epochs import epochs_from_bins
from tests.test_em_pallas import _synthetic_counts


def test_sharded_pallas_bit_equal_to_single_device():
    from colate_tpu.ops.em_pallas import run_em_pallas
    from colate_tpu.parallel.mesh import make_mesh, sharded_run_em

    epochs, _ = epochs_from_bins("3,7,0.2", 28.0, 0.0)
    sc, nc = _synthetic_counts(B=5, seed=11)
    init = np.full(epochs.shape, INITIAL_COAL_RATE)
    kw = dict(max_iter=16, min_iter=16)

    r1, ll1, it1 = run_em_pallas(
        epochs, init, sc, nc, check_every=8, interpret=True, **kw
    )
    mesh = make_mesh(4)
    r4, ll4, it4 = sharded_run_em(
        mesh, epochs, init, sc, nc, backend="pallas", interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(it1), it4)
    np.testing.assert_allclose(np.asarray(r1), r4, rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ll1), ll4, rtol=0, atol=0)


def test_sharded_bin_pallas_matches_xla():
    """Mesh-sharded fused binning (pallas per shard + psum) vs the
    segment-sum shard_map path on the virtual CPU mesh."""
    import numpy as np

    from colate_tpu.parallel.mesh import make_mesh, sharded_bin_sites

    g = np.random.default_rng(12)
    n, nb = 40000, 9
    ab = np.exp(g.uniform(np.log(1e-1), np.log(1e4), n))
    ae = ab * np.exp(g.uniform(0.05, 2.0, n))
    emp = g.uniform(size=n) < 0.2
    ab[emp] = 0.0
    ws = g.uniform(0, 2, n)
    wn = g.uniform(0, 2, n)
    blk = np.sort(g.integers(0, nb, n)).astype(np.int32)
    mesh = make_mesh(4)
    out_x = sharded_bin_sites(mesh, ab, ae, ws, wn, blk, nb, backend="xla")
    out_p = sharded_bin_sites(mesh, ab, ae, ws, wn, blk, nb, backend="pallas")
    assert out_p is not None
    for a, b in zip(out_p, out_x):
        denom = max(np.abs(b).max(), 1e-300)
        assert np.abs(a - b).max() / denom < 3e-5
