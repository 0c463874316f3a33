"""Pins the fused Pallas EM backend to the XLA f32 path.

The kernel (ops/em_pallas.py) reorders the E-step math onto a
[bins, epochs, lanes] layout and fuses K iterations per pallas_call;
its arithmetic matches ops/em.py's f32 path op-for-op but reduction
orders differ, so the contract here is:

- a fixed 8-iteration chunk matches the XLA f32 chunk to ~1e-5 rel
  (pure f32 reassociation noise; the one-hot gathers run at
  Precision.HIGHEST — at default bf16 matmul precision this test
  fails at ~1e-2);
- run-to-convergence matches the XLA f32 run under the tiered
  contract of tests/test_em_f32.py (identified rates 1e-4; the
  stopped-mid-transient chaos at unidentified epochs is a property
  of the stopping rule, not the backend).

All tests run the kernel in interpret mode (CPU test platform).
"""

import numpy as np
import pytest

from colate_tpu.config import INITIAL_COAL_RATE, age_bin_centers
from colate_tpu.ops.epochs import epochs_from_bins


def _synthetic_counts(B, seed):
    """Count matrices shaped like a real run: mass concentrated in the
    mid age bins, bootstrap-jittered."""
    rng = np.random.default_rng(seed)
    t = age_bin_centers()
    N = t.shape[0]
    base_s = 1e4 * np.exp(-0.5 * ((np.log(t + 1e-9) - 7.0) / 2.0) ** 2)
    base_n = 3e4 * np.exp(-0.5 * ((np.log(t + 1e-9) - 8.5) / 2.5) ** 2)
    jit_s = rng.gamma(20.0, 1 / 20.0, size=(B, N))
    jit_n = rng.gamma(20.0, 1 / 20.0, size=(B, N))
    sc = np.round(base_s[None, :] * jit_s, 3)
    nc = np.round(base_n[None, :] * jit_n, 3)
    # zero out the tails like a real dataset (no dated mutations there)
    sc[:, :40] = 0.0
    sc[:, 150:] = 0.0
    nc[:, :35] = 0.0
    nc[:, 155:] = 0.0
    return sc, nc


@pytest.fixture(scope="module")
def problem():
    epochs, _ = epochs_from_bins("3,7,0.2", 28.0, 0.0)
    sc, nc = _synthetic_counts(B=5, seed=11)
    init = np.full(epochs.shape, INITIAL_COAL_RATE)
    return epochs, init, sc, nc


def test_fixed_chunk_matches_xla_f32(problem):
    import jax.numpy as jnp

    from colate_tpu.ops.em import run_em
    from colate_tpu.ops.em_pallas import run_em_pallas

    epochs, init, sc, nc = problem
    kw = dict(max_iter=8, min_iter=8, check_every=8)
    r_x, ll_x, it_x = run_em(
        jnp.asarray(epochs), jnp.asarray(init),
        jnp.asarray(sc.astype(np.float32)), jnp.asarray(nc.astype(np.float32)),
        dtype="float32", **kw,
    )
    r_p, ll_p, it_p = run_em_pallas(
        epochs, init, sc, nc, interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(it_x), np.asarray(it_p))
    r_x, r_p = np.asarray(r_x), np.asarray(r_p)
    nz = r_x != 0
    rel = np.abs(r_p[nz] - r_x[nz]) / np.abs(r_x[nz])
    assert rel.max() < 1e-4, f"8-iter chunk deviates {rel.max():.2e}"
    np.testing.assert_array_equal(r_x == 0, r_p == 0)
    ll_rel = np.abs(np.asarray(ll_p) - np.asarray(ll_x)) / np.abs(
        np.asarray(ll_x)
    )
    # both providers are f32 E-steps with f64 logl accumulation; their
    # 1−e^{-x} evaluations round differently at the last f32 ulp
    assert ll_rel.max() < 3e-6


def test_convergence_matches_xla_f32_tiered(problem):
    import jax.numpy as jnp

    from colate_tpu.ops.em import run_em
    from colate_tpu.ops.em_pallas import run_em_pallas

    epochs, init, sc, nc = problem
    r_x, ll_x, it_x = run_em(
        jnp.asarray(epochs), jnp.asarray(init),
        jnp.asarray(sc.astype(np.float32)), jnp.asarray(nc.astype(np.float32)),
        dtype="float32", check_every=8,
    )
    r_p, ll_p, it_p = run_em_pallas(
        epochs, init, sc, nc, check_every=8, interpret=True
    )
    a, b = np.asarray(r_x), np.asarray(r_p)
    assert a.shape == b.shape
    rel = np.abs(b - a) / np.maximum(np.abs(a), 1e-300)
    strong = a >= 1e-4
    weak = a >= 1e-6
    assert strong.sum() >= 4, "problem must have identified epochs"
    assert rel[strong].max() <= 1e-4, (
        f"identified rates deviate {rel[strong].max():.2e} > 1e-4"
    )
    assert rel[weak].max() <= 2e-2, (
        f"weakly identified rates deviate {rel[weak].max():.2e} > 2e-2"
    )
    np.testing.assert_array_equal(a == 0.0, b == 0.0)


def test_non_multiple_of_lanes_batch_padding(problem):
    """B=5 (above) already exercises padding; check a B crossing one full
    lane tile boundary keeps per-replicate results independent of Bp."""
    from colate_tpu.ops.em_pallas import run_em_pallas

    epochs, init, sc, nc = problem
    kw = dict(max_iter=16, min_iter=16, check_every=8, interpret=True)
    r5, ll5, _ = run_em_pallas(epochs, init, sc, nc, **kw)
    sc2 = np.concatenate([sc, sc[:1]], axis=0)
    nc2 = np.concatenate([nc, nc[:1]], axis=0)
    r6, ll6, _ = run_em_pallas(epochs, init, sc2, nc2, **kw)
    np.testing.assert_allclose(np.asarray(r6)[:5], np.asarray(r5), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ll6)[:5], np.asarray(ll5), rtol=0, atol=0)
