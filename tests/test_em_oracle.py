"""Exact-oracle sweeps for the EM E-step (reference: test_aDNA.cpp:68-212).

The reference sweeps 7 coal-rate magnitudes x all 92 age bins (C=5) for
shared + notshared against its independent ``coal_EM_simplified``
implementation at tolerance 1e-1, plus a NaN/negativity sweep over all
(bin1 <= bin2) age pairs.  Here the oracle is exact (mpmath, arbitrary
precision; tests/helpers/em_oracle.py), so the point-age sweep asserts
far tighter tolerances, and the interval-age (begin < end) path — which
the reference never tests — is swept against the same oracle.
"""

import numpy as np
import pytest

from helpers.em_oracle import em_oracle

YPG = 28.0


def _ref_test_epochs():
    """The epoch grid of test_aDNA.cpp:73-83 (E=21)."""
    E = 21
    epochs = np.zeros(E)
    epochs[1] = 1e3 / YPG
    for e in range(2, E - 1):
        epochs[e] = np.exp(np.log(10) * (3.0 + 4.0 * (e - 1.0) / (E - 3.0))) / YPG
    epochs[E - 1] = 1e8 / YPG
    return epochs


def _age_bins_c5():
    """92 bins at C=5 (test_aDNA.cpp:108-115): age = exp(bin/C)/10."""
    C = 5
    nbins = int(np.log(1e8) * C)
    return np.exp(np.arange(nbins) / C) / 10.0


MAGNITUDES = [1e-7 * 10.0**f for f in range(7)]  # 1e-7 .. 1e-1


def _cmp(got, want, rtol, atol):
    got = np.asarray(got)
    want = np.asarray(want)
    denom = np.maximum(np.abs(want), atol / rtol)
    assert np.all(np.abs(got - want) <= rtol * denom), (
        np.abs(got - want) / denom
    ).max()


@pytest.mark.parametrize("mag", MAGNITUDES)
def test_point_age_sweep_vs_exact_oracle(mag):
    """All 92 bins x shared+notshared at 7 rate magnitudes (the
    reference's sweep at tolerance 1e-1; exact oracle allows 1e-6)."""
    import jax.numpy as jnp

    from colate_tpu.ops.em import _e_step_all_bins

    epochs = _ref_test_epochs()
    E = epochs.shape[0]
    rates = np.full(E, mag)
    ages = _age_bins_c5()
    t = jnp.asarray(ages)
    k = jnp.clip(
        jnp.searchsorted(jnp.asarray(epochs), t, side="right") - 1, 0, E - 1
    ).astype(jnp.int32)
    ns, ds, ls, nn, dn, ln_ = (
        np.asarray(x)
        for x in _e_step_all_bins(jnp.asarray(epochs), jnp.asarray(rates), t, k)
    )
    for b in range(ages.shape[0]):
        o_ns, o_ds, o_ls = em_oracle(epochs, rates, ages[b], ages[b], True)
        o_nn, o_dn, o_ln = em_oracle(epochs, rates, ages[b], ages[b], False)
        _cmp(ns[b], o_ns, 1e-6, 1e-12)
        _cmp(ds[b], o_ds, 1e-6, 1e-4)  # tiny exposures at extreme rates
        assert abs(ls[b] - o_ls) < 1e-6
        _cmp(nn[b], o_nn, 1e-6, 1e-12)
        _cmp(dn[b], o_dn, 1e-6, 1e-6)
        assert abs(ln_[b] - o_ln) < 1e-6 * max(1.0, abs(o_ln))


@pytest.mark.parametrize("mag", [1e-6, 1e-3, 1e-1])
def test_interval_age_sweep_vs_exact_oracle(mag):
    """Interval ages (begin < end) — the path the reference never
    oracle-tests — against the exact oracle, including piecewise
    (non-constant) rates."""
    from colate_tpu.ops.em import e_step_interval

    epochs = _ref_test_epochs()
    E = epochs.shape[0]
    g = np.random.default_rng(int(1 / mag) % 2**31)
    rates = mag * np.exp(g.uniform(-1.5, 1.5, E))  # piecewise rates
    ages = _age_bins_c5()
    pairs = [
        (b1, b2)
        for b1 in range(0, ages.shape[0], 7)
        for b2 in range(b1 + 1, ages.shape[0], 11)
    ]
    a = np.array([ages[b1] for b1, _ in pairs])
    b = np.array([ages[b2] for _, b2 in pairs])
    ns, ds, ls, nn, dn, ln_ = e_step_interval(epochs, rates, a, b)
    for i in range(a.shape[0]):
        o_ns, o_ds, o_ls = em_oracle(epochs, rates, a[i], b[i], True)
        o_nn, o_dn, o_ln = em_oracle(epochs, rates, a[i], b[i], False)
        _cmp(ns[i], o_ns, 1e-6, 1e-12)
        _cmp(ds[i], o_ds, 1e-6, 1e-4)
        assert abs(ls[i] - o_ls) < 1e-6 * max(1.0, abs(o_ls))
        _cmp(nn[i], o_nn, 1e-6, 1e-12)
        _cmp(dn[i], o_dn, 1e-6, 1e-6)
        assert abs(ln_[i] - o_ln) < 1e-6 * max(1.0, abs(o_ln))


def test_interval_nan_negativity_sweep():
    """All (bin1 <= bin2) pairs stay finite and nonnegative
    (test_aDNA.cpp:187-208), on the interval path."""
    from colate_tpu.ops.em import e_step_interval

    epochs = _ref_test_epochs()
    rates = np.full(epochs.shape[0], 1e-4)
    ages = _age_bins_c5()
    nb = ages.shape[0]
    b1, b2 = np.triu_indices(nb)
    ns, ds, ls, nn, dn, ln_ = e_step_interval(
        epochs, rates, ages[b1], ages[b2]
    )
    for arr in (ns, ds, nn, dn):
        assert np.all(np.isfinite(arr))
        assert np.all(arr >= 0.0)
    assert np.all(np.isfinite(ls)) and np.all(np.isfinite(ln_))


def test_one_em_iteration_matches_oracle_m_step():
    """One full EM iteration (both providers) against the oracle:
    aggregate oracle num/den over the 185 production bins with random
    counts, apply the reference M-step rules, and compare with
    max_iter=1 runs of the JAX EM and the native host EM."""
    import jax.numpy as jnp

    from colate_tpu.config import COAL_RATE_FLOOR, age_bin_centers
    from colate_tpu.ops.em import run_em, run_em_native

    epochs = np.array([0.0, 50.0, 400.0, 3000.0, 2e4, 2e5, 1e8 / YPG])
    E = epochs.shape[0]
    init = np.full(E, 1 / 20000.0)
    ages = age_bin_centers()
    g = np.random.default_rng(5)
    sc = g.uniform(0, 20, (1, ages.shape[0]))
    nc = g.uniform(0, 50, (1, ages.shape[0]))

    num_tot = np.zeros(E)
    den_tot = np.zeros(E)
    for bin_i in range(ages.shape[0]):
        o_ns, o_ds, _ = em_oracle(epochs, init, ages[bin_i], ages[bin_i], True)
        o_nn, o_dn, _ = em_oracle(epochs, init, ages[bin_i], ages[bin_i], False)
        num_tot += sc[0, bin_i] * np.asarray(o_ns) + nc[0, bin_i] * np.asarray(o_nn)
        den_tot += sc[0, bin_i] * np.asarray(o_ds) + nc[0, bin_i] * np.asarray(o_dn)
    # reference M-step (coal.cpp:3775-3815): num==0 copies the previous
    # NEW rate; den==0 keeps the old; else floored num/den
    want = np.zeros(E)
    prev_new = 0.0
    for e in range(E):
        if num_tot[e] == 0:
            want[e] = prev_new
        elif den_tot[e] == 0:
            want[e] = init[e]
        else:
            want[e] = max(num_tot[e] / den_tot[e], COAL_RATE_FLOOR)
        prev_new = want[e]

    r_jax, _, _ = run_em(
        jnp.asarray(epochs), jnp.asarray(init), jnp.asarray(sc),
        jnp.asarray(nc), max_iter=1, min_iter=0, dtype="float64",
        check_every=1,
    )
    np.testing.assert_allclose(np.asarray(r_jax)[0], want, rtol=1e-9)
    out = run_em_native(epochs, init, sc, nc, max_iter=1, min_iter=0)
    assert out is not None
    np.testing.assert_allclose(out[0][0], want, rtol=1e-9)
