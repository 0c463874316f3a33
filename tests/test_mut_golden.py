"""Golden end-to-end tests: colate_tpu vs the reference binary.

The reference is built from /root/reference into /tmp/refbin (see
tools/build_reference_oracle.sh).  In mc_parity sampling mode the engine
replays the reference's exact RNG stream, so the `.coal` output matches
to the printed 6-significant-digit precision.  The default analytic mode
is compared within a statistical tolerance.
"""

import numpy as np
import pytest

from colate_tpu.config import MutRunConfig
from colate_tpu.formats.coal import CoalFile
from colate_tpu.models.mut_em import run_mut_and_write
from helpers.synth import run_oracle_mut


def _cfg(fix, out, **kw):
    base = dict(
        mut=fix["mut_prefix"],
        output=out,
        chr_list=fix["chroms"],
        target_tmp=fix["target"],
        reference_tmp=fix["reference"],
        bins="3,7,0.2",
        seed=1,
    )
    base.update(kw)
    return MutRunConfig(**base)


def _compare_coal(ref_path, our_path, rtol):
    ref = CoalFile.read(ref_path)
    ours = CoalFile.read(our_path)
    np.testing.assert_allclose(ours.epochs, ref.epochs, rtol=1e-5)
    assert ours.rates.shape == ref.rates.shape
    np.testing.assert_allclose(ours.rates, ref.rates, rtol=rtol, atol=1e-12)


@pytest.mark.oracle
def test_mut_tmptmp_parity_single(oracle, fixture_small, tmp_path):
    run_oracle_mut(fixture_small, str(tmp_path / "ref_out"), seed=1)
    cfg = _cfg(fixture_small, str(tmp_path / "our_out"), sampling="mc_parity")
    run_mut_and_write(cfg)
    _compare_coal(
        str(tmp_path / "ref_out.coal"), str(tmp_path / "our_out.coal"), rtol=1e-5
    )


@pytest.mark.oracle
def test_mut_tmptmp_parity_bootstrap(oracle, fixture_small, tmp_path):
    run_oracle_mut(fixture_small, str(tmp_path / "ref_out"), seed=9, num_bootstraps=4)
    cfg = _cfg(
        fixture_small,
        str(tmp_path / "our_out"),
        seed=9,
        num_bootstrap=4,
        sampling="mc_parity",
    )
    run_mut_and_write(cfg)
    _compare_coal(
        str(tmp_path / "ref_out.coal"), str(tmp_path / "our_out.coal"), rtol=1e-5
    )


@pytest.mark.oracle
def test_mut_emp_top_bin_parity(oracle, tmp_path):
    """Emp-F redistribution with mass banked in the LAST age bin.

    The reference's width-scaling loop (coal.cpp:3420-3426) leaves
    F[num_age_bins-1] unscaled and its first write (F[-1] for modern
    samples) lands out of bounds; a Python wrap-around emulation would
    instead scale and sign-flip the last bin.  This fixture forces
    age_begin==0 mutations whose age_end lies in bin 184, so any
    divergence in that bin's handling shows up in the .coal rates.
    """
    from helpers.synth import make_fixture

    fix = make_fixture(
        str(tmp_path / "fix"), n_per_chrom=1500, seed=31, top_bin_frac=0.15
    )
    run_oracle_mut(fix, str(tmp_path / "ref_out"), seed=3, num_bootstraps=3)
    cfg = _cfg(
        fix,
        str(tmp_path / "our_out"),
        seed=3,
        num_bootstrap=3,
        sampling="mc_parity",
    )
    run_mut_and_write(cfg)
    _compare_coal(
        str(tmp_path / "ref_out.coal"), str(tmp_path / "our_out.coal"), rtol=1e-5
    )


@pytest.mark.oracle
def test_mut_analytic_close_to_reference(oracle, fixture_small, tmp_path):
    """The analytic expected-histogram mode must agree with the reference
    within MC sampling noise on informative epochs."""
    run_oracle_mut(fixture_small, str(tmp_path / "ref_out"), seed=1)
    cfg = _cfg(fixture_small, str(tmp_path / "ana_out"), sampling="analytic")
    run_mut_and_write(cfg)
    ref = CoalFile.read(str(tmp_path / "ref_out.coal"))
    ours = CoalFile.read(str(tmp_path / "ana_out.coal"))
    r = ref.rates[0]
    o = ours.rates[0]
    # compare log-rates where both are away from the 5e-9 floor
    m = (r > 1e-8) & (o > 1e-8)
    assert m.sum() >= 5
    np.testing.assert_allclose(np.log(o[m]), np.log(r[m]), atol=0.35)


def test_mut_analytic_deterministic(fixture_small, tmp_path):
    """Analytic mode must not depend on the seed at all."""
    a = run_mut_and_write(
        _cfg(fixture_small, str(tmp_path / "a"), sampling="analytic", seed=1)
    )
    b = run_mut_and_write(
        _cfg(fixture_small, str(tmp_path / "b"), sampling="analytic", seed=12345)
    )
    np.testing.assert_array_equal(a.rates, b.rates)


def test_colate_mat_cache_roundtrip(fixture_small, tmp_path):
    """A run that writes .colate_mat must reload it identically.

    tmp inputs don't write the cache (reference behaviour), so emulate a
    cached run by dumping and reloading via the mat format with B=1.
    """
    from colate_tpu.config import age_bin_centers
    from colate_tpu.formats.colate_mat import read_colate_mat, write_colate_mat

    res = run_mut_and_write(_cfg(fixture_small, str(tmp_path / "x"), sampling="analytic"))
    # writing the result counts through the cache loses only %g precision
    bins = age_bin_centers()
    sh = np.random.default_rng(5).random((1, bins.size))
    ns = np.random.default_rng(6).random((1, bins.size))
    write_colate_mat(str(tmp_path / "m.colate_mat"), bins, sh, ns)
    _, s2, n2 = read_colate_mat(str(tmp_path / "m.colate_mat"), 1)
    np.testing.assert_allclose(s2, sh, rtol=1e-5)
    np.testing.assert_allclose(n2, ns, rtol=1e-5)
