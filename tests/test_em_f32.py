"""Accuracy contract of the f32 device-EM path (the TPU default for
large bootstrap batches).

Measured behaviour (r3, CPU XLA and v5e give the same picture):

- a single f32 E-step at converged rates matches f64 to ~1e-7;
- the counts -> rates map is well-conditioned (1e-7 input perturbation
  moves converged rates by <4e-6);
- BUT the EM stops mid-transient (logl-ratio rule after >=1000 iters),
  and at *statistically unidentified* epochs (rates near the 5e-9
  floor, essentially zero expected events) the stopped trajectory is
  chaotic: per-iteration rounding differences compound multiplicatively
  there, so f32-vs-f64 deviations of a few percent at tiny rates are a
  property of the stopping rule, not of the arithmetic.  (An f64
  "polish" phase moves the result *away* from the f64 run — both are
  mid-transient points, see VERDICT r2 weak #3 investigation.)

The contract pinned here, end-to-end through the full mut pipeline:

- identified rates (>= 1e-4, the magnitude of data-rich epochs):
  rtol <= 1e-4 vs the f64 path;
- weakly identified rates (>= 1e-6): rtol <= 2e-2;
- below that: no guarantee (the reference's own bootstrap CIs span
  orders of magnitude there).

f64 stays the default for parity runs, CPU backends, and B <= 800
(host provider); bench.py records the measured relerr per run.
"""

import numpy as np
import pytest

from colate_tpu.config import MutRunConfig
from helpers.synth import make_fixture


def _run(fix, out, dtype):
    from colate_tpu.models.mut_em import run_mut

    cfg = MutRunConfig(
        mut=fix["mut_prefix"],
        output=out,
        chr_list=fix["chroms"],
        target_tmp=fix["target"],
        reference_tmp=fix["reference"],
        bins="3,7,0.2",
        seed=2,
        num_bootstrap=4,
        sampling="analytic",
        em_dtype=dtype,
    )
    return run_mut(cfg)


def test_f32_em_end_to_end_tiered_tolerance(tmp_path):
    fix = make_fixture(str(tmp_path / "fix"), n_per_chrom=3000, seed=17)
    r64 = _run(fix, str(tmp_path / "o64"), "float64")
    r32 = _run(fix, str(tmp_path / "o32"), "float32")
    a, b = np.asarray(r64.rates), np.asarray(r32.rates)
    assert a.shape == b.shape
    rel = np.abs(b - a) / np.maximum(np.abs(a), 1e-300)
    strong = a >= 1e-4
    weak = a >= 1e-6
    assert strong.sum() >= 4, "fixture must have identified epochs"
    assert rel[strong].max() <= 1e-4, (
        f"identified rates deviate {rel[strong].max():.2e} > 1e-4"
    )
    assert rel[weak].max() <= 2e-2, (
        f"weakly identified rates deviate {rel[weak].max():.2e} > 2e-2"
    )


def test_f32_em_identical_fixed_point_structure(tmp_path):
    """Both precisions must agree on WHICH epochs carry data (the
    num==0 fill-forward / floor structure), not just on magnitudes."""
    fix = make_fixture(str(tmp_path / "fix"), n_per_chrom=3000, seed=29)
    r64 = _run(fix, str(tmp_path / "a64"), "float64")
    r32 = _run(fix, str(tmp_path / "a32"), "float32")
    a, b = np.asarray(r64.rates), np.asarray(r32.rates)
    np.testing.assert_array_equal(a == 0.0, b == 0.0)
    floor = 5e-9  # the f32 path carries the floor as float32(5e-9)
    np.testing.assert_array_equal(
        np.isclose(a, floor, rtol=1e-6), np.isclose(b, floor, rtol=1e-6)
    )


def test_f32_den_no_cancellation_extreme_rates():
    """The f32 E-step's per-epoch exposures must stay accurate when
    λ·t_e is huge — the naive T1−t_e·P form lost ~λ·t_e relative digits
    (round-3 BENCH: 0.9% on rates ≥ 1e6); the g(x)/λ identity is
    cancellation-free.  Compare f32 den against the f64 path per bin."""
    import jax.numpy as jnp
    import numpy as np

    from colate_tpu.config import age_bin_centers
    from colate_tpu.ops.em import _e_step_all_bins

    epochs = np.array([0.0, 10.0, 100.0, 1e3, 1e4, 1e5, 1e6])
    # rates spanning 12 decades incl. degenerate 1e6-scale epochs
    rates = np.array([1e-4, 1e-6, 5e-3, 1e-8, 1e2, 1e6, 1e-5])
    t = age_bin_centers()
    k = np.clip(np.searchsorted(epochs, t, side="right") - 1, 0, 6).astype(
        np.int32
    )
    out64 = _e_step_all_bins(
        jnp.asarray(epochs), jnp.asarray(rates), jnp.asarray(t),
        jnp.asarray(k),
    )
    out32 = _e_step_all_bins(
        jnp.asarray(epochs, jnp.float32), jnp.asarray(rates, jnp.float32),
        jnp.asarray(t, jnp.float32), jnp.asarray(k),
    )
    for name, a64, a32 in (
        ("den_s", out64[1], out32[1]),
        ("den_n", out64[4], out32[4]),
    ):
        a64 = np.asarray(a64)
        a32 = np.asarray(a32, np.float64)
        m = np.abs(a64) > 1e-300
        rel = np.abs(a32[m] - a64[m]) / np.abs(a64[m])
        assert rel.max() < 5e-5, f"{name}: f32 relerr {rel.max():.2e}"
