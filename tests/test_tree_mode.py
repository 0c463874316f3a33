"""Golden tests for CoalRate mode tree (coal_tree estimator)."""

import os
import subprocess

import numpy as np
import pytest

from colate_tpu.formats.anc import AncFile, node_ages
from colate_tpu.formats.coal import CoalFile
from helpers.synth_anc import REF_COALRATE, make_anc_mut


@pytest.fixture(scope="module")
def anc_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ancfix"))
    prefix = os.path.join(root, "trees")
    for i, c in enumerate(["1", "2"]):
        make_anc_mut(prefix, c, N=10, num_trees=37, seed=11 + i, skip_trees=(3, 20))
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("1\n2\n")
    return dict(prefix=prefix, chrfile=chrfile, chroms=["1", "2"])


def test_anc_roundtrip(anc_fixture):
    anc = AncFile.read(anc_fixture["prefix"] + "_chr1.anc")
    assert anc.n_hap == 10
    assert anc.num_trees == 37
    coords = node_ages(anc)
    # root is the oldest node; leaves at 0
    assert np.all(coords[:, :10] == 0)
    assert np.all(coords.max(axis=1) > 0)


@pytest.mark.oracle
def test_tree_mode_golden(anc_fixture, tmp_path):
    if not os.path.exists(REF_COALRATE):
        pytest.skip("CoalRate oracle not built")
    ref_out = str(tmp_path / "ref_tree")
    subprocess.run(
        [
            REF_COALRATE, "--mode", "tree",
            "-i", anc_fixture["prefix"],
            "--chr", anc_fixture["chrfile"],
            "--bins", "2,6,0.5",
            "-o", ref_out,
        ],
        check=True, capture_output=True, timeout=300,
    )

    class Args:
        input = anc_fixture["prefix"]
        bins = "2,6,0.5"
        chr_file = anc_fixture["chrfile"]
        years_per_gen = None
        num_bootstraps = 1
        coal = None
        output = str(tmp_path / "our_tree")

    from colate_tpu.models.tree_coal import run_tree_mode

    run_tree_mode(Args())

    ref = CoalFile.read(ref_out + ".coal")
    ours = CoalFile.read(str(tmp_path / "our_tree.coal"))
    np.testing.assert_allclose(ours.epochs, ref.epochs, rtol=1e-6)
    m = np.isfinite(ref.rates)
    assert m.sum() > 5
    np.testing.assert_allclose(ours.rates[m], ref.rates[m], rtol=1e-5, atol=0)
    # nan pattern must match too (epochs with zero exposure)
    np.testing.assert_array_equal(np.isfinite(ours.rates), m)


@pytest.mark.oracle
def test_tree_mode_golden_bootstrap(anc_fixture, tmp_path):
    if not os.path.exists(REF_COALRATE):
        pytest.skip("CoalRate oracle not built")
    ref_out = str(tmp_path / "ref_tree_b")
    subprocess.run(
        [
            REF_COALRATE, "--mode", "tree",
            "-i", anc_fixture["prefix"],
            "--chr", anc_fixture["chrfile"],
            "--bins", "2,6,0.5",
            "--num_bootstraps", "7",
            "-o", ref_out,
        ],
        check=True, capture_output=True, timeout=300,
    )

    class Args:
        input = anc_fixture["prefix"]
        bins = "2,6,0.5"
        chr_file = anc_fixture["chrfile"]
        years_per_gen = None
        num_bootstraps = 7
        coal = None
        output = str(tmp_path / "our_tree_b")

    from colate_tpu.models.tree_coal import run_tree_mode

    run_tree_mode(Args())
    ref = CoalFile.read(ref_out + ".coal")
    ours = CoalFile.read(str(tmp_path / "our_tree_b.coal"))
    assert ours.rates.shape == ref.rates.shape
    m = np.isfinite(ref.rates)
    np.testing.assert_allclose(ours.rates[m], ref.rates[m], rtol=1e-5)


def _tree_inputs(anc_fixture, bins="2,6,0.5"):
    from colate_tpu.models.tree_coal import epochs_from_bins_tree, tree_spans
    from colate_tpu.formats.mut import MutTable

    anc = AncFile.read(anc_fixture["prefix"] + "_chr1.anc")
    mut = MutTable.read(anc_fixture["prefix"] + "_chr1.mut")
    epochs = epochs_from_bins_tree(bins, 28.0)
    return anc, mut, epochs


def test_populate_device_matches_numpy(anc_fixture):
    """The device populate kernel (cumulative-exposure evaluation) must
    reproduce the host interval-overlap oracle in f64."""
    jax = pytest.importorskip("jax")
    from colate_tpu.models.tree_coal import accumulate_tree_stats

    anc, mut, epochs = _tree_inputs(anc_fixture)
    E = epochs.shape[0]
    num_np = np.zeros((8, E)); den_np = np.zeros((8, E))
    num_dv = np.zeros((8, E)); den_dv = np.zeros((8, E))
    nb1 = accumulate_tree_stats(anc, mut, epochs, 0, num_np, den_np,
                                backend="numpy")
    nb2 = accumulate_tree_stats(anc, mut, epochs, 0, num_dv, den_dv,
                                backend="device")
    assert nb1 == nb2
    np.testing.assert_allclose(num_dv, num_np, rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(den_dv, den_np, rtol=1e-12, atol=1e-300)
    assert den_np.sum() > 0


def test_populate_device_ancient_samples(tmp_path):
    """Ancient (nonzero-age) leaves shift both the k(t) sweep and the
    coalescence binning; device and host must agree."""
    pytest.importorskip("jax")
    from colate_tpu.formats.mut import MutTable
    from colate_tpu.models.tree_coal import (
        accumulate_tree_stats,
        epochs_from_bins_tree,
    )
    from helpers.synth_anc import make_anc_mut

    prefix = str(tmp_path / "aa")
    ages = [0.0, 40.0, 0.0, 125.0, 0.0, 0.0, 7.5, 0.0]
    make_anc_mut(prefix, "1", N=8, num_trees=41, seed=19, sample_ages=ages)
    anc = AncFile.read(prefix + "_chr1.anc")
    mut = MutTable.read(prefix + "_chr1.mut")
    epochs = epochs_from_bins_tree("1,6,0.4", 28.0)
    E = epochs.shape[0]
    outs = []
    for backend in ("numpy", "device"):
        num = np.zeros((4, E)); den = np.zeros((4, E))
        accumulate_tree_stats(anc, mut, epochs, 0, num, den, backend=backend)
        outs.append((num, den))
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(outs[1][1], outs[0][1], rtol=1e-12, atol=1e-300)


def test_populate_device_zero_branch_lengths(tmp_path):
    """A coalescence at age exactly 0 (zero branch lengths) belongs to
    epoch 0 on both backends — the device kernel must not drop events at
    the epochs[0] boundary (ADVICE r2)."""
    pytest.importorskip("jax")
    from colate_tpu.formats.mut import MutTable
    from colate_tpu.models.tree_coal import (
        accumulate_tree_stats,
        epochs_from_bins_tree,
    )
    from helpers.synth_anc import make_anc_mut

    prefix = str(tmp_path / "zb")
    make_anc_mut(prefix, "1", N=6, num_trees=9, seed=5)
    anc = AncFile.read(prefix + "_chr1.anc")
    # zero out every branch length in a few trees: all internal nodes
    # coalesce at age exactly 0
    anc.branch_length[::3] = 0.0
    mut = MutTable.read(prefix + "_chr1.mut")
    epochs = epochs_from_bins_tree("1,6,0.4", 28.0)
    E = epochs.shape[0]
    outs = []
    for backend in ("numpy", "device"):
        num = np.zeros((2, E)); den = np.zeros((2, E))
        accumulate_tree_stats(anc, mut, epochs, 0, num, den, backend=backend)
        outs.append((num, den))
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(outs[1][1], outs[0][1], rtol=1e-12, atol=1e-300)
    # the zero-age coalescences must actually land in epoch 0
    assert outs[0][0][:, 0].sum() > 0


@pytest.mark.oracle
def test_tree_mode_golden_device_backend(anc_fixture, tmp_path, monkeypatch):
    """Whole tree mode with the device kernel forced on must stay within
    golden tolerance of the reference CoalRate binary."""
    pytest.importorskip("jax")
    if not os.path.exists(REF_COALRATE):
        pytest.skip("CoalRate oracle not built")
    import colate_tpu.models.tree_coal as tc

    monkeypatch.setattr(tc, "_DEVICE_MIN_NODES", 0)  # force device dispatch
    ref_out = str(tmp_path / "ref_tree_dev")
    subprocess.run(
        [REF_COALRATE, "--mode", "tree", "-i", anc_fixture["prefix"],
         "--chr", anc_fixture["chrfile"], "--bins", "2,6,0.5", "-o", ref_out],
        check=True, capture_output=True, timeout=300,
    )

    class Args:
        input = anc_fixture["prefix"]
        bins = "2,6,0.5"
        chr_file = anc_fixture["chrfile"]
        years_per_gen = None
        num_bootstraps = 1
        coal = None
        output = str(tmp_path / "our_tree_dev")

    tc.run_tree_mode(Args())
    ref = CoalFile.read(ref_out + ".coal")
    ours = CoalFile.read(str(tmp_path / "our_tree_dev.coal"))
    m = np.isfinite(ref.rates)
    np.testing.assert_allclose(ours.rates[m], ref.rates[m], rtol=1e-5, atol=0)
    np.testing.assert_array_equal(np.isfinite(ours.rates), m)


def test_sorted_populate_matches_general():
    """The sort-free fast path (leaves at 0, internal ages ordered) must
    reproduce the general argsort kernel and the numpy oracle exactly,
    including ties at epoch edges and zero-age coalescences."""
    pytest.importorskip("jax")
    import numpy as np

    from colate_tpu.models.tree_coal import _populate_numpy_chunk
    from colate_tpu.ops.tree_kernel import (
        populate_device,
        populate_device_sorted,
        sorted_case_applicable,
    )

    g = np.random.default_rng(17)
    T, N = 50, 6
    M = 2 * N - 1
    coords = np.zeros((T, M), np.float32)
    ia = np.sort(g.uniform(0.0, 90.0, (T, N - 1)), axis=1)
    ia[0, 0] = 0.0           # zero-age coalescence
    ia[3, 2] = 10.0          # exactly on an epoch edge
    ia[5, :] = 95.0          # all above; some beyond last edge
    coords[:, N:] = ia
    spans = g.uniform(0.5, 2.0, T)
    blocks = g.integers(0, 3, T).astype(np.int32)
    epochs = np.array([0.0, 1.0, 10.0, 50.0, 80.0])
    assert sorted_case_applicable(coords, N)
    n_s, d_s = populate_device_sorted(coords, spans, blocks, epochs, N, 3)
    n_g, d_g = populate_device(coords, spans, blocks, epochs, N, 3)
    np.testing.assert_allclose(n_s, n_g, rtol=0, atol=0)
    np.testing.assert_allclose(d_s, d_g, rtol=1e-12, atol=1e-12)
    # numpy oracle
    nt, dt = _populate_numpy_chunk(coords, spans, epochs, N)
    n_o = np.zeros((3, epochs.size)); d_o = np.zeros((3, epochs.size))
    np.add.at(n_o, blocks, nt); np.add.at(d_o, blocks, dt)
    np.testing.assert_allclose(n_s, n_o, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(d_s, d_o, rtol=1e-12, atol=1e-12)
    # ancient leaves must NOT take the fast path
    c2 = coords.copy(); c2[:, 0] = 5.0
    assert not sorted_case_applicable(c2, N)


def test_sorted_populate_native_matches_device():
    import numpy as np

    from colate_tpu.models.tree_coal import _populate_numpy_chunk
    from colate_tpu.ops.tree_kernel import (
        populate_sorted_native,
        sorted_case_applicable,
    )

    g = np.random.default_rng(23)
    T, N = 200, 8
    M = 2 * N - 1
    coords = np.zeros((T, M), np.float32)
    coords[:, N:] = np.sort(g.uniform(0.0, 90.0, (T, N - 1)), axis=1)
    coords[2, N] = 0.0  # zero-age first coalescence (still sorted)
    # edge-coincident ages, order preserved
    coords[7, N:] = [0.5, 5.0, 10.0, 10.0, 50.0, 80.0, 88.0]
    spans = g.uniform(0.5, 2.0, T)
    blocks = (np.arange(T) // 50).astype(np.int32)
    epochs = np.array([0.0, 1.0, 10.0, 50.0, 80.0])
    assert sorted_case_applicable(coords, N)
    out = populate_sorted_native(coords, spans, blocks, epochs, N, 4)
    if out is None:
        pytest.skip("native kernel unavailable")
    nt, dt = _populate_numpy_chunk(coords, spans, epochs, N)
    n_o = np.zeros((4, epochs.size)); d_o = np.zeros((4, epochs.size))
    np.add.at(n_o, blocks, nt); np.add.at(d_o, blocks, dt)
    np.testing.assert_allclose(out[0], n_o, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(out[1], d_o, rtol=1e-12, atol=1e-12)


def test_native_populate_handles_unsorted_internal_ages():
    """Ages recomputed from branch lengths carry tiny inversions; the
    native kernel stably sorts per tree and must match the general
    numpy oracle on arbitrarily ordered internal ages."""
    import numpy as np

    from colate_tpu.models.tree_coal import _populate_numpy_chunk
    from colate_tpu.ops.tree_kernel import (
        leaf_zero_applicable,
        populate_sorted_native,
        sorted_case_applicable,
    )

    g = np.random.default_rng(31)
    T, N = 120, 7
    M = 2 * N - 1
    coords = np.zeros((T, M), np.float32)
    coords[:, N:] = g.uniform(0.0, 90.0, (T, N - 1))  # UNSORTED
    spans = g.uniform(0.5, 2.0, T)
    blocks = (np.arange(T) // 40).astype(np.int32)
    epochs = np.array([0.0, 1.0, 10.0, 50.0, 80.0])
    assert leaf_zero_applicable(coords, N)
    assert not sorted_case_applicable(coords, N)
    out = populate_sorted_native(coords, spans, blocks, epochs, N, 3)
    if out is None:
        pytest.skip("native kernel unavailable")
    nt, dt = _populate_numpy_chunk(coords, spans, epochs, N)
    n_o = np.zeros((3, epochs.size)); d_o = np.zeros((3, epochs.size))
    np.add.at(n_o, blocks, nt); np.add.at(d_o, blocks, dt)
    np.testing.assert_allclose(out[0], n_o, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(out[1], d_o, rtol=1e-9, atol=1e-12)
