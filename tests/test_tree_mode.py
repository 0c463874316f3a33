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
