"""Golden tests: compare_tmp, count_topo, CondCoalRates."""

import filecmp
import os
import subprocess

import numpy as np
import pytest

from helpers.synth import REF_COLATE, make_fixture, make_stream
from helpers.synth_anc import make_anc_mut


@pytest.mark.oracle
def test_compare_tmp_golden(oracle, fixture_small, tmp_path):
    fix = fixture_small
    ref_out = str(tmp_path / "ref_cmp.txt")
    subprocess.run(
        [
            oracle, "--mode", "compare_tmp",
            "--mut", fix["mut_prefix"],
            "--target_tmp", fix["target"],
            "--reference_tmp", fix["reference"],
            "--chr", fix["chrfile"],
            "--seed", "11",
            "-o", ref_out,
        ],
        check=True, capture_output=True, timeout=300,
    )

    class Args:
        mut = fix["mut_prefix"]
        target_tmp = fix["target"]
        reference_tmp = fix["reference"]
        chr_file = fix["chrfile"]
        seed = 11
        output = str(tmp_path / "our_cmp.txt")

    from colate_tpu.models.compare_tmp import run_compare_tmp

    run_compare_tmp(Args())
    assert filecmp.cmp(ref_out, Args.output, shallow=False), "compare_tmp differs"


@pytest.mark.oracle
def test_count_topo_golden(oracle, fixture_small, tmp_path):
    fix = fixture_small
    # conditional stream: reuse the reference stream generator with a new seed
    cond = str(tmp_path / "cond.colate.in")
    make_stream(cond, fix["chroms"], fix["mut_tables"], seed=777, n_hap=8)
    ref_out = str(tmp_path / "ref_topo.txt")
    subprocess.run(
        [
            oracle, "--mode", "count_topo",
            "--mut", fix["mut_prefix"],
            "--target_tmp", fix["target"],
            "--reference_tmp", fix["reference"],
            "-i", cond,
            "--chr", fix["chrfile"],
            "--seed", "13",
            "-o", ref_out,
        ],
        check=True, capture_output=True, timeout=300,
    )

    class Args:
        mut = fix["mut_prefix"]
        target_tmp = fix["target"]
        reference_tmp = fix["reference"]
        input = cond
        chr_file = fix["chrfile"]
        seed = 13
        output = str(tmp_path / "our_topo.txt")

    from colate_tpu.models.compare_tmp import run_count_topo

    run_count_topo(Args())
    assert filecmp.cmp(ref_out, Args.output, shallow=False), "count_topo differs"


@pytest.fixture(scope="module")
def cond_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("condfix"))
    prefix = os.path.join(root, "trees")
    for i, c in enumerate(["1", "2"]):
        make_anc_mut(prefix, c, N=12, num_trees=19, seed=61 + i)
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("1\n2\n")
    pop = os.path.join(root, "pop.poplabels")
    with open(pop, "w") as fh:
        fh.write("sample population group sex\n")
        for i in range(6):
            fh.write(f"S{i} {'FOC' if i < 2 else 'CON' if i < 4 else 'OTH'} G1 NA\n")
    return dict(prefix=prefix, chrfile=chrfile, pop=pop)


@pytest.mark.oracle
@pytest.mark.parametrize("groups", ["FOC,CON", "FOC,NONEXIST"])
def test_cond_coal_rates_golden(cond_fixture, tmp_path, groups):
    ref_out = str(tmp_path / f"ref_{groups.replace(',', '_')}.txt")
    subprocess.run(
        [
            REF_COLATE, "--mode", "CondCoalRates",
            "-i", cond_fixture["prefix"],
            "--chr", cond_fixture["chrfile"],
            "--poplabels", cond_fixture["pop"],
            "--groups", groups,
            "--bins", "2,6,0.5",
            "--seed", "7",
            "-o", ref_out,
        ],
        check=True, capture_output=True, timeout=300,
    )

    class Args:
        input = cond_fixture["prefix"]
        chr_file = cond_fixture["chrfile"]
        poplabels = cond_fixture["pop"]
        bins = "2,6,0.5"
        years_per_gen = None
        lineage_bin = None
        num_bootstraps = 1
        seed = 7
        mask = None
        mask_cutoff = None
        map = None
        coal = None
        output = str(tmp_path / "our_cond.txt")

    Args.groups = groups
    from colate_tpu.models.cond_coal import run_cond_coal

    run_cond_coal(Args())

    with open(ref_out) as fh:
        ref_lines = fh.read().splitlines()
    with open(Args.output) as fh:
        our_lines = fh.read().splitlines()
    assert ref_lines[0] == our_lines[0]
    assert len(ref_lines) == len(our_lines)
    n_exact = 0
    for r, o in zip(ref_lines[1:], our_lines[1:]):
        rp, op = r.split(), o.split()
        assert rp[:4] == op[:4], (r, o)
        rv, ov = rp[4], op[4]
        if rv in ("nan", "-nan", "inf", "-inf"):
            assert ov in ("nan", "-nan", "inf", "-inf"), (r, o)
        else:
            np.testing.assert_allclose(float(ov), float(rv), rtol=2e-3, err_msg=(r, o))
            n_exact += 1
    assert n_exact > 20
