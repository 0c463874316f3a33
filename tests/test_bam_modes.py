"""Golden tests vs the reference oracle for the BAM pileup paths:
make_tmp --target_bam (± mask, ± strandfilter), calc_depth, get_deam."""

import filecmp
import os
import subprocess
from types import SimpleNamespace

import numpy as np
import pytest

from colate_tpu.formats.fasta import write_fasta
from colate_tpu.models.make_tmp_bam import maketmp_bam
from helpers.synth import make_mut
from helpers.synth_bam import make_bam


@pytest.fixture(scope="module")
def bam_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bamfix"))
    g = np.random.default_rng(31)
    span = 30_000
    contigs = {}
    for i, c in enumerate(["1", "2"]):
        make_mut(
            os.path.join(root, f"synth_chr{c}.mut"), 600, seed=41 + i,
            chrom_span=span, dirty=True,
        )
        ref = "".join(g.choice(list("ACGT"), size=span + 10))
        contigs[c] = ref
        write_fasta(os.path.join(root, f"rg_chr{c}.fa"), c, ref)
        # anc genome: ref with ~2% diffs (for strandfilter)
        anc = list(ref)
        for j in np.nonzero(g.random(len(ref)) < 0.02)[0]:
            anc[j] = [b for b in "ACGT" if b != ref[j]][int(g.integers(0, 3))]
        write_fasta(os.path.join(root, f"ag_chr{c}.fa"), c, "".join(anc))
        mask = "".join(np.where(g.random(span + 10) < 0.1, "N", "P"))
        write_fasta(os.path.join(root, f"mask_chr{c}.fa"), c, mask)
    # trailing contig NOT in chr.txt exercises the contig-change break
    contigs["9"] = "".join(g.choice(list("ACGT"), size=2000))
    make_bam(os.path.join(root, "reads.bam"), contigs, seed=131,
             reads_per_contig=2500)
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("1\n2\n")
    return dict(root=root, chroms=["1", "2"], chrfile=chrfile,
                bam=os.path.join(root, "reads.bam"),
                mut_prefix=os.path.join(root, "synth"),
                rg_prefix=os.path.join(root, "rg"),
                ag_prefix=os.path.join(root, "ag"),
                mask_prefix=os.path.join(root, "mask"))


def _run_ours_make_tmp(fix, out, mask=False, strand=False):
    cs = fix["chroms"]
    return maketmp_bam(
        cs,
        [f"{fix['mut_prefix']}_chr{c}.mut" for c in cs],
        fix["bam"],
        [f"{fix['mask_prefix']}_chr{c}.fa" for c in cs] if mask else None,
        [f"{fix['rg_prefix']}_chr{c}.fa" for c in cs],
        [f"{fix['ag_prefix']}_chr{c}.fa" for c in cs] if strand else None,
        out,
        strandfilter=strand,
    )


@pytest.mark.oracle
@pytest.mark.parametrize("variant", ["plain", "mask", "strand"])
def test_make_tmp_bam_golden(oracle, bam_fixture, tmp_path, variant):
    fix = bam_fixture
    cmd = [
        oracle, "--mode", "make_tmp",
        "--mut", fix["mut_prefix"],
        "--target_bam", fix["bam"],
        "--ref_genome", fix["rg_prefix"],
        "--chr", fix["chrfile"],
        "-o", str(tmp_path / "ref_made"),
    ]
    if variant == "mask":
        cmd += ["--target_mask", fix["mask_prefix"]]
    if variant == "strand":
        cmd += ["--strandfilter", "1", "--anc_genome", fix["ag_prefix"]]
    subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    n = _run_ours_make_tmp(
        fix, str(tmp_path / "our_made.colate.in"),
        mask=(variant == "mask"), strand=(variant == "strand"),
    )
    assert n > 100
    assert filecmp.cmp(
        str(tmp_path / "ref_made.colate.in"),
        str(tmp_path / "our_made.colate.in"),
        shallow=False,
    ), f"make_tmp bam ({variant}) .colate.in differs"


@pytest.mark.oracle
def test_calc_depth_golden(oracle, bam_fixture, tmp_path):
    from colate_tpu.models.bam_stats import run_calc_depth

    fix = bam_fixture
    subprocess.run(
        [
            oracle, "--mode", "calc_depth",
            "--target_bam", fix["bam"],
            "--ref_genome", fix["rg_prefix"],
            "--chr", fix["chrfile"],
            "-o", str(tmp_path / "ref_depth"),
        ],
        check=True, capture_output=True, timeout=600,
    )
    args = SimpleNamespace(
        target_bam=fix["bam"], ref_genome=fix["rg_prefix"],
        chr_file=fix["chrfile"], output=str(tmp_path / "our_depth"),
        filters="20,30,10",
    )
    assert run_calc_depth(args) == 0
    ref_vals = [float(x) for x in open(tmp_path / "ref_depth").read().split()]
    our_vals = [float(x) for x in open(tmp_path / "our_depth").read().split()]
    np.testing.assert_allclose(our_vals, ref_vals, rtol=2e-6)
    assert ref_vals[0] > 1.0  # sanity: fixture has real coverage


@pytest.mark.oracle
def test_get_deam_golden(oracle, bam_fixture, tmp_path):
    from colate_tpu.models.bam_stats import run_get_deam

    fix = bam_fixture
    subprocess.run(
        [
            oracle, "--mode", "get_deam",
            "--target_bam", fix["bam"],
            "--ref_genome", fix["rg_prefix"],
            "--chr", fix["chrfile"],
            "-o", str(tmp_path / "ref_deam"),
        ],
        check=True, capture_output=True, timeout=600,
    )
    args = SimpleNamespace(
        target_bam=fix["bam"], ref_genome=fix["rg_prefix"],
        chr_file=fix["chrfile"], output=str(tmp_path / "our_deam"),
        filters="20,30,10",
    )
    assert run_get_deam(args) == 0
    ref_txt = open(tmp_path / "ref_deam").read()
    assert open(tmp_path / "our_deam").read() == ref_txt
    # sanity: deamination signal present
    assert sum(int(ln.split()[3]) for ln in ref_txt.splitlines()[1:]) > 50
