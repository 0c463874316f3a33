"""Golden tests for mode mut's BAM front-ends:
--target_bam + --reference_bcf (parse_onebamvcf) and
--target_bam + --reference_bam (parse_onebambam)."""

import os
import subprocess

import numpy as np
import pytest

from colate_tpu.config import MutRunConfig
from colate_tpu.formats.coal import CoalFile
from colate_tpu.formats.fasta import write_fasta
from colate_tpu.models.mut_em import run_mut_and_write
from helpers.synth import make_mut
from helpers.synth_bam import make_bam
from helpers.synth_vcf import make_ref_genome, make_vcf_for_mut


@pytest.fixture(scope="module")
def mutbam_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mutbam"))
    g = np.random.default_rng(77)
    span = 40_000
    contigs = {}
    for i, c in enumerate(["1", "2"]):
        mt = make_mut(
            os.path.join(root, f"synth_chr{c}.mut"), 800, seed=61 + i,
            chrom_span=span, dirty=True,
        )
        rg = make_ref_genome(span + 10, mt, seed=161 + i)
        contigs[c] = rg
        write_fasta(os.path.join(root, f"rg_chr{c}.fa"), c, rg)
        # reference BCF covering most sites (ensures the oracle's stale-
        # N_ref absent-site fallback only fires after N_ref is defined)
        make_vcf_for_mut(
            os.path.join(root, f"rbcf_chr{c}.bcf"), c, mt, rg,
            seed=261 + i, n_samples=6, p_present=0.8, present_head=20,
        )
        mask = "".join(np.where(g.random(span + 10) < 0.12, "N", "P"))
        write_fasta(os.path.join(root, f"mask_chr{c}.fa"), c, mask)
    contigs["9"] = "".join(g.choice(list("ACGT"), size=2000))
    make_bam(os.path.join(root, "target.bam"), contigs, seed=171,
             reads_per_contig=6000)
    make_bam(os.path.join(root, "refreads.bam"), contigs, seed=271,
             reads_per_contig=6000)
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("1\n2\n")
    return dict(root=root, chroms=["1", "2"], chrfile=chrfile,
                target_bam=os.path.join(root, "target.bam"),
                ref_bam=os.path.join(root, "refreads.bam"),
                mut_prefix=os.path.join(root, "synth"),
                rbcf_prefix=os.path.join(root, "rbcf"),
                rg_prefix=os.path.join(root, "rg"),
                mask_prefix=os.path.join(root, "mask"))


def _compare(tmp_path):
    ref = CoalFile.read(str(tmp_path / "ref_out.coal"))
    ours = CoalFile.read(str(tmp_path / "our_out.coal"))
    # the .colate_mat check below is bit-exact; rates only to EM-rounding
    # tolerance (reimplemented E-step algebra drifts ~1e-5 over 1e3 iters)
    np.testing.assert_allclose(ours.rates, ref.rates, rtol=1e-4, atol=1e-12)
    with open(tmp_path / "ref_out.colate_mat") as fh:
        ref_mat = fh.read()
    with open(tmp_path / "our_out.colate_mat") as fh:
        our_mat = fh.read()
    assert our_mat == ref_mat


@pytest.mark.oracle
@pytest.mark.parametrize("masked", [False, True])
def test_mut_onebamvcf_golden(oracle, mutbam_fixture, tmp_path, masked):
    fix = mutbam_fixture
    # the oracle appends ".bam" to --target_bam in this path (coal.cpp:3228)
    bam_prefix = fix["target_bam"][:-4]
    cmd = [
        oracle, "--mode", "mut",
        "--mut", fix["mut_prefix"],
        "--target_bam", bam_prefix,
        "--reference_bcf", fix["rbcf_prefix"],
        "--ref_genome", fix["rg_prefix"],
        "--chr", fix["chrfile"],
        "--bins", "3,7,0.2",
        "--seed", "43",
        "-o", str(tmp_path / "ref_out"),
    ]
    if masked:
        cmd += ["--target_mask", fix["mask_prefix"]]
    subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    cfg = MutRunConfig(
        mut=fix["mut_prefix"],
        output=str(tmp_path / "our_out"),
        chr_list=fix["chroms"],
        target_bam=bam_prefix,
        reference_bcf=fix["rbcf_prefix"],
        ref_genome=fix["rg_prefix"],
        target_mask=fix["mask_prefix"] if masked else None,
        bins="3,7,0.2",
        seed=43,
        sampling="mc_parity",
    )
    run_mut_and_write(cfg)
    _compare(tmp_path)


@pytest.mark.oracle
def test_mut_onebambam_golden(oracle, mutbam_fixture, tmp_path):
    fix = mutbam_fixture
    cmd = [
        oracle, "--mode", "mut",
        "--mut", fix["mut_prefix"],
        "--target_bam", fix["target_bam"],  # used as-is (coal.cpp:3262)
        "--reference_bam", fix["ref_bam"],
        "--ref_genome", fix["rg_prefix"],
        "--chr", fix["chrfile"],
        "--bins", "3,7,0.2",
        "--seed", "47",
        "-o", str(tmp_path / "ref_out"),
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    cfg = MutRunConfig(
        mut=fix["mut_prefix"],
        output=str(tmp_path / "our_out"),
        chr_list=fix["chroms"],
        target_bam=fix["target_bam"],
        reference_bam=fix["ref_bam"],
        ref_genome=fix["rg_prefix"],
        bins="3,7,0.2",
        seed=47,
        sampling="mc_parity",
    )
    run_mut_and_write(cfg)
    _compare(tmp_path)
