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


def _split_bam_per_contig(fix, out_prefix):
    """Rewrite the multi-contig fixture BAM as one BAM per listed
    chromosome (the parse_bamvcf layout, <prefix>_chr<name>.bam)."""
    from colate_tpu.formats.bam import read_bam
    from colate_tpu.formats.fasta import read_fasta
    from helpers.synth_bam import write_bam

    rec = read_bam(fix["target_bam"])
    for c in fix["chroms"]:
        ln = len(read_fasta(f"{fix['rg_prefix']}_chr{c}.fa"))
        sel = [i for i in range(len(rec)) if rec.contig[i] == c]
        write_bam(
            f"{out_prefix}_chr{c}.bam",
            {c: ln},
            [
                (int(rec.flag[i]), 0, int(rec.pos[i]), int(rec.mapq[i]),
                 rec.seq[i], rec.qual[i])
                for i in sel
            ],
        )


def test_bamvcf_split_equals_onebamvcf(mutbam_fixture, tmp_path):
    """join_bamvcf (parse_bamvcf, coal.cpp:1229-1510 — dead code behind
    the reference CLI) on a per-contig split of the BAM must produce the
    same sufficient statistics as join_onebamvcf on the combined BAM:
    the two reference functions share their per-site math verbatim."""
    from colate_tpu.pipeline.join_bam import join_bamvcf, join_onebamvcf

    fix = mutbam_fixture
    prefix = str(tmp_path / "split")
    _split_bam_per_contig(fix, prefix)
    chroms = fix["chroms"]
    mut_files = [f"{fix['mut_prefix']}_chr{c}.mut" for c in chroms]
    bcf_files = [f"{fix['rbcf_prefix']}_chr{c}.bcf" for c in chroms]
    rg_files = [f"{fix['rg_prefix']}_chr{c}.fa" for c in chroms]
    mask_files = [f"{fix['mask_prefix']}_chr{c}.fa" for c in chroms]

    one = join_onebamvcf(chroms, mut_files, fix["target_bam"], bcf_files,
                         mask_files, None, rg_files)
    per = join_bamvcf(chroms, mut_files,
                      [f"{prefix}_chr{c}.bam" for c in chroms],
                      bcf_files, mask_files, None, rg_files)
    assert len(per) == len(one) > 0
    assert per.num_blocks == one.num_blocks
    np.testing.assert_array_equal(per.block_id, one.block_id)
    np.testing.assert_array_equal(per.age_begin, one.age_begin)
    np.testing.assert_array_equal(per.age_end, one.age_end)
    np.testing.assert_array_equal(per.w_shared, one.w_shared)
    np.testing.assert_array_equal(per.w_notshared, one.w_notshared)


def test_mut_per_chr_bam_end_to_end(mutbam_fixture, tmp_path):
    """--per_chr_bam end-to-end: identical .coal to the one-BAM path
    (analytic sampling is deterministic given equal suffstats)."""
    fix = mutbam_fixture
    prefix = str(tmp_path / "split")
    _split_bam_per_contig(fix, prefix)
    base = dict(
        mut=fix["mut_prefix"],
        chr_list=fix["chroms"],
        reference_bcf=fix["rbcf_prefix"],
        ref_genome=fix["rg_prefix"],
        bins="3,7,0.2",
        seed=11,
        sampling="analytic",
    )
    run_mut_and_write(MutRunConfig(
        output=str(tmp_path / "one"),
        target_bam=fix["target_bam"][:-4],
        **base,
    ))
    run_mut_and_write(MutRunConfig(
        output=str(tmp_path / "per"),
        target_bam=prefix,
        per_chr_bam=True,
        **base,
    ))
    with open(tmp_path / "one.coal") as fh:
        one = fh.read()
    with open(tmp_path / "per.coal") as fh:
        per = fh.read()
    assert per == one
