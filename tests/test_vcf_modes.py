"""Golden tests for the VCF-backed paths: make_tmp --target_bcf (+ mut)."""

import filecmp
import os
import subprocess

import numpy as np
import pytest

from colate_tpu.formats.fasta import write_fasta
from colate_tpu.formats.vcf import read_vcf
from colate_tpu.models.make_tmp_vcf import maketmp_vcf
from helpers.synth import REF_COLATE, make_mut
from helpers.synth_vcf import make_ref_genome, make_vcf_for_mut


@pytest.fixture(scope="module")
def vcf_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vcffix"))
    span = 500_000
    muts = {}
    for i, c in enumerate(["1", "2"]):
        mt = make_mut(
            os.path.join(root, f"synth_chr{c}.mut"), 900, seed=91 + i,
            chrom_span=span, dirty=True,
        )
        muts[c] = mt
        rg = make_ref_genome(span + 10, mt, seed=191 + i)
        write_fasta(os.path.join(root, f"rg_chr{c}.fa"), c, rg)
        make_vcf_for_mut(
            os.path.join(root, f"gts_chr{c}.bcf"), c, mt, rg, seed=291 + i
        )
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("1\n2\n")
    return dict(root=root, chroms=["1", "2"], chrfile=chrfile,
                mut_prefix=os.path.join(root, "synth"),
                vcf_prefix=os.path.join(root, "gts"),
                rg_prefix=os.path.join(root, "rg"), muts=muts)


def test_vcf_text_reader(vcf_fixture):
    vt = read_vcf(vcf_fixture["vcf_prefix"] + "_chr1.bcf")
    assert len(vt) > 200
    assert vt.ploidy == 2
    assert vt.n_samples == 3
    assert np.all(np.diff(vt.pos) > 0)
    assert set(np.unique(vt.gt)) <= {-1, 0, 1, 2}


@pytest.mark.oracle
def test_make_tmp_vcf_golden(oracle, vcf_fixture, tmp_path):
    fix = vcf_fixture
    subprocess.run(
        [
            oracle, "--mode", "make_tmp",
            "--mut", fix["mut_prefix"],
            "--target_bcf", fix["vcf_prefix"],
            "--ref_genome", fix["rg_prefix"],
            "--chr", fix["chrfile"],
            "-o", str(tmp_path / "ref_made"),
        ],
        check=True, capture_output=True, timeout=300,
    )
    n = maketmp_vcf(
        fix["chroms"],
        [f"{fix['mut_prefix']}_chr{c}.mut" for c in fix["chroms"]],
        [f"{fix['vcf_prefix']}_chr{c}.bcf" for c in fix["chroms"]],
        None,
        [f"{fix['rg_prefix']}_chr{c}.fa" for c in fix["chroms"]],
        str(tmp_path / "our_made.colate.in"),
    )
    assert n > 300
    assert filecmp.cmp(
        str(tmp_path / "ref_made.colate.in"),
        str(tmp_path / "our_made.colate.in"),
        shallow=False,
    ), "make_tmp vcf .colate.in differs"


@pytest.mark.oracle
@pytest.mark.parametrize("with_genome", [False, True])
def test_mut_vcfvcf_golden(oracle, vcf_fixture, tmp_path, with_genome):
    """mode mut directly from target+reference BCFs (parse_vcfvcf)."""
    from colate_tpu.config import MutRunConfig
    from colate_tpu.formats.coal import CoalFile
    from colate_tpu.models.mut_em import run_mut_and_write

    fix = vcf_fixture
    for c in fix["chroms"]:
        make_vcf_for_mut(
            str(tmp_path / f"rbcf_chr{c}.bcf"), c, fix["muts"][c],
            "", seed=491 + int(c), n_samples=8,
        )
    cmd = [
        oracle, "--mode", "mut",
        "--mut", fix["mut_prefix"],
        "--target_bcf", fix["vcf_prefix"],
        "--reference_bcf", str(tmp_path / "rbcf"),
        "--chr", fix["chrfile"],
        "--bins", "3,7,0.2",
        "--seed", "17",
        "-o", str(tmp_path / "ref_out"),
    ]
    if with_genome:
        cmd += ["--ref_genome", fix["rg_prefix"]]
    subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    cfg = MutRunConfig(
        mut=fix["mut_prefix"],
        output=str(tmp_path / "our_out"),
        chr_list=fix["chroms"],
        target_bcf=fix["vcf_prefix"],
        reference_bcf=str(tmp_path / "rbcf"),
        ref_genome=fix["rg_prefix"] if with_genome else None,
        bins="3,7,0.2",
        seed=17,
        sampling="mc_parity",
    )
    run_mut_and_write(cfg)
    ref = CoalFile.read(str(tmp_path / "ref_out.coal"))
    ours = CoalFile.read(str(tmp_path / "our_out.coal"))
    np.testing.assert_allclose(ours.rates, ref.rates, rtol=1e-5, atol=1e-12)
    # the cached sufficient-statistic matrices must match too
    with open(tmp_path / "ref_out.colate_mat") as fh:
        ref_mat = fh.read()
    with open(tmp_path / "our_out.colate_mat") as fh:
        our_mat = fh.read()
    assert our_mat == ref_mat


@pytest.mark.oracle
@pytest.mark.parametrize("with_genome", [False, True])
def test_mut_vcf_split_golden(oracle, vcf_fixture, tmp_path, with_genome):
    """mode mut from ONE BCF with random haplotype half-split (parse_vcf)."""
    from colate_tpu.config import MutRunConfig
    from colate_tpu.formats.coal import CoalFile
    from colate_tpu.models.mut_em import run_mut_and_write

    fix = vcf_fixture
    cmd = [
        oracle, "--mode", "mut",
        "--mut", fix["mut_prefix"],
        "--target_bcf", fix["vcf_prefix"],
        "--chr", fix["chrfile"],
        "--bins", "3,7,0.2",
        "--seed", "29",
        "-o", str(tmp_path / "ref_out"),
    ]
    if with_genome:
        cmd += ["--ref_genome", fix["rg_prefix"]]
    subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    cfg = MutRunConfig(
        mut=fix["mut_prefix"],
        output=str(tmp_path / "our_out"),
        chr_list=fix["chroms"],
        target_bcf=fix["vcf_prefix"],
        ref_genome=fix["rg_prefix"] if with_genome else None,
        bins="3,7,0.2",
        seed=29,
        sampling="mc_parity",
    )
    run_mut_and_write(cfg)
    ref = CoalFile.read(str(tmp_path / "ref_out.coal"))
    ours = CoalFile.read(str(tmp_path / "our_out.coal"))
    np.testing.assert_allclose(ours.rates, ref.rates, rtol=1e-5, atol=1e-12)
    with open(tmp_path / "ref_out.colate_mat") as fh:
        ref_mat = fh.read()
    with open(tmp_path / "our_out.colate_mat") as fh:
        our_mat = fh.read()
    assert our_mat == ref_mat


@pytest.mark.oracle
def test_preprocess_mut_golden(oracle, tmp_path):
    from types import SimpleNamespace

    from colate_tpu.models.preprocess_mut import run_preprocess_mut
    from helpers.synth_anc import make_anc_mut
    from helpers.synth_vcf import make_vcf_for_preprocess

    root = str(tmp_path)
    g = np.random.default_rng(7)
    _, mt = make_anc_mut(
        os.path.join(root, "pp"), "1", N=10, num_trees=25,
        snps_per_tree=30, seed=77, skip_trees=(0, 3),
    )
    # oracle asserts DAF==1 when a copied seg row has age_begin==0 → keep >0
    n = len(mt)
    mt.age_begin = g.uniform(1.0, 50.0, n)
    mt.age_end = np.full(n, 100.0)
    mt.write(os.path.join(root, "pp_chr1.mut"))

    span = int(mt.pos[-1]) + 50
    ref_g = "".join(g.choice(list("ACGT"), size=span))
    anc_list = list(ref_g)
    for i in np.nonzero(g.random(span) < 0.01)[0]:
        anc_list[i] = [b for b in "ACGT" if b != ref_g[i]][int(g.integers(0, 3))]
    anc_g = "".join(anc_list)
    mask = "".join(np.where(g.random(span) < 0.1, "N", "P"))
    write_fasta(os.path.join(root, "rg.fa"), "1", ref_g)
    write_fasta(os.path.join(root, "ag.fa"), "1", anc_g)
    write_fasta(os.path.join(root, "mask.fa"), "1", mask)
    make_vcf_for_preprocess(
        os.path.join(root, "ref.bcf"), "1", mt, ref_g, anc_g, seed=177
    )
    subprocess.run(
        [
            oracle, "--mode", "preprocess_mut",
            "--anc", os.path.join(root, "pp_chr1.anc"),
            "--mut", os.path.join(root, "pp_chr1.mut"),
            "--reference_bcf", os.path.join(root, "ref.bcf"),
            "--ref_genome", os.path.join(root, "rg.fa"),
            "--anc_genome", os.path.join(root, "ag.fa"),
            "--mask", os.path.join(root, "mask.fa"),
            "-o", os.path.join(root, "ref_out.mut"),
        ],
        check=True, capture_output=True, timeout=300,
    )
    args = SimpleNamespace(
        anc=os.path.join(root, "pp_chr1.anc"),
        mut=os.path.join(root, "pp_chr1.mut"),
        reference_bcf=os.path.join(root, "ref.bcf"),
        ref_genome=os.path.join(root, "rg.fa"),
        anc_genome=os.path.join(root, "ag.fa"),
        mask=os.path.join(root, "mask.fa"),
        output=os.path.join(root, "our_out.mut"),
        years_per_gen=None,
        outgroup_tmrca=None,
    )
    assert run_preprocess_mut(args) == 0
    with open(os.path.join(root, "ref_out.mut")) as fh:
        ref_lines = fh.read().splitlines()
    with open(os.path.join(root, "our_out.mut")) as fh:
        our_lines = fh.read().splitlines()
    assert len(our_lines) > 100
    assert our_lines == ref_lines


@pytest.mark.oracle
def test_make_tmp_vcf_then_mut_golden(oracle, vcf_fixture, tmp_path):
    """Full README flow: make_tmp from BCF for target+reference, then mut."""
    from colate_tpu.config import MutRunConfig
    from colate_tpu.formats.coal import CoalFile
    from colate_tpu.models.mut_em import run_mut_and_write
    from helpers.synth_vcf import make_vcf_for_mut

    fix = vcf_fixture
    # second genome set as "reference"
    for c in fix["chroms"]:
        make_vcf_for_mut(
            str(tmp_path / f"ref_gts_chr{c}.bcf"), c, fix["muts"][c],
            "", seed=391 + int(c), n_samples=8,
        )
    for tag, prefix in [("t", fix["vcf_prefix"]), ("r", str(tmp_path / "ref_gts"))]:
        subprocess.run(
            [
                oracle, "--mode", "make_tmp",
                "--mut", fix["mut_prefix"],
                "--target_bcf", prefix,
                "--ref_genome", fix["rg_prefix"],
                "--chr", fix["chrfile"],
                "-o", str(tmp_path / f"{tag}_made"),
            ],
            check=True, capture_output=True, timeout=300,
        )
    subprocess.run(
        [
            oracle, "--mode", "mut",
            "--mut", fix["mut_prefix"],
            "--target_tmp", str(tmp_path / "t_made.colate.in"),
            "--reference_tmp", str(tmp_path / "r_made.colate.in"),
            "--chr", fix["chrfile"],
            "--bins", "3,7,0.2",
            "--seed", "5",
            "-o", str(tmp_path / "ref_out"),
        ],
        check=True, capture_output=True, timeout=600,
    )
    cfg = MutRunConfig(
        mut=fix["mut_prefix"],
        output=str(tmp_path / "our_out"),
        chr_list=fix["chroms"],
        target_tmp=str(tmp_path / "t_made.colate.in"),
        reference_tmp=str(tmp_path / "r_made.colate.in"),
        bins="3,7,0.2",
        seed=5,
        sampling="mc_parity",
    )
    run_mut_and_write(cfg)
    ref = CoalFile.read(str(tmp_path / "ref_out.coal"))
    ours = CoalFile.read(str(tmp_path / "our_out.coal"))
    np.testing.assert_allclose(ours.rates, ref.rates, rtol=1e-5, atol=1e-12)


def test_bcf2_decoders_equivalent(vcf_fixture, tmp_path):
    """Binary BCF2: streaming native decoder == pure-Python _parse_bcf ==
    the text-VCF parse of the same records."""
    from helpers.synth_bcf import vcf_text_to_bcf2

    from colate_tpu.formats.vcf import _parse_bcf, _read_bcf_native, _read_raw

    fix = vcf_fixture
    src = fix["vcf_prefix"] + "_chr1.bcf"  # text VCF
    bcf = str(tmp_path / "bin_chr1.bcf")
    vcf_text_to_bcf2(src, bcf)
    truth = read_vcf(src)
    py = _parse_bcf(_read_raw(bcf))
    nat = _read_bcf_native(bcf)
    for table in ([py, nat] if nat is not None else [py]):
        np.testing.assert_array_equal(truth.pos, table.pos)
        np.testing.assert_array_equal(truth.n_allele, table.n_allele)
        np.testing.assert_array_equal(truth.gt, table.gt)
        assert list(truth.chrom) == list(table.chrom)
        assert list(truth.ref) == list(table.ref)
        assert list(truth.alt) == list(table.alt)
        assert (truth.n_samples, truth.ploidy) == (table.n_samples, table.ploidy)


@pytest.mark.oracle
def test_make_tmp_bcf2_golden(oracle, vcf_fixture, tmp_path):
    """make_tmp from real binary BCF2: htslib inside the oracle and our
    streaming native decoder must produce byte-identical .colate.in."""
    from helpers.synth_bcf import vcf_text_to_bcf2

    fix = vcf_fixture
    for c in fix["chroms"]:
        vcf_text_to_bcf2(
            f"{fix['vcf_prefix']}_chr{c}.bcf", str(tmp_path / f"b_chr{c}.bcf")
        )
    subprocess.run(
        [
            oracle, "--mode", "make_tmp",
            "--mut", fix["mut_prefix"],
            "--target_bcf", str(tmp_path / "b"),
            "--ref_genome", fix["rg_prefix"],
            "--chr", fix["chrfile"],
            "-o", str(tmp_path / "ref_made"),
        ],
        check=True, capture_output=True, timeout=300,
    )
    n = maketmp_vcf(
        fix["chroms"],
        [f"{fix['mut_prefix']}_chr{c}.mut" for c in fix["chroms"]],
        [str(tmp_path / f"b_chr{c}.bcf") for c in fix["chroms"]],
        None,
        [f"{fix['rg_prefix']}_chr{c}.fa" for c in fix["chroms"]],
        str(tmp_path / "our_made.colate.in"),
    )
    assert n > 300
    assert filecmp.cmp(
        str(tmp_path / "ref_made.colate.in"),
        str(tmp_path / "our_made.colate.in"),
        shallow=False,
    ), "make_tmp bcf2 .colate.in differs"
