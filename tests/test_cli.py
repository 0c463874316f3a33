"""CLI flag-plumbing tests (VERDICT r4 weak #4).

Every mode family runs once through ``cli.main([...])`` — the product's
public surface (reference contract: Colate.cpp:6-116, CoalRate.cpp:6-58)
— and the output is byte-compared against the direct model invocation
with the equivalent config.  The direct paths are oracle-gated in their
own golden tests, so byte-equality here transitively pins the CLI to the
reference binary; what THESE tests catch is a flag-mapping typo in
cli._build_parser/_dispatch (e.g. --seed not reaching MutRunConfig.seed).
"""

import filecmp
import os
from types import SimpleNamespace

import numpy as np
import pytest

from colate_tpu import cli


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    from helpers.synth import make_fixture

    root = tmp_path_factory.mktemp("clifix")
    return make_fixture(str(root), n_per_chrom=800, seed=31)


@pytest.fixture(scope="module")
def tree_fix(tmp_path_factory):
    from helpers.synth_anc import make_anc_mut

    root = str(tmp_path_factory.mktemp("clitree"))
    prefix = os.path.join(root, "trees")
    make_anc_mut(prefix, "1", N=12, num_trees=25, seed=71)
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("1\n")
    pop = os.path.join(root, "pop.poplabels")
    with open(pop, "w") as fh:
        fh.write("sample population group sex\n")
        for i in range(6):
            fh.write(f"S{i} {'FOC' if i < 2 else 'CON' if i < 4 else 'OTH'} G1 NA\n")
    return dict(prefix=prefix, chrfile=chrfile, pop=pop, root=root)


def _mut_cfg(fix, out, **kw):
    from colate_tpu.config import MutRunConfig

    base = dict(
        mut=fix["mut_prefix"], output=out, chr_list=fix["chroms"],
        target_tmp=fix["target"], reference_tmp=fix["reference"],
        bins="3,7,0.5", seed=5, num_bootstrap=3,
    )
    base.update(kw)
    return MutRunConfig(**base)


def test_mut_cli_matches_direct(fix, tmp_path):
    from colate_tpu.models.mut_em import run_mut_and_write

    out_cli = str(tmp_path / "cli")
    rc = cli.main([
        "--mode", "mut", "--mut", fix["mut_prefix"],
        "--target_tmp", fix["target"], "--reference_tmp", fix["reference"],
        "--chr", fix["chrfile"], "--bins", "3,7,0.5", "--seed", "5",
        "--num_bootstraps", "3", "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct")
    run_mut_and_write(_mut_cfg(fix, out_dir))
    assert filecmp.cmp(out_cli + ".coal", out_dir + ".coal", shallow=False)


def test_mut_cli_mc_parity_flag(fix, tmp_path):
    from colate_tpu.models.mut_em import run_mut_and_write

    out_cli = str(tmp_path / "cli")
    rc = cli.main([
        "--mode", "mut", "--mut", fix["mut_prefix"],
        "--target_tmp", fix["target"], "--reference_tmp", fix["reference"],
        "--chr", fix["chrfile"], "--bins", "3,7,0.5", "--seed", "5",
        "--num_bootstraps", "2", "--sampling", "mc_parity", "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct")
    run_mut_and_write(
        _mut_cfg(fix, out_dir, sampling="mc_parity", num_bootstrap=2)
    )
    assert filecmp.cmp(out_cli + ".coal", out_dir + ".coal", shallow=False)


def test_mut_cli_devices_and_binning(fix, tmp_path):
    """--devices 1 --binning sharded: the mesh path from the CLI."""
    from colate_tpu.models.mut_em import run_mut_and_write

    out_cli = str(tmp_path / "cli")
    rc = cli.main([
        "--mode", "mut", "--mut", fix["mut_prefix"],
        "--target_tmp", fix["target"], "--reference_tmp", fix["reference"],
        "--chr", fix["chrfile"], "--bins", "3,7,0.5", "--seed", "5",
        "--num_bootstraps", "3", "--devices", "1", "--binning", "sharded",
        "--em_dtype", "float64", "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct")
    run_mut_and_write(
        _mut_cfg(fix, out_dir, devices=1, binning="sharded",
                 em_dtype="float64")
    )
    assert filecmp.cmp(out_cli + ".coal", out_dir + ".coal", shallow=False)


def test_mut_cli_coal_initfile(fix, tmp_path):
    """--coal supplies the epoch grid + initial rates (coal.cpp:3508-3549)."""
    from colate_tpu.models.mut_em import run_mut_and_write

    # first run produces a .coal usable as the init file
    seed_out = str(tmp_path / "seedrun")
    run_mut_and_write(_mut_cfg(fix, seed_out, num_bootstrap=1))
    out_cli = str(tmp_path / "cli")
    rc = cli.main([
        "--mode", "mut", "--mut", fix["mut_prefix"],
        "--target_tmp", fix["target"], "--reference_tmp", fix["reference"],
        "--chr", fix["chrfile"], "--coal", seed_out + ".coal",
        "--seed", "5", "--num_bootstraps", "2", "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct")
    run_mut_and_write(
        _mut_cfg(fix, out_dir, num_bootstrap=2, bins=None,
                 coal=seed_out + ".coal")
    )
    assert filecmp.cmp(out_cli + ".coal", out_dir + ".coal", shallow=False)


def test_print_tmp_cli(fix, tmp_path):
    from colate_tpu.models.print_tmp import run_print_tmp

    out_cli = str(tmp_path / "cli.txt")
    rc = cli.main([
        "--mode", "print_tmp", "--mut", fix["mut_prefix"],
        "--target_tmp", fix["target"], "--chr", fix["chrfile"],
        "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct.txt")
    run_print_tmp(SimpleNamespace(
        mut=fix["mut_prefix"], target_tmp=fix["target"],
        chr_file=fix["chrfile"], output=out_dir,
    ))
    assert filecmp.cmp(out_cli, out_dir, shallow=False)


def test_compare_tmp_cli(fix, tmp_path):
    from colate_tpu.models.compare_tmp import run_compare_tmp

    out_cli = str(tmp_path / "cli.txt")
    rc = cli.main([
        "--mode", "compare_tmp", "--mut", fix["mut_prefix"],
        "--target_tmp", fix["target"], "--reference_tmp", fix["reference"],
        "--chr", fix["chrfile"], "--seed", "11", "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct.txt")
    run_compare_tmp(SimpleNamespace(
        mut=fix["mut_prefix"], target_tmp=fix["target"],
        reference_tmp=fix["reference"], chr_file=fix["chrfile"], seed=11,
        output=out_dir,
    ))
    assert filecmp.cmp(out_cli, out_dir, shallow=False)


def test_count_topo_cli(fix, tmp_path):
    from helpers.synth import make_stream

    from colate_tpu.models.compare_tmp import run_count_topo

    cond = str(tmp_path / "cond.colate.in")
    make_stream(cond, fix["chroms"], fix["mut_tables"], seed=777, n_hap=8)
    out_cli = str(tmp_path / "cli.txt")
    rc = cli.main([
        "--mode", "count_topo", "--mut", fix["mut_prefix"],
        "--target_tmp", fix["target"], "--reference_tmp", fix["reference"],
        "-i", cond, "--chr", fix["chrfile"], "--seed", "13", "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct.txt")
    run_count_topo(SimpleNamespace(
        mut=fix["mut_prefix"], target_tmp=fix["target"],
        reference_tmp=fix["reference"], input=cond,
        chr_file=fix["chrfile"], seed=13, output=out_dir,
    ))
    assert filecmp.cmp(out_cli, out_dir, shallow=False)


def test_make_tmp_table_cli(fix, tmp_path):
    from helpers.synth import make_table

    from colate_tpu.formats.fasta import write_fasta
    from colate_tpu.models.make_tmp import run_make_tmp

    table = str(tmp_path / "reads.table")
    make_table(table, fix["chroms"], fix["mut_tables"], seed=5)
    rg = str(tmp_path / "rg")
    for c in fix["chroms"]:
        write_fasta(f"{rg}_chr{c}.fa", c, "ACGT")
    out_cli = str(tmp_path / "cli")
    rc = cli.main([
        "--mode", "make_tmp", "--mut", fix["mut_prefix"],
        "--target_table", table, "--ref_genome", rg,
        "--chr", fix["chrfile"], "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct")
    run_make_tmp(SimpleNamespace(
        mut=fix["mut_prefix"], target_table=table, target_bcf=None,
        target_bam=None, target_mask=None, ref_genome=rg, anc_genome=None,
        chr_file=fix["chrfile"], filters="20,30,10", strandfilter=False,
        output=out_dir,
    ))
    assert filecmp.cmp(
        out_cli + ".colate.in", out_dir + ".colate.in", shallow=False
    )


def test_tree_mode_cli(tree_fix, tmp_path):
    from colate_tpu.models.tree_coal import run_tree_mode

    out_cli = str(tmp_path / "cli")
    rc = cli.main([
        "--mode", "tree", "-i", tree_fix["prefix"],
        "--chr", tree_fix["chrfile"], "--bins", "2,6,0.5", "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct")
    run_tree_mode(SimpleNamespace(
        input=tree_fix["prefix"], chr_file=tree_fix["chrfile"],
        bins="2,6,0.5", years_per_gen=None, num_bootstraps=1, coal=None,
        dist=None, output=out_dir,
    ))
    assert filecmp.cmp(out_cli + ".coal", out_dir + ".coal", shallow=False)


def test_local_ancestry_cli(tree_fix, tmp_path):
    from colate_tpu.models.local_ancestry import run_local_ancestry

    out_cli = str(tmp_path / "cli")
    rc = cli.main([
        "--mode", "local_ancestry", "-i", tree_fix["prefix"],
        "--chr", tree_fix["chrfile"], "--poplabels", tree_fix["pop"],
        "--bins", "2,6,0.5", "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct")
    run_local_ancestry(SimpleNamespace(
        input=tree_fix["prefix"], chr_file=tree_fix["chrfile"],
        poplabels=tree_fix["pop"], bins="2,6,0.5", years_per_gen=None,
        num_bootstraps=1, coal=None, output=out_dir,
    ))
    assert filecmp.cmp(out_cli + ".coal", out_dir + ".coal", shallow=False)


def test_cond_coal_cli(tree_fix, tmp_path):
    from colate_tpu.models.cond_coal import run_cond_coal

    out_cli = str(tmp_path / "cli.txt")
    rc = cli.main([
        "--mode", "CondCoalRates", "-i", tree_fix["prefix"],
        "--chr", tree_fix["chrfile"], "--poplabels", tree_fix["pop"],
        "--groups", "FOC,CON", "--bins", "2,6,0.5", "--seed", "7",
        "--num_bootstraps", "2", "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct.txt")
    run_cond_coal(SimpleNamespace(
        input=tree_fix["prefix"], chr_file=tree_fix["chrfile"],
        poplabels=tree_fix["pop"], groups="FOC,CON", bins="2,6,0.5",
        years_per_gen=None, lineage_bin=None, num_bootstraps=2, seed=7,
        mask=None, mask_cutoff=None, map=None, coal=None,
        sampling="analytic", output=out_dir,
    ))
    assert filecmp.cmp(out_cli, out_dir, shallow=False)


@pytest.fixture(scope="module")
def bam_fix(tmp_path_factory):
    from helpers.synth_bam import make_bam

    from colate_tpu.formats.fasta import write_fasta

    root = str(tmp_path_factory.mktemp("clibam"))
    g = np.random.default_rng(3)
    span = 8000
    ref = "".join(g.choice(list("ACGT"), size=span))
    write_fasta(os.path.join(root, "rg_chr1.fa"), "1", ref)
    make_bam(os.path.join(root, "reads.bam"), {"1": ref}, seed=9,
             reads_per_contig=600)
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("1\n")
    return dict(root=root, chrfile=chrfile,
                bam=os.path.join(root, "reads.bam"),
                rg=os.path.join(root, "rg"))


def test_calc_depth_cli(bam_fix, tmp_path):
    from colate_tpu.models.bam_stats import run_calc_depth

    out_cli = str(tmp_path / "cli.txt")
    rc = cli.main([
        "--mode", "calc_depth", "--target_bam", bam_fix["bam"],
        "--ref_genome", bam_fix["rg"], "--chr", bam_fix["chrfile"],
        "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct.txt")
    run_calc_depth(SimpleNamespace(
        target_bam=bam_fix["bam"], ref_genome=bam_fix["rg"],
        chr_file=bam_fix["chrfile"], filters=None, output=out_dir,
    ))
    assert filecmp.cmp(out_cli, out_dir, shallow=False)


def test_get_deam_cli(bam_fix, tmp_path):
    from colate_tpu.models.bam_stats import run_get_deam

    out_cli = str(tmp_path / "cli.txt")
    rc = cli.main([
        "--mode", "get_deam", "--target_bam", bam_fix["bam"],
        "--ref_genome", bam_fix["rg"], "--chr", bam_fix["chrfile"],
        "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct.txt")
    run_get_deam(SimpleNamespace(
        target_bam=bam_fix["bam"], ref_genome=bam_fix["rg"],
        chr_file=bam_fix["chrfile"], filters=None, output=out_dir,
    ))
    assert filecmp.cmp(out_cli, out_dir, shallow=False)


def test_preprocess_mut_cli(tmp_path):
    from helpers.synth_anc import make_anc_mut
    from helpers.synth_vcf import make_vcf_for_preprocess

    from colate_tpu.formats.fasta import write_fasta
    from colate_tpu.models.preprocess_mut import run_preprocess_mut

    root = str(tmp_path)
    g = np.random.default_rng(8)
    _, mt = make_anc_mut(
        os.path.join(root, "pp"), "1", N=8, num_trees=10,
        snps_per_tree=20, seed=55,
    )
    n = len(mt)
    mt.age_begin = g.uniform(1.0, 50.0, n)
    mt.age_end = np.full(n, 100.0)
    mt.write(os.path.join(root, "pp_chr1.mut"))
    anc_file = os.path.join(root, "pp_chr1.anc")
    mut_file = os.path.join(root, "pp_chr1.mut")
    span = int(mt.pos[-1]) + 50
    ref = "".join(g.choice(list("ACGT"), size=span))
    anc = list(ref)
    for j in np.nonzero(g.random(span) < 0.02)[0]:
        anc[j] = [b for b in "ACGT" if b != ref[j]][int(g.integers(0, 3))]
    rg = os.path.join(root, "rg.fa")
    ag = os.path.join(root, "ag.fa")
    mk = os.path.join(root, "mask.fa")
    write_fasta(rg, "1", ref)
    write_fasta(ag, "1", "".join(anc))
    write_fasta(mk, "1", "P" * span)
    bcf = os.path.join(root, "ref.bcf")
    make_vcf_for_preprocess(bcf, "1", mt, ref, "".join(anc), seed=177)

    out_cli = str(tmp_path / "cli.mut")
    rc = cli.main([
        "--mode", "preprocess_mut", "--anc", anc_file, "--mut", mut_file,
        "--reference_bcf", bcf, "--ref_genome", rg, "--anc_genome", ag,
        "--mask", mk, "-o", out_cli,
    ])
    assert rc == 0
    out_dir = str(tmp_path / "direct.mut")
    run_preprocess_mut(SimpleNamespace(
        anc=anc_file, mut=mut_file, reference_bcf=bcf, ref_genome=rg,
        anc_genome=ag, mask=mk, outgroup_tmrca=None, years_per_gen=28.0,
        output=out_dir,
    ))
    assert filecmp.cmp(out_cli, out_dir, shallow=False)


def test_distributed_flags_parse():
    """--coordinator/--num_processes/--process_id/--devices reach the
    parser (the multihost launch path consumes them before dispatch)."""
    p = cli._build_parser()
    a = p.parse_args([
        "--mode", "mut", "-o", "x", "--coordinator", "10.0.0.1:1234",
        "--num_processes", "4", "--process_id", "2", "--devices", "8",
        "--binning", "sharded",
    ])
    assert a.coordinator == "10.0.0.1:1234"
    assert a.num_processes == 4 and a.process_id == 2 and a.devices == 8
    assert a.binning == "sharded"


def test_invalid_mode_rc():
    assert cli.main(["--mode", "bogus", "-o", "x"]) == 2


def test_missing_inputs_clean_error(tmp_path, capsys):
    """Input errors print the reference-style error block, not a
    traceback (Colate.cpp error paths exit with a message)."""
    rc = cli.main(["--mode", "mut", "--bins", "3,7,0.5",
                   "-o", str(tmp_path / "x")])
    assert rc == 1
    err = capsys.readouterr().err
    assert "####### error #######" in err
    assert "mode mut needs" in err
