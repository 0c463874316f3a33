"""Golden tests for the auxiliary tmp modes: print_tmp and make_tmp(table)."""

import filecmp

import numpy as np
import pytest

from colate_tpu.models.make_tmp import maketmp_table
from colate_tpu.models.print_tmp import print_tmp
from helpers.synth import make_table, run_oracle


@pytest.mark.oracle
def test_print_tmp_golden(oracle, fixture_small, tmp_path):
    fix = fixture_small
    ref_out = str(tmp_path / "ref_print.txt")
    run_oracle(
        "print_tmp",
        [
            "--mut", fix["mut_prefix"],
            "--target_tmp", fix["target"],
            "--chr", fix["chrfile"],
            "-o", ref_out,
        ],
    )
    our_out = str(tmp_path / "our_print.txt")
    mut_files = [f"{fix['mut_prefix']}_chr{c}.mut" for c in fix["chroms"]]
    n = print_tmp(fix["chroms"], mut_files, fix["target"], our_out)
    assert n > 100
    assert filecmp.cmp(ref_out, our_out, shallow=False), "print_tmp output differs"


@pytest.mark.oracle
def test_make_tmp_table_golden(oracle, fixture_small, tmp_path):
    from colate_tpu.formats.fasta import write_fasta

    fix = fixture_small
    table = str(tmp_path / "reads.table")
    make_table(table, fix["chroms"], fix["mut_tables"], seed=5)
    # the reference requires --ref_genome here (exits otherwise) but table
    # mode only checks its presence; tiny fastas suffice
    rg_files = []
    for c in fix["chroms"]:
        p = str(tmp_path / f"rg_chr{c}.fa")
        write_fasta(p, c, "ACGT")
        rg_files.append(p)

    run_oracle(
        "make_tmp",
        [
            "--mut", fix["mut_prefix"],
            "--target_table", table,
            "--ref_genome", str(tmp_path / "rg"),
            "--chr", fix["chrfile"],
            "-o", str(tmp_path / "ref_made"),
        ],
    )
    mut_files = [f"{fix['mut_prefix']}_chr{c}.mut" for c in fix["chroms"]]
    n = maketmp_table(
        fix["chroms"], mut_files, table, None, rg_files,
        str(tmp_path / "our_made.colate.in")
    )
    assert n > 100
    assert filecmp.cmp(
        str(tmp_path / "ref_made.colate.in"),
        str(tmp_path / "our_made.colate.in"),
        shallow=False,
    ), "make_tmp table .colate.in differs"


@pytest.mark.oracle
def test_make_tmp_table_roundtrip_through_mut(oracle, fixture_small, tmp_path):
    """A table-made stream should feed mode mut identically in both engines."""
    from colate_tpu.config import MutRunConfig
    from colate_tpu.formats.coal import CoalFile
    from colate_tpu.models.mut_em import run_mut_and_write
    from helpers.synth import run_oracle_mut

    fix = fixture_small
    table = str(tmp_path / "reads.table")
    make_table(table, fix["chroms"], fix["mut_tables"], seed=8)
    mut_files = [f"{fix['mut_prefix']}_chr{c}.mut" for c in fix["chroms"]]
    made = str(tmp_path / "made.colate.in")
    maketmp_table(fix["chroms"], mut_files, table, None, None, made)

    fix2 = dict(fix)
    fix2["target"] = made
    run_oracle_mut(fix2, str(tmp_path / "ref_out"), seed=2)
    cfg = MutRunConfig(
        mut=fix["mut_prefix"],
        output=str(tmp_path / "our_out"),
        chr_list=fix["chroms"],
        target_tmp=made,
        reference_tmp=fix["reference"],
        bins="3,7,0.2",
        seed=2,
        sampling="mc_parity",
    )
    run_mut_and_write(cfg)
    ref = CoalFile.read(str(tmp_path / "ref_out.coal"))
    ours = CoalFile.read(str(tmp_path / "our_out.coal"))
    np.testing.assert_allclose(ours.rates, ref.rates, rtol=1e-5, atol=1e-12)
