"""Streaming native BAM pileup (native/hts.cpp) vs the Python oracle.

The Python :class:`BamCursor` holds the whole file and whole-contig
count arrays; the native cursor streams BGZF blocks and keeps only
query-position state.  Both must answer identical (claimed, counts)
for the per-contig batch queries all modes issue.
"""

import numpy as np
import pytest

from colate_tpu import native
from colate_tpu.models.bam_pileup import BamCursor, NativeBamPileup, open_pileup

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable"
)


def _contig_seqs(contigs, seed):
    g = np.random.default_rng(seed)
    return {c: "".join(g.choice(list("ACGT"), n)) for c, n in contigs.items()}


def _genomes(tmp_path, seqs):
    from colate_tpu.formats.fasta import write_fasta

    paths = {}
    for c, seq in seqs.items():
        p = str(tmp_path / f"rg_chr{c}.fa")
        write_fasta(p, c, seq)
        paths[c] = p
    return paths


def _compare(tmp_path, bam_path, seqs, strandfilter=False, anc_paths=None,
             params="20,30,10", seed=5):
    rg = _genomes(tmp_path, seqs)
    nat = open_pileup(bam_path, params, strandfilter)
    assert isinstance(nat, NativeBamPileup), "native path not taken"
    py = BamCursor(bam_path, params, strandfilter)
    g = np.random.default_rng(seed)
    for c, seq in seqs.items():
        q = np.unique(g.integers(0, len(seq), 400))
        anc = anc_paths[c] if anc_paths else None
        cl_n, ct_n, cov_n, cova_n, glen_n = nat.contig_counts(c, rg[c], anc, q)
        cl_p, ct_p, cov_p, cova_p, glen_p = py.contig_counts(c, rg[c], anc, q)
        np.testing.assert_array_equal(cl_n, cl_p, err_msg=f"claimed chr{c}")
        np.testing.assert_array_equal(ct_n, ct_p, err_msg=f"counts chr{c}")
        assert (cov_n, cova_n, glen_n) == (cov_p, cova_p, glen_p)
        assert cl_n.any(), f"degenerate fixture: nothing claimed on chr{c}"


def test_native_pileup_matches_python(tmp_path):
    from helpers.synth_bam import make_bam

    seqs = _contig_seqs({"1": 60_000, "2": 40_000}, seed=103)
    bam = str(tmp_path / "t.bam")
    make_bam(bam, seqs, seed=3, reads_per_contig=2500)
    _compare(tmp_path, bam, seqs, seed=11)


def test_native_pileup_strandfilter(tmp_path):
    from colate_tpu.formats.fasta import write_fasta
    from helpers.synth_bam import make_bam

    seqs = _contig_seqs({"1": 50_000}, seed=107)
    bam = str(tmp_path / "t.bam")
    make_bam(bam, seqs, seed=7, reads_per_contig=2000, deam_rate=0.2)
    g = np.random.default_rng(9)
    anc = str(tmp_path / "anc_chr1.fa")
    write_fasta(anc, "1", "".join(g.choice(list("ACGT"), 50_000)))
    _compare(
        tmp_path, bam, seqs, strandfilter=True, anc_paths={"1": anc}, seed=13
    )


def test_native_pileup_tight_filters(tmp_path):
    """Strict mismatch threshold exercises the claimed-but-not-counted
    path (reads claiming entries then failing the mismatch filter)."""
    from helpers.synth_bam import make_bam

    seqs = _contig_seqs({"1": 30_000}, seed=109)
    bam = str(tmp_path / "t.bam")
    make_bam(bam, seqs, seed=21, reads_per_contig=1500, mismatch_rate=0.2)
    _compare(tmp_path, bam, seqs, params="20,30,1", seed=17)


def test_native_pileup_unsorted_raises(tmp_path):
    from colate_tpu.formats.fasta import write_fasta
    from helpers.synth_bam import write_bam

    bam = str(tmp_path / "u.bam")
    seq = "ACGT" * 20
    qual = np.full(80, 40, np.uint8)
    write_bam(
        bam,
        {"1": 10_000},
        [(0, 0, 500, 60, seq, qual), (0, 0, 100, 60, seq, qual)],
    )
    rg = str(tmp_path / "rg_chr1.fa")
    g = np.random.default_rng(1)
    write_fasta(rg, "1", "".join(g.choice(list("ACGT"), 10_000)))
    nat = open_pileup(bam)
    assert isinstance(nat, NativeBamPileup)
    with pytest.raises(RuntimeError, match="sorted"):
        nat.contig_counts("1", rg, None, np.array([200, 600], np.int64))


def test_open_pileup_sam_text_falls_back(tmp_path):
    sam = str(tmp_path / "t.sam")
    with open(sam, "w") as fh:
        fh.write("@SQ\tSN:1\tLN:1000\n")
        fh.write(
            "r1\t0\t1\t10\t60\t40M\t*\t0\t0\t" + "A" * 40 + "\t" + "I" * 40 + "\n"
        )
    cur = open_pileup(sam)
    assert isinstance(cur, BamCursor)
