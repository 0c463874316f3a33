"""Synthetic Colate workloads: .mut + .colate.in pairs + golden runs.

Generates a deterministic fake dataset shaped like real Relate output
(sorted positions, age intervals from a crude coalescent-ish law, a mix
of filter-triggering rows) so the reference binary (built from
/root/reference into /tmp/refbin) and colate_tpu can be compared
end-to-end on identical inputs.
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

from colate_tpu.formats.colate_in import write_colate_in
from colate_tpu.formats.mut import MutTable

REF_COLATE = "/tmp/refbin/Colate"


def have_oracle() -> bool:
    return os.path.exists(REF_COLATE)


def make_mut(
    path: str,
    n: int,
    seed: int,
    chrom_span: int = 70_000_000,
    dirty: bool = True,
    top_bin_frac: float = 0.0,
) -> MutTable:
    """Write a synthetic .mut with n rows; returns the table.

    ``top_bin_frac`` > 0 gives that fraction of rows age_begin == 0 and
    age_end inside the LAST age bin (bin 184: age in ~[8.44e6, 9.33e6)
    generations) so the emp-F redistribution carries mass in the top bin
    — the regime where the reference's width-scaling loop leaves
    F[num_age_bins-1] unscaled (coal.cpp:3420-3426).
    """
    g = np.random.default_rng(seed)
    pos = np.sort(g.choice(np.arange(1, chrom_span), size=n, replace=False))
    dist = np.diff(np.append(pos, chrom_span)).astype(np.int64)
    age_end = np.exp(g.uniform(np.log(10.0), np.log(3e5), n))
    frac = g.uniform(0.0, 0.9, n)
    age_begin = age_end * frac
    # ~20% of rows have age_begin == 0 (routes into the emp matrices)
    zero_mask = g.random(n) < 0.2
    age_begin[zero_mask] = 0.0
    if top_bin_frac > 0.0:
        top = g.random(n) < top_bin_frac
        age_end[top] = g.uniform(8.6e6, 9.2e6, int(top.sum()))
        age_begin[top] = 0.0
    bases = np.array(list("ACGT"))
    anc = bases[g.integers(0, 4, n)]
    shift = g.integers(1, 4, n)
    der = bases[(np.searchsorted(bases, anc) + shift) % 4]
    mtype = np.array([f"{a}/{d}" for a, d in zip(anc, der)], dtype=object)
    flipped = np.zeros(n, np.int64)
    nbr = np.ones(n, np.int64)
    if dirty:
        # filter-triggering rows: flipped, multi-branch, inverted ages, junk alleles
        flipped[g.random(n) < 0.03] = 1
        multi = g.random(n) < 0.03
        nbr[multi] = 2
        inv = g.random(n) < 0.03
        age_begin[inv], age_end[inv] = age_end[inv], age_begin[inv] * 1.5 + 1.0
        junk = g.random(n) < 0.02
        for i in np.nonzero(junk)[0]:
            mtype[i] = "N/A"
    branch = [[0] if k == 1 else [0, 1] for k in nbr]
    tbl = MutTable(
        header=(
            "snp;pos_of_snp;dist;rs-id;tree_index;branch_indices;is_not_mapping;"
            "is_flipped;age_begin;age_end;ancestral_allele/alternative_allele;"
            "upstream_allele;downstream_allele;"
        ),
        snp_id=np.arange(n, dtype=np.int64),
        pos=pos.astype(np.int64),
        dist=dist,
        rs_id=np.array([f"rs{i}" for i in range(n)], dtype=object),
        tree=np.zeros(n, np.int64),
        branch=branch,
        num_branches=nbr,
        flipped=flipped,
        age_begin=np.float32(age_begin).astype(np.float64),
        age_end=np.float32(age_end).astype(np.float64),
        mutation_type=mtype,
        rest=np.array([""] * n, dtype=object),
    )
    tbl.write(path)
    return tbl


def make_stream(
    path: str,
    chroms: list[str],
    mut_tables: list[MutTable],
    seed: int,
    n_hap: int,
    p_present: float = 0.85,
    p_allele_mismatch: float = 0.03,
):
    """Write a .colate.in covering a random subset of the .mut sites."""
    g = np.random.default_rng(seed)
    all_chrom, all_bp, all_anc, all_der, all_aaf, all_daf = [], [], [], [], [], []
    for chrom, mt in zip(chroms, mut_tables):
        n = len(mt)
        present = g.random(n) < p_present
        idx = np.nonzero(present)[0]
        anc = mt.anc_allele[idx].copy()
        der = mt.der_allele[idx].copy()
        # some records carry mismatching alleles (join must reject them)
        bad = g.random(idx.size) < p_allele_mismatch
        for i in np.nonzero(bad)[0]:
            anc[i], der[i] = der[i], anc[i]
        daf = g.integers(0, n_hap + 1, idx.size)
        aaf = n_hap - daf
        ok = np.array([len(a) == 1 and len(d) == 1 for a, d in zip(anc, der)])
        idx, anc, der, daf, aaf = idx[ok], anc[ok], der[ok], daf[ok], aaf[ok]
        all_chrom.append(np.full(idx.size, chrom, dtype=object))
        all_bp.append(mt.pos[idx])
        all_anc.append(np.array([ord(a) for a in anc], np.uint8))
        all_der.append(np.array([ord(d) for d in der], np.uint8))
        all_aaf.append(aaf)
        all_daf.append(daf)
    write_colate_in(
        path,
        np.concatenate(all_chrom),
        np.concatenate(all_bp),
        np.concatenate(all_anc),
        np.concatenate(all_der),
        np.concatenate(all_aaf),
        np.concatenate(all_daf),
    )


def make_fixture(
    root: str,
    chroms=("1", "2"),
    n_per_chrom: int = 4000,
    seed: int = 7,
    n_hap_target: int = 2,
    n_hap_ref: int = 20,
    dirty: bool = True,
    top_bin_frac: float = 0.0,
):
    """Standard tmptmp fixture; returns dict of paths."""
    os.makedirs(root, exist_ok=True)
    muts = []
    for i, c in enumerate(chroms):
        muts.append(
            make_mut(
                os.path.join(root, f"synth_chr{c}.mut"),
                n_per_chrom,
                seed + 13 * i,
                dirty=dirty,
                top_bin_frac=top_bin_frac,
            )
        )
    tgt = os.path.join(root, "target.colate.in")
    ref = os.path.join(root, "ref.colate.in")
    make_stream(tgt, list(chroms), muts, seed + 101, n_hap_target)
    make_stream(ref, list(chroms), muts, seed + 202, n_hap_ref)
    chrfile = os.path.join(root, "chr.txt")
    with open(chrfile, "w") as fh:
        fh.write("\n".join(chroms) + "\n")
    return dict(
        root=root,
        chroms=list(chroms),
        mut_prefix=os.path.join(root, "synth"),
        target=tgt,
        reference=ref,
        chrfile=chrfile,
        mut_tables=muts,
    )


def make_table(
    path: str,
    chroms: list[str],
    mut_tables: list[MutTable],
    seed: int,
    p_present: float = 0.7,
    p_junk: float = 0.05,
):
    """Write a 'CHR BP allele' text table covering a subset of mut sites."""
    g = np.random.default_rng(seed)
    with open(path, "w") as fh:
        for chrom, mt in zip(chroms, mut_tables):
            anc = mt.anc_allele
            der = mt.der_allele
            for i in range(len(mt)):
                if g.random() > p_present:
                    continue
                a = anc[i] if len(anc[i]) == 1 else "A"
                d = der[i] if len(der[i]) == 1 else "C"
                r = g.random()
                if r < p_junk:
                    allele = "T" if d != "T" else "G"  # junk third allele
                elif r < 0.5:
                    allele = d
                else:
                    allele = a
                fh.write(f"{chrom} {mt.pos[i]} {allele}\n")


def run_oracle(mode: str, argv: list[str], timeout: int = 600):
    subprocess.run(
        [REF_COLATE, "--mode", mode] + argv,
        check=True,
        capture_output=True,
        timeout=timeout,
    )


def run_oracle_mut(fix: dict, out: str, seed: int = 1, num_bootstraps: int = 1,
                   bins: str = "3,7,0.2", extra: list[str] | None = None) -> str:
    """Run the reference binary's mode mut on a fixture; returns out prefix."""
    cmd = [
        REF_COLATE,
        "--mode", "mut",
        "--mut", fix["mut_prefix"],
        "--target_tmp", fix["target"],
        "--reference_tmp", fix["reference"],
        "--chr", fix["chrfile"],
        "--bins", bins,
        "--seed", str(seed),
        "-o", out,
    ]
    if num_bootstraps != 1:
        cmd += ["--num_bootstraps", str(num_bootstraps)]
    if extra:
        cmd += extra
    subprocess.run(cmd, check=True, capture_output=True, timeout=600)
    return out
