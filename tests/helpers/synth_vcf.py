"""Synthetic VCF fixtures exercising maketmp_vcf / parse_vcfvcf semantics."""

from __future__ import annotations

import numpy as np

from colate_tpu.formats.mut import MutTable


def make_vcf_for_mut(
    path: str,
    chrom: str,
    mt: MutTable,
    ref_genome: str,
    seed: int,
    n_samples: int = 3,
    p_present: float = 0.75,
    present_head: int = 0,
):
    """Write a text VCF covering a subset of mut sites with varied cases.

    ``present_head`` forces the first rows to be present: the oracle's
    absent-site fallback reads an *uninitialised* N_ref before the first
    allele-matching record (coal.cpp:1648-1656), so parity there is
    undefined behaviour — fixtures must not create leading absent sites.
    """
    g = np.random.default_rng(seed)
    lines = [
        "##fileformat=VCFv4.2",
        f"##contig=<ID={chrom}>",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(f"S{i}" for i in range(n_samples)),
    ]
    anc = mt.anc_allele
    der = mt.der_allele
    for i in range(len(mt)):
        if g.random() > p_present and i >= present_head:
            continue
        a, d = anc[i], der[i]
        if len(a) != 1 or len(d) != 1:
            continue
        pos = int(mt.pos[i])
        r = g.random()
        if r < 0.08:
            ref_al, alt_al = d, ""  # fixed-for-derived candidate
            gts = ["0|0"] * n_samples
        elif r < 0.16:
            ref_al, alt_al = d, a  # flipped
            gts = [f"{g.integers(0,2)}|{g.integers(0,2)}" for _ in range(n_samples)]
        elif r < 0.22:
            bases = [b for b in "ACGT" if b not in (a, d)]
            ref_al, alt_al = bases[0], bases[1]  # mismatching alleles
            gts = ["0|1"] * n_samples
        elif r < 0.26:
            ref_al, alt_al = a, f"{d},{'G' if d != 'G' else 'T'}"  # multi-allelic
            gts = ["0|2"] + ["0|1"] * (n_samples - 1)
        elif r < 0.30:
            ref_al, alt_al = a, d  # missing genotype present
            gts = [".|."] + [f"{g.integers(0,2)}|{g.integers(0,2)}" for _ in range(n_samples - 1)]
        else:
            ref_al, alt_al = a, d
            gts = [f"{g.integers(0,2)}|{g.integers(0,2)}" for _ in range(n_samples)]
        alt_field = alt_al if alt_al else "."
        lines.append(
            f"{chrom}\t{pos}\t.\t{ref_al}\t{alt_field}\t.\tPASS\t.\tGT\t"
            + "\t".join(gts)
        )
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def make_vcf_for_preprocess(
    path: str,
    chrom: str,
    mt: MutTable,
    ref_genome: str,
    anc_genome: str,
    seed: int,
    n_samples: int = 4,
):
    """VCF exercising preprocess_mut: seg matches, flips, DAF=0/N fixed
    sites (accept + reject), off-mut sites, multi-allelic, missing GT.

    All positions stay strictly below the last .mut position (the oracle
    dereferences a past-the-end iterator once its mut cursor is exhausted).
    """
    g = np.random.default_rng(seed)
    N = 2 * n_samples
    rows = {}  # pos -> (ref, alt, gts)

    def seg_gts(daf):
        alleles = np.zeros(N, np.int64)
        alleles[g.choice(N, size=daf, replace=False)] = 1
        return ["|".join(map(str, alleles[2 * i : 2 * i + 2])) for i in range(n_samples)]

    max_pos = int(mt.pos[-1])
    anc, der = mt.anc_allele, mt.der_allele
    for i in range(len(mt) - 1):  # skip last row: keep cursor in bounds
        pos = int(mt.pos[i])
        if pos >= max_pos or g.random() > 0.55 or len(anc[i]) != 1 or len(der[i]) != 1:
            continue
        a, d = anc[i], der[i]
        r = g.random()
        if r < 0.35:  # straight segregating match
            rows[pos] = (a, d, seg_gts(int(g.integers(1, N))))
        elif r < 0.55:  # flipped match
            rows[pos] = (d, a, seg_gts(int(g.integers(1, N))))
        elif r < 0.65:  # DAF==0 or N at a mut site → fixed classification
            rows[pos] = (a, d, seg_gts(0 if g.random() < 0.5 else N))
        elif r < 0.75:  # mismatching alleles
            others = [b for b in "ACGT" if b not in (a, d)]
            rows[pos] = (others[0], others[1], seg_gts(int(g.integers(1, N))))
        elif r < 0.85:  # multi-allelic
            third = [b for b in "ACGT" if b not in (a, d)][0]
            gts = ["0|2"] + seg_gts(int(g.integers(0, N)))[1:]
            rows[pos] = (a, f"{d},{third}", gts)
        else:  # missing genotypes present
            gts = [".|."] + seg_gts(int(g.integers(0, N)))[1:]
            rows[pos] = (a, d, gts)
    # off-mut sites: fixed-classification candidates incl. guaranteed accepts
    mut_pos = set(int(p) for p in mt.pos)
    for _ in range(len(mt)):
        pos = int(g.integers(2, max_pos - 1))
        if pos in mut_pos or pos in rows:
            continue
        bp = pos - 1
        if bp >= len(ref_genome) or bp >= len(anc_genome):
            continue
        rg, ag = ref_genome[bp], anc_genome[bp]
        r = g.random()
        if r < 0.3 and rg == ag:  # DAF==N accept shape
            alt = [b for b in "ACGT" if b != ag][int(g.integers(0, 3))]
            rows[pos] = (rg, alt, seg_gts(N))
        elif r < 0.6 and rg != ag:  # DAF==0 accept shape
            rows[pos] = (rg, ag, seg_gts(0))
        else:  # random → mostly rejects
            ref_al = "ACGT"[int(g.integers(0, 4))]
            alt = [b for b in "ACGT" if b != ref_al][int(g.integers(0, 3))]
            rows[pos] = (ref_al, alt, seg_gts(0 if g.random() < 0.5 else N))
    lines = [
        "##fileformat=VCFv4.2",
        f"##contig=<ID={chrom}>",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(f"S{i}" for i in range(n_samples)),
    ]
    for pos in sorted(rows):
        ref_al, alt_al, gts = rows[pos]
        lines.append(
            f"{chrom}\t{pos}\t.\t{ref_al}\t{alt_al}\t.\tPASS\t.\tGT\t" + "\t".join(gts)
        )
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def make_ref_genome(length: int, mut: MutTable, seed: int) -> str:
    """Random genome whose bases at mut sites are anc/der/other mix."""
    g = np.random.default_rng(seed)
    seq = g.choice(list("ACGT"), size=length)
    anc = mut.anc_allele
    der = mut.der_allele
    for i in range(len(mut)):
        p = int(mut.pos[i]) - 1
        if p >= length or len(anc[i]) != 1 or len(der[i]) != 1:
            continue
        r = g.random()
        if r < 0.45:
            seq[p] = anc[i]
        elif r < 0.9:
            seq[p] = der[i]
        # else leave a third base
    return "".join(seq)
