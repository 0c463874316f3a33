"""``make_tmp --target_bam``: BAM pileup → .colate.in site stream.

Reference: maketmp_bam (coal/coal.cpp:2526-2680).  Per .mut row (with
flipped==0, single branch, nonempty anc/der alleles, ancestral in
{A,C,G,T,0}, mask 'P' at bp-1 when a mask is given):

- stream the pileup cursor to bp-1 (0-based);
- the site is emitted only if the position has a pileup entry
  (coal.cpp:2607) with at least one read (num_reads>0, coal.cpp:2615)
  and AAF+DAF > 0 (coal.cpp:2645);
- AAF/DAF are the A/C/G/T counts matching the ancestral/derived
  allele letters (coal.cpp:2618-2641);
- one BAM file covers all chromosomes; genomes/masks/muts are per-chr
  (<prefix>_chr<name>.fa, coal.cpp:2990-3006).
"""

from __future__ import annotations

import sys

import numpy as np

from colate_tpu.formats.colate_in import write_colate_in
from colate_tpu.formats.fasta import read_mask
from colate_tpu.formats.mut import MutTable
from colate_tpu.models.bam_pileup import open_pileup

_VALID_ANC = {"A", "C", "G", "T", "0"}
_LETTER = {"A": 0, "C": 1, "G": 2, "T": 3}


def maketmp_bam(
    chrom_names: list[str],
    mut_files: list[str],
    bam_file: str,
    mask_files: list[str] | None,
    ref_genome_files: list[str],
    anc_genome_files: list[str] | None,
    out_path: str,
    params: str = "20,30,10",
    strandfilter: bool = False,
) -> int:
    target = open_pileup(bam_file, params, strandfilter)
    o_chrom, o_bp, o_anc, o_der, o_aaf, o_daf = [], [], [], [], [], []
    for ci, chrom in enumerate(chrom_names):
        print(f"parsing CHR: {ci + 1} / {len(chrom_names)}", file=sys.stderr)
        mask = read_mask(mask_files[ci]) if mask_files else None
        mt = MutTable.read(mut_files[ci], fast=False)

        # ---- static row filters (coal.cpp:2569-2607) ----
        cand: list[int] = []
        ancs: list[str] = []
        ders: list[str] = []
        for r in range(len(mt)):
            if mt.flipped[r] != 0 or mt.num_branches[r] != 1:
                continue
            mtype = mt.mutation_type[r]
            j = mtype.find("/")
            ancestral = mtype[:j] if j >= 0 else mtype
            derived = mtype[j + 1 :] if j >= 0 else ""
            bp_mut = int(mt.pos[r])
            if not ancestral or not derived:
                continue
            if ancestral not in _VALID_ANC:
                continue
            if mask is not None:
                if bp_mut >= mask.shape[0] or mask[bp_mut - 1] != ord("P"):
                    continue
            cand.append(r)
            ancs.append(ancestral)
            ders.append(derived)

        # ---- one streamed pass over the contig, answering all rows ----
        bp = mt.pos[np.asarray(cand, np.int64)].astype(np.int64) if cand else (
            np.zeros(0, np.int64)
        )
        claimed, counts, cov_raw, cova_raw, glen = target.contig_counts(
            chrom,
            ref_genome_files[ci],
            anc_genome_files[ci] if strandfilter else None,
            bp - 1,
        )
        num_reads = counts.sum(axis=1)
        for i in range(bp.shape[0]):
            if not claimed[i] or num_reads[i] == 0:
                continue
            a, d = ancs[i], ders[i]
            aaf = int(counts[i, _LETTER[a]]) if a in _LETTER else 0
            daf = int(counts[i, _LETTER[d]]) if d in _LETTER else 0
            if aaf == 0 and daf == 0:
                continue
            o_chrom.append(chrom)
            o_bp.append(int(bp[i]))
            o_anc.append(ord(a[0]))
            o_der.append(ord(d[0]))
            o_aaf.append(aaf)
            o_daf.append(daf)
        print(
            f"Bam coverage: {cov_raw / max(glen, 1):g} "
            f"{cova_raw / max(glen, 1):g}",
            file=sys.stderr,
        )
    write_colate_in(
        out_path,
        np.array(o_chrom, dtype=object),
        np.array(o_bp, dtype=np.int64),
        np.array(o_anc, dtype=np.uint8),
        np.array(o_der, dtype=np.uint8),
        np.array(o_aaf, dtype=np.int64),
        np.array(o_daf, dtype=np.int64),
    )
    return len(o_bp)
