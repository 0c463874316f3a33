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
from colate_tpu.models.bam_pileup import BamCursor

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
    target = BamCursor(bam_file, params, strandfilter)
    o_chrom, o_bp, o_anc, o_der, o_aaf, o_daf = [], [], [], [], [], []
    for ci, chrom in enumerate(chrom_names):
        print(f"parsing CHR: {ci + 1} / {len(chrom_names)}", file=sys.stderr)
        mask = read_mask(mask_files[ci]) if mask_files else None
        if strandfilter:
            target.assign_contig(chrom, ref_genome_files[ci], anc_genome_files[ci])
        else:
            target.assign_contig(chrom, ref_genome_files[ci])
        mt = MutTable.read(mut_files[ci], fast=False)
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
            bp_target = bp_mut - 1
            target.read_to_pos(bp_target)
            counts = target.entry_counts(bp_target)
            if counts is None:
                continue
            num_reads = int(counts.sum())
            if num_reads == 0:
                continue
            aaf = int(counts[_LETTER[ancestral]]) if ancestral in _LETTER else 0
            daf = int(counts[_LETTER[derived]]) if derived in _LETTER else 0
            if aaf == 0 and daf == 0:
                continue
            o_chrom.append(chrom)
            o_bp.append(bp_mut)
            o_anc.append(ord(ancestral[0]))
            o_der.append(ord(derived[0]))
            o_aaf.append(aaf)
            o_daf.append(daf)
        cov = target.coverage / max(target.ref.shape[0], 1)
        cov_f = target.coverage_after_filter / max(target.ref.shape[0], 1)
        print(f"Bam coverage: {cov:g} {cov_f:g}", file=sys.stderr)
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
