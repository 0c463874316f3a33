"""Minimal BCF2 encoder for fixtures.

Encodes a text VCF (the synth fixtures) into spec-compliant binary BCF2
(BGZF-wrapped), so the streaming native decoder (native/hts.cpp), the
pure-Python `_parse_bcf`, and htslib inside the reference oracle can all
be driven from the same records.  Dictionary ids follow htslib's
implicit ordering: FILTER/INFO/FORMAT IDs in order of appearance with
PASS always id 0.
"""

from __future__ import annotations

import struct

from helpers.synth_bam import _bgzf_compress


def _typed_str(s: bytes) -> bytes:
    n = len(s)
    if n < 15:
        return bytes([(n << 4) | 7]) + s
    return bytes([(15 << 4) | 7]) + _typed_int(n) + s


def _typed_int(v: int) -> bytes:
    if -128 <= v <= 127:
        return bytes([(1 << 4) | 1]) + struct.pack("<b", v)
    if -32768 <= v <= 32767:
        return bytes([(1 << 4) | 2]) + struct.pack("<h", v)
    return bytes([(1 << 4) | 3]) + struct.pack("<i", v)


def _typed_int_vec(vals: list[int]) -> bytes:
    n = len(vals)
    head = bytes([(n << 4) | 1]) if n < 15 else bytes([(15 << 4) | 1]) + _typed_int(n)
    return head + struct.pack(f"<{n}b", *vals)


def vcf_text_to_bcf2(text_path: str, bcf_path: str) -> None:
    with open(text_path) as fh:
        lines = fh.read().splitlines()
    meta = [ln for ln in lines if ln.startswith("##")]
    chrom_line = next(ln for ln in lines if ln.startswith("#CHROM"))
    rows = [ln for ln in lines if ln and not ln.startswith("#")]
    n_samples = max(len(chrom_line.split("\t")) - 9, 0)

    # contig dictionary (order of ##contig lines)
    contigs: list[str] = []
    for ln in meta:
        if ln.startswith("##contig=<"):
            body = ln[len("##contig=<") : ln.rindex(">")]
            fields = dict(kv.split("=", 1) for kv in body.split(",") if "=" in kv)
            contigs.append(fields["ID"])
    # FORMAT/GT dictionary id: PASS is implicit id 0, then IDs in order
    dict_ids = ["PASS"]
    for ln in meta:
        for tag in ("##INFO=<ID=", "##FILTER=<ID=", "##FORMAT=<ID="):
            if ln.startswith(tag):
                name = ln[len(tag) :].split(",")[0].split(">")[0]
                if name not in dict_ids:
                    dict_ids.append(name)
    gt_id = dict_ids.index("GT") if "GT" in dict_ids else 1

    header_text = "\n".join(meta + [chrom_line]) + "\n"
    htext = header_text.encode() + b"\x00"

    out = bytearray()
    out += b"BCF\x02\x02"
    out += struct.pack("<I", len(htext))
    out += htext

    for ln in rows:
        f = ln.split("\t")
        chrom_id = contigs.index(f[0])
        pos0 = int(f[1]) - 1
        ref = f[3]
        alts = [] if f[4] in (".", "") else f[4].split(",")
        alleles = [ref] + alts
        n_allele = len(alleles)
        rlen = len(ref)

        shared = bytearray()
        shared += struct.pack("<iii", chrom_id, pos0, rlen)
        shared += struct.pack("<I", 0x7F800001)  # QUAL: bcf missing float
        shared += struct.pack("<I", (n_allele << 16) | 0)  # n_info=0
        shared += struct.pack("<I", (1 << 24) | n_samples)  # n_fmt=1
        shared += _typed_str(b"")  # ID missing
        for a in alleles:
            shared += _typed_str(a.encode())
        shared += _typed_int_vec([0])  # FILTER: PASS
        # no INFO

        # indiv: GT only
        gts: list[list[int]] = []
        fmt = f[8].split(":") if len(f) > 8 else []
        gt_i = fmt.index("GT") if "GT" in fmt else -1
        ploidy = 2
        for s in f[9 : 9 + n_samples]:
            val = s.split(":")[gt_i] if gt_i >= 0 else "."
            phased = "|" in val
            calls = val.replace("|", "/").split("/")
            row = []
            for ci, c in enumerate(calls):
                if c in (".", ""):
                    enc = 0
                else:
                    enc = (int(c) + 1) << 1
                if phased and ci > 0:
                    enc |= 1
                row.append(enc)
            ploidy = max(ploidy, len(row))
            gts.append(row)
        indiv = bytearray()
        indiv += _typed_int(gt_id)
        indiv += bytes([(min(ploidy, 14) << 4) | 1])  # int8 vector, ploidy per sample
        for row in gts:
            row = row + [0x81] * (ploidy - len(row))  # END_OF_VECTOR pad
            indiv += struct.pack(f"<{ploidy}b", *row)

        out += struct.pack("<II", len(shared), len(indiv))
        out += shared
        out += indiv

    with open(bcf_path, "wb") as fh:
        fh.write(_bgzf_compress(bytes(out)))
