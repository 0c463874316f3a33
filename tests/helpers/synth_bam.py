"""Synthetic BAM fixtures for the BAM pileup paths.

The oracle's read loop requires ``sam_read1 > 0`` — true only for
binary BAM (bam_read1 returns bytes read), never for SAM text (0 on
success).  So fixtures must be real BGZF BAM files; this module
includes a minimal BAM writer.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_BASES = np.array(list("ACGT"))
_NT16_CODE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}


def _bgzf_block(payload: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    bsize = len(comp) + 25  # header(18) + footer(8) = 26; BSIZE = total size - 1
    header = struct.pack(
        "<BBBBIBBHBBHH",
        0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6, 66, 67, 2, bsize,
    )
    footer = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload))
    return header + comp + footer


_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _bgzf_compress(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 60000):
        out += _bgzf_block(data[i : i + 60000])
    out += _BGZF_EOF
    return bytes(out)


def write_bam(path: str, contigs: dict[str, int], records) -> None:
    """records: iterable of (flag, ref_idx, pos0, mapq, seq, qual_array)
    or (..., aux_bytes) with BAM-format auxiliary data appended."""
    names = list(contigs)
    text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{n}\tLN:{contigs[n]}\n" for n in names
    )
    payload = bytearray()
    payload += b"BAM\x01"
    payload += struct.pack("<i", len(text))
    payload += text.encode()
    payload += struct.pack("<i", len(names))
    for n in names:
        payload += struct.pack("<i", len(n) + 1)
        payload += n.encode() + b"\x00"
        payload += struct.pack("<i", contigs[n])
    for ri, rec in enumerate(records):
        (flag, ref_idx, pos0, mapq, seq, qual) = rec[:6]
        aux = rec[6] if len(rec) > 6 else b""
        name = f"r{ri}".encode() + b"\x00"
        l_seq = len(seq)
        n_cigar = 0 if (flag & 4) else 1
        cigar = b"" if (flag & 4) else struct.pack("<I", (l_seq << 4) | 0)
        packed = bytearray((l_seq + 1) // 2)
        for i, c in enumerate(seq):
            code = _NT16_CODE.get(c.upper(), 15)
            if i % 2 == 0:
                packed[i // 2] = code << 4
            else:
                packed[i // 2] |= code
        body = (
            struct.pack(
                "<iiBBHHHiiii",
                ref_idx, pos0, len(name), mapq, 0, n_cigar, flag,
                l_seq, -1, -1, 0,
            )
            + name
            + cigar
            + bytes(packed)
            + bytes(np.asarray(qual, np.uint8).tobytes())
            + aux
        )
        payload += struct.pack("<i", len(body)) + body
    with open(path, "wb") as fh:
        fh.write(_bgzf_compress(bytes(payload)))


def make_bam(
    path: str,
    contigs: dict[str, str],
    seed: int,
    reads_per_contig: int = 1500,
    deam_rate: float = 0.04,
    mismatch_rate: float = 0.01,
):
    """Write a coordinate-sorted BAM over the given contig sequences.

    Reads vary in length (20-80), mapq (0-60, some below the 20
    threshold), base quality (2-41, some below the 30 threshold),
    strand, and mismatch load (a few reads exceed the mismatch cap).
    Positions start at >=3 (the oracle underflows ref[pos-1] at pos 0
    in read_deam).
    """
    g = np.random.default_rng(seed)
    records = []
    for ref_idx, (name, ref) in enumerate(contigs.items()):
        L = len(ref)
        poss = np.sort(g.integers(3, max(L - 10, 4), reads_per_contig))
        for pos in poss:
            rlen = int(g.integers(20, 81))
            seq = list(ref[pos : pos + rlen])
            while len(seq) < rlen:  # overhang past the genome end
                seq.append(str(_BASES[g.integers(0, 4)]))
            # mismatches: mostly sparse; ~5% of reads are mismatch-heavy
            rate = 0.25 if g.random() < 0.05 else mismatch_rate
            for i in range(rlen):
                r = g.random()
                if r < deam_rate:
                    if seq[i] == "C":
                        seq[i] = "T"
                    elif seq[i] == "G":
                        seq[i] = "A"
                elif r < deam_rate + rate:
                    seq[i] = str(_BASES[g.integers(0, 4)])
            if g.random() < 0.02:
                seq[int(g.integers(0, rlen))] = "N"
            qual = g.integers(2, 42, rlen)
            qual[g.random(rlen) < 0.15] = int(g.integers(2, 30))
            mapq = int(g.integers(0, 61)) if g.random() < 0.25 else int(g.integers(20, 61))
            flag = 16 if g.random() < 0.5 else 0
            records.append((flag, ref_idx, int(pos), mapq, "".join(seq), qual))
    write_bam(path, {n: len(s) for n, s in contigs.items()}, records)
