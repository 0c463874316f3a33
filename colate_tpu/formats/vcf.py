"""VCF/BCF genotype reader → columnar arrays.

Handles the three on-disk encodings htslib's ``bcf_open`` auto-detects
(the reference passes files named .bcf but htslib accepts any):
plain-text VCF, bgzip/gzip VCF, and binary BCF2 (BGZF-compressed).

Returns one :class:`VcfTable` per file: 1-based positions, REF/first-ALT
allele strings, and the GT matrix as int8 (allele index per haplotype,
-1 for missing — matching ``bcf_gt_allele`` which maps '.' to -1; the
reference then *subtracts* 1 per missing call when summing DAF, a quirk
its consumers replicate).
"""

from __future__ import annotations

import dataclasses
import gzip
import struct
import zlib

import numpy as np


@dataclasses.dataclass
class VcfTable:
    chrom: np.ndarray  # object (string per record)
    pos: np.ndarray  # int64, 1-based
    ref: np.ndarray  # object — REF allele string
    alt: np.ndarray  # object — first ALT string ("" when none)
    n_allele: np.ndarray  # int32
    gt: np.ndarray  # int8 [sites, n_samples*ploidy]; -1 = missing
    n_samples: int
    ploidy: int

    def __len__(self) -> int:
        return int(self.pos.shape[0])


def read_vcf(path: str) -> VcfTable:
    out = _read_bcf_native(path)
    if out is not None:
        return out
    data = _read_raw(path)
    if data[:5] == b"BCF\x02\x02" or data[:3] == b"BCF":
        return _parse_bcf(data)
    return _parse_vcf_text(data.decode("utf-8", errors="replace"))


def _read_bcf_native(path: str) -> VcfTable | None:
    """Streaming native BCF decode (native/hts.cpp) — bounded input
    memory, columnar output.  Returns None for text VCF (the Python
    parser handles it) or when the native library is unavailable; the
    pure-Python `_parse_bcf` stays the equivalence oracle."""
    import ctypes

    from colate_tpu import native

    lib = native.load()
    if lib is None:
        return None
    errbuf = ctypes.create_string_buffer(256)
    h = lib.cn_bcf_read(path.encode(), errbuf, len(errbuf))
    if not h:
        err = errbuf.value.decode()
        if err == "not-bcf":
            return None  # text VCF / gzip VCF: Python parser
        raise FileNotFoundError(err or f"cannot read {path}")
    try:
        n = int(lib.cn_bcf_n(h))
        n_samples = int(lib.cn_bcf_meta(h, 0))
        ploidy = int(lib.cn_bcf_meta(h, 1))
        width = int(lib.cn_bcf_meta(h, 2))
        col = lambda i, dt: native.col_array(lib, lib.cn_bcf_col, h, i, dt)
        pos = col(0, np.int64)
        n_allele = col(1, np.int32)
        chrom_id = col(2, np.int32)
        ref_blob = col(3, np.uint8).tobytes()
        ref_off = col(4, np.uint64)
        alt_blob = col(5, np.uint8).tobytes()
        alt_off = col(6, np.uint64)
        gt = col(7, np.int8).reshape(n, width) if width else np.zeros(
            (n, 0), np.int8
        )
        cname_blob = col(8, np.uint8).tobytes()
        cname_off = col(9, np.uint64)
        cname_idx = col(10, np.int64)
    finally:
        lib.cn_bcf_free(h)
    names = {
        int(cname_idx[i]): cname_blob[cname_off[i] : cname_off[i + 1]].decode()
        for i in range(cname_idx.shape[0])
    }
    chrom = np.array(
        [names.get(int(c), str(int(c))) for c in chrom_id], object
    )
    ref = np.array(
        [ref_blob[ref_off[i] : ref_off[i + 1]].decode() for i in range(n)],
        object,
    )
    alt = np.array(
        [alt_blob[alt_off[i] : alt_off[i + 1]].decode() for i in range(n)],
        object,
    )
    return VcfTable(
        chrom=chrom,
        pos=pos,
        ref=ref,
        alt=alt,
        n_allele=n_allele,
        gt=gt,
        n_samples=n_samples,
        ploidy=max(ploidy, 1),
    )


def _read_raw(path: str) -> bytes:
    with open(path, "rb") as fh:
        head = fh.read(2)
        fh.seek(0)
        raw = fh.read()
    if head == b"\x1f\x8b":
        # gzip or BGZF — members concatenate; zlib handles both
        out = bytearray()
        d = zlib.decompressobj(31)
        buf = raw
        while buf:
            out += d.decompress(buf)
            buf = d.unused_data
            if buf:
                d = zlib.decompressobj(31)
            else:
                break
        return bytes(out)
    return raw


def _parse_vcf_text(text: str) -> VcfTable:
    chroms, poss, refs, alts, nals, gts = [], [], [], [], [], []
    n_samples = 0
    ploidy = 2
    for line in text.splitlines():
        if not line or line.startswith("##"):
            continue
        if line.startswith("#CHROM"):
            n_samples = max(len(line.split("\t")) - 9, 0)
            continue
        f = line.split("\t")
        if len(f) < 8:
            f = line.split()
        chroms.append(f[0])
        poss.append(int(f[1]))
        refs.append(f[3])
        alt_field = f[4]
        alt_list = [] if alt_field in (".", "") else alt_field.split(",")
        alts.append(alt_list[0] if alt_list else "")
        nals.append(1 + len(alt_list))
        row: list[int] = []
        if len(f) > 9:
            fmt = f[8].split(":")
            gt_i = fmt.index("GT") if "GT" in fmt else -1
            for s in f[9:]:
                val = s.split(":")[gt_i] if gt_i >= 0 else "."
                calls = val.replace("|", "/").split("/")
                for c in calls:
                    row.append(-1 if c in (".", "") else int(c))
        gts.append(row)
    n = len(poss)
    if n and gts[0]:
        ploidy = len(gts[0]) // max(n_samples, 1) if n_samples else 2
    width = n_samples * ploidy
    gt = np.full((n, width), -1, np.int8)
    for i, row in enumerate(gts):
        m = min(len(row), width)
        gt[i, :m] = row[:m]
    return VcfTable(
        chrom=np.array(chroms, object),
        pos=np.array(poss, np.int64),
        ref=np.array(refs, object),
        alt=np.array(alts, object),
        n_allele=np.array(nals, np.int32),
        gt=gt,
        n_samples=n_samples,
        ploidy=ploidy,
    )


def _bcf_typed_int(buf: memoryview, off: int):
    """Read one BCF2 typed scalar int; returns (value, new_off)."""
    t = buf[off]
    ty = t & 0x0F
    off += 1
    if ty == 1:
        return int(np.frombuffer(buf[off : off + 1], np.int8)[0]), off + 1
    if ty == 2:
        return int(np.frombuffer(buf[off : off + 2], np.int16)[0]), off + 2
    if ty == 3:
        return int(np.frombuffer(buf[off : off + 4], np.int32)[0]), off + 4
    raise ValueError(f"unexpected BCF typed int type {ty}")


def _bcf_type_descriptor(buf: memoryview, off: int):
    """Returns (type_code, count, new_off)."""
    t = buf[off]
    ty = t & 0x0F
    cnt = t >> 4
    off += 1
    if cnt == 15:
        cnt, off = _bcf_typed_int(buf, off)
    return ty, cnt, off


_BCF_TYPE_SIZE = {0: 0, 1: 1, 2: 2, 3: 4, 5: 4, 7: 1}


def _parse_bcf(data: bytes) -> VcfTable:
    if data[:3] != b"BCF":
        raise ValueError("not a BCF file")
    mv = memoryview(data)
    (l_text,) = struct.unpack_from("<I", data, 5)
    header_text = bytes(mv[9 : 9 + l_text]).rstrip(b"\x00").decode()
    # contig index mapping: IDX= aware
    contigs: list[str] = []
    contig_idx: dict[int, str] = {}
    auto = 0
    n_samples = 0
    for ln in header_text.splitlines():
        if ln.startswith("##contig=<"):
            body = ln[len("##contig=<") : ln.rindex(">")]
            fields = dict(
                kv.split("=", 1) for kv in _split_csv(body) if "=" in kv
            )
            name = fields.get("ID", f"contig{auto}")
            idx = int(fields["IDX"]) if "IDX" in fields else auto
            contig_idx[idx] = name
            auto += 1
        elif ln.startswith("#CHROM"):
            n_samples = max(len(ln.split("\t")) - 9, 0)
    off = 9 + l_text
    chroms, poss, refs, alts, nals = [], [], [], [], []
    gt_rows: list[np.ndarray] = []
    ploidy = 2
    n = len(data)
    while off + 8 <= n:
        l_shared, l_indiv = struct.unpack_from("<II", data, off)
        off += 8
        rec_end = off + l_shared + l_indiv
        if rec_end > n:
            break
        sh = off
        chrom_id, pos0, _rlen = struct.unpack_from("<iii", data, sh)
        # qual f32 at sh+12; n_info/n_allele packed at sh+16; n_fmt/n_sample at sh+20
        (n_info_allele,) = struct.unpack_from("<I", data, sh + 16)
        n_allele = n_info_allele >> 16
        n_info = n_info_allele & 0xFFFF
        (n_fmt_sample,) = struct.unpack_from("<I", data, sh + 20)
        n_sample = n_fmt_sample & 0xFFFFFF
        n_fmt = n_fmt_sample >> 24
        p = sh + 24
        # ID (typed string)
        ty, cnt, p = _bcf_type_descriptor(mv, p)
        p += cnt * _BCF_TYPE_SIZE.get(ty, 1)
        # alleles
        allele_strs = []
        for _ in range(n_allele):
            ty, cnt, p = _bcf_type_descriptor(mv, p)
            allele_strs.append(bytes(mv[p : p + cnt]).decode())
            p += cnt
        # skip FILTER + INFO — jump straight to the indiv block
        p = off + l_shared
        gt_row = None
        for _ in range(n_fmt):
            # fmt key (typed int), then value descriptor
            key, p = _read_typed_scalar(mv, p)
            ty, per_sample, p = _bcf_type_descriptor(mv, p)
            size = _BCF_TYPE_SIZE.get(ty, 1)
            total = per_sample * n_sample * size
            # GT is (nearly) always the first FORMAT field written by htslib;
            # identify by int-encoded values with the phasing bit
            if gt_row is None and ty in (1, 2, 3):
                arr = np.frombuffer(
                    mv[p : p + total], {1: np.int8, 2: np.int16, 3: np.int32}[ty]
                ).reshape(n_sample, per_sample)
                # bcf GT encoding: (allele+1)<<1 | phased; 0 = missing
                dec = (arr.astype(np.int32) >> 1) - 1
                gt_row = dec.reshape(-1).astype(np.int8)
                ploidy = per_sample
            p += total
        off = rec_end
        chroms.append(contig_idx.get(chrom_id, str(chrom_id)))
        poss.append(pos0 + 1)
        refs.append(allele_strs[0] if allele_strs else "")
        alts.append(allele_strs[1] if len(allele_strs) > 1 else "")
        nals.append(n_allele)
        gt_rows.append(
            gt_row if gt_row is not None else np.full(n_samples * ploidy, -1, np.int8)
        )
    width = max((r.shape[0] for r in gt_rows), default=0)
    gt = np.full((len(poss), width), -1, np.int8)
    for i, r in enumerate(gt_rows):
        gt[i, : r.shape[0]] = r
    return VcfTable(
        chrom=np.array(chroms, object),
        pos=np.array(poss, np.int64),
        ref=np.array(refs, object),
        alt=np.array(alts, object),
        n_allele=np.array(nals, np.int32),
        gt=gt,
        n_samples=n_samples or (width // ploidy if ploidy else 0),
        ploidy=ploidy,
    )


def _read_typed_scalar(mv: memoryview, p: int):
    ty, cnt, p = _bcf_type_descriptor(mv, p)
    size = _BCF_TYPE_SIZE.get(ty, 1)
    if cnt != 1:
        return 0, p + cnt * size
    val = int.from_bytes(bytes(mv[p : p + size]), "little", signed=True)
    return val, p + size


def _split_csv(s: str) -> list[str]:
    """Split on commas outside quotes."""
    out, cur, q = [], [], False
    for ch in s:
        if ch == '"':
            q = not q
        if ch == "," and not q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
