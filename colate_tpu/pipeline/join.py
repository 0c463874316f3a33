"""Join ``.mut`` mutation tables against target/reference site streams.

Replicates, vectorised, the exact sequential-cursor semantics of the
reference's ``parse_tmptmp`` (coal/coal.cpp:2071-2321):

- a mutation row is considered only if flipped==0, exactly one mapped
  branch, age_begin < age_end, age_end >= age(=0 in tmp mode), both
  alleles valid (A/C/G/T or 0/1) and any masks read 'P' at the site;
- the reference stream cursor advances (reading records while bp < pos)
  only for rows surviving those filters, and a row matches only if the
  advance *consumed at least one record* and landed on (chrom,pos,anc,der)
  with DAF_ref > 0 — so e.g. a second mutation row at the same position
  can never match (the record was already consumed);
- the target cursor advances only for rows that matched the reference
  stream; the row is kept if the target record matches and N_target > 0.

Cursor emulation: with record positions sorted within a chromosome and
mutation positions nondecreasing, the consumed-record index after row k is
``max(initial, searchsorted(rec_bp, pos_k))`` and "at least one record was
read" is ``searchsorted(rec_bp, pos_k) > consumed_{k-1}``.

The output is a columnar :class:`JoinedSites` ready for device binning.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from colate_tpu.config import NUM_BASES_PER_BLOCK
from colate_tpu.formats.colate_in import SiteStream
from colate_tpu.formats.mut import MutTable

_VALID_ANC = frozenset(b"ACGT0")
_VALID_DER = frozenset(b"ACGT1")


@dataclasses.dataclass
class JoinedSites:
    """Accepted sites with their histogram weights, concatenated over chroms."""

    age_begin: np.ndarray  # float64 (already max'ed with ref_age)
    age_end: np.ndarray  # float64
    w_shared: np.ndarray  # float64: f_DAF_target * DAF_ref / N_ref
    w_notshared: np.ndarray  # float64: f_AAF_target * DAF_ref / N_ref
    block_id: np.ndarray  # int32 global block index
    num_blocks: int
    # per-MC-draw weights with the reference's exact fp grouping
    # x*DAF_ref/(N_ref*100) — NOT (x*DAF_ref/N_ref)/100, which rounds
    # differently (bit-parity only; analytic binning uses w_* directly)
    w_shared_mc: np.ndarray | None = None
    w_notshared_mc: np.ndarray | None = None

    def __len__(self) -> int:
        return int(self.age_begin.shape[0])

    def mc_weights(self) -> tuple[np.ndarray, np.ndarray]:
        ws = self.w_shared_mc if self.w_shared_mc is not None else self.w_shared / 100.0
        wn = (
            self.w_notshared_mc
            if self.w_notshared_mc is not None
            else self.w_notshared / 100.0
        )
        return ws, wn


@dataclasses.dataclass
class _Cursor:
    """Global consumed-record cursor over a SiteStream."""

    stream: SiteStream
    consumed: int = -1  # index of last consumed record; -1 = nothing read
    cur_chrom: str = "\x00uninit"  # matches the reference's garbage initial
    _run_starts: np.ndarray | None = None
    _run_names: list | None = None

    def _runs(self):
        if self._run_starts is None:
            self._run_starts, self._run_names = self.stream.runs()
        return self._run_starts, self._run_names

    def segment(self, chrom: str) -> tuple[int, int]:
        """Range [lo, hi) of records for `chrom` at/after the cursor.

        O(runs) via the stream's run-length chromosome encoding; exact
        consumed-record semantics of the reference's chromosome scan
        (coal.cpp:2125-2133): consume records until the current record's
        chrom matches (at least one record if the cursor's current one
        doesn't)."""
        starts, names = self._runs()
        n = len(self.stream.chrom)
        if self.cur_chrom != chrom:
            j = self.consumed + 1
            if j >= n:
                self.consumed = n
                self.cur_chrom = chrom
                return (n, n)
            r = int(np.searchsorted(starts, j, side="right")) - 1
            while r < len(names) and names[r] != chrom:
                r += 1
            if r >= len(names):
                self.consumed = n
                self.cur_chrom = chrom  # EOF; no records will match
                return (n, n)
            self.consumed = max(j, int(starts[r]))
            self.cur_chrom = chrom
        lo = max(self.consumed, 0)
        if lo >= n:
            return (n, n)
        r = int(np.searchsorted(starts, lo, side="right")) - 1
        hi = int(starts[r + 1]) if names[r] == chrom else lo
        return (lo, hi)


def _advance_match(
    cursor: _Cursor,
    chrom: str,
    pos: np.ndarray,
    anc: np.ndarray,
    der: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorised cursor walk for rows with positions `pos` (nondecreasing).

    Returns (matched_bool, aaf, daf) per row; advances the cursor to its
    final state.  anc/der are uint8 ASCII codes per row.
    """
    lo, hi = cursor.segment(chrom)
    st = cursor.stream
    nrow = pos.shape[0]
    matched = np.zeros(nrow, dtype=bool)
    aaf = np.zeros(nrow, dtype=np.int64)
    daf = np.zeros(nrow, dtype=np.int64)
    if nrow == 0:
        return matched, aaf, daf
    if lo >= hi:
        return matched, aaf, daf
    seg_bp = st.bp[lo:hi]
    # first record index (within segment) with bp >= pos
    s = np.searchsorted(seg_bp, pos, side="left")
    # consumed index within segment before each row: running max of s over
    # previous rows, seeded with 0 (the segment's first record was consumed
    # by the chromosome scan / previous chromosome overshoot).
    s_prev = np.maximum.accumulate(np.concatenate([[0], s[:-1]]))
    advanced = s > s_prev
    in_seg = s < (hi - lo)
    idx = np.where(in_seg, s, 0)
    ok = (
        advanced
        & in_seg
        & (seg_bp[idx] == pos)
        & (st.anc[lo:hi][idx] == anc)
        & (st.der[lo:hi][idx] == der)
    )
    aaf = np.where(ok, st.aaf[lo:hi][idx], 0).astype(np.int64)
    daf = np.where(ok, st.daf[lo:hi][idx], 0).astype(np.int64)
    # final cursor state: last consumed = lo + max(s, 0 over all rows), but
    # never past the segment end (reading stops at the first record of the
    # next chromosome — which is then the consumed record).
    final_s = int(max(np.max(s), 0))
    if final_s >= (hi - lo):
        # overshot into the next chromosome's first record (or EOF)
        cursor.consumed = hi
        n = len(st.chrom)
        cursor.cur_chrom = st.chrom[hi] if hi < n else cursor.cur_chrom
    else:
        cursor.consumed = lo + final_s
    return ok, aaf, daf


def join_tmptmp(
    chrom_names: list[str],
    mut_tables: list[MutTable],
    target: SiteStream,
    reference: SiteStream,
    target_masks: list[np.ndarray] | None = None,
    reference_masks: list[np.ndarray] | None = None,
    age: float = 0.0,
    ref_age: float = 0.0,
    use_native: bool | None = None,
) -> JoinedSites:
    """The parse_tmptmp join.  NOTE: the reference forces age=ref_age=0 for
    tmp inputs (coal.cpp:2073-2074); callers pass 0 to match.

    Dispatches to the native C++ cursor walk when the library is
    available (use_native=None); the vectorised numpy path below is the
    fallback and equivalence oracle (tests/test_native_io.py)."""
    age = 0.0
    ref_age = 0.0
    if use_native is not False:
        try:
            out = _join_tmptmp_native(
                chrom_names, mut_tables, target, reference,
                target_masks, reference_masks, age, ref_age,
            )
            if out is not None:
                return out
        except Exception:
            if use_native:
                raise

    tgt_cur = _Cursor(target)
    ref_cur = _Cursor(reference)

    out_ab: list[np.ndarray] = []
    out_ae: list[np.ndarray] = []
    out_ws: list[np.ndarray] = []
    out_wn: list[np.ndarray] = []
    out_wsm: list[np.ndarray] = []
    out_wnm: list[np.ndarray] = []
    out_blk: list[np.ndarray] = []
    block_offset = 0

    for ci, chrom in enumerate(chrom_names):
        mt = mut_tables[ci]
        # --- pre-stream filters (coal.cpp:2150-2176) ---
        anc_c, der_c, valid_alleles = allele_codes(mt)
        keep = (
            (mt.flipped == 0)
            & (mt.num_branches == 1)
            & (mt.age_begin < mt.age_end)
            & (mt.age_end >= age)
            & valid_alleles
        )
        if target_masks is not None and target_masks[ci] is not None:
            keep &= _mask_pass(target_masks[ci], mt.pos)
        if reference_masks is not None and reference_masks[ci] is not None:
            keep &= _mask_pass(reference_masks[ci], mt.pos)
        rows = np.nonzero(keep)[0]
        pos = mt.pos[rows].astype(np.int64)
        anc = anc_c[rows]
        der = der_c[rows]

        # --- reference stream: cursor walk + match + DAF_ref > 0 ---
        ref_ok, ref_aaf, ref_daf = _advance_match(ref_cur, chrom, pos, anc, der)
        ref_ok &= ref_daf > 0
        rsel = np.nonzero(ref_ok)[0]

        # --- target stream: only ref-matched rows advance the cursor ---
        tgt_ok, tgt_aaf, tgt_daf = _advance_match(
            tgt_cur, chrom, pos[rsel], anc[rsel], der[rsel]
        )
        n_t = tgt_aaf + tgt_daf
        tgt_ok &= n_t > 0
        tsel = rsel[tgt_ok]

        if tsel.size:
            n_ref = (ref_aaf + ref_daf)[tsel].astype(np.float64)
            daf_ref = ref_daf[tsel].astype(np.float64)
            n_tt = n_t[tgt_ok].astype(np.float64)
            daf_t = tgt_daf[tgt_ok].astype(np.float64)
            aaf_t = tgt_aaf[tgt_ok].astype(np.float64)
            # pseudo-diploid rounding (coal.cpp:2236-2242): the quotient is
            # computed in double, stored to float, then std::round'ed (half
            # AWAY from zero — not numpy's half-to-even): floor(x+0.5) for x>=0
            f_daf = np.floor(
                (daf_t / (n_tt / 2.0)).astype(np.float32).astype(np.float64) + 0.5
            )
            f_aaf = np.floor(
                (aaf_t / (n_tt / 2.0)).astype(np.float32).astype(np.float64) + 0.5
            )
            mrows = rows[tsel]
            ab = np.maximum(mt.age_begin[mrows], ref_age)
            ae = mt.age_end[mrows]
            bp_used = mt.pos[mrows].astype(np.int64)
            # block id (coal.cpp:2225-2232): advance while base + B < bp
            blk = np.maximum((bp_used - 1) // NUM_BASES_PER_BLOCK, 0).astype(np.int64)
            out_ab.append(ab)
            out_ae.append(ae)
            out_ws.append(f_daf * daf_ref / n_ref)
            out_wn.append(f_aaf * daf_ref / n_ref)
            # reference grouping: f * DAF_ref / (N_ref * 100.0) (coal.cpp:2291)
            out_wsm.append(f_daf * daf_ref / (n_ref * 100.0))
            out_wnm.append(f_aaf * daf_ref / (n_ref * 100.0))
            out_blk.append(blk + block_offset)
            last_blk = int(blk[-1])
        else:
            last_blk = 0
        # end-of-chromosome block advance (coal.cpp:2307-2312)
        block_offset += last_blk + 1

    if out_ab:
        return JoinedSites(
            age_begin=np.concatenate(out_ab),
            age_end=np.concatenate(out_ae),
            w_shared=np.concatenate(out_ws),
            w_notshared=np.concatenate(out_wn),
            block_id=np.concatenate(out_blk).astype(np.int32),
            num_blocks=block_offset,
            w_shared_mc=np.concatenate(out_wsm),
            w_notshared_mc=np.concatenate(out_wnm),
        )
    return JoinedSites(
        age_begin=np.zeros(0),
        age_end=np.zeros(0),
        w_shared=np.zeros(0),
        w_notshared=np.zeros(0),
        block_id=np.zeros(0, np.int32),
        num_blocks=block_offset,
    )


def _stream_ctypes(st: SiteStream):
    """(bp, anc, der, aaf, daf, n, name_blob, name_off, run_starts, nr)
    contiguous buffers for the native join."""
    starts, names = st.runs()
    blob = "".join(names).encode("ascii")
    name_off = np.zeros(len(names) + 1, np.int64)
    np.cumsum([len(n) for n in names], out=name_off[1:])
    return (
        np.ascontiguousarray(st.bp, np.int32),
        np.ascontiguousarray(st.anc, np.uint8),
        np.ascontiguousarray(st.der, np.uint8),
        np.ascontiguousarray(st.aaf, np.int32),
        np.ascontiguousarray(st.daf, np.int32),
        len(st),
        np.frombuffer(blob, np.uint8) if blob else np.zeros(0, np.uint8),
        name_off,
        np.ascontiguousarray(starts, np.int64),
        len(names),
    )


def _join_tmptmp_native(
    chrom_names, mut_tables, target, reference, target_masks,
    reference_masks, age, ref_age,
) -> JoinedSites | None:
    import ctypes

    from colate_tpu import native
    from colate_tpu.config import NUM_BASES_PER_BLOCK as NBB

    lib = native.load()
    if lib is None:
        return None

    # pre-filter rows per chromosome (vectorised; identical to the numpy
    # path) and concatenate
    pos_l, ab_l, ae_l, anc_l, der_l = [], [], [], [], []
    off = np.zeros(len(chrom_names) + 1, np.int64)
    for ci, mt in enumerate(mut_tables):
        anc_c, der_c, valid = allele_codes(mt)
        keep = (
            (mt.flipped == 0)
            & (mt.num_branches == 1)
            & (mt.age_begin < mt.age_end)
            & (mt.age_end >= age)
            & valid
        )
        if target_masks is not None and target_masks[ci] is not None:
            keep &= _mask_pass(target_masks[ci], mt.pos)
        if reference_masks is not None and reference_masks[ci] is not None:
            keep &= _mask_pass(reference_masks[ci], mt.pos)
        rows = np.nonzero(keep)[0]
        pos_l.append(mt.pos[rows].astype(np.int64))
        ab_l.append(np.ascontiguousarray(mt.age_begin[rows], np.float64))
        ae_l.append(np.ascontiguousarray(mt.age_end[rows], np.float64))
        anc_l.append(np.ascontiguousarray(anc_c[rows], np.uint8))
        der_l.append(np.ascontiguousarray(der_c[rows], np.uint8))
        off[ci + 1] = off[ci] + rows.shape[0]
    m_pos = np.concatenate(pos_l) if pos_l else np.zeros(0, np.int64)
    m_ab = np.concatenate(ab_l) if ab_l else np.zeros(0)
    m_ae = np.concatenate(ae_l) if ae_l else np.zeros(0)
    m_anc = np.concatenate(anc_l) if anc_l else np.zeros(0, np.uint8)
    m_der = np.concatenate(der_l) if der_l else np.zeros(0, np.uint8)

    cblob = "".join(chrom_names).encode("ascii")
    coff = np.zeros(len(chrom_names) + 1, np.int64)
    np.cumsum([len(c) for c in chrom_names], out=coff[1:])
    cblob_a = np.frombuffer(cblob, np.uint8) if cblob else np.zeros(0, np.uint8)

    t = _stream_ctypes(target)
    r = _stream_ctypes(reference)

    def pp(a):
        return ctypes.c_void_p(a.ctypes.data) if isinstance(a, np.ndarray) else a

    h = lib.cn_join_tmptmp(
        len(chrom_names), pp(cblob_a), pp(coff),
        pp(off), pp(m_pos), pp(m_ab), pp(m_ae), pp(m_anc), pp(m_der),
        pp(t[0]), pp(t[1]), pp(t[2]), pp(t[3]), pp(t[4]), t[5],
        pp(t[6]), pp(t[7]), pp(t[8]), t[9],
        pp(r[0]), pp(r[1]), pp(r[2]), pp(r[3]), pp(r[4]), r[5],
        pp(r[6]), pp(r[7]), pp(r[8]), r[9],
        float(ref_age), NBB,
    )
    if not h:
        return None
    try:
        col = lambda c, dt: native.col_array(lib, lib.cn_join_col, h, c, dt)
        out = JoinedSites(
            age_begin=col(0, np.float64),
            age_end=col(1, np.float64),
            w_shared=col(2, np.float64),
            w_notshared=col(3, np.float64),
            block_id=col(6, np.int32),
            num_blocks=int(lib.cn_join_num_blocks(h)),
            w_shared_mc=col(4, np.float64),
            w_notshared_mc=col(5, np.float64),
        )
    finally:
        lib.cn_join_free(h)
    return out


def _static_segments(stream: SiteStream, chroms: list[str]) -> np.ndarray | None:
    """Per-chromosome [lo, hi) record ranges of the cursor walk, computed
    statically from the run-length index.

    The dynamic cursor's cross-chromosome state reduces to "segment =
    first run named `chrom` at/after the previous match, else empty
    forever" (see _Cursor.segment + the overshoot rule in
    _advance_match); that only holds when chromosome names don't repeat
    in the request, so duplicates return None (caller falls back)."""
    if len(set(chroms)) != len(chroms):
        return None
    starts, names = stream.runs()
    n = len(stream)
    segs = np.empty((len(chroms), 2), np.int64)
    r = 0
    exhausted = False
    for i, c in enumerate(chroms):
        if exhausted:
            segs[i] = (n, n)
            continue
        rr = r
        while rr < len(names) and names[rr] != c:
            rr += 1
        if rr >= len(names):
            exhausted = True
            segs[i] = (n, n)
            continue
        segs[i] = (int(starts[rr]), int(starts[rr + 1]))
        r = rr + 1
    return segs


def _pp(a):
    import ctypes

    return ctypes.c_void_p(a.ctypes.data) if isinstance(a, np.ndarray) else a


def mut_prefilter_native(
    mut_files: list[str],
    target_masks: list[np.ndarray] | None,
    reference_masks: list[np.ndarray] | None,
    age: float = 0.0,
):
    """Phase 1 of the fused tmp pipeline: parse + filter the .mut files
    (native, threaded, intra-file sharded).  Independent of the site
    streams, so callers overlap it with the .colate.in decode.  Returns
    an opaque handle for :func:`fused_join_bin_native`, or None when the
    native library is unavailable.

    NOTE: tmp inputs force age=0 in the reference (parse_tmptmp,
    coal.cpp:2073-2074), so the row filter ignores the caller's age —
    same as :func:`join_tmptmp`."""
    import ctypes

    age = 0.0

    from colate_tpu import native

    lib = native.load()
    if lib is None:
        return None

    pblob = "".join(mut_files).encode()
    poff = np.zeros(len(mut_files) + 1, np.int64)
    np.cumsum([len(f.encode()) for f in mut_files], out=poff[1:])
    pblob_a = np.frombuffer(pblob, np.uint8) if pblob else np.zeros(0, np.uint8)

    def mask_blob(masks):
        if masks is None or all(m is None for m in masks):
            return None, None
        parts = [
            np.zeros(0, np.uint8) if m is None else np.ascontiguousarray(m, np.uint8)
            for m in masks
        ]
        off = np.zeros(len(parts) + 1, np.int64)
        np.cumsum([p.shape[0] for p in parts], out=off[1:])
        blob = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
        return blob, off

    tm_blob, tm_off = mask_blob(target_masks)
    rm_blob, rm_off = mask_blob(reference_masks)
    errbuf = ctypes.create_string_buffer(512)
    # keep the blobs alive across the call
    h = lib.cn_mut_prefilter(
        len(mut_files), _pp(pblob_a), _pp(poff),
        _pp(tm_blob), _pp(tm_off), _pp(rm_blob), _pp(rm_off),
        float(age), errbuf, len(errbuf),
    )
    if not h:
        raise FileNotFoundError(errbuf.value.decode() or "cn_mut_prefilter failed")
    return h


def fused_join_bin_native(
    prefilter,
    chrom_names: list[str],
    target: SiteStream,
    reference: SiteStream,
    age: float = 0.0,
    ref_age: float = 0.0,
):
    """Phase 2: cursor-join the prefiltered rows against the decoded
    streams and bin analytically (consumes the prefilter handle).
    Returns ((shared, notshared, shared_emp, notshared_emp) block
    histograms, num_sites, num_blocks), or None when stream segments
    can't be statically derived (duplicate chromosome names) — the
    caller must then free the handle and fall back to the staged path.

    NOTE: tmp inputs force age=ref_age=0 in the reference (parse_tmptmp,
    coal.cpp:2073-2074); binning likewise uses age=0 — same as the
    staged join_tmptmp + bin_sites_analytic path."""
    from colate_tpu import native
    from colate_tpu.config import AGE_BIN_C, NUM_AGE_BINS, age_bin_edges

    age = 0.0
    ref_age = 0.0

    lib = native.load()
    t_seg = _static_segments(target, chrom_names)
    r_seg = _static_segments(reference, chrom_names)
    if t_seg is None or r_seg is None:
        lib.cn_prefilter_free(prefilter)
        return None
    t = _stream_ctypes(target)
    r = _stream_ctypes(reference)
    edges = np.ascontiguousarray(age_bin_edges())
    h = lib.cn_tmptmp_join_bin(
        prefilter,
        _pp(t[0]), _pp(t[1]), _pp(t[2]), _pp(t[3]), _pp(t[4]), t[5],
        _pp(np.ascontiguousarray(t_seg)),
        _pp(r[0]), _pp(r[1]), _pp(r[2]), _pp(r[3]), _pp(r[4]), r[5],
        _pp(np.ascontiguousarray(r_seg)),
        float(ref_age), NUM_BASES_PER_BLOCK,
        NUM_AGE_BINS, _pp(edges), float(age), AGE_BIN_C,
    )
    if not h:
        raise RuntimeError("cn_tmptmp_join_bin failed")
    try:
        num_blocks = int(lib.cn_fused_num_blocks(h))
        num_sites = int(lib.cn_fused_num_sites(h))
        hists = tuple(
            native.col_array(lib, lib.cn_fused_hist, h, i, np.float64).reshape(
                num_blocks, NUM_AGE_BINS
            )
            for i in range(4)
        )
    finally:
        lib.cn_fused_free(h)
    return hists, num_sites, num_blocks


def fused_tmptmp_stream(
    prefilter,
    chrom_names: list[str],
    target_path: str,
    reference_path: str,
    age: float = 0.0,
    ref_age: float = 0.0,
):
    """Streaming phase 2: join + bin straight from the two ``.colate.in``
    FILES, one chromosome run at a time — peak memory is a single
    chromosome's columns per stream, not the whole genome (the reference
    also streams, coal.cpp:2125-2145).  Consumes the prefilter handle.
    Returns (histograms, num_sites, num_blocks); raises on I/O errors.

    Equivalent to read_colate_in + fused_join_bin_native when chromosome
    names are unique in file order (the same `_static_segments`
    first-match-after-previous rule is applied by the run reader)."""
    import ctypes

    from colate_tpu import native
    from colate_tpu.config import AGE_BIN_C, NUM_AGE_BINS, age_bin_edges

    age = 0.0  # tmp inputs force age=0 (coal.cpp:2073-2074)
    ref_age = 0.0

    lib = native.load()
    blob = "".join(chrom_names).encode()
    off = np.zeros(len(chrom_names) + 1, np.int64)
    np.cumsum([len(c.encode()) for c in chrom_names], out=off[1:])
    blob_a = np.frombuffer(blob, np.uint8) if blob else np.zeros(0, np.uint8)
    edges = np.ascontiguousarray(age_bin_edges())
    errbuf = ctypes.create_string_buffer(512)
    h = lib.cn_tmptmp_fused_stream(
        prefilter, target_path.encode(), reference_path.encode(),
        _pp(blob_a), _pp(off), float(ref_age), NUM_BASES_PER_BLOCK,
        NUM_AGE_BINS, _pp(edges), float(age), AGE_BIN_C, errbuf, len(errbuf),
    )
    if not h:
        raise RuntimeError(
            errbuf.value.decode() or "cn_tmptmp_fused_stream failed"
        )
    try:
        num_blocks = int(lib.cn_fused_num_blocks(h))
        num_sites = int(lib.cn_fused_num_sites(h))
        hists = tuple(
            native.col_array(lib, lib.cn_fused_hist, h, i, np.float64).reshape(
                num_blocks, NUM_AGE_BINS
            )
            for i in range(4)
        )
    finally:
        lib.cn_fused_free(h)
    return hists, num_sites, num_blocks


def fused_tmptmp_hists(
    chrom_names: list[str],
    mut_files: list[str],
    target: SiteStream,
    reference: SiteStream,
    target_masks: list[np.ndarray] | None,
    reference_masks: list[np.ndarray] | None,
    age: float = 0.0,
    ref_age: float = 0.0,
):
    """Fused tmp-mode sufficient-statistic build: .mut parse + row
    filters + cursor join + analytic binning in native code, threaded
    over chromosomes with intra-file parse sharding.

    Returns ((shared, notshared, shared_emp, notshared_emp) block
    histograms, num_sites, num_blocks), or None when the native library
    is unavailable / segments can't be statically derived — callers fall
    back to the staged join_tmptmp + bin_sites_analytic path, which is
    also the equivalence oracle (tests/test_native_io.py)."""
    if len(set(chrom_names)) != len(chrom_names):
        return None
    pf = mut_prefilter_native(mut_files, target_masks, reference_masks, age)
    if pf is None:
        return None
    return fused_join_bin_native(pf, chrom_names, target, reference, age, ref_age)


def allele_codes(mt) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(anc uint8, der uint8, valid bool) for a MutTable, using the
    native reader's precomputed codes when present."""
    if mt.anc_code is not None:
        return mt.anc_code, mt.der_code, mt.allele_valid
    return _allele_codes(mt.mutation_type)


def _allele_codes(mutation_type: np.ndarray):
    """Split 'A/C'-style strings into uint8 codes + validity mask.

    The reference validates the full '/'-separated substrings against
    single characters (coal.cpp:2170-2171), so a row is valid iff the
    string is exactly 'X/Y' with X in ACGT0 and Y in ACGT1 — checkable
    on a fixed-width byte view without any per-row Python.
    """
    as_bytes = np.asarray(mutation_type, dtype="S4")
    padded = np.zeros((as_bytes.shape[0], 4), np.uint8)
    view = as_bytes.view(np.uint8).reshape(as_bytes.shape[0], -1)
    padded[:, : view.shape[1]] = view[:, :4]
    b0, b1, b2, b3 = padded[:, 0], padded[:, 1], padded[:, 2], padded[:, 3]
    anc_ok = np.isin(b0, np.frombuffer(b"ACGT0", np.uint8))
    der_ok = np.isin(b2, np.frombuffer(b"ACGT1", np.uint8))
    # exactly 3 chars: S4 keeps a NUL terminator for them; longer strings
    # (invalid anyway) truncate to 4 bytes with b3 != 0
    lengths = np.char.str_len(np.asarray(mutation_type, dtype="U8"))
    valid = anc_ok & der_ok & (b1 == ord("/")) & (b3 == 0) & (lengths == 3)
    anc = np.where(valid, b0, 0).astype(np.uint8)
    der = np.where(valid, b2, 0).astype(np.uint8)
    return anc, der, valid


def _mask_pass(mask: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """'P' at pos-1 required, but only when pos < len(mask) (coal.cpp:2163-2168)."""
    n = mask.shape[0]
    idx = np.clip(pos - 1, 0, max(n - 1, 0))
    in_range = pos < n
    is_p = mask[idx] == ord("P") if n else np.zeros(pos.shape, bool)
    return ~in_range | is_p
