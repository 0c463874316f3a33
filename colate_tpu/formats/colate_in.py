"""Reader/writer for the ``.colate.in`` binary site stream.

Record layout (reference coal/coal.cpp:2503-2515, little-endian)::

    int32  lchrom
    char   chrom[lchrom]
    int32  bp
    char   ancestral
    char   derived
    int32  AAF     (ancestral allele count)
    int32  DAF     (derived allele count)

Records are grouped by chromosome in file order.  Rather than a
record-at-a-time fread loop, this reader exploits that the record stride
is constant within a run of equal ``lchrom`` (in practice one run per
chromosome) and decodes each run with a single strided numpy view.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SiteStream:
    """Columnar decoded .colate.in."""

    chrom: np.ndarray  # object (str per record)
    bp: np.ndarray  # int32
    anc: np.ndarray  # uint8 (ASCII)
    der: np.ndarray  # uint8
    aaf: np.ndarray  # int32
    daf: np.ndarray  # int32

    def __len__(self) -> int:
        return int(self.bp.shape[0])

    # populated by the native reader (run-length already known); lazily
    # derived from `chrom` otherwise
    _runs_cache: tuple | None = None

    def runs(self) -> tuple[np.ndarray, list[str]]:
        """Run-length chromosome encoding: (starts [R+1] int64, names [R]).

        Adjacent equal-name runs are merged; the cursor walk in
        pipeline.join uses this to scan chromosomes in O(runs) instead of
        O(records)."""
        if self._runs_cache is not None:
            return self._runs_cache
        n = len(self)
        if n == 0:
            return np.zeros(1, np.int64), []
        change = np.nonzero(self.chrom[1:] != self.chrom[:-1])[0] + 1
        starts = np.concatenate([[0], change, [n]]).astype(np.int64)
        names = [str(self.chrom[int(s)]) for s in starts[:-1]]
        self._runs_cache = (starts, names)
        return self._runs_cache


def read_colate_in(path: str) -> SiteStream:
    try:
        s = _read_colate_in_native(path)
        if s is not None:
            return s
    except Exception:
        pass
    return _read_colate_in_py(path)


def _read_colate_in_native(path: str) -> SiteStream | None:
    import ctypes

    from colate_tpu import native

    lib = native.load()
    if lib is None:
        return None
    err = ctypes.create_string_buffer(512)
    h = lib.cn_colatein_read(path.encode(), err, 512)
    if not h:
        raise ValueError(err.value.decode() or f"native read failed: {path}")
    try:
        col = lambda c, dt: native.col_array(lib, lib.cn_colatein_col, h, c, dt)
        bp = col(0, np.int32)
        anc = col(1, np.uint8)
        der = col(2, np.uint8)
        aaf = col(3, np.int32)
        daf = col(4, np.int32)
        run_len = col(5, np.int64)
        blob = col(6, np.uint8).tobytes()
        off = col(7, np.uint64)
    finally:
        lib.cn_colatein_free(h)
    names = [
        blob[int(off[i]) : int(off[i + 1])].decode("ascii")
        for i in range(run_len.shape[0])
    ]
    chroms = [
        np.full(int(run_len[i]), names[i], dtype=object)
        for i in range(run_len.shape[0])
    ]
    chrom = np.concatenate(chroms) if chroms else np.zeros(0, object)
    s = SiteStream(chrom=chrom, bp=bp, anc=anc, der=der, aaf=aaf, daf=daf)
    # run structure is already known — cache it (merging adjacent equals)
    m_starts = [0]
    m_names: list[str] = []
    pos = 0
    for i, name in enumerate(names):
        if m_names and m_names[-1] == name:
            pos += int(run_len[i])
            m_starts[-1] = pos + int(run_len[i]) * 0  # extend current run
            continue
        m_names.append(name)
        pos += int(run_len[i])
        m_starts.append(pos)
    if not m_names:
        m_starts = [0]
    else:
        m_starts = np.cumsum([0] + [0] * 0).tolist() and m_starts
    # recompute starts robustly
    starts = [0]
    cur = None
    total = 0
    for i, name in enumerate(names):
        if cur is not None and name != cur:
            starts.append(total)
        cur = name
        total += int(run_len[i])
    starts.append(total)
    merged_names = []
    cur = None
    for name in names:
        if name != cur:
            merged_names.append(name)
            cur = name
    s._runs_cache = (np.asarray(starts, np.int64), merged_names)
    return s


def _read_colate_in_py(path: str) -> SiteStream:
    raw = np.fromfile(path, dtype=np.uint8)
    n = raw.size
    chroms: list[np.ndarray] = []
    bps: list[np.ndarray] = []
    ancs: list[np.ndarray] = []
    ders: list[np.ndarray] = []
    aafs: list[np.ndarray] = []
    dafs: list[np.ndarray] = []
    pos = 0
    while pos + 4 <= n:
        lchrom = int(raw[pos : pos + 4].view(np.int32)[0])
        if lchrom <= 0 or lchrom > 1023 or pos + lchrom + 18 > n:
            raise ValueError(f"corrupt .colate.in at byte {pos}: lchrom={lchrom}")
        rec = lchrom + 18
        name = raw[pos + 4 : pos + 4 + lchrom].tobytes().decode("ascii")
        # gallop: how many consecutive records share this lchrom (and fit)?
        max_here = (n - pos) // rec
        count = max_here
        if max_here > 1:
            # lchrom fields of candidate records, strided view
            lens = np.lib.stride_tricks.as_strided(
                raw[pos:],
                shape=(max_here, 4),
                strides=(rec, 1),
            ).copy().view(np.int32)[:, 0]
            bad = np.nonzero(lens != lchrom)[0]
            if bad.size:
                count = int(bad[0])
        block = (
            np.lib.stride_tricks.as_strided(
                raw[pos:], shape=(count, rec), strides=(rec, 1)
            ).copy()
        )
        # same-name check within the run (names could differ at equal length)
        names_u8 = block[:, 4 : 4 + lchrom]
        same = np.all(names_u8 == names_u8[0], axis=1)
        if not same.all():
            count = int(np.nonzero(~same)[0][0])
            block = block[:count]
        off = 4 + lchrom
        bps.append(block[:, off : off + 4].copy().view(np.int32)[:, 0])
        ancs.append(block[:, off + 4])
        ders.append(block[:, off + 5])
        aafs.append(block[:, off + 6 : off + 10].copy().view(np.int32)[:, 0])
        dafs.append(block[:, off + 10 : off + 14].copy().view(np.int32)[:, 0])
        chroms.append(np.full(count, name, dtype=object))
        pos += count * rec
    if pos != n:
        # trailing partial record: the reference's fread loop would stop too
        pass
    if not bps:
        z = np.zeros(0, np.int32)
        return SiteStream(np.zeros(0, object), z, z.astype(np.uint8), z.astype(np.uint8), z, z)
    return SiteStream(
        chrom=np.concatenate(chroms),
        bp=np.concatenate(bps),
        anc=np.concatenate(ancs).astype(np.uint8),
        der=np.concatenate(ders).astype(np.uint8),
        aaf=np.concatenate(aafs),
        daf=np.concatenate(dafs),
    )


def write_colate_in(
    path: str,
    chrom: np.ndarray,
    bp: np.ndarray,
    anc: np.ndarray,
    der: np.ndarray,
    aaf: np.ndarray,
    daf: np.ndarray,
) -> None:
    """Write records byte-compatibly with the reference (coal.cpp:2503-2515).

    Vectorised over runs of equal chromosome-name length: each run's
    records are fixed-width, so one [n_run, width] uint8 fill replaces
    the per-record byte assembly."""
    n = len(bp)
    names = np.array(
        [c if isinstance(c, str) else str(c) for c in chrom], object
    )
    name_len = np.array([len(s) for s in names], np.int64)
    bp32 = np.asarray(bp, np.int32)
    aaf32 = np.asarray(aaf, np.int32)
    daf32 = np.asarray(daf, np.int32)

    def code(x):
        a = np.asarray(x)
        if a.dtype.kind in ("U", "O"):
            return np.array([ord(v) for v in a], np.uint8)
        return a.astype(np.uint8)

    anc8 = code(anc)
    der8 = code(der)

    with open(path, "wb") as fh:
        i = 0
        while i < n:
            ln = name_len[i]
            j = i
            while j < n and name_len[j] == ln:
                j += 1
            m = j - i
            width = 4 + int(ln) + 4 + 2 + 8
            rec = np.zeros((m, width), np.uint8)
            rec[:, 0:4] = np.frombuffer(
                np.full(m, ln, np.int32).tobytes(), np.uint8
            ).reshape(m, 4)
            nb = np.frombuffer(
                "".join(names[i:j]).encode("ascii"), np.uint8
            ).reshape(m, int(ln))
            rec[:, 4 : 4 + ln] = nb
            o = 4 + int(ln)
            rec[:, o : o + 4] = bp32[i:j].view(np.uint8).reshape(m, 4)
            rec[:, o + 4] = anc8[i:j]
            rec[:, o + 5] = der8[i:j]
            rec[:, o + 6 : o + 10] = aaf32[i:j].view(np.uint8).reshape(m, 4)
            rec[:, o + 10 : o + 14] = daf32[i:j].view(np.uint8).reshape(m, 4)
            fh.write(rec.tobytes())
            i = j
