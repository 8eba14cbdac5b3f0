"""Legacy MS Office (OLE2/CFB) extraction for the parse-tika tier:
Word 97 ``.doc`` and BIFF8 ``.xls``.

Reference contracts: the reference routes ``application/msword`` /
``application/vnd.ms-excel`` through the ``*`` fallback chain to
parse-tika (``conf/configsets/default/parse-plugins.xml:27-29``),
where Tika/POI extracts body text + the SummaryInformation title; the
historical Nutch ``parse-msword`` test (TestMSWordParser) pins the
same contract — a ``.doc`` sample must parse to its known body text.

Implemented with the stdlib against the published formats:

- **CFB container** ([MS-CFB]): 512-byte sectors, header DIFAT → FAT
  → directory; mini-FAT/mini-stream supported on read. The writer
  pads streams to the 4096-byte mini cutoff so everything lives in
  regular sectors (pad bytes are invisible behind each format's own
  length fields).
- **Word 97** ([MS-DOC]): FIB at offset 0 of ``WordDocument``
  (wIdent 0xA5EC); ``fWhichTblStm`` selects ``0Table``/``1Table``;
  the CLX piece table (``fcClx``/``lcbClx`` in FibRgFcLcb97) maps CPs
  to file offsets, per-piece ``fCompressed`` choosing CP1252 vs
  UTF-16LE. ``make_doc`` writes a two-piece document (one compressed,
  one not) so both decode paths round-trip.
- **BIFF8** ([MS-XLS]): record stream in ``Workbook``; SST shared
  strings (compressed and UTF-16 flavors), LABELSST and NUMBER cell
  records; text is cells in (row, col) order, one line per row.
- **SummaryInformation** ([MS-OLEPS]): property-set stream
  ``\\x05SummaryInformation``; PIDSI_TITLE (2) as VT_LPSTR/VT_LPWSTR.

Spark shape: ``msoffice_parse_rows`` is Arrow-batched mapInPandas on
the content-type slice only (passthrough columns, no join-back),
identical to the PDF/ODF tiers.
"""

from __future__ import annotations

import io
import struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DOC_TYPES = ("application/msword",)
XLS_TYPES = ("application/vnd.ms-excel", "application/excel")
OLE2_TYPES = DOC_TYPES + XLS_TYPES

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_NOSTREAM = 0xFFFFFFFF
_SECT = 512
_MINI_SECT = 64
_MINI_CUTOFF = 4096

_SUMMARY_FMTID = bytes(
    [0xE0, 0x85, 0x9F, 0xF2, 0xF9, 0x4F, 0x68, 0x10,
     0xAB, 0x91, 0x08, 0x00, 0x2B, 0x27, 0xB3, 0xD9]
)


# ---------------------------------------------------------------------------
# CFB container
# ---------------------------------------------------------------------------

class CfbError(ValueError):
    pass


def _chain(fat: list[int], start: int, limit: int) -> list[int]:
    out, s = [], start
    while s != _ENDOFCHAIN:
        if s >= len(fat) or s in (_FREESECT,) or len(out) > limit:
            raise CfbError("broken sector chain")
        out.append(s)
        s = fat[s]
    return out


def cfb_open(data: bytes) -> dict[str, bytes]:
    """Stream name -> bytes for a CFB compound file (regular and
    mini-stream storage)."""
    if len(data) < _SECT or data[:8] != _MAGIC:
        raise CfbError("not a compound file")
    (sector_shift,) = struct.unpack_from("<H", data, 30)
    if sector_shift != 9:
        raise CfbError(f"unsupported sector size 2^{sector_shift}")
    n_fat = struct.unpack_from("<I", data, 44)[0]
    first_dir = struct.unpack_from("<I", data, 48)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        off = _SECT + i * _SECT
        if off + _SECT > len(data):
            raise CfbError("sector out of range")
        return data[off:off + _SECT]

    # DIFAT: 109 header entries + optional chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    s, seen = first_difat, 0
    while s != _ENDOFCHAIN and s != _FREESECT and seen < n_difat:
        blk = sector(s)
        difat.extend(struct.unpack_from("<127I", blk, 0))
        s = struct.unpack_from("<I", blk, 508)[0]
        seen += 1
    fat: list[int] = []
    for fs in difat[:n_fat]:
        if fs == _FREESECT:
            break
        fat.extend(struct.unpack_from("<128I", sector(fs), 0))

    max_chain = len(fat) + 1

    def read_chain(start: int, size: int) -> bytes:
        if start == _ENDOFCHAIN and size == 0:
            return b""
        buf = b"".join(sector(i) for i in _chain(fat, start, max_chain))
        return buf[:size]

    # directory
    dir_bytes = b"".join(sector(i) for i in _chain(fat, first_dir, max_chain))
    entries = []
    for off in range(0, len(dir_bytes), 128):
        e = dir_bytes[off:off + 128]
        if len(e) < 128:
            break
        (name_len,) = struct.unpack_from("<H", e, 64)
        etype = e[66]
        if etype == 0 or name_len < 2:
            continue
        name = e[: name_len - 2].decode("utf-16-le", "replace")
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<Q", e, 120)[0]
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    mini_stream = b""
    minifat: list[int] = []
    if root is not None and root[2] != _ENDOFCHAIN:
        mini_stream = read_chain(root[2], root[3])
    if first_minifat not in (_ENDOFCHAIN, _FREESECT) and n_minifat:
        for i in _chain(fat, first_minifat, max_chain):
            minifat.extend(struct.unpack_from("<128I", sector(i), 0))

    def read_mini(start: int, size: int) -> bytes:
        out, s, hops = [], start, 0
        while s != _ENDOFCHAIN:
            if s >= len(minifat) or hops > len(minifat) + 1:
                raise CfbError("broken mini chain")
            out.append(mini_stream[s * _MINI_SECT:(s + 1) * _MINI_SECT])
            s = minifat[s]
            hops += 1
        return b"".join(out)[:size]

    streams: dict[str, bytes] = {}
    for name, etype, start, size in entries:
        if etype != 2:  # stream objects only
            continue
        if size < _MINI_CUTOFF and minifat:
            streams[name] = read_mini(start, size)
        else:
            streams[name] = read_chain(start, size)
    return streams


def cfb_build(streams: list[tuple[str, bytes]]) -> bytes:
    """Minimal CFB writer: every stream padded to the 4096-byte mini
    cutoff (real length recorded in the directory) so all storage is
    regular sectors; header-DIFAT only (plenty for test documents)."""
    padded = [(n, b, max(len(b), _MINI_CUTOFF)) for n, b in streams]
    data_sectors: list[bytes] = []
    starts: list[int] = []
    for _, b, pad in padded:
        starts.append(len(data_sectors))
        blob = b + b"\x00" * (pad - len(b))
        if len(blob) % _SECT:
            blob += b"\x00" * (_SECT - len(blob) % _SECT)
        for off in range(0, len(blob), _SECT):
            data_sectors.append(blob[off:off + _SECT])

    # directory: root + streams, one sector per 4 entries
    def dir_entry(name: str, etype: int, start: int, size: int,
                  child: int = _NOSTREAM, right: int = _NOSTREAM) -> bytes:
        nm = name.encode("utf-16-le")
        e = bytearray(128)
        e[:len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<I", e, 68, _NOSTREAM)  # left
        struct.pack_into("<I", e, 72, right)
        struct.pack_into("<I", e, 76, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    entries = [
        dir_entry("Root Entry", 5, _ENDOFCHAIN, 0,
                  child=1 if padded else _NOSTREAM)
    ]
    for i, ((name, b, _), start) in enumerate(zip(padded, starts)):
        right = i + 2 if i + 1 < len(padded) else _NOSTREAM
        entries.append(dir_entry(name, 2, start, len(b), right=right))
    dir_blob = b"".join(entries)
    if len(dir_blob) % _SECT:
        dir_blob += b"\x00" * (_SECT - len(dir_blob) % _SECT)
    n_dir = len(dir_blob) // _SECT

    # fixpoint on FAT sector count
    n_data = len(data_sectors)
    n_fat = 1
    while True:
        total = n_data + n_dir + n_fat
        need = (total * 4 + _SECT - 1) // _SECT
        if need <= n_fat:
            break
        n_fat = need
    first_dir = n_data
    first_fat = n_data + n_dir
    fat = [_FREESECT] * (n_fat * _SECT // 4)
    pos = 0
    for (name, b, pad), start in zip(padded, starts):
        n = (max(pad, len(b)) + _SECT - 1) // _SECT
        for j in range(n - 1):
            fat[start + j] = start + j + 1
        fat[start + n - 1] = _ENDOFCHAIN
        pos = start + n
    for j in range(n_dir - 1):
        fat[first_dir + j] = first_dir + j + 1
    fat[first_dir + n_dir - 1] = _ENDOFCHAIN
    for j in range(n_fat):
        fat[first_fat + j] = 0xFFFFFFFD  # FATSECT marker

    header = bytearray(_SECT)
    header[:8] = _MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major (512-byte sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)       # sector shift
    struct.pack_into("<H", header, 32, 6)       # mini shift
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, first_dir)
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # no mini FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<I", header, 76 + 4 * i,
                         first_fat + i if i < n_fat else _FREESECT)

    fat_blob = struct.pack(f"<{len(fat)}I", *fat)
    return bytes(header) + b"".join(data_sectors) + dir_blob + fat_blob


# ---------------------------------------------------------------------------
# SummaryInformation property set (title)
# ---------------------------------------------------------------------------

def make_summary_info(title: str) -> bytes:
    tb = title.encode("cp1252", "replace") + b"\x00"
    prop_val = struct.pack("<II", 30, len(tb)) + tb  # VT_LPSTR
    if len(prop_val) % 4:
        prop_val += b"\x00" * (4 - len(prop_val) % 4)
    # section: cb, cProps=1, (propId=2, offset=16), value
    section = struct.pack("<IIII", 16 + len(prop_val), 1, 2, 16) + prop_val
    head = struct.pack("<HHI", 0xFFFE, 0, 0x00020005) + b"\x00" * 16
    head += struct.pack("<I", 1) + _SUMMARY_FMTID + struct.pack("<I", 48)
    return head + section


def summary_title(blob: bytes) -> str:
    try:
        if struct.unpack_from("<H", blob, 0)[0] != 0xFFFE:
            return ""
        (n_sections,) = struct.unpack_from("<I", blob, 24)
        for i in range(n_sections):
            fmtid = blob[28 + 20 * i:28 + 20 * i + 16]
            (off,) = struct.unpack_from("<I", blob, 28 + 20 * i + 16)
            if fmtid != _SUMMARY_FMTID:
                continue
            (_, n_props) = struct.unpack_from("<II", blob, off)
            for p in range(n_props):
                pid, poff = struct.unpack_from("<II", blob, off + 8 + 8 * p)
                if pid != 2:  # PIDSI_TITLE
                    continue
                (vt,) = struct.unpack_from("<I", blob, off + poff)
                (cb,) = struct.unpack_from("<I", blob, off + poff + 4)
                if vt == 30:  # VT_LPSTR, cb bytes incl nul, cp1252
                    raw = blob[off + poff + 8:off + poff + 8 + cb]
                    return raw.split(b"\x00")[0].decode("cp1252", "replace")
                if vt == 31:  # VT_LPWSTR, cb is cch in CHARS (2 bytes each)
                    raw = blob[off + poff + 8:off + poff + 8 + 2 * cb]
                    return raw.decode("utf-16-le", "replace").rstrip("\x00")
        return ""
    except (struct.error, IndexError):
        return ""


# ---------------------------------------------------------------------------
# Word 97 (.doc)
# ---------------------------------------------------------------------------

_FIB_BASE = 1024  # text starts after the FIB block we reserve


def make_doc(paragraphs: list[str], title: str | None = None) -> bytes:
    """Two-piece Word 97 document: the first half of the text stored
    compressed (CP1252), the second as UTF-16LE — exercising both
    piece decodings."""
    text = "\r".join(paragraphs) + "\r"
    n = len(text)
    split = n // 2
    t1, t2 = text[:split], text[split:]
    b1 = t1.encode("cp1252", "replace")
    fc1 = _FIB_BASE
    b2 = t2.encode("utf-16-le")
    fc2 = fc1 + len(b1)

    word = bytearray(_FIB_BASE)
    struct.pack_into("<H", word, 0, 0xA5EC)   # wIdent
    struct.pack_into("<H", word, 2, 0x00C1)   # nFib (Word 97)
    struct.pack_into("<H", word, 10, 0x0200)  # fWhichTblStm -> 1Table
    struct.pack_into("<I", word, 0x18, fc1)        # fcMin
    struct.pack_into("<I", word, 0x1C, fc2 + len(b2))  # fcMac
    struct.pack_into("<I", word, 0x4C, n)     # ccpText
    word_stream = bytes(word) + b1 + b2

    # CLX: one clxt=2 Pcdt with a 2-piece PlcPcd
    cps = struct.pack("<III", 0, split, n)
    pcd1 = struct.pack("<HIH", 0, (fc1 * 2) | (1 << 30), 0)  # compressed
    pcd2 = struct.pack("<HIH", 0, fc2, 0)                    # utf-16
    plc = cps + pcd1 + pcd2
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    fib = bytearray(word_stream)
    struct.pack_into("<I", fib, 0x01A2, 0)         # fcClx (in 1Table)
    struct.pack_into("<I", fib, 0x01A6, len(clx))  # lcbClx
    word_stream = bytes(fib)

    streams = [("WordDocument", word_stream), ("1Table", clx)]
    if title is not None:
        streams.append(("\x05SummaryInformation", make_summary_info(title)))
    return cfb_build(streams)


def doc_extract(streams: dict[str, bytes]) -> dict:
    wd = streams.get("WordDocument")
    if wd is None or len(wd) < 0x200:
        return {"ok": False, "status": "failed: no WordDocument stream",
                "title": "", "text": ""}
    if struct.unpack_from("<H", wd, 0)[0] != 0xA5EC:
        return {"ok": False, "status": "failed: bad FIB magic",
                "title": "", "text": ""}
    flags = struct.unpack_from("<H", wd, 10)[0]
    which = (flags >> 9) & 1
    table = streams.get(f"{which}Table") or streams.get(f"{1 - which}Table")
    fc_clx = struct.unpack_from("<I", wd, 0x01A2)[0]
    lcb_clx = struct.unpack_from("<I", wd, 0x01A6)[0]
    pieces: list[tuple[int, int, int, bool]] = []
    if table and lcb_clx:
        clx = table[fc_clx:fc_clx + lcb_clx]
        pos = 0
        try:
            while pos < len(clx) and clx[pos] == 0x01:  # RgPrc entries
                (cb,) = struct.unpack_from("<H", clx, pos + 1)
                pos += 3 + cb
            if pos < len(clx) and clx[pos] == 0x02:
                (lcb,) = struct.unpack_from("<I", clx, pos + 1)
                plc = clx[pos + 5:pos + 5 + lcb]
                n_pieces = (len(plc) - 4) // 12
                cps = struct.unpack_from(f"<{n_pieces + 1}I", plc, 0)
                for i in range(n_pieces):
                    fc_raw = struct.unpack_from(
                        "<I", plc, (n_pieces + 1) * 4 + i * 8 + 2
                    )[0]
                    compressed = bool(fc_raw & (1 << 30))
                    fc = fc_raw & 0x3FFFFFFF
                    if compressed:
                        fc //= 2
                    pieces.append((cps[i], cps[i + 1], fc, compressed))
        except (struct.error, IndexError):
            pieces = []
    if not pieces:
        # fall back to the fcMin/fcMac contiguous-CP1252 contract
        fc_min = struct.unpack_from("<I", wd, 0x18)[0]
        fc_mac = struct.unpack_from("<I", wd, 0x1C)[0]
        if not (0 < fc_min <= fc_mac <= len(wd)):
            return {"ok": False, "status": "failed: no piece table",
                    "title": "", "text": ""}
        text = wd[fc_min:fc_mac].decode("cp1252", "replace")
    else:
        parts = []
        for cp_start, cp_end, fc, compressed in pieces:
            n = cp_end - cp_start
            if compressed:
                parts.append(wd[fc:fc + n].decode("cp1252", "replace"))
            else:
                parts.append(wd[fc:fc + 2 * n].decode("utf-16-le", "replace"))
        text = "".join(parts)
    text = text.replace("\x07", "\t").replace("\r", "\n").rstrip("\n")
    return {"ok": True, "status": "success", "title": "", "text": text}


# ---------------------------------------------------------------------------
# BIFF8 (.xls)
# ---------------------------------------------------------------------------

def _biff_record(rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(payload)) + payload


def make_xls(rows: list[list], sheet_name: str = "Sheet1",
             title: str | None = None) -> bytes:
    strings: list[str] = []
    string_idx: dict[str, int] = {}
    cells: list[tuple[int, int, bytes]] = []
    total_refs = 0
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                cells.append(
                    (r, c, _biff_record(
                        0x0203, struct.pack("<HHH", r, c, 0)
                        + struct.pack("<d", float(v))))
                )
            else:
                s = str(v)
                if s not in string_idx:
                    string_idx[s] = len(strings)
                    strings.append(s)
                total_refs += 1
                cells.append(
                    (r, c, _biff_record(
                        0x00FD, struct.pack("<HHHI", r, c, 0, string_idx[s])))
                )
    sst = struct.pack("<II", total_refs, len(strings))
    for s in strings:
        try:
            raw = s.encode("ascii")
            sst += struct.pack("<HB", len(s), 0x00) + raw
        except UnicodeEncodeError:
            sst += struct.pack("<HB", len(s), 0x01) + s.encode("utf-16-le")

    nm = sheet_name.encode("ascii", "replace")
    out = _biff_record(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    out += _biff_record(0x0085, struct.pack("<IHB", 0, 0, len(nm)) + b"\x00" + nm)
    out += _biff_record(0x00FC, sst)
    out += _biff_record(0x000A, b"")
    out += _biff_record(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    for _, _, rec in cells:
        out += rec
    out += _biff_record(0x000A, b"")

    streams = [("Workbook", out)]
    if title is not None:
        streams.append(("\x05SummaryInformation", make_summary_info(title)))
    return cfb_build(streams)


def _fmt_num(v: float) -> str:
    return "%g" % v


def xls_extract(streams: dict[str, bytes]) -> dict:
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        return {"ok": False, "status": "failed: no Workbook stream",
                "title": "", "text": ""}
    sst: list[str] = []
    cells: dict[tuple[int, int], str] = {}
    pos = 0
    try:
        while pos + 4 <= len(wb):
            rtype, ln = struct.unpack_from("<HH", wb, pos)
            if pos + 4 + ln > len(wb):
                return {"ok": False, "status": "failed: corrupt BIFF stream",
                        "title": "", "text": ""}
            payload = wb[pos + 4:pos + 4 + ln]
            pos += 4 + ln
            if rtype == 0x00FC:  # SST
                (_, n_unique) = struct.unpack_from("<II", payload, 0)
                p = 8
                for _ in range(n_unique):
                    cch, grbit = struct.unpack_from("<HB", payload, p)
                    p += 3
                    if grbit & 0x01:
                        sst.append(
                            payload[p:p + 2 * cch].decode("utf-16-le", "replace")
                        )
                        p += 2 * cch
                    else:
                        sst.append(payload[p:p + cch].decode("cp1252", "replace"))
                        p += cch
            elif rtype == 0x00FD and ln >= 10:  # LABELSST
                r, c, _, isst = struct.unpack_from("<HHHI", payload, 0)
                if isst < len(sst):
                    cells[(r, c)] = sst[isst]
            elif rtype == 0x0203 and ln >= 14:  # NUMBER
                r, c, _ = struct.unpack_from("<HHH", payload, 0)
                (v,) = struct.unpack_from("<d", payload, 6)
                cells[(r, c)] = _fmt_num(v)
    except (struct.error, IndexError):
        return {"ok": False, "status": "failed: corrupt BIFF stream",
                "title": "", "text": ""}
    lines = []
    for r in sorted({rc[0] for rc in cells}):
        lines.append(
            " ".join(cells[(r, c)] for c in sorted(c for rr, c in cells if rr == r))
        )
    return {"ok": True, "status": "success", "title": "", "text": "\n".join(lines)}


# ---------------------------------------------------------------------------
# top-level extraction + Spark operator
# ---------------------------------------------------------------------------

def msoffice_extract(data: bytes) -> dict:
    """DOC/XLS text + SummaryInformation title from an OLE2 blob."""
    try:
        streams = cfb_open(data)
    except CfbError as e:
        return {"ok": False, "status": f"failed: {e}", "title": "", "text": ""}
    if "WordDocument" in streams:
        r = doc_extract(streams)
    elif "Workbook" in streams or "Book" in streams:
        r = xls_extract(streams)
    else:
        return {"ok": False, "status": "failed: unknown OLE2 document",
                "title": "", "text": ""}
    si = streams.get("\x05SummaryInformation")
    if r["ok"] and si:
        r["title"] = summary_title(si)
    return r


_MSOFFICE_FIELDS = [
    T.StructField("msoffice_ok", T.BooleanType()),
    T.StructField("msoffice_status", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
]


def msoffice_parse_rows(
    slice_df: DataFrame,
    id_col: str = "url_hash",
    bytes_col: str = "bytes",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *passthrough, ok, status, title, text) per DOC/XLS row —
    Arrow-batched; only the OLE2 slice of a dispatch reaches this."""
    import pandas as pd

    schema = T.StructType(
        [T.StructField(id_col, T.StringType())]
        + [T.StructField(c, slice_df.schema[c].dataType) for c in passthrough]
        + _MSOFFICE_FIELDS
    )
    cols = [f.name for f in schema.fields]

    def _parse(it):
        for pdf in it:
            recs = []
            for i in range(len(pdf)):
                blob = pdf[bytes_col].iat[i]
                r = msoffice_extract(bytes(blob) if blob is not None else b"")
                rec = {
                    id_col: pdf[id_col].iat[i],
                    "msoffice_ok": r["ok"],
                    "msoffice_status": r["status"],
                    "title": r["title"],
                    "text": r["text"],
                }
                for c in passthrough:
                    rec[c] = pdf[c].iat[i]
                recs.append(rec)
            yield pd.DataFrame(recs, columns=cols)

    sel = [id_col, *passthrough, bytes_col]
    return slice_df.select(*sel).mapInPandas(_parse, schema)
