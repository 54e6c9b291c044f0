"""Vectorized batch RTCM decode (the 100 TB ingest hot path).

Same semantics as the row-wise ``rtcm._decode_one`` (kept as the
readable reference implementation and golden-test oracle), but decoded
with the NumPy bit-plane toolkit (``functions.bitvec``): a batch of
frames becomes one uint8 matrix; CRC, message-type dispatch, MSM
headers, masks, satellite blocks and signal cells are each extracted
for ALL frames of a kind at once. Per-(frame,satellite) and
per-(frame,cell) fields use flat ragged index arrays — the NumPy analog
of ``posexplode`` — so no Python loop scales with satellite or cell
count.

Output is built directly as Arrow ``ListArray(StructArray)`` columns
from the flat buffers (``mapInArrow``), skipping the
pandas-object-per-row detour entirely.

Layout citations as in operators/rtcm.py (reference src/rtcm3.py:316-391,
RTCM 10403 transcription). Frame-relative bit offsets (payload starts
at bit 24 after the 0xD3/len envelope header):

  MSM   : station 36:12, epoch 48:30, flags 78:19, sat_mask 97:64,
          sig_mask 161:32, cell_mask 193:(nsat*nsig), then field-major
          satellite block (8/4/10/14-bit fields) and cell block
          (MSM5: 15/22/4/1/6/15, MSM7: 20/24/10/1/10/15).
  legacy: station 36:12, epoch 48:30 (GPS) / 48:27 (GLONASS), nsat
          after the sync bit.
  1005/6: ecef_x s38@58, ecef_y s38@98, ecef_z s38@138, ant u16@176.
  1029  : station 36:12, nbytes 88:8, UTF-8 text from byte 12.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ntripmonitor_spark.functions.bitvec import (
    frames_matrix,
    mask_positions,
    mask_string_chars,
    popcount64,
    ragged_indices,
    read_mask,
    read_sint,
    read_uint,
)
from ntripmonitor_spark.functions.crc24q import frame_crc_ok_batch
from ntripmonitor_spark.operators.rtcm import LEGACY_FIELDS, LEGACY_LAYOUTS

_MSM_HUNDREDS = np.array([107, 108, 109, 110, 111, 112])

_SAT_FIELDS = ("int_ms", "ext_info", "mod1ms", "rough_rate")
_CELL_FIELDS = ("fine_code", "fine_phase", "lock", "half_cycle", "cnr", "fine_rate")
# Wire layouts per MSM level as ordered (field, width, signed) —
# fields absent from a level stay null in the IR. MSM1-3 carry the
# low-res subsets; MSM4/6 carry no fine rate (decoded gracefully,
# SURVEY.md §7.3; the reference's DecoderMSM only scales 5/7).
_LO_CELLS = (("fine_code", 15, True), ("fine_phase", 22, True),
             ("lock", 4, False), ("half_cycle", 1, False))
_HI_CELLS = (("fine_code", 20, True), ("fine_phase", 24, True),
             ("lock", 10, False), ("half_cycle", 1, False), ("cnr", 10, False))
_CELL_LAYOUT = {
    1: _LO_CELLS[:1],
    2: _LO_CELLS[1:],
    3: _LO_CELLS,
    4: _LO_CELLS + (("cnr", 6, False),),
    5: _LO_CELLS + (("cnr", 6, False), ("fine_rate", 15, True)),
    6: _HI_CELLS,
    7: _HI_CELLS + (("fine_rate", 15, True),),
}
_SAT_LAYOUT = {
    1: (("mod1ms", 10, False),),
    2: (("mod1ms", 10, False),),
    3: (("mod1ms", 10, False),),
    4: (("int_ms", 8, False), ("mod1ms", 10, False)),
    6: (("int_ms", 8, False), ("mod1ms", 10, False)),
    5: (("int_ms", 8, False), ("ext_info", 4, False), ("mod1ms", 10, False),
        ("rough_rate", 14, True)),
    7: (("int_ms", 8, False), ("ext_info", 4, False), ("mod1ms", 10, False),
        ("rough_rate", 14, True)),
}
_SAT_BITS = {lvl: sum(w for _, w, _ in lay) for lvl, lay in _SAT_LAYOUT.items()}
_LEGACY_EPOCH_BITS = {True: 30, False: 27}  # is_gps


class _Cols:
    """Per-frame output accumulators (None-marked via bool masks)."""

    def __init__(self, n: int):
        self.n = n
        self.msg_type = np.zeros(n, np.int64)
        self.msg_type_valid = np.zeros(n, bool)
        self.station = np.zeros(n, np.int64)
        self.station_valid = np.zeros(n, bool)
        self.epoch = np.zeros(n, np.int64)
        self.epoch_valid = np.zeros(n, bool)
        self.gdow = np.zeros(n, np.int64)
        self.gdow_valid = np.zeros(n, bool)
        self.ecef = {k: (np.zeros(n, np.int64), np.zeros(n, bool)) for k in ("x", "y", "z", "ant")}
        self.text: list = [None] * n
        # raw mask values for the rows that reached the MSM header —
        # mask STRINGS are assembled buffer-level at the Arrow stage
        # (mask_string_chars), never as per-row Python strings
        self.mask_rows = np.zeros(0, np.int64)
        self.satm = np.zeros(0, np.uint64)
        self.sigm = np.zeros(0, np.uint64)
        self.cellm = np.zeros(0, np.uint64)
        self.cell_widths = np.zeros(0, np.int64)
        # mask set-bit positions (flat buffers + per-row counts; valid
        # exactly where the mask strings are)
        self.nsatpos = np.zeros(n, np.int64)
        self.nsigpos = np.zeros(n, np.int64)
        self.ncellpos = np.zeros(n, np.int64)
        self.slots_valid = np.zeros(n, bool)
        self.slot_rows = np.zeros(0, np.int64)
        self.satpos_flat = np.zeros(0, np.int64)
        self.sigpos_flat = np.zeros(0, np.int64)
        self.cellpos_flat = np.zeros(0, np.int64)
        # sats / cells list containers
        self.nsat = np.zeros(n, np.int64)       # list length where sats_valid
        self.sats_valid = np.zeros(n, bool)
        self.ncells = np.zeros(n, np.int64)
        self.cells_valid = np.zeros(n, bool)
        self.nleg = np.zeros(n, np.int64)       # legacy record list length
        self.legacy_valid = np.zeros(n, bool)


def _decode_msm(m, lens, cols: _Cols, rows: np.ndarray, payload_bits: np.ndarray):
    """Partial-assignment semantics mirror the row-wise decoder: each
    field group is populated iff the payload reaches it (EOFError mid-
    read in ``_decode_one`` leaves earlier assignments in place)."""
    t = cols.msg_type[rows]
    pb = payload_bits[rows]
    # station readable at payload bits [12,24); epoch at [24,54).
    r_st = rows[pb >= 24]
    cols.station[r_st] = read_uint(m, r_st, 36, 12)
    cols.station_valid[r_st] = True
    ok_ep = pb >= 54
    r_ep, t_ep = rows[ok_ep], t[ok_ep]
    e30 = read_uint(m, r_ep, 48, 30)
    glo = (t_ep >= 1081) & (t_ep <= 1087)
    cols.epoch[r_ep] = np.where(glo, e30 & ((1 << 27) - 1), e30)
    cols.epoch_valid[r_ep] = True
    cols.gdow[r_ep[glo]] = e30[glo] >> 27
    cols.gdow_valid[r_ep[glo]] = True

    ok_hdr = pb >= 169
    r = rows[ok_hdr]
    if not len(r):
        return None
    t = t[ok_hdr]
    satm = read_mask(m, r, 97, 64)
    sigm = read_mask(m, r, 161, 32)
    nsat = popcount64(satm)
    nsig = popcount64(sigm)
    csize = nsat * nsig
    # RTCM DF396 caps the cell mask at 64 bits; frames violating that
    # (impossible per spec) get envelope-only treatment here.
    ok_cm = (csize <= 64) & (payload_bits[r] >= 169 + csize)
    r2, t2 = r[ok_cm], t[ok_cm]
    nsat2, nsig2, csize2 = nsat[ok_cm], nsig[ok_cm], csize[ok_cm]
    cellm = read_mask(m, r2, 193, np.maximum(csize2, 1)) & _width_mask(csize2)
    # r2 is ascending, so flat buffers derived from these are already
    # in global row order for the Arrow assembly
    cols.mask_rows = r2
    cols.satm, cols.sigm = satm[ok_cm], sigm[ok_cm]
    cols.cellm, cols.cell_widths = cellm, csize2
    cols.slot_rows = r2
    cols.satpos_flat, satc = mask_positions(satm[ok_cm], 64)
    cols.sigpos_flat, sigc = mask_positions(sigm[ok_cm], 32)
    cols.cellpos_flat, cellc = mask_positions(cellm, csize2)
    cols.nsatpos[r2], cols.nsigpos[r2], cols.ncellpos[r2] = satc, sigc, cellc
    cols.slots_valid[r2] = True

    level = t2 % 10
    out = []
    for lvl in (1, 2, 3, 4, 5, 6, 7):
        sel = level == lvl
        if not sel.any():
            continue
        r3 = r2[sel]
        ns, nsg, cs = nsat2[sel], nsig2[sel], csize2[sel]
        sat_bits = _SAT_BITS[lvl] * ns
        ok_sat = payload_bits[r3] >= 169 + cs + sat_bits
        r4 = r3[ok_sat]
        if not len(r4):
            continue
        ns4, cs4 = ns[ok_sat], cs[ok_sat]
        ncell4 = popcount64(read_mask(m, r3, 193, np.maximum(cs, 1)) & _width_mask(cs))[ok_sat]
        cell_w = sum(w for _, w, _ in _CELL_LAYOUT[lvl])
        ok_cell = payload_bits[r4] >= 169 + cs4 + sat_bits[ok_sat] + cell_w * ncell4
        cols.nsat[r4] = ns4
        cols.sats_valid[r4] = True
        cols.ncells[r4[ok_cell]] = ncell4[ok_cell]
        cols.cells_valid[r4[ok_cell]] = True
        out.append((lvl, r4, ns4, cs4, ncell4, ok_cell))
    return out


def _width_mask(w: np.ndarray) -> np.ndarray:
    """uint64 mask of the w low bits (w may be 0..64)."""
    w = w.astype(np.uint64)
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    return np.where(w >= 64, full, (np.uint64(1) << w) - np.uint64(1))


def decode_matrix(frames: "list[bytes] | pa.Array") -> dict:
    """Batch decode → dict of flat per-frame arrays + flat sat/cell
    child buffers with list offsets (Arrow-assembly-ready)."""
    n = len(frames)
    cols = _Cols(n)
    if n == 0:
        z = np.zeros(1, np.int64)
        empty = lambda fields: {f: (np.zeros(0, np.int64), np.zeros(0, bool)) for f in fields}  # noqa: E731
        return {"cols": cols, "lens": np.zeros(0, np.int64), "crc_ok": np.zeros(0, bool),
                "sat_starts": z, "sat_children": empty(_SAT_FIELDS),
                "cell_starts": z, "cell_children": empty(_CELL_FIELDS),
                "leg_starts": z, "leg_children": empty(LEGACY_FIELDS)}
    m, lens = frames_matrix(frames)
    crc_ok = frame_crc_ok_batch(m, lens)
    ok = crc_ok & (lens >= 8)
    payload_bits = (lens - 6) * 8

    rows_ok = np.flatnonzero(ok)
    cols.msg_type[rows_ok] = read_uint(m, rows_ok, 24, 12)
    cols.msg_type_valid[rows_ok] = True
    t = cols.msg_type

    is_msm = np.zeros(n, bool)
    is_msm[rows_ok] = np.isin(t[rows_ok] // 10, _MSM_HUNDREDS) & (t[rows_ok] % 10 >= 1) & (t[rows_ok] % 10 <= 7)
    msm57 = _decode_msm(m, lens, cols, np.flatnonzero(is_msm), payload_bits) or []

    # Legacy observables 1001-1004 / 1009-1012: header + per-satellite
    # records (layouts src/rtcm3.py:320-339); records decode only when
    # ALL nsat records fit the payload (matching the row-wise decoder).
    is_leg = np.zeros(n, bool)
    is_leg[rows_ok] = ((t[rows_ok] >= 1001) & (t[rows_ok] <= 1004)) | (
        (t[rows_ok] >= 1009) & (t[rows_ok] <= 1012)
    )
    rl = np.flatnonzero(is_leg)
    if len(rl):
        is_gps = t[rl] <= 1004
        pb = payload_bits[rl]
        r = rl[pb >= 24]
        cols.station[r] = read_uint(m, r, 36, 12)
        cols.station_valid[r] = True
        ok_ep = pb >= np.where(is_gps, 54, 51)
        r = rl[ok_ep]
        e30 = read_uint(m, r, 48, 30)
        cols.epoch[r] = np.where(is_gps[ok_ep], e30, e30 >> 3)
        cols.epoch_valid[r] = True
        # nsat at payload [55,60) GPS / [52,57) GLONASS; the sats list
        # is assigned once the 4-bit smoothing tail is readable too.
        ok_ns = pb >= np.where(is_gps, 64, 61)
        r = rl[ok_ns]
        cols.nsat[r] = read_uint(m, r, np.where(is_gps[ok_ns], 79, 76), 5)
        cols.sats_valid[r] = True
        # Full-record reach: header (64/61 payload bits) + nsat·rec.
        rec_bits = np.array([sum(w for _, w, _ in LEGACY_LAYOUTS[tt]) for tt in t[r]])
        hdr = np.where(is_gps[ok_ns], 64, 61)
        full = pb[ok_ns] >= hdr + cols.nsat[r] * rec_bits
        rf = r[full]
        cols.nleg[rf] = cols.nsat[rf]
        cols.legacy_valid[rf] = True

    # Station ARP 1005/1006 — per-field reach (reads at payload-
    # relative x:[34,72) y:[74,112) z:[114,152) ant:[152,168)).
    is_arp = ok & ((t == 1005) | (t == 1006))
    ra = np.flatnonzero(is_arp)
    if len(ra):
        pb = payload_bits[ra]
        r = ra[pb >= 24]
        cols.station[r] = read_uint(m, r, 36, 12)
        cols.station_valid[r] = True
        for key, off, w, need in (("x", 58, 38, 72), ("y", 98, 38, 112), ("z", 138, 38, 152)):
            r = ra[pb >= need]
            arr, valid = cols.ecef[key]
            arr[r] = read_sint(m, r, off, 38)
            valid[r] = True
        r = ra[(t[ra] == 1006) & (pb >= 168)]
        arr, valid = cols.ecef["ant"]
        arr[r] = read_uint(m, r, 176, 16)
        valid[r] = True

    # Text 1029 (station at [12,24), nbytes at [64,72), UTF-8 bytes
    # from payload byte 9 = frame byte 12).
    rt = np.flatnonzero(ok & (t == 1029))
    if len(rt):
        pb = payload_bits[rt]
        r = rt[pb >= 24]
        cols.station[r] = read_uint(m, r, 36, 12)
        cols.station_valid[r] = True
        r = rt[pb >= 72]
        nbytes = read_uint(m, r, 88, 8)
        fits = payload_bits[r] >= 72 + nbytes * 8
        for i, nb in zip(r[fits], nbytes[fits]):
            cols.text[i] = m[i, 12 : 12 + nb].tobytes().decode("utf-8", errors="replace")

    # ---- flat sat / cell child buffers --------------------------------
    sat_starts = np.concatenate([[0], np.cumsum(cols.nsat)])
    total_sat = int(sat_starts[-1])
    sat_children = {
        f: (np.zeros(total_sat, np.int64), np.ones(total_sat, bool)) for f in _SAT_FIELDS
    }
    cell_starts = np.concatenate([[0], np.cumsum(cols.ncells)])
    total_cell = int(cell_starts[-1])
    cell_children = {
        f: (np.zeros(total_cell, np.int64), np.ones(total_cell, bool)) for f in _CELL_FIELDS
    }
    leg_starts = np.concatenate([[0], np.cumsum(cols.nleg)])
    total_leg = int(leg_starts[-1])
    leg_children = {
        f: (np.zeros(total_leg, np.int64), np.ones(total_leg, bool)) for f in LEGACY_FIELDS
    }

    # Legacy records: fixed width per type → field offset is an affine
    # function of the record index (record-major on the wire, unlike
    # the field-major MSM blocks).
    rleg = np.flatnonzero(cols.legacy_valid)
    for t_val, layout in LEGACY_LAYOUTS.items():
        rt_ = rleg[cols.msg_type[rleg] == t_val]
        if not len(rt_):
            continue
        rec_w = sum(w for _, w, _ in layout)
        hdr_frame = 24 + (64 if t_val <= 1004 else 61)
        fr, k = ragged_indices(cols.nleg[rt_])
        rows = rt_[fr]
        flat = leg_starts[rows] + k
        off0 = hdr_frame + k * rec_w
        off = 0
        for name, w, signed in layout:
            vals, mask = leg_children[name]
            vals[flat] = (read_sint if signed else read_uint)(m, rows, off0 + off, w)
            mask[flat] = False
            off += w

    for lvl, r4, ns4, cs4, ncell4, ok_cell in msm57:
        # satellite block: field-major (all int_ms, all ext, ...).
        fr, j = ragged_indices(ns4)
        rows = r4[fr]
        base = (193 + cs4)[fr]
        flat = sat_starts[rows] + j
        # field-major: field f's block starts after all previous
        # fields' full blocks — offset = base + sum(prev widths)*nsat + j*w
        prev = 0
        for name, w, signed in _SAT_LAYOUT[lvl]:
            vals, mask = sat_children[name]
            off = base + prev * ns4[fr] + j * w
            vals[flat] = (read_sint if signed else read_uint)(m, rows, off, w)
            mask[flat] = False
            prev += w

        # cell block
        rc = r4[ok_cell]
        if len(rc):
            nsc, csc, ncc = ns4[ok_cell], cs4[ok_cell], ncell4[ok_cell]
            frc, k = ragged_indices(ncc)
            rowsc = rc[frc]
            cbase = (193 + csc + _SAT_BITS[lvl] * nsc)[frc]
            flatc = cell_starts[rowsc] + k
            prev = 0
            for name, w, signed in _CELL_LAYOUT[lvl]:
                vals, mask = cell_children[name]
                off = cbase + prev * ncc[frc] + k * w
                vals[flatc] = (read_sint if signed else read_uint)(m, rowsc, off, w)
                mask[flatc] = False
                prev += w

    return {
        "cols": cols, "lens": lens, "crc_ok": crc_ok,
        "sat_starts": sat_starts, "sat_children": sat_children,
        "cell_starts": cell_starts, "cell_children": cell_children,
        "leg_starts": leg_starts, "leg_children": leg_children,
    }


# ---------------------------------------------------------------------------
# Arrow assembly
# ---------------------------------------------------------------------------

_SAT_PA = pa.struct([pa.field(f, pa.int32()) for f in _SAT_FIELDS])
_CELL_PA = pa.struct(
    [pa.field(f, pa.bool_() if f == "half_cycle" else pa.int32()) for f in _CELL_FIELDS]
)
_LEGACY_PA = pa.struct(
    [pa.field(f, pa.bool_() if f in ("l1_code", "l2_code") else pa.int32()) for f in LEGACY_FIELDS]
)


def _mask_string_array(v: np.ndarray, width, rows: np.ndarray, n: int) -> pa.Array:
    """Global string column of mask strings: values for ``rows``
    (ascending), null elsewhere — assembled from flat char buffers,
    zero per-row Python."""
    flat, w = mask_string_chars(v, width)
    w_glob = np.zeros(n, np.int64)
    w_glob[rows] = w
    offsets = np.zeros(n + 1, np.int32)
    offsets[1:] = np.cumsum(w_glob)
    valid = np.zeros(n, bool)
    valid[rows] = True
    nulls = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.utf8(), n,
        [nulls, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())],
    )


def _int_list_array(counts: np.ndarray, flat: np.ndarray, list_valid: np.ndarray) -> pa.Array:
    """list<int32> column from per-row counts + a flat value buffer
    already in ascending row order."""
    starts = np.concatenate([[0], np.cumsum(counts)])
    offsets = pa.array(starts.astype(np.int32), type=pa.int32())
    child = pa.array(flat.astype(np.int32), type=pa.int32())
    return pa.ListArray.from_arrays(offsets, child, mask=pa.array(~list_valid))


def _list_array(starts, children, struct_type, list_valid, counts) -> pa.Array:
    arrs = []
    for field in struct_type:
        vals, nullmask = children[field.name]
        if pa.types.is_boolean(field.type):
            arrs.append(pa.array(vals.astype(bool), type=pa.bool_(), mask=nullmask))
        else:
            arrs.append(pa.array(vals.astype(np.int32), type=field.type, mask=nullmask))
    struct_arr = pa.StructArray.from_arrays(arrs, fields=list(struct_type))
    offsets = pa.array(starts.astype(np.int32), type=pa.int32())
    mask = pa.array(~list_valid)
    return pa.ListArray.from_arrays(offsets, struct_arr, mask=mask)


def decoded_record_batch(
    mountpoint: pa.Array, receive_time: pa.Array, frames: "list[bytes] | pa.Array"
) -> pa.RecordBatch:
    """Decode ``frames`` and assemble the DECODED_SCHEMA record batch
    (mountpoint / receive_time are passed through unchanged)."""
    d = decode_matrix(frames)
    cols, lens = d["cols"], d["lens"]
    n = cols.n

    def iarr(vals, valid, typ=pa.int32()):
        return pa.array(vals.astype(np.int64), type=typ, mask=~valid)

    sats = _list_array(d["sat_starts"], d["sat_children"], _SAT_PA, cols.sats_valid, cols.nsat)
    cells = _list_array(d["cell_starts"], d["cell_children"], _CELL_PA, cols.cells_valid, cols.ncells)
    legacy = _list_array(d["leg_starts"], d["leg_children"], _LEGACY_PA, cols.legacy_valid, cols.nleg)

    ex, exv = cols.ecef["x"]
    ey, eyv = cols.ecef["y"]
    ez, ezv = cols.ecef["z"]
    ea, eav = cols.ecef["ant"]
    arrays = [
        mountpoint,
        receive_time,
        iarr(cols.msg_type, cols.msg_type_valid),
        pa.array(lens.astype(np.int32), type=pa.int32()),
        pa.array(d["crc_ok"]),
        iarr(cols.station, cols.station_valid),
        iarr(cols.epoch, cols.epoch_valid, pa.int64()),
        iarr(cols.gdow, cols.gdow_valid),
        _mask_string_array(cols.satm, 64, cols.mask_rows, n),
        _mask_string_array(cols.sigm, 32, cols.mask_rows, n),
        _mask_string_array(cols.cellm, cols.cell_widths, cols.mask_rows, n),
        _int_list_array(cols.nsatpos, cols.satpos_flat, cols.slots_valid),
        _int_list_array(cols.nsigpos, cols.sigpos_flat, cols.slots_valid),
        _int_list_array(cols.ncellpos, cols.cellpos_flat, cols.slots_valid),
        sats,
        cells,
        legacy,
        iarr(ex, exv, pa.int64()),
        iarr(ey, eyv, pa.int64()),
        iarr(ez, ezv, pa.int64()),
        iarr(ea, eav, pa.int64()),
        pa.array(cols.text, type=pa.string()),
    ]
    names = [
        "mountpoint", "receive_time", "msg_type", "msg_size", "crc_ok",
        "station_id", "epoch_ms", "glonass_dow", "sat_mask", "sig_mask",
        "cell_mask", "sat_slots", "sig_slots", "cell_slots", "sats",
        "cells", "legacy", "ecef_x", "ecef_y", "ecef_z",
        "ant_height", "text",
    ]
    return pa.RecordBatch.from_arrays(arrays, names=names)
