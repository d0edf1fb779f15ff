"""Test-only PROGRESSIVE JPEG encoder (T.81 annex G forward path).

Independent forward implementation to exercise the decoder's SOF2 path:
spectral-selection band scans, successive-approximation first + refinement
scans (correction-bit buffering, EOB-run accumulation), optional restart
markers. Tables: all-ones quant, flat 8-bit-canonical huffman (12 DC
categories; the 160 AC run/size symbols plus all 16 (n<<4)|0 EOBn/ZRL
symbols at code length 8 — 176 codes, Kraft-valid at 176/256).

A fully-refined progressive stream carries exactly the same quantized
coefficients as the baseline encoder in util_jpeg, so
decode(progressive(img)) must equal decode(baseline(img)) bit-for-bit —
the cross-entropy-coding differential used by the tests.
"""

import numpy as np

from security_log_analysis_rust_spark.textops.jpeg import ZIGZAG, _A
from util_jpeg import BitWriter, DC_CODES, DC_VALS, rgb_to_ycbcr, seg

AC_PROG_VALS = [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [n << 4 for n in range(16)]
AC_PROG_CODES = {v: (8, i) for i, v in enumerate(AC_PROG_VALS)}


def _dht(tc, th, vals):
    bits = [0] * 16
    bits[7] = len(vals)
    return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))


def _blocks(plane, bw, bh):
    """Padded float plane -> (bh, bw, 64) quantized zig-zag coefficients."""
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            f = _A @ (plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                      - 128.0) @ _A.T
            out[by, bx] = np.round(f).astype(np.int64).flatten()[ZIGZAG]
    return out


def _point_ac(c, al):
    return (c >> al) if c >= 0 else -((-c) >> al)


class _Comp:
    def __init__(self, cid, hs, vs, grid, cw, ch):
        self.cid, self.hs, self.vs = cid, hs, vs
        self.grid = grid  # (bh, bw, 64) on the padded MCU-aligned grid
        self.cw, self.ch = cw, ch  # non-interleaved ceil-grid dims


class _Scan:
    """One SOS segment + entropy data, with restart support."""

    def __init__(self, out, restart_interval):
        self.out = out
        self.ri = restart_interval
        self.w = BitWriter()
        self.rst = 0

    def restart(self):
        self.w.flush()
        self.out += self.w.out + bytes([0xFF, 0xD0 + self.rst])
        self.rst = (self.rst + 1) % 8
        self.w = BitWriter()

    def finish(self):
        self.w.flush()
        self.out += self.w.out


def _emit_dc_first(out, comps, mcus, al, ri):
    ns = len(comps)
    hdr = bytes([ns]) + b"".join(bytes([c.cid, 0x00]) for c in comps)
    out += seg(0xDA, hdr + bytes([0, 0, al]))
    sc = _Scan(out, ri)
    preds = {c.cid: 0 for c in comps}
    mcus_x, mcus_y = mcus
    units = mcus_x * mcus_y if ns > 1 else comps[0].cw * comps[0].ch
    for unit in range(units):
        if ri and unit and unit % ri == 0:
            sc.restart()
            preds = {c.cid: 0 for c in comps}
        for c in comps:
            if ns > 1:
                my, mx = divmod(unit, mcus_x)
                blocks = [
                    c.grid[my * c.vs + by, mx * c.hs + bx]
                    for by in range(c.vs)
                    for bx in range(c.hs)
                ]
            else:
                row, col = divmod(unit, c.cw)
                blocks = [c.grid[row, col]]
            for zz in blocks:
                dc = int(zz[0]) >> al  # arithmetic shift (G.1.2.1)
                diff = dc - preds[c.cid]
                preds[c.cid] = dc
                t = abs(diff).bit_length()
                ln, code = DC_CODES[t]
                sc.w.write(code, ln)
                if t:
                    v = diff if diff >= 0 else diff + (1 << t) - 1
                    sc.w.write(v, t)
    sc.finish()


def _emit_dc_refine(out, comps, mcus, al, ri):
    ns = len(comps)
    hdr = bytes([ns]) + b"".join(bytes([c.cid, 0x00]) for c in comps)
    out += seg(0xDA, hdr + bytes([0, 0, ((al + 1) << 4) | al]))
    sc = _Scan(out, ri)
    mcus_x, mcus_y = mcus
    units = mcus_x * mcus_y if ns > 1 else comps[0].cw * comps[0].ch
    for unit in range(units):
        if ri and unit and unit % ri == 0:
            sc.restart()
        for c in comps:
            if ns > 1:
                my, mx = divmod(unit, mcus_x)
                blocks = [
                    c.grid[my * c.vs + by, mx * c.hs + bx]
                    for by in range(c.vs)
                    for bx in range(c.hs)
                ]
            else:
                row, col = divmod(unit, c.cw)
                blocks = [c.grid[row, col]]
            for zz in blocks:
                sc.w.write((int(zz[0]) >> al) & 1, 1)
    sc.finish()


def _emit_ac_first(out, comp, ss, se, al, ri):
    out += seg(0xDA, bytes([1, comp.cid, 0x00, ss, se, al]))
    sc = _Scan(out, ri)
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            ln, code = AC_PROG_CODES[nbits << 4]
            sc.w.write(code, ln)
            if nbits:
                sc.w.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for unit in range(comp.cw * comp.ch):
        if ri and unit and unit % ri == 0:
            emit_eobrun()
            sc.restart()
        row, col = divmod(unit, comp.cw)
        zz = comp.grid[row, col]
        tvals = [_point_ac(int(zz[k]), al) for k in range(ss, se + 1)]
        if not any(tvals):
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
            continue
        emit_eobrun()
        r = 0
        for t in tvals:
            if t == 0:
                r += 1
                continue
            while r > 15:
                ln, code = AC_PROG_CODES[0xF0]
                sc.w.write(code, ln)
                r -= 16
            s = abs(t).bit_length()
            ln, code = AC_PROG_CODES[(r << 4) | s]
            sc.w.write(code, ln)
            v = t if t >= 0 else t + (1 << s) - 1
            sc.w.write(v, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()
    sc.finish()


def _emit_ac_refine(out, comp, ss, se, al, ri):
    """libjpeg-style correction-bit encoder (T.81 G.1.2.3 forward)."""
    out += seg(0xDA, bytes([1, comp.cid, 0x00, ss, se, ((al + 1) << 4) | al]))
    sc = _Scan(out, ri)
    eobrun = 0
    be_bits = []  # correction bits buffered across EOB-run blocks

    def emit_eobrun():
        nonlocal eobrun, be_bits
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            ln, code = AC_PROG_CODES[nbits << 4]
            sc.w.write(code, ln)
            if nbits:
                sc.w.write(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
            for b in be_bits:
                sc.w.write(b, 1)
            be_bits = []

    for unit in range(comp.cw * comp.ch):
        if ri and unit and unit % ri == 0:
            emit_eobrun()
            sc.restart()
        row, col = divmod(unit, comp.cw)
        zz = comp.grid[row, col]
        absvals = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = 0  # index past the last newly-nonzero coefficient
        for i, t in enumerate(absvals):
            if t == 1:
                eob = i + 1
        r = 0
        br = []  # correction bits buffered within this block
        for i, t in enumerate(absvals):
            if t == 0:
                r += 1
                continue
            while r > 15 and i < eob:
                emit_eobrun()
                ln, code = AC_PROG_CODES[0xF0]
                sc.w.write(code, ln)
                r -= 16
                for b in br:
                    sc.w.write(b, 1)
                br = []
            if t > 1:  # already nonzero at the previous level
                br.append(t & 1)
                continue
            emit_eobrun()
            ln, code = AC_PROG_CODES[(r << 4) | 1]
            sc.w.write(code, ln)
            sc.w.write(0 if int(zz[ss + i]) < 0 else 1, 1)
            for b in br:
                sc.w.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be_bits.extend(br)
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()
    sc.finish()


def encode_progressive(
    img, subsample=False, restart_interval=0, band_split=6
):
    """Grayscale 2-D array or RGB 3-D array -> progressive JPEG bytes.

    Scan script exercises every scan type: interleaved DC first (Al=1) and
    refine (Al=0); per component AC first at Al=2 (luma split into two
    spectral bands at ``band_split``), then two refinement passes
    (Ah=2->Al=1, Ah=1->Al=0) so coefficients refine fully to Al=0.
    """
    gray = img.ndim == 2
    h, wd = img.shape[:2]
    if gray:
        planes = [img.astype(float)]
        samps = [(1, 1)]
    else:
        y, cb, cr = rgb_to_ycbcr(img)
        if subsample:
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-wd // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comps = []
    for ci, (plane, (hs, vs)) in enumerate(zip(planes, samps)):
        if (hs, vs) != (hmax, vmax):  # chroma subsample by box mean
            plane = np.pad(
                plane,
                (
                    (0, mcus_y * 8 * vmax - h),
                    (0, mcus_x * 8 * hmax - wd),
                ),
                mode="edge",
            )
            fy, fx = vmax // vs, hmax // hs
            plane = plane.reshape(
                plane.shape[0] // fy, fy, plane.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        bw, bh = mcus_x * hs, mcus_y * vs
        plane = np.pad(
            plane,
            ((0, bh * 8 - plane.shape[0]), (0, bw * 8 - plane.shape[1])),
            mode="edge",
        )
        cw = -(-(-(-wd * hs // hmax)) // 8)
        ch = -(-(-(-h * vs // vmax)) // 8)
        comps.append(_Comp(ci + 1, hs, vs, _blocks(plane, bw, bh), cw, ch))

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + wd.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for c in comps:
        sof += bytes([c.cid, (c.hs << 4) | c.vs, 0])
    out += seg(0xC2, sof)
    out += _dht(0, 0, DC_VALS) + _dht(1, 0, AC_PROG_VALS)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))

    ri = restart_interval
    _emit_dc_first(out, comps, (mcus_x, mcus_y), 1, ri)
    for ci, c in enumerate(comps):
        if ci == 0 and band_split > 1:
            _emit_ac_first(out, c, 1, band_split - 1, 2, ri)
            _emit_ac_first(out, c, band_split, 63, 2, ri)
        else:
            _emit_ac_first(out, c, 1, 63, 2, ri)
    _emit_dc_refine(out, comps, (mcus_x, mcus_y), 0, ri)
    for al in (1, 0):
        for ci, c in enumerate(comps):
            if ci == 0 and band_split > 1:
                _emit_ac_refine(out, c, 1, band_split - 1, al, ri)
                _emit_ac_refine(out, c, band_split, 63, al, ri)
            else:
                _emit_ac_refine(out, c, 1, 63, al, ri)
    out += b"\xff\xd9"
    return bytes(out)
