"""Test-only baseline JPEG ENCODER (forward path) to exercise the decoder.

Independent forward implementation of T.81 baseline: forward DCT (shared
orthonormal basis), all-ones quant tables, flat 8-bit-canonical huffman
tables (12 DC categories / all 162 AC run-size symbols at code length 8 —
valid per Annex C, chosen for construction simplicity, not compression).
Round-tripping through the decoder bounds the combined error at the
coefficient-rounding level (±2 worst-case per sample with Q=1).
"""
import numpy as np
from security_log_analysis_rust_spark.textops.jpeg import ZIGZAG, _A

DC_VALS = list(range(12))
AC_VALS = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]

def _canonical(vals):
    # all codes at length 8
    return {v: (8, i) for i, v in enumerate(vals)}

DC_CODES = _canonical(DC_VALS)
AC_CODES = _canonical(AC_VALS)

class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0
    def write(self, val, n):
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.bits += n
        while self.bits >= 8:
            self.bits -= 8
            b = (self.acc >> self.bits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
    def flush(self):
        if self.bits:
            pad = 8 - self.bits
            self.write((1 << pad) - 1, pad)

def seg(marker, data):
    return bytes([0xFF, marker]) + (len(data) + 2).to_bytes(2, "big") + data

def dht(tc, th, vals):
    bits = [0]*16
    bits[7] = len(vals)  # all length-8
    return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

def encode_block(w, pixels, pred):
    """pixels: 8x8 float (0..255). returns new pred."""
    f = _A @ (pixels - 128.0) @ _A.T
    q = np.round(f).astype(int)
    zz = q.flatten()[ZIGZAG]
    dc = int(zz[0]); diff = dc - pred
    t = abs(diff).bit_length()
    ln, code = DC_CODES[t]
    w.write(code, ln)
    if t:
        v = diff if diff >= 0 else diff + (1 << t) - 1
        w.write(v, t)
    run = 0
    last_nz = max([i for i in range(1, 64) if zz[i] != 0], default=0)
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            ln, code = AC_CODES[0x00]; w.write(code, ln)  # EOB
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = AC_CODES[0xF0]; w.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        ln, code = AC_CODES[(run << 4) | s]
        w.write(code, ln)
        vv = v if v >= 0 else v + (1 << s) - 1
        w.write(vv, s)
        run = 0
    return dc

def encode_gray(img, restart_interval=0):
    h, wd = img.shape
    out = bytearray(b"\xff\xd8")
    qt = bytes([0]) + bytes([1]*64)
    out += seg(0xDB, qt)
    out += seg(0xC0, bytes([8]) + h.to_bytes(2,"big") + wd.to_bytes(2,"big") + bytes([1, 1, 0x11, 0]))
    out += dht(0, 0, DC_VALS) + dht(1, 0, AC_VALS)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    w = BitWriter()
    pred = 0
    bh, bw = -(-h//8), -(-wd//8)
    pad = np.pad(img.astype(float), ((0, bh*8-h), (0, bw*8-wd)), mode="edge")
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.flush()
                out += w.out + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                w = BitWriter()
                pred = 0
            pred = encode_block(w, pad[by*8:by*8+8, bx*8:bx*8+8], pred)
            mcu += 1
    w.flush()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)

def rgb_to_ycbcr(rgb):
    r, g, b = rgb[...,0].astype(float), rgb[...,1].astype(float), rgb[...,2].astype(float)
    y = 0.299*r + 0.587*g + 0.114*b
    cb = -0.168736*r - 0.331264*g + 0.5*b + 128
    cr = 0.5*r - 0.418688*g - 0.081312*b + 128
    return y, cb, cr

def encode_color(rgb, subsample=False):
    h, wd = rgb.shape[:2]
    y, cb, cr = rgb_to_ycbcr(rgb)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1]*64))
    if subsample:
        sof = bytes([8]) + h.to_bytes(2,"big") + wd.to_bytes(2,"big") + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    else:
        sof = bytes([8]) + h.to_bytes(2,"big") + wd.to_bytes(2,"big") + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    out += seg(0xC0, sof)
    out += dht(0, 0, DC_VALS) + dht(1, 0, AC_VALS)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    w = BitWriter()
    if subsample:
        mh, mw = 16, 16
        mcus_y, mcus_x = -(-h//mh), -(-wd//mw)
        def padto(p, H, W):
            return np.pad(p, ((0, H-p.shape[0]), (0, W-p.shape[1])), mode="edge")
        Y = padto(y, mcus_y*16, mcus_x*16)
        # subsample chroma 2x2 mean
        CB = padto(cb, mcus_y*16, mcus_x*16).reshape(mcus_y*8, 2, mcus_x*8, 2).mean(axis=(1,3))
        CR = padto(cr, mcus_y*16, mcus_x*16).reshape(mcus_y*8, 2, mcus_x*8, 2).mean(axis=(1,3))
        preds = [0,0,0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(2):
                    for bx in range(2):
                        preds[0] = encode_block(w, Y[(my*2+by)*8:(my*2+by)*8+8, (mx*2+bx)*8:(mx*2+bx)*8+8], preds[0])
                preds[1] = encode_block(w, CB[my*8:my*8+8, mx*8:mx*8+8], preds[1])
                preds[2] = encode_block(w, CR[my*8:my*8+8, mx*8:mx*8+8], preds[2])
    else:
        bh, bw = -(-h//8), -(-wd//8)
        def padto(p):
            return np.pad(p, ((0, bh*8-h), (0, bw*8-wd)), mode="edge")
        Y, CB, CR = padto(y), padto(cb), padto(cr)
        preds = [0,0,0]
        for by in range(bh):
            for bx in range(bw):
                for ci, p in enumerate((Y, CB, CR)):
                    preds[ci] = encode_block(w, p[by*8:by*8+8, bx*8:bx*8+8], preds[ci])
    w.flush()
    out += w.out + b"\xff\xd9"
    return bytes(out)
