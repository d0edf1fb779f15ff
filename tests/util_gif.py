"""Test-only GIF ENCODER: the classic 'uncompressed' LZW trick (a CLEAR
code before every pixel code keeps the dictionary at its base size and the
code width fixed), so the decoder's LZW/bit-unpacking/interlace paths are
exercised against exactly known pixels."""

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


class _BitPacker:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code, width):
        self.acc |= code << self.bits  # GIF is LSB-first
        self.bits += width
        while self.bits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.bits -= 8

    def flush(self):
        if self.bits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.bits = 0


def encode_gif(indices, palette, interlace=False, transparent=None, compress=False):
    """indices: (h, w) uint8 palette indices; palette: (n, 3) uint8."""
    h, w = indices.shape
    n = len(palette)
    size_bits = max(1, (n - 1).bit_length())
    table_n = 1 << size_bits
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (size_bits - 1), 0, 0])  # GCT flag+size, bg=0
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    iflags = 0x40 if interlace else 0
    out += bytes([0x2C]) + b"\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([iflags])
    min_code = max(2, size_bits)
    out += bytes([min_code])
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width_bits = min_code + 1
    rows = indices
    if interlace:  # writer emits rows in pass order
        order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
        rows = indices[order]
    p = _BitPacker()
    p.write(clear, width_bits)
    if compress:  # real LZW: exercises dictionary growth + width bumps
        table = {bytes([i]): i for i in range(1 << min_code)}
        next_code = eoi + 1
        cur = b""
        for v in rows.flatten():
            nxt = cur + bytes([int(v)])
            if nxt in table:
                cur = nxt
                continue
            p.write(table[cur], width_bits)
            if next_code < 4096:
                table[nxt] = next_code
                next_code += 1
                if next_code - 1 == (1 << width_bits) and width_bits < 12:
                    width_bits += 1
            else:  # table full: emit CLEAR and restart (real-encoder move)
                p.write(clear, width_bits)
                table = {bytes([i]): i for i in range(1 << min_code)}
                next_code = eoi + 1
                width_bits = min_code + 1
            cur = bytes([int(v)])
        if cur:
            p.write(table[cur], width_bits)
    else:
        for v in rows.flatten():
            p.write(int(v), width_bits)
            p.write(clear, width_bits)  # keep dictionary at base size
    p.write(eoi, width_bits)
    p.flush()
    data = bytes(p.out)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
