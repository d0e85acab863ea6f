#!/usr/bin/env python3
"""Generate the checked-in baseline-JPEG fixtures under data/fixtures/ and
print the expected decode stats for MultimodalSpec.

Encoder: real baseline sequential DCT (ITU-T T.81) — float FDCT, per-file
quant tables embedded via DQT, per-file two-length canonical Huffman
tables embedded via DHT, byte-stuffed entropy stream, optional DRI/RSTn.
The encode side is free to use floats: it only has to produce a VALID
file.

Expectation: decoded stats are replayed from the encoder's own quantized
coefficients through an INTEGER pipeline that mirrors ImageCodecs.decodeJpeg
exactly — the same literal 15-bit cosine grid, the same
`(s + 2^29) >> 30 (+128)` descale, the same nearest-neighbor chroma
subscript `(y*vS//vmax, x*hS//hmax)` and the same 16-bit fixed-point
YCbCr→RGB constants (91881 / 22554 / 46802 / 116130). Integers only →
bit-exact across Python and the JVM, so if the Scala Huffman/marker path
decodes every coefficient correctly its channel sums MUST equal these.

Fixtures:
  dct_gray.jpg    8x8   grayscale gradient, single component
  dct_rgb444.jpg  16x16 RGB, 4:4:4
  dct_rgb420.jpg  24x17 RGB, 4:2:0 (padding + subsampling + odd dims)
  dct_rst.jpg     32x8  grayscale, DRI=2 (restart markers + DC reset)
"""
import math
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "data" / "fixtures"

ZIGZAG = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# the same literal grid as ImageCodecs.CosT
COS_T = [[round((((1 / math.sqrt(2)) if u == 0 else 1.0)
                 * math.cos((2 * x + 1) * u * math.pi / 16) * 0.5) * 32768)
          for x in range(8)] for u in range(8)]

QT_LUMA = [8 + (i % 5) for i in range(64)]     # zigzag order
QT_CHROMA = [12 + (i % 7) for i in range(64)]


# ───────────────────────── encoder ─────────────────────────

def fdct_quant(block, qt):
    """Level-shift + float FDCT + round-to-nearest quantize → 64 zigzag
    coefficients. block = 8x8 list of samples 0..255."""
    shifted = [[block[y][x] - 128 for x in range(8)] for y in range(8)]
    coefs = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (shifted[y][x]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            cu = (1 / math.sqrt(2)) if u == 0 else 1.0
            cv = (1 / math.sqrt(2)) if v == 0 else 1.0
            coefs[v][u] = 0.25 * cu * cv * s
    zz = []
    for k in range(64):
        nat = ZIGZAG[k]
        v, u = divmod(nat, 8)
        q = qt[k]
        c = coefs[v][u] / q
        zz.append(int(math.floor(c + 0.5)) if c >= 0 else -int(math.floor(-c + 0.5)))
    return zz


def mag_bits(v):
    """(size, raw bits) for a DC diff / AC value per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    raw = v if v > 0 else v + (1 << s) - 1
    return s, raw


def block_symbols(zz, pred):
    """(dc_symbol, dc_bits, [(ac_symbol, ac_size, ac_bits)...], new_pred)."""
    diff = zz[0] - pred
    s, raw = mag_bits(diff)
    acs = []
    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            acs.append((0x00, 0, 0))             # EOB
            break
        while run >= 16:
            acs.append((0xF0, 0, 0))             # ZRL
            run -= 16
        asz, araw = mag_bits(zz[k])
        acs.append(((run << 4) | asz, asz, araw))
        k += 1
    return (s, raw), acs, zz[0]


def build_huff(freqs):
    """Two-length canonical table over the used symbols: the most frequent
    symbol gets length L, the rest L+1 (exercises the decoder's
    empty-length walk + multi-length step). Returns (bits16, vals,
    {sym: (code, len)})."""
    syms = sorted(freqs, key=lambda s: (-freqs[s], s))
    n = len(syms)
    assert n >= 1
    if n == 1:
        bits = [0] * 16
        bits[0] = 1                              # one code, length 1: "0"
        return bits, syms, {syms[0]: (0, 1)}
    L = 1
    while n > (1 << (L + 1)) - 2:
        L += 1
    bits = [0] * 16
    bits[L - 1] = 1
    bits[L] = n - 1
    codes = {syms[0]: (0, L)}
    code = 2                                     # (0+1) << 1
    for s in syms[1:]:
        codes[s] = (code, L + 1)
        code += 1
    return bits, syms, codes


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.put(1, 1)                       # pad with 1-bits

    def marker(self, m):
        self.align()
        self.buf += bytes([0xFF, m])


def seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def rgb_to_ycbcr(r, g, b):
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cl = lambda v: max(0, min(255, int(round(v))))
    return cl(y), cl(cb), cl(cr)


def extract_block(plane, pw, ph, bx, by):
    """8x8 block at (bx*8, by*8) with edge replication."""
    return [[plane[min(ph - 1, by * 8 + y)][min(pw - 1, bx * 8 + x)]
             for x in range(8)] for y in range(8)]


def downsample(plane, w, h, fx, fy):
    """Box-average by (fx, fy) with floor division (encoder-side only)."""
    ow, oh = (w + fx - 1) // fx, (h + fy - 1) // fy
    out = []
    for oy in range(oh):
        row = []
        for ox in range(ow):
            acc, n = 0, 0
            for dy in range(fy):
                for dx in range(fx):
                    x, y = ox * fx + dx, oy * fy + dy
                    if x < w and y < h:
                        acc += plane[y][x]
                        n += 1
            row.append(acc // n)
        out.append(row)
    return out


def encode(path, w, h, pixel_fn, ncomp, sampling, restart_interval=0):
    """pixel_fn(x, y) -> gray int (ncomp=1) or (r, g, b). sampling =
    [(hS, vS), ...] per component. Returns per-component quantized coef
    lists in MCU scan order for the replay."""
    # component planes at full resolution → subsampled planes
    if ncomp == 1:
        planes = [[[pixel_fn(x, y) for x in range(w)] for y in range(h)]]
        qts = [QT_LUMA]
        qids = [0]
    else:
        ys, cbs, crs = [], [], []
        for y in range(h):
            ry, rcb, rcr = [], [], []
            for x in range(w):
                r, g, b = pixel_fn(x, y)
                yy, cb, cr = rgb_to_ycbcr(r, g, b)
                ry.append(yy); rcb.append(cb); rcr.append(cr)
            ys.append(ry); cbs.append(rcb); crs.append(rcr)
        hmax = max(s[0] for s in sampling)
        vmax = max(s[1] for s in sampling)
        planes = []
        for (hs, vs), src in zip(sampling, [ys, cbs, crs]):
            planes.append(downsample(src, w, h, hmax // hs, vmax // vs))
        qts = [QT_LUMA, QT_CHROMA, QT_CHROMA]
        qids = [0, 1, 1]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # quantize every block in MCU scan order
    blocks = [[] for _ in range(ncomp)]          # flat, scan order
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hs, vs = sampling[ci]
                p = planes[ci]
                ph, pw = len(p), len(p[0])
                for v0 in range(vs):
                    for h0 in range(hs):
                        blk = extract_block(p, pw, ph, mx * hs + h0, my * vs + v0)
                        blocks[ci].append(fdct_quant(blk, qts[qids[ci]]))

    # symbol passes: gather frequencies (restart-aware DC prediction)
    def walk():
        preds = [0] * ncomp
        idx = [0] * ncomp
        mcu = 0
        rst = 0
        for _my in range(mcus_y):
            for _mx in range(mcus_x):
                if restart_interval and mcu > 0 and mcu % restart_interval == 0:
                    yield ("RST", rst)
                    rst = (rst + 1) & 7
                    preds = [0] * ncomp
                for ci in range(ncomp):
                    hs, vs = sampling[ci]
                    for _ in range(hs * vs):
                        zz = blocks[ci][idx[ci]]
                        idx[ci] += 1
                        (s, raw), acs, preds[ci] = block_symbols(zz, preds[ci])
                        yield ("DC", ci, s, raw)
                        for sym, asz, araw in acs:
                            yield ("AC", ci, sym, asz, araw)
                mcu += 1

    # two table classes: 0 = luma (comp 0), 1 = chroma (comps 1, 2)
    tclass = [0] + [1] * (ncomp - 1)
    dc_freq = [{} for _ in range(2)]
    ac_freq = [{} for _ in range(2)]
    for ev in walk():
        if ev[0] == "DC":
            _, ci, s, _ = ev
            dc_freq[tclass[ci]][s] = dc_freq[tclass[ci]].get(s, 0) + 1
        elif ev[0] == "AC":
            _, ci, sym, _, _ = ev
            ac_freq[tclass[ci]][sym] = ac_freq[tclass[ci]].get(sym, 0) + 1
    ntab = 1 if ncomp == 1 else 2
    dc_tabs = [build_huff(dc_freq[t]) for t in range(ntab)]
    ac_tabs = [build_huff(ac_freq[t]) for t in range(ntab)]

    # entropy-coded stream
    bw = BitWriter()
    for ev in walk():
        if ev[0] == "RST":
            bw.marker(0xD0 + ev[1])
        elif ev[0] == "DC":
            _, ci, s, raw = ev
            code, ln = dc_tabs[tclass[ci]][2][s]
            bw.put(code, ln)
            if s:
                bw.put(raw, s)
        else:
            _, ci, sym, asz, araw = ev
            code, ln = ac_tabs[tclass[ci]][2][sym]
            bw.put(code, ln)
            if asz:
                bw.put(araw, asz)
    bw.align()

    # assemble the file
    out = bytearray()
    out += bytes([0xFF, 0xD8])                   # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFE, b"graft jpeg fixture")      # COM (skip path)
    dqt = bytes([0x00]) + bytes(QT_LUMA)
    if ncomp == 3:
        dqt += bytes([0x01]) + bytes(QT_CHROMA)
    out += seg(0xDB, dqt)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qids[ci]])
    out += seg(0xC0, sof)
    dht = b""
    for t in range(ntab):
        bits, vals, _ = dc_tabs[t]
        dht += bytes([0x00 | t] + bits + vals)
        bits, vals, _ = ac_tabs[t]
        dht += bytes([0x10 | t] + bits + vals)
    out += seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = tclass[ci]
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.buf
    out += bytes([0xFF, 0xD9])                   # EOI
    path.write_bytes(bytes(out))
    return blocks, qts, qids


# ───────────────────────── integer replay ─────────────────────────

def idct_int(zz, qt):
    """Dequant + the decoder's exact integer IDCT → 8x8 samples."""
    coef = [0] * 64
    for k in range(64):
        coef[ZIGZAG[k]] = zz[k] * qt[k]
    out = [[0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0
            for v in range(8):
                for u in range(8):
                    f = coef[v * 8 + u]
                    if f:
                        s += f * COS_T[u][x] * COS_T[v][y]
            p = ((s + (1 << 29)) >> 30) + 128
            out[y][x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def replay(w, h, ncomp, sampling, blocks, qts, qids):
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        pw, ph = mcus_x * 8 * hs, mcus_y * 8 * vs
        plane = [[0] * pw for _ in range(ph)]
        # blocks[ci] is already in MCU scan order
        idx = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for v0 in range(vs):
                    for h0 in range(hs):
                        blk = idct_int(blocks[ci][idx], qts[qids[ci]])
                        idx += 1
                        for y in range(8):
                            for x in range(8):
                                plane[(my * vs + v0) * 8 + y][(mx * hs + h0) * 8 + x] = blk[y][x]
        planes.append((plane, pw, hs, vs))
    sum_r = sum_g = sum_b = 0
    if ncomp == 1:
        plane, pw, _, _ = planes[0]
        for y in range(h):
            for x in range(w):
                g = plane[y][x]
                sum_r += g; sum_g += g; sum_b += g
    else:
        cl = lambda v: 0 if v < 0 else (255 if v > 255 else v)
        for y in range(h):
            for x in range(w):
                yy = planes[0][0][y * planes[0][3] // vmax][x * planes[0][2] // hmax] << 16
                pb = planes[1][0][y * planes[1][3] // vmax][x * planes[1][2] // hmax] - 128
                pr = planes[2][0][y * planes[2][3] // vmax][x * planes[2][2] // hmax] - 128
                sum_r += cl((yy + 91881 * pr + 32768) >> 16)
                sum_g += cl((yy - 22554 * pb - 46802 * pr + 32768) >> 16)
                sum_b += cl((yy + 116130 * pb + 32768) >> 16)
    return sum_r, sum_g, sum_b


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    fixtures = [
        ("dct_gray.jpg", 8, 8, lambda x, y: (16 * x + 13 * y) % 256,
         1, [(1, 1)], 0),
        ("dct_rgb444.jpg", 16, 16,
         lambda x, y: ((8 * x + 4 * y) % 256, (255 - 8 * x) % 256, (16 * y) % 256),
         3, [(1, 1), (1, 1), (1, 1)], 0),
        ("dct_rgb420.jpg", 24, 17,
         lambda x, y: ((10 * x) % 256, (12 * y) % 256, (7 * x + 5 * y) % 256),
         3, [(2, 2), (1, 1), (1, 1)], 0),
        ("dct_rst.jpg", 32, 8, lambda x, y: (7 * x * y + 31 * x + 3) % 256,
         1, [(1, 1)], 2),
    ]
    for name, w, h, fn, nc, samp, dri in fixtures:
        blocks, qts, qids = encode(OUT / name, w, h, fn, nc, samp, dri)
        sr, sg, sb = replay(w, h, nc, samp, blocks, qts, qids)
        print(f"{name}: {w}x{h} sumR={sr} sumG={sg} sumB={sb}")


if __name__ == "__main__":
    main()
