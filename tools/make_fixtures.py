#!/usr/bin/env python3
"""Deterministic image fixtures for the multimodal decode tests.

Writes (committed under data/fixtures/):
  gradient.bmp    6x4 24-bit bottom-up BMP, rows padded (pad bytes 0xEE so
                  a decoder that counts padding is caught)
  gradient_td.bmp the SAME pixels as a top-down BMP (negative height)
  stripes.ppm     5x3 binary P6 with a header comment
  stripes_p3.ppm  the same pixels as ASCII P3

Pixel patterns are closed-form so tests can assert exact channel sums.
"""
import struct, os

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "fixtures")
os.makedirs(out, exist_ok=True)

W, H = 6, 4
def px(x, y):  # (r, g, b)
    return (10 * x + y, 40 * y + x, 200 - 5 * x - 3 * y)

def bmp(topdown):
    rowsize = (W * 3 + 3) // 4 * 4
    pad = rowsize - W * 3
    h_field = -H if topdown else H
    pixeldata = b""
    ys = range(H) if topdown else range(H - 1, -1, -1)  # file row order
    for y in ys:
        for x in range(W):
            r, g, b = px(x, y)
            pixeldata += bytes([b, g, r])
        pixeldata += b"\xee" * pad
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pixeldata), 0, 0, 54) +
              struct.pack("<IiiHHIIiiII", 40, W, h_field, 1, 24, 0,
                          len(pixeldata), 2835, 2835, 0, 0))
    return header + pixeldata

with open(f"{out}/gradient.bmp", "wb") as f:
    f.write(bmp(topdown=False))
with open(f"{out}/gradient_td.bmp", "wb") as f:
    f.write(bmp(topdown=True))

PW, PH = 5, 3
def ppx(x, y):
    return (50 * (x % 2), 30 * y + 2 * x, 7 * x)

p6 = b"P6\n# stripes fixture\n5 3\n255\n"
p3_lines = ["P3", "# stripes fixture", "5 3", "255"]
for y in range(PH):
    row = []
    for x in range(PW):
        r, g, b = ppx(x, y)
        p6 += bytes([r, g, b])
        row += [str(r), str(g), str(b)]
    p3_lines.append(" ".join(row))
with open(f"{out}/stripes.ppm", "wb") as f:
    f.write(p6)
with open(f"{out}/stripes_p3.ppm", "wb") as f:
    f.write(("\n".join(p3_lines) + "\n").encode())

sums = {}
sums["bmp"] = tuple(sum(px(x, y)[c] for x in range(W) for y in range(H))
                    for c in range(3))
sums["ppm"] = tuple(sum(ppx(x, y)[c] for x in range(PW) for y in range(PH))
                    for c in range(3))
print("bmp (sumR,sumG,sumB):", sums["bmp"])
print("ppm (sumR,sumG,sumB):", sums["ppm"])
