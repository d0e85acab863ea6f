#!/usr/bin/env python3
"""Generate the checked-in PNG fixtures under data/fixtures/.

Each fixture exercises a distinct decoder path in ImageCodecs.decodePng:
  gradient.png   8x8  RGB  (type 2), one row per filter type 0-4 then 0,1,2
                 — all five scanline filters in one image, zlib level 9
  gray.png       5x4  gray (type 0), filters [0, 1, 2, 3]
  rgba.png       4x4  RGBA (type 6), Paeth (4) on every row after row 0

Pixel formulas are mirrored in MultimodalSpec, which asserts decode()
returns the exact channel sums — bit-exact, from real inflate + unfilter.
"""
import struct
import zlib
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "data" / "fixtures"


def chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def apply_filter(ftype, row, prior, bpp):
    out = bytearray()
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prior[i] if prior else 0
        c = prior[i - bpp] if (prior and i >= bpp) else 0
        if ftype == 0:
            out.append(x)
        elif ftype == 1:
            out.append((x - a) & 0xFF)
        elif ftype == 2:
            out.append((x - b) & 0xFF)
        elif ftype == 3:
            out.append((x - (a + b) // 2) & 0xFF)
        elif ftype == 4:
            out.append((x - paeth(a, b, c)) & 0xFF)
    return bytes(out)


def write_png(path, width, height, color_type, rows, filters):
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    raw = bytearray()
    prior = None
    for y in range(height):
        f = filters[y]
        raw.append(f)
        raw += apply_filter(f, rows[y], prior, bpp)
        prior = rows[y]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
           + chunk(b"IEND", b""))
    path.write_bytes(png)
    print(f"{path.name}: {width}x{height} type={color_type} "
          f"filters={sorted(set(filters))} ({len(png)} bytes)")


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    # gradient.png: r=x*30, g=y*30, b=(x+y)*15  (all values < 256)
    rows = [bytes(v for x in range(8) for v in (x * 30, y * 30, (x + y) * 15))
            for y in range(8)]
    write_png(OUT / "gradient.png", 8, 8, 2, rows, [0, 1, 2, 3, 4, 0, 1, 2])
    # gray.png: v = (x*7 + y*11) % 256
    rows = [bytes((x * 7 + y * 11) % 256 for x in range(5)) for y in range(4)]
    write_png(OUT / "gray.png", 5, 4, 0, rows, [0, 1, 2, 3])
    # rgba.png: r=x*40, g=y*40, b=200-x*20, a=255-y*10
    rows = [bytes(v for x in range(4)
                  for v in (x * 40, y * 40, 200 - x * 20, 255 - y * 10))
            for y in range(4)]
    write_png(OUT / "rgba.png", 4, 4, 6, rows, [0, 4, 4, 4])


if __name__ == "__main__":
    main()
