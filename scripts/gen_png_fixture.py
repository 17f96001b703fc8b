#!/usr/bin/env python3
"""Cross-implementation PNG fixture for the REAL image decode path.

Writes src/test/resources/fixture_rgb.png with PYTHON'S STDLIB ONLY
(struct + zlib — a from-scratch PNG encoder, no shared code with the JVM
reader), so MultimodalSpec decoding it through javax.imageio is a true
cross-implementation check: 5x3 RGB, pixel (x,y) =
(r, g, b) = ((x*50)%256, (y*80)%256, (x*20+y*40)%256).

Driver-side tooling only; re-run if the fixture spec changes.
"""
import struct
import zlib
from pathlib import Path

W, H = 5, 3


def chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def main():
    raw = b""
    for y in range(H):
        raw += b"\x00"  # filter type None per scanline
        for x in range(W):
            raw += bytes(((x * 50) % 256, (y * 80) % 256, (x * 20 + y * 40) % 256))
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)  # 8-bit RGB
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = Path(__file__).resolve().parent.parent / "src/test/resources/fixture_rgb.png"
    out.write_bytes(png)
    print(f"{W}x{H} RGB -> {out} ({len(png)} bytes)")


if __name__ == "__main__":
    main()
