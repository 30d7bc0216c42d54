"""LZW decompression for TIFF (MSB-first, early-change) and GIF
(LSB-first, variable initial code size, sub-block stream already joined).

Pure-Python sequential loops by design: LZW is an inherently serial
chain (each output string depends on the previously emitted one), and
crawl-share of LZW-compressed TIFF/GIF pages is small enough that the
per-document cost is noise next to table extraction.  The per-code body
is O(1) appends on a list of byte strings with a single join at the end.

Spec sources: TIFF 6.0 §13 (Adobe, 1992) and GIF89a Appendix F (W3C).
No counterpart in /root/reference — it delegates container decode to
cv2.imdecode (src/img2table/document/image.py:25-32).
"""

from __future__ import annotations


class LzwError(ValueError):
    pass


def lzw_decode_tiff(data: bytes, max_out: int | None = None) -> bytes:
    """TIFF-variant LZW: 9..12-bit codes packed MSB-first, ClearCode=256,
    EOI=257, and the *early-change* width bump every mainstream writer
    uses (width grows when the NEXT table entry would be 511/1023/2047).
    """
    CLEAR, EOI = 256, 257
    base = [bytes((i,)) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out: list[bytes] = []
    out_len = 0
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # missing EOI: tolerated (some writers truncate at the end
                # of the strip) — emit what we have
                return b"".join(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)

        if code == EOI:
            return b"".join(out)
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if prev is None:
            if code > 255:
                raise LzwError("first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise LzwError("LZW code out of range")
        out.append(entry)
        out_len += len(entry)
        if max_out is not None and out_len >= max_out:
            return b"".join(out)
        prev = entry
        # early change: bump width when the next free entry index reaches
        # 2^width - 1 (libtiff/Pillow: "only the early-change case")
        if len(table) in (511, 1023, 2047) and width < 12:
            width += 1


def lzw_decode_gif(data: bytes, min_code_size: int,
                   max_out: int | None = None) -> bytes:
    """GIF-variant LZW: codes packed LSB-first; clear = 1 << min_code_size,
    end = clear + 1; width grows AFTER the table fills (no early change),
    capped at 12 bits (table stops growing at 4096)."""
    if not 2 <= min_code_size <= 11:
        raise LzwError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out: list[bytes] = []
    out_len = 0
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return b"".join(out)  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == end:
            return b"".join(out)
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            if code >= clear:
                raise LzwError("first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise LzwError("LZW code out of range")
        out.append(entry)
        out_len += len(entry)
        if max_out is not None and out_len >= max_out:
            return b"".join(out)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
