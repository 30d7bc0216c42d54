"""Compact Font Format (CFF / Type1C) parser + Type 2 charstring
interpreter, from the public Adobe specs (CFF: Technical Note #5176,
Type 2 charstrings: #5177).

Purpose: real glyph OUTLINES for the PDF vector rasterizer
(``extract/pdfraster.py``) — embedded ``FontFile3`` fonts are the
dominant case in crawl PDFs, and filling actual outlines (nonzero
winding, same scanline filler as path fills) replaces the documented
per-character-box ink approximation wherever a font parses.

Covers what Latin text subsets use: INDEX/DICT structures, charset
formats 0-2, built-in encodings 0-1 (+ supplements), Private DICT with
local/global subrs (correct bias), and the full Type 2 outline operator
set incl. the flex family.  ``seac``-style endchar accent composition
is approximated by the base glyph.  Not covered: CID-keyed CFF
(FDArray/FDSelect) — those raise ``CffError`` and the caller falls back
to box ink.
"""

from __future__ import annotations

import struct


class CffError(ValueError):
    pass


# Adobe standard strings, SID 0..390 (CFF spec appendix A).  Only the
# Latin-relevant prefix is spelled out; the tail (accented sets, small
# caps, ordinals) is filled with placeholder names — subset fonts for
# Latin text reference names in this prefix or their own String INDEX.
_STD = [
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero",
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "colon", "semicolon", "less", "equal", "greater", "question",
    "at", "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L",
    "M", "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y",
    "Z", "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "quoteleft", "a", "b", "c", "d", "e", "f", "g", "h",
    "i", "j", "k", "l", "m", "n", "o", "p", "q", "r", "s", "t", "u",
    "v", "w", "x", "y", "z", "braceleft", "bar", "braceright",
    "asciitilde", "exclamdown", "cent", "sterling", "fraction", "yen",
    "florin", "section", "currency", "quotesingle", "quotedblleft",
    "guillemotleft", "guilsinglleft", "guilsinglright", "fi", "fl",
    "endash", "dagger", "daggerdbl", "periodcentered", "paragraph",
    "bullet", "quotesinglbase", "quotedblbase", "quotedblright",
    "guillemotright", "ellipsis", "perthousand", "questiondown",
    "grave", "acute", "circumflex", "tilde", "macron", "breve",
    "dotaccent", "dieresis", "ring", "cedilla", "hungarumlaut",
    "ogonek", "caron", "emdash",
]
_STD += [f"sid{i}" for i in range(len(_STD), 391)]


def _read_index(data: bytes, pos: int):
    """CFF INDEX at ``pos`` -> (list of byte strings, next position)."""
    if pos + 2 > len(data):
        raise CffError("truncated INDEX header")
    (count,) = struct.unpack(">H", data[pos : pos + 2])
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise CffError(f"bad INDEX offSize {off_size}")
    offs = []
    for i in range(count + 1):
        v = 0
        for b in data[pos + i * off_size : pos + (i + 1) * off_size]:
            v = (v << 8) | b
        offs.append(v)
    pos += (count + 1) * off_size
    base = pos - 1
    items = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, base + offs[count]


def _parse_dict(data: bytes) -> dict:
    """CFF DICT -> {op: [operands]}; two-byte ops keyed as 1200+op2."""
    out: dict[int, list] = {}
    stack: list = []
    i = 0
    n = len(data)
    while i < n:
        b0 = data[i]
        if b0 <= 21:
            op = b0
            i += 1
            if b0 == 12:
                op = 1200 + data[i]
                i += 1
            out[op] = stack
            stack = []
        elif b0 == 28:
            stack.append(struct.unpack(">h", data[i + 1 : i + 3])[0])
            i += 3
        elif b0 == 29:
            stack.append(struct.unpack(">i", data[i + 1 : i + 5])[0])
            i += 5
        elif b0 == 30:  # real number, nibble-encoded
            i += 1
            s = ""
            done = False
            while i < n and not done:
                byte = data[i]
                i += 1
                for nib in (byte >> 4, byte & 0xF):
                    if nib <= 9:
                        s += chr(48 + nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
            try:
                stack.append(float(s) if s else 0.0)
            except ValueError:
                stack.append(0.0)
        elif 32 <= b0 <= 246:
            stack.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            stack.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            stack.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        else:
            raise CffError(f"bad DICT byte {b0}")
    return out


def _bias(subrs: list) -> int:
    n = len(subrs)
    if n < 1240:
        return 107
    if n < 33900:
        return 1131
    return 32768


class CffFont:
    """One parsed (non-CID) CFF font: name-keyed glyph outlines."""

    def __init__(self, data: bytes) -> None:
        if len(data) < 4:
            raise CffError("truncated CFF")
        hdr_size = data[2]
        pos = hdr_size
        _names, pos = _read_index(data, pos)
        top_dicts, pos = _read_index(data, pos)
        strings, pos = _read_index(data, pos)
        self.gsubrs, pos = _read_index(data, pos)
        if not top_dicts:
            raise CffError("no Top DICT")
        top = _parse_dict(top_dicts[0])
        if 1230 in top:  # ROS -> CID-keyed
            raise CffError("CID-keyed CFF unsupported")
        cs_off = top.get(17)
        if not cs_off:
            raise CffError("no CharStrings")
        self.charstrings, _ = _read_index(data, int(cs_off[0]))
        n_glyphs = len(self.charstrings)

        def sid_name(sid: int) -> str:
            if sid < 391:
                return _STD[sid]
            j = sid - 391
            if j < len(strings):
                return strings[j].decode("latin-1", "replace")
            return f"sid{sid}"

        # charset: gid -> name
        self.glyph_names = [".notdef"]
        cs = int(top.get(15, [0])[0])
        if cs == 0 and 15 not in top:
            # ISOAdobe charset: gid i -> SID i
            self.glyph_names = [sid_name(i) for i in range(n_glyphs)]
        elif cs in (0, 1, 2) and 15 in top and cs < 3:
            # predefined charsets 0..2 (ISOAdobe/Expert/ExpertSubset):
            # treat as identity over standard SIDs (Latin subsets)
            self.glyph_names = [sid_name(i) for i in range(n_glyphs)]
        else:
            fmt = data[cs]
            p = cs + 1
            if fmt == 0:
                for _ in range(n_glyphs - 1):
                    sid = struct.unpack(">H", data[p : p + 2])[0]
                    self.glyph_names.append(sid_name(sid))
                    p += 2
            elif fmt in (1, 2):
                step = 3 if fmt == 1 else 4
                while len(self.glyph_names) < n_glyphs:
                    sid = struct.unpack(">H", data[p : p + 2])[0]
                    n_left = (data[p + 2] if fmt == 1 else
                              struct.unpack(">H", data[p + 2 : p + 4])[0])
                    for k in range(n_left + 1):
                        if len(self.glyph_names) >= n_glyphs:
                            break
                        self.glyph_names.append(sid_name(sid + k))
                    p += step
            else:
                raise CffError(f"charset format {fmt}")
        self.gid_of = {n: g for g, n in enumerate(self.glyph_names)}

        # built-in encoding: code -> gid (used when the PDF supplies none)
        self.encoding: dict[int, int] = {}
        enc = int(top.get(16, [0])[0])
        if enc in (0, 1) and 16 not in top or enc == 0:
            # standard encoding: code -> standard name -> gid
            for code in range(32, 127):
                name = _STD[code - 31] if code - 31 < len(_STD) else None
                if name and name in self.gid_of:
                    self.encoding[code] = self.gid_of[name]
        else:
            fmt = data[enc] & 0x7F
            p = enc + 1
            if fmt == 0:
                n_codes = data[p]
                p += 1
                for gid in range(1, n_codes + 1):
                    self.encoding[data[p]] = gid
                    p += 1
            elif fmt == 1:
                n_ranges = data[p]
                p += 1
                gid = 1
                for _ in range(n_ranges):
                    first, n_left = data[p], data[p + 1]
                    for k in range(n_left + 1):
                        self.encoding[first + k] = gid
                        gid += 1
                    p += 2

        # Private DICT + local subrs
        self.subrs: list = []
        priv = top.get(18)
        if priv and len(priv) == 2:
            size, off = int(priv[0]), int(priv[1])
            pd = _parse_dict(data[off : off + size])
            if 19 in pd:
                self.subrs, _ = _read_index(data, off + int(pd[19][0]))
        self._cache: dict[int, list] = {}

    # -- Type 2 charstring interpretation --------------------------------

    def glyph_by_name(self, name: str):
        gid = self.gid_of.get(name)
        if gid is None:
            return None
        return self.glyph_outline(gid)

    def glyph_by_code(self, code: int):
        gid = self.encoding.get(code)
        if gid is None:
            return None
        return self.glyph_outline(gid)

    def glyph_outline(self, gid: int):
        """GID -> list of closed contours, each a list of path segments:
        ('l', x, y) line-to or ('c', x1, y1, x2, y2, x3, y3) curve-to,
        starting from an implicit ('m', x, y) first element.  Coordinates
        in font units (FontMatrix applied by the caller, nominally
        1/1000 em)."""
        if gid in self._cache:
            return self._cache[gid]
        if not 0 <= gid < len(self.charstrings):
            return None
        out = _Type2(self).run(self.charstrings[gid])
        self._cache[gid] = out
        return out


class _Type2:
    __slots__ = ("font", "x", "y", "contours", "cur", "stack", "n_stems",
                 "width_done", "depth")

    def __init__(self, font: CffFont) -> None:
        self.font = font
        self.x = 0.0
        self.y = 0.0
        self.contours: list = []
        self.cur: list | None = None
        self.stack: list = []
        self.n_stems = 0
        self.width_done = False
        self.depth = 0

    def run(self, cs: bytes):
        self._exec(cs)
        self._close()
        return self.contours

    def _close(self) -> None:
        if self.cur is not None and len(self.cur) > 1:
            self.contours.append(self.cur)
        self.cur = None

    def _moveto(self) -> None:
        self._close()
        self.cur = [("m", self.x, self.y)]

    def _lineto(self) -> None:
        if self.cur is not None:
            self.cur.append(("l", self.x, self.y))

    def _curveto(self, x1, y1, x2, y2) -> None:
        if self.cur is not None:
            self.cur.append(("c", x1, y1, x2, y2, self.x, self.y))

    def _take_width(self, even_args: int) -> None:
        """Stack-clearing ops: an odd extra leading operand is the glyph
        width delta (consumed once)."""
        if not self.width_done:
            self.width_done = True
            if len(self.stack) % 2 != even_args % 2:
                self.stack.pop(0)

    def _stems(self) -> None:
        self._take_width(0)
        self.n_stems += len(self.stack) // 2
        self.stack.clear()

    def _exec(self, cs: bytes) -> None:
        self.depth += 1
        if self.depth > 64:
            raise CffError("charstring recursion")
        i = 0
        n = len(cs)
        st = self.stack
        while i < n:
            b0 = cs[i]
            if b0 >= 32 or b0 == 28:
                if b0 == 28:
                    st.append(struct.unpack(">h", cs[i + 1 : i + 3])[0])
                    i += 3
                elif b0 <= 246:
                    st.append(b0 - 139)
                    i += 1
                elif b0 <= 250:
                    st.append((b0 - 247) * 256 + cs[i + 1] + 108)
                    i += 2
                elif b0 <= 254:
                    st.append(-(b0 - 251) * 256 - cs[i + 1] - 108)
                    i += 2
                else:  # 255: 16.16 fixed
                    st.append(struct.unpack(">i", cs[i + 1 : i + 5])[0]
                              / 65536.0)
                    i += 5
                continue
            i += 1
            if b0 in (1, 3, 18, 23):  # h/vstem(hm)
                self._stems()
            elif b0 in (19, 20):  # hintmask / cntrmask
                if st:
                    self._stems()  # implicit vstems
                i += (self.n_stems + 7) // 8
            elif b0 == 21:  # rmoveto
                self._take_width(2)
                if len(st) >= 2:
                    self.x += st[-2]
                    self.y += st[-1]
                self._moveto()
                st.clear()
            elif b0 == 22:  # hmoveto
                self._take_width(1)
                if st:
                    self.x += st[-1]
                self._moveto()
                st.clear()
            elif b0 == 4:  # vmoveto
                self._take_width(1)
                if st:
                    self.y += st[-1]
                self._moveto()
                st.clear()
            elif b0 == 5:  # rlineto
                for j in range(0, len(st) - 1, 2):
                    self.x += st[j]
                    self.y += st[j + 1]
                    self._lineto()
                st.clear()
            elif b0 in (6, 7):  # hlineto / vlineto (alternating)
                horiz = b0 == 6
                for v in st:
                    if horiz:
                        self.x += v
                    else:
                        self.y += v
                    self._lineto()
                    horiz = not horiz
                st.clear()
            elif b0 == 8:  # rrcurveto
                for j in range(0, len(st) - 5, 6):
                    self._rc(*st[j : j + 6])
                st.clear()
            elif b0 == 24:  # rcurveline
                j = 0
                while len(st) - j >= 8:
                    self._rc(*st[j : j + 6])
                    j += 6
                if len(st) - j >= 2:
                    self.x += st[j]
                    self.y += st[j + 1]
                    self._lineto()
                st.clear()
            elif b0 == 25:  # rlinecurve
                j = 0
                while len(st) - j >= 8:
                    self.x += st[j]
                    self.y += st[j + 1]
                    self._lineto()
                    j += 2
                if len(st) - j >= 6:
                    self._rc(*st[j : j + 6])
                st.clear()
            elif b0 == 26:  # vvcurveto
                j = 0
                dx1 = 0.0
                if len(st) % 4 == 1:
                    dx1 = st[0]
                    j = 1
                while len(st) - j >= 4:
                    self._rc(dx1, st[j], st[j + 1], st[j + 2], 0.0,
                             st[j + 3])
                    dx1 = 0.0
                    j += 4
                st.clear()
            elif b0 == 27:  # hhcurveto
                j = 0
                dy1 = 0.0
                if len(st) % 4 == 1:
                    dy1 = st[0]
                    j = 1
                while len(st) - j >= 4:
                    self._rc(st[j], dy1, st[j + 1], st[j + 2], st[j + 3],
                             0.0)
                    dy1 = 0.0
                    j += 4
                st.clear()
            elif b0 in (30, 31):  # vhcurveto / hvcurveto
                horiz = b0 == 31
                j = 0
                while len(st) - j >= 4:
                    last = len(st) - j < 8
                    dlast = st[j + 4] if (last and len(st) - j == 5) else 0.0
                    if horiz:
                        self._rc(st[j], 0.0, st[j + 1], st[j + 2], dlast,
                                 st[j + 3])
                    else:
                        self._rc(0.0, st[j], st[j + 1], st[j + 2],
                                 st[j + 3], dlast)
                    horiz = not horiz
                    j += 4
                st.clear()
            elif b0 == 10:  # callsubr
                if st:
                    idx = int(st.pop()) + _bias(self.font.subrs)
                    if 0 <= idx < len(self.font.subrs):
                        self._exec(self.font.subrs[idx])
            elif b0 == 29:  # callgsubr
                if st:
                    idx = int(st.pop()) + _bias(self.font.gsubrs)
                    if 0 <= idx < len(self.font.gsubrs):
                        self._exec(self.font.gsubrs[idx])
            elif b0 == 11:  # return
                self.depth -= 1
                return
            elif b0 == 14:  # endchar (seac accent approximated by base)
                self._take_width(0)
                st.clear()
                self.depth -= 1
                return
            elif b0 == 12:
                b1 = cs[i]
                i += 1
                if b1 == 35:  # flex
                    if len(st) >= 13:
                        self._rc(*st[0:6])
                        self._rc(*st[6:12])
                elif b1 == 34:  # hflex
                    if len(st) >= 7:
                        dx1, dx2, dy2, dx3, dx4, dx5, dx6 = st[:7]
                        self._rc(dx1, 0.0, dx2, dy2, dx3, 0.0)
                        self._rc(dx4, 0.0, dx5, -dy2, dx6, 0.0)
                elif b1 == 36:  # hflex1
                    if len(st) >= 9:
                        dx1, dy1, dx2, dy2, dx3, dx4, dx5, dy5, dx6 = st[:9]
                        self._rc(dx1, dy1, dx2, dy2, dx3, 0.0)
                        self._rc(dx4, 0.0, dx5, dy5, dx6,
                                 -(dy1 + dy2 + dy5))
                elif b1 == 37:  # flex1
                    if len(st) >= 11:
                        dx1, dy1, dx2, dy2, dx3, dy3 = st[0:6]
                        dx4, dy4, dx5, dy5, d6 = st[6:11]
                        dx = dx1 + dx2 + dx3 + dx4 + dx5
                        dy = dy1 + dy2 + dy3 + dy4 + dy5
                        self._rc(dx1, dy1, dx2, dy2, dx3, dy3)
                        if abs(dx) > abs(dy):
                            self._rc(dx4, dy4, dx5, dy5, d6, -dy)
                        else:
                            self._rc(dx4, dy4, dx5, dy5, -dx, d6)
                st.clear()
            else:
                st.clear()  # unknown op: be permissive (subset fonts)
        self.depth -= 1

    def _rc(self, dx1, dy1, dx2, dy2, dx3, dy3) -> None:
        x1 = self.x + dx1
        y1 = self.y + dy1
        x2 = x1 + dx2
        y2 = y1 + dy2
        self.x = x2 + dx3
        self.y = y2 + dy3
        self._curveto(x1, y1, x2, y2)
