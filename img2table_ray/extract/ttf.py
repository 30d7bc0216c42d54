"""TrueType (sfnt) glyph-outline parser, from the public OpenType spec.

Counterpart to ``extract/cff.py`` for PDF ``FontFile2`` programs: the
rasterizer needs outlines only, so this reads ``head``/``maxp``/
``loca``/``glyf``/``cmap`` and converts quadratic B-spline contours to
the same segment form the CFF path produces (('m'|'l'|'c') tuples,
scaled to a 1000-unit em so the consumer's 0.001 FontMatrix applies
unchanged).  Composite glyphs recurse with offset (and basic scale)
components.  Horizontal metrics, hinting and variable-font tables are
irrelevant to ink and ignored.
"""

from __future__ import annotations

import struct


class TtfError(ValueError):
    pass


class TtfFont:
    """Glyph outlines + unicode cmap for one TrueType font."""

    def __init__(self, data: bytes) -> None:
        if len(data) < 12:
            raise TtfError("truncated sfnt")
        tag = data[:4]
        if tag == b"ttcf":
            # font collection: use the first font
            if len(data) < 16:
                raise TtfError("truncated ttc header")
            (off,) = struct.unpack(">I", data[12:16])
            return self.__init__(data[off:] if off else data)
        if tag not in (b"\x00\x01\x00\x00", b"true", b"OTTO"):
            raise TtfError(f"not an sfnt font ({tag!r})")
        (num_tables,) = struct.unpack(">H", data[4:6])
        self.tables: dict[bytes, tuple[int, int]] = {}
        pos = 12
        for _ in range(num_tables):
            if pos + 16 > len(data):
                raise TtfError("truncated table directory")
            t, _cs, off, length = struct.unpack(">4sIII", data[pos : pos + 16])
            self.tables[t] = (off, length)
            pos += 16
        self.data = data
        if tag == b"OTTO" or b"glyf" not in self.tables:
            raise TtfError("CFF-flavoured/glyf-less sfnt: use extract/cff")

        head = self._table(b"head")
        if len(head) < 54:
            raise TtfError("short head table")
        self.units_per_em = struct.unpack(">H", head[18:20])[0] or 1000
        loc_fmt = struct.unpack(">h", head[50:52])[0]
        maxp = self._table(b"maxp")
        self.num_glyphs = struct.unpack(">H", maxp[4:6])[0]
        loca = self._table(b"loca")
        if loc_fmt:
            self.loca = list(struct.unpack(
                f">{self.num_glyphs + 1}I", loca[: 4 * (self.num_glyphs + 1)]))
        else:
            self.loca = [2 * v for v in struct.unpack(
                f">{self.num_glyphs + 1}H", loca[: 2 * (self.num_glyphs + 1)])]
        self.glyf = self._table(b"glyf")
        self.cmap = self._parse_cmap()
        self._cache: dict[int, list] = {}

    def _table(self, tag: bytes) -> bytes:
        if tag not in self.tables:
            raise TtfError(f"missing {tag!r} table")
        off, length = self.tables[tag]
        return self.data[off : off + length]

    def _parse_cmap(self) -> dict[int, int]:
        out: dict[int, int] = {}
        try:
            cm = self._table(b"cmap")
        except TtfError:
            return out
        (n,) = struct.unpack(">H", cm[2:4])
        subtables = []
        for i in range(n):
            pid, eid, off = struct.unpack(">HHI", cm[4 + 8 * i : 12 + 8 * i])
            subtables.append((pid, eid, off))
        # prefer (3,1) windows-unicode, then (0,x), then (3,0) symbol
        order = sorted(subtables, key=lambda t: (
            0 if (t[0], t[1]) == (3, 1) else 1 if t[0] == 0 else
            2 if (t[0], t[1]) == (3, 0) else 3))
        for pid, eid, off in order:
            fmt = struct.unpack(">H", cm[off : off + 2])[0]
            if fmt == 4:
                segx2 = struct.unpack(">H", cm[off + 6 : off + 8])[0]
                seg = segx2 // 2
                ends = struct.unpack(f">{seg}H", cm[off + 14 : off + 14 + segx2])
                p = off + 16 + segx2
                starts = struct.unpack(f">{seg}H", cm[p : p + segx2])
                p += segx2
                deltas = struct.unpack(f">{seg}h", cm[p : p + segx2])
                p += segx2
                range_off_pos = p
                range_offs = struct.unpack(f">{seg}H", cm[p : p + segx2])
                for i in range(seg):
                    for code in range(starts[i], min(ends[i], 0xFFFE) + 1):
                        if range_offs[i] == 0:
                            gid = (code + deltas[i]) & 0xFFFF
                        else:
                            gp = (range_off_pos + 2 * i + range_offs[i]
                                  + 2 * (code - starts[i]))
                            if gp + 2 > len(cm):
                                continue
                            gid = struct.unpack(">H", cm[gp : gp + 2])[0]
                            if gid:
                                gid = (gid + deltas[i]) & 0xFFFF
                        if gid:
                            out.setdefault(code, gid)
                if out:
                    return out
            elif fmt == 6:
                first, cnt = struct.unpack(">HH", cm[off + 6 : off + 10])
                gids = struct.unpack(f">{cnt}H", cm[off + 10 : off + 10 + 2 * cnt])
                for k, g in enumerate(gids):
                    if g:
                        out.setdefault(first + k, g)
                if out:
                    return out
            elif fmt == 0:
                for code in range(256):
                    g = cm[off + 6 + code]
                    if g:
                        out.setdefault(code, g)
                if out:
                    return out
        return out

    # -- outlines ---------------------------------------------------------

    def glyph_for_char(self, ch: str):
        gid = self.cmap.get(ord(ch)) if ch else None
        if gid is None:
            return None
        return self.glyph_outline(gid)

    def glyph_outline(self, gid: int, depth: int = 0):
        """GID -> contours of ('m'/'l'/'c') segments in 1000-unit-em
        coordinates (quadratics promoted to cubics)."""
        if gid in self._cache:
            return self._cache[gid]
        if not 0 <= gid < self.num_glyphs or depth > 8:
            return None
        start, end = self.loca[gid], self.loca[gid + 1]
        if end <= start:
            out: list = []  # empty glyph (space)
            self._cache[gid] = out
            return out
        g = self.glyf[start:end]
        n_cont = struct.unpack(">h", g[0:2])[0]
        scale = 1000.0 / self.units_per_em
        if n_cont >= 0:
            out = self._simple_glyph(g, n_cont, scale)
        else:
            out = self._composite_glyph(g, scale, depth)
        if depth == 0:
            self._cache[gid] = out
        return out

    def _simple_glyph(self, g: bytes, n_cont: int, scale: float):
        p = 10
        ends = struct.unpack(f">{n_cont}H", g[p : p + 2 * n_cont])
        p += 2 * n_cont
        n_pts = (ends[-1] + 1) if n_cont else 0
        (ilen,) = struct.unpack(">H", g[p : p + 2])
        p += 2 + ilen  # skip instructions
        flags = []
        while len(flags) < n_pts:
            f = g[p]
            p += 1
            flags.append(f)
            if f & 8:  # repeat
                rep = g[p]
                p += 1
                flags.extend([f] * rep)
        flags = flags[:n_pts]
        xs = []
        v = 0
        for f in flags:
            if f & 2:
                d = g[p]
                p += 1
                v += d if f & 16 else -d
            elif not f & 16:
                v += struct.unpack(">h", g[p : p + 2])[0]
                p += 2
            xs.append(v)
        ys = []
        v = 0
        for f in flags:
            if f & 4:
                d = g[p]
                p += 1
                v += d if f & 32 else -d
            elif not f & 32:
                v += struct.unpack(">h", g[p : p + 2])[0]
                p += 2
            ys.append(v)
        contours = []
        s0 = 0
        for e in ends:
            pts = [(xs[i] * scale, ys[i] * scale, bool(flags[i] & 1))
                   for i in range(s0, e + 1)]
            s0 = e + 1
            cont = self._quad_contour(pts)
            if cont:
                contours.append(cont)
        return contours

    @staticmethod
    def _quad_contour(pts):
        """One TrueType contour (on/off-curve points) -> segments, with
        implied on-curve midpoints between consecutive off-curve points
        and quadratics promoted to cubics (ctrl = p +/- 2/3 (q - p))."""
        if not pts:
            return []
        # rotate so we start on-curve (insert midpoint if all off-curve)
        on_idx = next((i for i, p in enumerate(pts) if p[2]), None)
        if on_idx is None:
            x0 = (pts[0][0] + pts[-1][0]) / 2
            y0 = (pts[0][1] + pts[-1][1]) / 2
            work = [(x0, y0, True)] + pts
        else:
            work = pts[on_idx:] + pts[:on_idx]
        work.append(work[0])  # close
        out = [("m", work[0][0], work[0][1])]
        cx = cy = None  # pending off-curve control
        cur = (work[0][0], work[0][1])

        def emit_quad(qx, qy, x, y):
            nonlocal cur
            p0x, p0y = cur
            c1x = p0x + 2.0 / 3.0 * (qx - p0x)
            c1y = p0y + 2.0 / 3.0 * (qy - p0y)
            c2x = x + 2.0 / 3.0 * (qx - x)
            c2y = y + 2.0 / 3.0 * (qy - y)
            out.append(("c", c1x, c1y, c2x, c2y, x, y))
            cur = (x, y)

        for x, y, on in work[1:]:
            if on:
                if cx is None:
                    out.append(("l", x, y))
                    cur = (x, y)
                else:
                    emit_quad(cx, cy, x, y)
                    cx = cy = None
            else:
                if cx is not None:
                    mx, my = (cx + x) / 2, (cy + y) / 2
                    emit_quad(cx, cy, mx, my)
                cx, cy = x, y
        return out

    def _composite_glyph(self, g: bytes, scale: float, depth: int):
        p = 10
        out = []
        while True:
            flags, gi = struct.unpack(">HH", g[p : p + 4])
            p += 4
            if flags & 1:  # words
                a1, a2 = struct.unpack(">hh", g[p : p + 4])
                p += 4
            else:
                a1, a2 = struct.unpack(">bb", g[p : p + 2])
                p += 2
            sx = sy = 1.0
            if flags & 8:  # single scale (F2Dot14)
                sx = sy = struct.unpack(">h", g[p : p + 2])[0] / 16384.0
                p += 2
            elif flags & 0x40:  # x and y scale
                sx = struct.unpack(">h", g[p : p + 2])[0] / 16384.0
                sy = struct.unpack(">h", g[p + 2 : p + 4])[0] / 16384.0
                p += 4
            elif flags & 0x80:  # 2x2 matrix: use diagonal (shear rare)
                sx = struct.unpack(">h", g[p : p + 2])[0] / 16384.0
                sy = struct.unpack(">h", g[p + 6 : p + 8])[0] / 16384.0
                p += 8
            sub = self.glyph_outline(gi, depth + 1) or []
            dx = a1 * scale if flags & 2 else 0.0  # ARGS_ARE_XY_VALUES
            dy = a2 * scale if flags & 2 else 0.0
            for cont in sub:
                moved = []
                for seg in cont:
                    vals = list(seg[1:])
                    for k in range(0, len(vals), 2):
                        vals[k] = vals[k] * sx + dx
                        vals[k + 1] = vals[k + 1] * sy + dy
                    moved.append((seg[0], *vals))
                out.append(moved)
            if not flags & 0x20:  # MORE_COMPONENTS
                break
        return out
