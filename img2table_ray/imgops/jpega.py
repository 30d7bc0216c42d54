"""Arithmetic-coded JPEG entropy codec (ITU T.81 Annex F, QM-coder).

The reference decodes arithmetic JPEGs through cv2 -> libjpeg
(``/root/reference/src/img2table/document/image.py:25-32``); this module
implements the same codec in pure Python at the exact integer-arithmetic
level of libjpeg's jdarith.c/jcarith.c formulation of the T.81
flowcharts, so streams interoperate bit-for-bit with the real-world
producer/consumer:

* ``_QE_TAB`` is T.81 Table D.3 (113 adaptive probability-estimation
  states + the non-adaptive fixed bin at index 113), packed per entry as
  ``Qe << 16 | Next_MPS << 8 | Switch << 7 | Next_LPS``.
* Statistics bins are single bytes: bit 7 = current MPS sense, bits 0-6 =
  state index.  DC tables use 64 bins (contexts 0/4/8/12/16 + magnitude
  ladder at 20), AC tables 256 bins (3 per k, X2 ladders at 189/217) —
  T.81 Tables F.4/F.5.
* Conditioning: DC ``(L, U)`` defaults (0, 1); AC ``Kx`` default 5; the
  DAC marker overrides per table id.
* Byte stuffing matches Huffman JPEG (0xFF 0x00), so the caller feeds the
  same destuffed restart segments it feeds the Huffman decoders; past the
  segment end the decoder zero-feeds (T.81 marker convention).

Interop is pinned in tests/test_jpeg_arith.py against libjpeg-turbo in
BOTH directions (our decode of libjpeg-encoded fixtures; libjpeg decode
of our encoder's streams) via the tests/tools/jpeg_oracle.c driver, plus
committed fixtures for environments without a compiler.
"""

from __future__ import annotations

import numpy as np

from img2table_ray.imgops.jpeg import JpegError, ZIGZAG

# T.81 Table D.3 / libjpeg jaricom packing: Qe<<16 | nextMPS<<8 | sw<<7 | nextLPS
_QE_TAB = (
    0x5A1D0181, 0x2586020E, 0x11140310, 0x080B0412,
    0x03D80514, 0x01DA0617, 0x00E50719, 0x006F081C,
    0x0036091E, 0x001A0A21, 0x000D0B23, 0x00060C09,
    0x00030D0A, 0x00010D0C, 0x5A7F0F8F, 0x3F251024,
    0x2CF21126, 0x207C1227, 0x17B91328, 0x1182142A,
    0x0CEF152B, 0x09A1162D, 0x072F172E, 0x055C1830,
    0x04061931, 0x03031A33, 0x02401B34, 0x01B11C36,
    0x01441D38, 0x00F51E39, 0x00B71F3B, 0x008A203C,
    0x0068213E, 0x004E223F, 0x003B2320, 0x002C0921,
    0x5AE125A5, 0x484C2640, 0x3A0D2741, 0x2EF12843,
    0x261F2944, 0x1F332A45, 0x19A82B46, 0x15182C48,
    0x11772D49, 0x0E742E4A, 0x0BFB2F4B, 0x09F8304D,
    0x0861314E, 0x0706324F, 0x05CD3330, 0x04DE3432,
    0x040F3532, 0x03633633, 0x02D43734, 0x025C3835,
    0x01F83936, 0x01A43A37, 0x01603B38, 0x01253C39,
    0x00F63D3A, 0x00CB3E3B, 0x00AB3F3D, 0x008F203D,
    0x5B1241C1, 0x4D044250, 0x412C4351, 0x37D84452,
    0x2FE84553, 0x293C4654, 0x23794756, 0x1EDF4857,
    0x1AA94957, 0x174E4A48, 0x14244B48, 0x119C4C4A,
    0x0F6B4D4A, 0x0D514E4B, 0x0BB64F4D, 0x0A40304D,
    0x583251D0, 0x4D1C5258, 0x438E5359, 0x3BDD545A,
    0x34EE555B, 0x2EAE565C, 0x299A575D, 0x25164756,
    0x557059D8, 0x4CA95A5F, 0x44D95B60, 0x3E225C61,
    0x38245D63, 0x32B45E63, 0x2E17565D, 0x56A860DF,
    0x4F466165, 0x47E56266, 0x41CF6367, 0x3C3D6468,
    0x375E5D63, 0x52316669, 0x4C0F676A, 0x4639686B,
    0x415E6367, 0x56276AE9, 0x50E76B6C, 0x4B85676D,
    0x55976D6E, 0x504F6B6F, 0x5A106FEE, 0x55226D70,
    0x59EB6FF0, 0x5A1D7171,
)

_FIXED = 113  # non-adaptive bin (state 113, Qe=0x5A1D, no transitions)


class _ArithDecoder:
    """QM decoder over one destuffed entropy segment (zero-fed past the
    end).  Register discipline matches libjpeg jdarith.c exactly: lazy
    renormalization at the start of each decision, ct tracks the bit
    alignment between A and the byte-fed C register, init ct=-16 pulls
    one byte and opens the interval at 0x10000."""

    __slots__ = ("data", "pos", "n", "c", "a", "ct")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.n = len(data)
        self.c = 0
        self.a = 0
        self.ct = -16

    def decode(self, st: bytearray, i: int) -> int:
        a = self.a
        c = self.c
        ct = self.ct
        data = self.data
        n = self.n
        pos = self.pos
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                b = data[pos] if pos < n else 0
                pos += 1
                c = (c << 8) | b
                ct += 8
                if ct < 0:  # still filling the 2 initial bytes
                    ct += 1
                    if ct == 0:  # init complete: open full interval
                        a = 0x10000
                        break
            a <<= 1
        self.pos = pos

        sv = st[i]
        v = _QE_TAB[sv & 0x7F]
        qe = v >> 16
        a -= qe
        if c < (a << ct):
            # MPS subinterval (bottom)
            if a < 0x8000:
                if a < qe:  # conditional exchange: value is really LPS
                    st[i] = (sv & 0x80) ^ (v & 0xFF)
                    sv ^= 0x80
                else:
                    st[i] = (sv & 0x80) ^ ((v >> 8) & 0xFF)
            # else: fast path — no renorm, no estimation update
        else:
            c -= a << ct
            if a < qe:  # conditional exchange: value is really MPS
                st[i] = (sv & 0x80) ^ ((v >> 8) & 0xFF)
            else:
                st[i] = (sv & 0x80) ^ (v & 0xFF)
                sv ^= 0x80
            a = qe
        self.a = a
        self.c = c
        self.ct = ct
        return sv >> 7


class _ArithEncoder:
    """QM encoder mirroring libjpeg jcarith.c: 3 spacer bits in C
    (output byte at c >> 19), carry resolved over the stacked-0xFF
    buffer, 0x00 stuffed after every emitted 0xFF."""

    __slots__ = ("c", "a", "ct", "buffer", "sc", "zc", "out")

    def __init__(self) -> None:
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.buffer = -1  # empty
        self.sc = 0  # stacked 0xFF bytes pending carry resolution
        self.zc = 0  # pending zero bytes
        self.out = bytearray()

    def encode(self, st: bytearray, i: int, val: int) -> None:
        sv = st[i]
        v = _QE_TAB[sv & 0x7F]
        qe = v >> 16
        self.a -= qe
        if val != (sv >> 7):
            # LPS
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) ^ (v & 0xFF)
        else:
            # MPS
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) ^ ((v >> 8) & 0xFF)
        # renormalize, emitting bytes as they complete
        out = self.out
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                temp = self.c >> 19
                if temp > 0xFF:
                    # carry propagates into buffered byte + stacked 0xFFs
                    if self.buffer >= 0:
                        if self.zc:
                            out.extend(b"\x00" * self.zc)
                            self.zc = 0
                        out.append(self.buffer + 1)
                        if self.buffer + 1 == 0xFF:
                            out.append(0x00)
                    self.zc += self.sc  # 0xFF + carry -> 0x00
                    self.sc = 0
                    self.buffer = temp & 0xFF
                elif temp == 0xFF:
                    self.sc += 1  # may still take a carry
                else:
                    # flush: no carry can reach these any more
                    if self.buffer == 0:
                        self.zc += 1
                    elif self.buffer >= 0:
                        if self.zc:
                            out.extend(b"\x00" * self.zc)
                            self.zc = 0
                        out.append(self.buffer)
                    if self.sc:
                        if self.zc:
                            out.extend(b"\x00" * self.zc)
                            self.zc = 0
                        out.extend(b"\xff\x00" * self.sc)
                        self.sc = 0
                    self.buffer = temp
                self.c &= 0x7FFFF
                self.ct += 8
            if self.a >= 0x8000:
                break

    def flush(self) -> bytes:
        """T.81 D.1.8 termination; returns the completed segment."""
        out = self.out
        # choose the in-interval C with the most trailing zeros
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        if temp < self.c:
            self.c = temp + 0x8000
        else:
            self.c = temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            # final carry
            if self.buffer >= 0:
                if self.zc:
                    out.extend(b"\x00" * self.zc)
                    self.zc = 0
                out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    out.append(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                if self.zc:
                    out.extend(b"\x00" * self.zc)
                    self.zc = 0
                out.append(self.buffer)
            if self.sc:
                if self.zc:
                    out.extend(b"\x00" * self.zc)
                    self.zc = 0
                out.extend(b"\xff\x00" * self.sc)
                self.sc = 0
        # final data bytes, only if nonzero (trailing zeros are implied)
        if self.c & 0x7FFF800:
            if self.zc:
                out.extend(b"\x00" * self.zc)
                self.zc = 0
            b = (self.c >> 19) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)
        return bytes(out)


# ---- statistical models (T.81 §F.1.4 / jdarith decode procedures) -----

def _decode_dc(dec, st, dc_ctx, ci, L, U):
    """One DC difference (T.81 Figures F.19-F.24); updates the per-
    component conditioning context in ``dc_ctx``."""
    s0 = dc_ctx[ci]
    if dec.decode(st, s0) == 0:
        dc_ctx[ci] = 0
        return 0
    sign = dec.decode(st, s0 + 1)
    ptr = s0 + 2 + sign
    m = dec.decode(st, ptr)
    if m:
        ptr = 20  # X1 (Table F.4)
        while dec.decode(st, ptr):
            m <<= 1
            if m == 0x8000:
                raise JpegError("arith DC magnitude overflow")
            ptr += 1
    # conditioning category for the NEXT block (F.1.4.4.1.2)
    if m < (1 << L) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << U) >> 1:
        dc_ctx[ci] = 12 + (sign << 2)
    else:
        dc_ctx[ci] = 4 + (sign << 2)
    v = m
    ptr += 14
    m >>= 1
    while m:
        if dec.decode(st, ptr):
            v |= m
        m >>= 1
    v += 1
    return -v if sign else v


def _decode_ac_block(dec, st, fixed, kx, lo, hi, emit):
    """AC coefficients k in [lo, hi] (T.81 Figure F.20); calls
    ``emit(k, v)`` per nonzero coefficient.  ``fixed`` is the shared
    non-adaptive sign bin.

    The QM decision (``_ArithDecoder.decode``) is INLINED over local
    register ints: AC decisions are ~90% of all arithmetic decisions in
    a sequential scan and the per-call method/attribute overhead
    dominated decode time.  The state machine is identical; registers
    are written back to ``dec`` on every exit path."""
    # inlined _ArithDecoder registers
    a = dec.a
    c = dec.c
    ct = dec.ct
    pos = dec.pos
    data = dec.data
    n = dec.n
    qe_tab = _QE_TAB

    k = lo
    try:
        while k <= hi:
            base = 3 * (k - 1)
            # --- decision template (see _ArithDecoder.decode) ---------
            sarr = st
            i = base
            while True:  # one iteration per decision, jumped via `goto`-ish flow
                while a < 0x8000:
                    ct -= 1
                    if ct < 0:
                        c = (c << 8) | (data[pos] if pos < n else 0)
                        pos += 1
                        ct += 8
                        if ct < 0:
                            ct += 1
                            if ct == 0:
                                a = 0x10000
                                break
                    a <<= 1
                sv = sarr[i]
                v = qe_tab[sv & 0x7F]
                qe = v >> 16
                a -= qe
                if c < (a << ct):
                    if a < 0x8000:
                        if a < qe:
                            sarr[i] = (sv & 0x80) ^ (v & 0xFF)
                            sv ^= 0x80
                        else:
                            sarr[i] = (sv & 0x80) ^ ((v >> 8) & 0xFF)
                else:
                    c -= a << ct
                    if a < qe:
                        sarr[i] = (sv & 0x80) ^ ((v >> 8) & 0xFF)
                    else:
                        sarr[i] = (sv & 0x80) ^ (v & 0xFF)
                        sv ^= 0x80
                    a = qe
                bit = sv >> 7
                # --- dispatch on which decision we just made ----------
                if i == base and sarr is st:
                    if bit:
                        return  # EOB
                    i = base + 1  # run-length decision next
                    continue
                if i == base + 1:
                    if bit == 0:
                        # zero run continues: next decision is the run
                        # bin of the NEXT k (no EOB re-check mid-run)
                        base += 3
                        k += 1
                        if k > hi:
                            raise JpegError("arith AC index overflow")
                        i = base + 1
                        continue
                    sarr = fixed
                    i = 0
                    continue
                if sarr is fixed:
                    sign = bit
                    sarr = st
                    i = base + 2
                    phase = 0  # first magnitude decision
                    continue
                if phase == 0:
                    if bit:
                        m = 1
                        phase = 1  # SP/X1 decision at the same bin
                        continue
                    # magnitude category 0: value is ±1, no mantissa bits
                    # (minimal exit form — ADVICE r4: the stale ptr/phase/
                    # mant assignments the other exits need are dead here)
                    emit(k, -1 if sign else 1)
                    k += 1
                    break
                if phase == 1:
                    if bit:  # SP doubles as X1 (Table F.5)
                        m = 2
                        i = 189 if k <= kx else 217
                        phase = 2
                        continue
                    ptr = i
                    v_out = m
                    ptr += 14
                    mant = m >> 1
                    if mant:
                        i = ptr
                        phase = 3
                        continue
                    v_out += 1
                    emit(k, -v_out if sign else v_out)
                    k += 1
                    break
                if phase == 2:  # magnitude exponent loop
                    if bit:
                        m <<= 1
                        if m == 0x8000:
                            raise JpegError("arith AC magnitude overflow")
                        i += 1
                        continue
                    ptr = i
                    v_out = m
                    ptr += 14
                    mant = m >> 1
                    if mant:
                        i = ptr
                        phase = 3
                        continue
                    v_out += 1
                    emit(k, -v_out if sign else v_out)
                    k += 1
                    break
                # phase == 3: mantissa bits
                if bit:
                    v_out |= mant
                mant >>= 1
                if mant:
                    continue
                v_out += 1
                emit(k, -v_out if sign else v_out)
                k += 1
                break
    finally:
        dec.a = a
        dec.c = c
        dec.ct = ct
        dec.pos = pos


def _encode_dc(enc, st, dc_ctx, ci, L, U, diff):
    s0 = dc_ctx[ci]
    if diff == 0:
        enc.encode(st, s0, 0)
        dc_ctx[ci] = 0
        return
    enc.encode(st, s0, 1)
    sign = 1 if diff < 0 else 0
    v = -diff if sign else diff
    enc.encode(st, s0 + 1, sign)
    ptr = s0 + 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(st, ptr, 1)
        m = 1
        v2 = v
        ptr = 20
        v2 >>= 1
        while v2:
            enc.encode(st, ptr, 1)
            m <<= 1
            ptr += 1
            v2 >>= 1
    enc.encode(st, ptr, 0)
    if m < (1 << L) >> 1:
        dc_ctx[ci] = 0
    elif m > (1 << U) >> 1:
        dc_ctx[ci] = 12 + (sign << 2)
    else:
        dc_ctx[ci] = 4 + (sign << 2)
    ptr += 14
    m >>= 1
    while m:
        enc.encode(st, ptr, 1 if (m & v) else 0)
        m >>= 1


def _encode_ac_block(enc, st, fixed, kx, lo, hi, zzvals):
    """AC coefficients of one block in zigzag order (T.81 Figure F.5)."""
    ke = hi
    while ke >= lo and zzvals[ke] == 0:
        ke -= 1
    k = lo
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        v = zzvals[k]
        while v == 0:
            enc.encode(st, base + 1, 0)
            base += 3
            k += 1
            v = zzvals[k]
        enc.encode(st, base + 1, 1)
        sign = 1 if v < 0 else 0
        if sign:
            v = -v
        enc.encode(fixed, 0, sign)
        ptr = base + 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, ptr, 1)
            m = 1
            v2 = v
            v2 >>= 1
            if v2:
                enc.encode(st, ptr, 1)
                m = 2
                ptr = 189 if k <= kx else 217
                v2 >>= 1
                while v2:
                    enc.encode(st, ptr, 1)
                    m <<= 1
                    ptr += 1
                    v2 >>= 1
        enc.encode(st, ptr, 0)
        ptr += 14
        m >>= 1
        while m:
            enc.encode(st, ptr, 1 if (m & v) else 0)
            m >>= 1
        k += 1
    if k <= hi:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


# ---- scan drivers -------------------------------------------------------

def decode_sequential_arith(width, height, comps, sel, dc_cond, ac_cond,
                            restart_interval, segs):
    """Interleaved sequential scan (SOF9).  Fills ``c.coefs`` with the
    same (n_blocks, 64) natural-order layout the Huffman paths produce."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    for c in comps:
        c.blocks_w = mcus_x * c.h
        c.blocks_h = mcus_y * c.v
        c.dc_tab, c.ac_tab = sel[c.cid]

    n_mcus = mcus_x * mcus_y
    zz = ZIGZAG.tolist()
    idx_acc: list[list[int]] = [[] for _ in comps]
    val_acc: list[list[int]] = [[] for _ in comps]

    plan = []
    for ci, c in enumerate(comps):
        for by in range(c.v):
            for bx in range(c.h):
                plan.append((ci, c.dc_tab, c.ac_tab, c.v, c.h, by, bx,
                             c.blocks_w))

    mcu = 0
    seg_idx = 0
    interval = restart_interval if restart_interval else n_mcus
    while mcu < n_mcus:
        if seg_idx >= len(segs):
            raise JpegError("truncated arithmetic entropy stream")
        dec = _ArithDecoder(segs[seg_idx])
        seg_idx += 1
        # statistics, conditioning and predictors reset per restart
        dc_stats = {t: bytearray(64) for t, _ in sel.values()}
        ac_stats = {t: bytearray(256) for _, t in sel.values()}
        fixed = bytearray([_FIXED])
        dc_ctx = [0] * len(comps)
        preds = [0] * len(comps)
        end = min(n_mcus, mcu + interval)
        while mcu < end:
            my, mx = divmod(mcu, mcus_x)
            for ci, td, ta, cv, ch, by, bx, bw in plan:
                base = ((my * cv + by) * bw + (mx * ch + bx)) * 64
                L, U = dc_cond.get(td, (0, 1))
                preds[ci] += _decode_dc(dec, dc_stats[td], dc_ctx, ci, L, U)
                iacc = idx_acc[ci]
                vacc = val_acc[ci]
                iacc.append(base)
                vacc.append(preds[ci])
                kx = ac_cond.get(ta, 5)

                def emit(k, v, iacc=iacc, vacc=vacc, base=base):
                    iacc.append(base + zz[k])
                    vacc.append(v)

                _decode_ac_block(dec, ac_stats[ta], fixed, kx, 1, 63, emit)
            mcu += 1

    for ci, c in enumerate(comps):
        flat = np.zeros(c.blocks_h * c.blocks_w * 64, dtype=np.int32)
        if idx_acc[ci]:
            flat[np.array(idx_acc[ci], dtype=np.int64)] = np.array(
                val_acc[ci], dtype=np.int32)
        c.coefs = flat.reshape(-1, 64)
    return comps


def progressive_scan_arith(width, height, comps, scan_sel, ss, se, ah, al,
                           dc_cond, ac_cond, restart_interval, segs):
    """One progressive scan of an SOF10 stream (jdarith decode_mcu_DC/AC
    first/refine semantics); updates ``c.pcoef`` in place."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    by_id = {c.cid: c for c in comps}
    zz = ZIGZAG.tolist()

    if ss == 0:
        if se != 0:
            raise JpegError("bad arithmetic progressive DC scan band")
        interleaved = len(scan_sel) > 1
        if interleaved:
            n_units = mcus_x * mcus_y
        else:
            c = by_id[scan_sel[0][0]]
            w2 = -(-(-(-width * c.h // hmax)) // 8)
            h2 = -(-(-(-height * c.v // vmax)) // 8)
            n_units = w2 * h2
        scan_comps = [by_id[cs] for cs, _, _ in scan_sel]
        tds = {cs: td for cs, td, _ in scan_sel}

        unit = 0
        seg_idx = 0
        interval = restart_interval if restart_interval else n_units
        while unit < n_units:
            if seg_idx >= len(segs):
                raise JpegError("truncated arith progressive DC stream")
            dec = _ArithDecoder(segs[seg_idx])
            seg_idx += 1
            dc_stats = {td: bytearray(64) for _, td, _ in scan_sel}
            fixed = bytearray([_FIXED])
            dc_ctx = [0] * len(scan_comps)
            for c in scan_comps:
                c.pred = 0
            end = min(n_units, unit + interval)
            while unit < end:
                if interleaved:
                    my, mx = divmod(unit, mcus_x)
                    blocks = []
                    for ci, c in enumerate(scan_comps):
                        for by in range(c.v):
                            for bx in range(c.h):
                                blocks.append(
                                    (ci, c, ((my * c.v + by) * c.blocks_w
                                             + mx * c.h + bx) * 64))
                else:
                    c = scan_comps[0]
                    r_, c_ = divmod(unit, w2)
                    blocks = [(0, c, (r_ * c.blocks_w + c_) * 64)]
                for ci, c, base in blocks:
                    if ah == 0:
                        td = tds[c.cid]
                        L, U = dc_cond.get(td, (0, 1))
                        c.pred += _decode_dc(dec, dc_stats[td], dc_ctx,
                                             ci, L, U)
                        c.pcoef[base] = c.pred << al
                    else:  # refinement: one fixed-bin bit per block
                        if dec.decode(fixed, 0):
                            c.pcoef[base] |= 1 << al
                unit += 1
        return

    # AC scan: single component
    if len(scan_sel) != 1:
        raise JpegError("arith progressive AC scan must be non-interleaved")
    cs, td, ta = scan_sel[0]
    c = by_id[cs]
    w2 = -(-(-(-width * c.h // hmax)) // 8)
    h2 = -(-(-(-height * c.v // vmax)) // 8)
    n_units = w2 * h2
    pc = c.pcoef
    kx = ac_cond.get(ta, 5)
    p1 = 1 << al
    m1 = -1 << al

    unit = 0
    seg_idx = 0
    interval = restart_interval if restart_interval else n_units
    while unit < n_units:
        if seg_idx >= len(segs):
            raise JpegError("truncated arith progressive AC stream")
        dec = _ArithDecoder(segs[seg_idx])
        seg_idx += 1
        ac_stats = bytearray(256)
        fixed = bytearray([_FIXED])
        end = min(n_units, unit + interval)
        while unit < end:
            r_, c_ = divmod(unit, w2)
            base = (r_ * c.blocks_w + c_) * 64
            if ah == 0:  # first AC scan

                def emit(k, v, base=base):
                    pc[base + zz[k]] = v << al

                _decode_ac_block(dec, ac_stats, fixed, kx, ss, se, emit)
            else:  # AC refinement (jdarith decode_mcu_AC_refine)
                kex = se
                while kex > 0 and pc[base + zz[kex]] == 0:
                    kex -= 1
                k = ss
                while k <= se:
                    st_base = 3 * (k - 1)
                    if k > kex:
                        if dec.decode(ac_stats, st_base):
                            break  # EOB
                    while True:
                        idx = base + zz[k]
                        cur = pc[idx]
                        if cur:  # previously nonzero: correction bit
                            if dec.decode(ac_stats, st_base + 2):
                                pc[idx] = cur + (m1 if cur < 0 else p1)
                            break
                        if dec.decode(ac_stats, st_base + 1):
                            pc[idx] = m1 if dec.decode(fixed, 0) else p1
                            break
                        st_base += 3
                        k += 1
                        if k > se:
                            raise JpegError("arith AC refine overflow")
                    k += 1
            unit += 1


def encode_sequential_arith(width, height, planes_hv, quant_blocks,
                            restart_interval=0):
    """Entropy-encode quantized blocks as one interleaved arithmetic
    scan.  ``planes_hv`` is [(h, v)] per component; ``quant_blocks`` is
    [(blocks_zz (n,64) int32 ZIGZAG order, blocks_h, blocks_w)].
    Returns the byte-stuffed entropy stream (restart markers included
    when ``restart_interval``), using default conditioning (DAC-free).
    Components 0 use table 0, the rest table 1, mirroring encode_jpeg."""
    ncomp = len(planes_hv)
    hmax = max(h for h, _ in planes_hv)
    vmax = max(v for _, v in planes_hv)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    out = bytearray()
    interval = restart_interval if restart_interval else n_mcus
    mcu = 0
    rst = 0
    while mcu < n_mcus:
        enc = _ArithEncoder()
        dc_stats = {0: bytearray(64), 1: bytearray(64)}
        ac_stats = {0: bytearray(256), 1: bytearray(256)}
        fixed = bytearray([_FIXED])
        dc_ctx = [0] * ncomp
        preds = [0] * ncomp
        end = min(n_mcus, mcu + interval)
        while mcu < end:
            my, mx = divmod(mcu, mcus_x)
            for ci in range(ncomp):
                ch, cv = planes_hv[ci]
                quant, bh, bw = quant_blocks[ci]
                t = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        row = min(my * cv + by, bh - 1)
                        col = min(mx * ch + bx, bw - 1)
                        zzvals = quant[row * bw + col]
                        dc = int(zzvals[0])
                        _encode_dc(enc, dc_stats[t], dc_ctx, ci, 0, 1,
                                   dc - preds[ci])
                        preds[ci] = dc
                        _encode_ac_block(enc, ac_stats[t], fixed, 5, 1, 63,
                                         zzvals.tolist())
            mcu += 1
        out += enc.flush()
        if mcu < n_mcus:
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
    return bytes(out)
