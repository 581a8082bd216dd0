"""Arithmetic-coded JPEG (ITU-T T.81 Annexes D + F): the QM coder.

Closes the JPEG codec's last honest gap: ~the remaining slice of
real-web JPEGs that use arithmetic entropy coding (SOF9, sequential
DCT) decoded `ok=False` until now. The QM coder is fully specified
in the public T.81 spec: a 113-state adaptive probability estimator
(Table D.3) driving a multiply-free binary arithmetic coder, with
per-decision context bins for the DC difference tree (F.1.4.4.1)
and the AC EOB/run/magnitude tree (F.1.4.4.2).

Provenance of the state table: ITU-T T.81 Table D.3 (the same table
appears in ISO/IEC 10918-1 and T.82/JBIG). The constants below are
packed (Qe << 16) | (NMPS << 8) | (SWITCH << 7) | NLPS and were
cross-checked entry-by-entry against the system libjpeg's compiled
copy of the same public table (state 0 = Qe 0x5A1D, NMPS 1, NLPS 1,
SWITCH 1; state 113 is the non-adapting 0.5-probability bin used
for AC sign decisions).

Wire conventions (same as the Huffman modes, per T.81 §B):
entropy-coded bytes 0xFF are followed by a stuffed 0x00; any other
byte after 0xFF is a marker and the decoder feeds zero bytes from
then on. jpegcodec._split_entropy already performs exactly this
unstuffing + RSTn split, so both entropy families share the byte
transport. Restart intervals re-init the coder registers AND reset
every statistics bin and DC predictor/context (F.1.4.4).

Conditioning defaults per §F.1.4.4.1.2/.2.1: DC L=0, U=1; AC Kx=5
(overridable by a DAC segment, parsed in jpegcodec).

Scale note: per-symbol Python, ~10^5 decisions per small image —
the slow-but-rare path, isolated per actor like the rest of the
codec; the common formats stay on the vectorized Huffman path.
"""

from __future__ import annotations

# (Qe << 16) | (NMPS << 8) | (SWITCH << 7) | NLPS — T.81 Table D.3
ARITAB = [
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
]
assert len(ARITAB) == 114

FIXED_BIN = 113  # stationary 0.5-probability state (AC signs)


class ArithDecoder:
    """T.81 Annex D decoder over one UNSTUFFED entropy segment (as
    produced by jpegcodec._split_entropy): registers C/A/CT, zero
    bytes fed past the end of data (the at-marker rule). Context
    bins are bytearrays packing (MPS << 7) | state_index."""

    __slots__ = ("data", "n", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        b0 = data[0] if self.n > 0 else 0
        b1 = data[1] if self.n > 1 else 0
        b2 = data[2] if self.n > 2 else 0
        self.bp = 3
        # window (bits 16..31) = first 16 code bits; the next byte is
        # preloaded at bits 8..15 so renorm shifts pull real code bits
        # immediately; CT=8 schedules the following BYTEIN
        self.c = (b0 << 24) | (b1 << 16) | (b2 << 8)
        self.a = 0x10000
        self.ct = 8

    def decode(self, st: bytearray, i: int) -> int:
        sv = st[i]
        entry = ARITAB[sv & 0x7F]
        qe = entry >> 16
        a = self.a - qe
        c = self.c
        if (c >> 16) < a:
            # bottom subinterval
            if a & 0x8000:
                self.a = a
                return sv >> 7  # MPS, no renorm
            # renorm path: conditional exchange decides the symbol
            if a < qe:
                d = (sv >> 7) ^ 1
                st[i] = ((sv ^ (0x80 if entry & 0x80 else 0)) & 0x80) \
                    | (entry & 0x7F)              # NLPS (+switch)
            else:
                d = sv >> 7
                st[i] = (sv & 0x80) | ((entry >> 8) & 0xFF)  # NMPS
        else:
            # top subinterval
            c -= a << 16
            if a < qe:
                d = sv >> 7
                st[i] = (sv & 0x80) | ((entry >> 8) & 0xFF)  # NMPS
            else:
                d = (sv >> 7) ^ 1
                st[i] = ((sv ^ (0x80 if entry & 0x80 else 0)) & 0x80) \
                    | (entry & 0x7F)              # NLPS (+switch)
            a = qe
        # RENORMD
        ct = self.ct
        data, n, bp = self.data, self.n, self.bp
        while a < 0x8000:
            if ct == 0:
                c |= (data[bp] if bp < n else 0) << 8
                bp += 1
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
        self.a = a
        self.c = c
        self.ct = ct
        self.bp = bp
        return d


class ArithEncoder:
    """T.81 Annex D encoder: pending-byte + stacked-0xFF carry
    resolution, 0xFF00 stuffing on output, CLEARBITS flush."""

    __slots__ = ("out", "c", "a", "ct", "b", "sc")

    def __init__(self):
        self.out = bytearray()
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.b = -1   # pending byte (-1: none yet)
        self.sc = 0   # stacked 0xFF count

    def _emit(self, byte: int):
        self.out.append(byte)
        if byte == 0xFF:
            self.out.append(0x00)  # stuff

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:
            # carry ripples into the pending byte; stacked 0xFFs
            # become 0x00s
            if self.b >= 0:
                self._emit(self.b + 1)
            for _ in range(self.sc):
                self._emit(0x00)
            self.sc = 0
            self.b = t & 0xFF
        elif t == 0xFF:
            self.sc += 1
        else:
            if self.b >= 0:
                self._emit(self.b)
            for _ in range(self.sc):
                self._emit(0xFF)
            self.sc = 0
            self.b = t
        self.c &= 0x7FFFF

    def encode(self, st: bytearray, i: int, d: int):
        sv = st[i]
        entry = ARITAB[sv & 0x7F]
        qe = entry >> 16
        a = self.a - qe
        if d == (sv >> 7):
            # MPS
            if a & 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange
                self.c += a
                a = qe
            st[i] = (sv & 0x80) | ((entry >> 8) & 0xFF)  # NMPS
        else:
            # LPS
            if a >= qe:  # no exchange: LPS takes the top
                self.c += a
                a = qe
            st[i] = ((sv ^ (0x80 if entry & 0x80 else 0)) & 0x80) \
                | (entry & 0x7F)                          # NLPS
        # RENORME
        while a < 0x8000:
            a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
        self.a = a

    def flush(self) -> bytes:
        # CLEARBITS: pick the code point with the most trailing zeros
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        if self.b >= 0 and self.b != 0:
            self._emit(self.b)
        elif self.b == 0:
            self.out.append(0)  # keep alignment simple; zeros are
            # decodable padding (decoder feeds zeros anyway)
        for _ in range(self.sc):
            self._emit(0xFF)
        # trailing zero bytes are optional per D.1.8 — keep them
        return bytes(self.out)


# ---------------------------------------------------------------------------
# sequential DCT scan (SOF9): F.1.4.4 encode / F.2.4.3 decode trees
# ---------------------------------------------------------------------------


def _classify_dc(m: int, sign: int, L: int, U: int) -> int:
    """F.1.4.4.1.2: conditioning category of a just-coded DIFF whose
    magnitude MSB power is m (0 for |diff| = 1)."""
    if m < ((1 << L) >> 1):
        return 0
    if m > ((1 << U) >> 1):
        return 12 + sign * 4
    return 4 + sign * 4


def decode_arith_scan(segs: list[bytes], comps: list[dict],
                      scan: list[tuple[int, int, int]],
                      mcux: int, mcuy: int,
                      restart_interval: int,
                      dc_cond: dict[int, tuple[int, int]],
                      ac_cond: dict[int, int]) -> None:
    """Decode an interleaved sequential arithmetic scan into each
    component's ``coef`` array (same contract as the Huffman MCU
    loop). ``scan``: (comp_index, dc_table, ac_table) triples;
    ``dc_cond[t]`` = (L, U), ``ac_cond[t]`` = Kx."""
    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    fixed = bytearray([FIXED_BIN])

    def reset():
        for _, d, a in scan:
            dc_stats[d] = bytearray(64)
            ac_stats[a] = bytearray(256)
        fixed[0] = FIXED_BIN

    scan_info = [(ci, d, a, comps[ci]["v"], comps[ci]["h"],
                  comps[ci]["bw"]) for ci, d, a in scan]
    nseg = len(segs)
    si = 0
    reset()
    dec = ArithDecoder(segs[0])
    last_dc = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    mcu_count = 0
    fills: list[tuple[list[int], list[int]]] = \
        [([], []) for _ in comps]

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                si += 1
                if si >= nseg:
                    raise ValueError("missing restart segment")
                reset()
                dec = ArithDecoder(segs[si])
                last_dc = [0] * len(comps)
                dc_ctx = [0] * len(comps)
            mcu_count += 1
            for ci, dt, at, cv, ch, cbw in scan_info:
                L, U = dc_cond[dt]
                kx = ac_cond[at]
                dst = dc_stats[dt]
                ast = ac_stats[at]
                rows, vals = fills[ci]
                for by in range(cv):
                    for bx in range(ch):
                        row64 = ((my * cv + by) * cbw
                                 + (mx * ch + bx)) * 64
                        # --- DC (F.2.4.3.1) ---
                        ctx = dc_ctx[ci]
                        if dec.decode(dst, ctx) == 0:
                            dc_ctx[ci] = 0
                        else:
                            sign = dec.decode(dst, ctx + 1)
                            sp = ctx + 2 + sign
                            m = dec.decode(dst, sp)
                            last_bin = sp
                            if m:
                                xb = 20
                                while dec.decode(dst, xb):
                                    m <<= 1
                                    if m == 0x8000:
                                        raise ValueError(
                                            "DC magnitude overflow")
                                    xb += 1
                                last_bin = xb
                            dc_ctx[ci] = _classify_dc(m, sign, L, U)
                            v = m
                            bb = last_bin + 14
                            while m > 1:
                                m >>= 1
                                if dec.decode(dst, bb):
                                    v |= m
                            v += 1
                            if sign:
                                v = -v
                            last_dc[ci] += v
                        rows.append(row64)
                        vals.append(last_dc[ci])
                        # --- AC (F.2.4.3.2) ---
                        k = 1
                        while k <= 63:
                            st3 = 3 * (k - 1)
                            if dec.decode(ast, st3):
                                break  # EOB
                            while dec.decode(ast, st3 + 1) == 0:
                                st3 += 3
                                k += 1
                                if k > 63:
                                    raise ValueError("AC overflow")
                            sign = dec.decode(fixed, 0)
                            mb = st3 + 2
                            m = dec.decode(ast, mb)
                            last_bin = mb
                            if m:
                                if dec.decode(ast, mb):
                                    m = 2
                                    xb = 189 if k <= kx else 217
                                    while dec.decode(ast, xb):
                                        m <<= 1
                                        if m == 0x8000:
                                            raise ValueError(
                                                "AC magnitude overflow")
                                        xb += 1
                                    last_bin = xb
                            v = m
                            bb = last_bin + 14
                            while m > 1:
                                m >>= 1
                                if dec.decode(ast, bb):
                                    v |= m
                            v += 1
                            if sign:
                                v = -v
                            rows.append(row64 + k)
                            vals.append(v)
                            k += 1
    import numpy as np

    for c, (rows, vals) in zip(comps, fills):
        if rows:
            flat = c["coef"].reshape(-1)
            flat[np.asarray(rows, np.int64)] = np.asarray(vals, np.int64)


def _encode_dc(enc: ArithEncoder, dst: bytearray, ctx: int, diff: int,
               L: int, U: int) -> int:
    """Encode one DC difference; returns the next conditioning ctx."""
    if diff == 0:
        enc.encode(dst, ctx, 0)
        return 0
    enc.encode(dst, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dst, ctx + 1, sign)
    v = -diff if sign else diff
    vm1 = v - 1
    sp = ctx + 2 + sign
    if vm1 == 0:
        enc.encode(dst, sp, 0)
        m = 0
        last_bin = sp
    else:
        enc.encode(dst, sp, 1)
        m = 1
        xb = 20
        while (m << 1) <= vm1:
            enc.encode(dst, xb, 1)
            m <<= 1
            xb += 1
        enc.encode(dst, xb, 0)
        last_bin = xb
    bb = last_bin + 14
    mm = m >> 1
    while mm:
        enc.encode(dst, bb, 1 if vm1 & mm else 0)
        mm >>= 1
    return _classify_dc(m, sign, L, U)


def _encode_ac(enc: ArithEncoder, ast: bytearray, fixed: bytearray,
               blk: list, kx: int) -> None:
    eob = 63
    while eob >= 1 and blk[eob] == 0:
        eob -= 1
    k = 1
    while k <= 63:
        st3 = 3 * (k - 1)
        if k > eob:
            enc.encode(ast, st3, 1)  # EOB
            return
        enc.encode(ast, st3, 0)
        while blk[k] == 0:
            enc.encode(ast, st3 + 1, 0)
            st3 += 3
            k += 1
        enc.encode(ast, st3 + 1, 1)
        val = blk[k]
        sign = 1 if val < 0 else 0
        enc.encode(fixed, 0, sign)
        v = -val if sign else val
        vm1 = v - 1
        mb = st3 + 2
        if vm1 == 0:
            enc.encode(ast, mb, 0)
            m = 0
            last_bin = mb
        else:
            enc.encode(ast, mb, 1)
            if vm1 == 1:
                enc.encode(ast, mb, 0)
                m = 1
                last_bin = mb
            else:
                enc.encode(ast, mb, 1)
                m = 2
                xb = 189 if k <= kx else 217
                while (m << 1) <= vm1:
                    enc.encode(ast, xb, 1)
                    m <<= 1
                    xb += 1
                enc.encode(ast, xb, 0)
                last_bin = xb
        bb = last_bin + 14
        mm = m >> 1
        while mm:
            enc.encode(ast, bb, 1 if vm1 & mm else 0)
            mm >>= 1
        k += 1
    # nonzero at k=63 coded: no EOB decision follows (F.1.4.4.2)


def encode_arith_scan(planes: list[tuple], mcux: int, mcuy: int,
                      restart_interval: int,
                      L: int = 0, U: int = 1, kx: int = 5) -> bytes:
    """Encode an interleaved sequential arithmetic scan.
    ``planes``: (blocks, blocks_across, v, h, dc_table, ac_table) per
    scan component, blocks = list of 64-length zigzag coefficient
    lists. Returns the entropy bytes WITH RSTn markers spliced in."""
    out = bytearray()
    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    fixed = bytearray([FIXED_BIN])

    def reset():
        for _, _, _, _, dt, at in planes:
            dc_stats[dt] = bytearray(64)
            ac_stats[at] = bytearray(256)
        fixed[0] = FIXED_BIN

    reset()
    enc = ArithEncoder()
    last_dc = [0] * len(planes)
    dc_ctx = [0] * len(planes)
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                reset()
                enc = ArithEncoder()
                last_dc = [0] * len(planes)
                dc_ctx = [0] * len(planes)
            mcu_count += 1
            for pi, (blocks, bwid, v, h, dt, at) in enumerate(planes):
                for by in range(v):
                    for bx in range(h):
                        blk = blocks[(my * v + by) * bwid
                                     + (mx * h + bx)]
                        diff = blk[0] - last_dc[pi]
                        last_dc[pi] = blk[0]
                        dc_ctx[pi] = _encode_dc(
                            enc, dc_stats[dt], dc_ctx[pi], diff, L, U)
                        _encode_ac(enc, ac_stats[at], fixed, blk, kx)
    out += enc.flush()
    return bytes(out)
