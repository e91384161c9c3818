"""REAL arithmetic-coded sequential JPEG decode (SOF9) — ITU-T T.81
Annex D QM-coder + §F.1.4.4 statistics model, pure Python/numpy (round 9;
previously the last major documented fake in the decode family).

What is implemented:
- the QM binary arithmetic decoder (Annex D.2): 16-bit interval register
  A, per-context (index, MPS) adaptive state over the Annex D Table D.3
  transition table, conditional exchange on both paths, renormalization;
- the sequential DCT statistics model (F.1.4.4): DC diff coding with the
  5-class previous-diff conditioning (L/U thresholds from DAC, defaults
  0/1) over a 49-bin state area; AC coding per coefficient index k with
  the 3-bins-per-k (EOB, significance, first magnitude category) layout,
  the Kx-conditioned high-magnitude regions at bins 189/217, magnitude
  bits at category+14, and the non-adaptive fixed bin for AC signs;
- DAC (0xCC) conditioning parameters; 8/12-bit precision (same top-8-bit
  output contract as every other decode path); interleaved and
  single-component scans; 1-4 components with any sampling factors.

Round 10 adds arithmetic-coded PROGRESSIVE decode (SOF10,
`decode_jpeg_arith_progressive`): the Annex G.2 scan procedures —
spectral selection + successive approximation — over the same QM coder
and F.1.4.4 statistics bins (DC first = the sequential DIFF model on
DC >> Al; DC refinement = fixed-context bits; AC first = the sequential
band model; AC refinement = per-k EOB/significance/correction decisions
with fixed-context signs). Each scan is an independent entropy segment
with fresh statistics.

Round 10 also adds arithmetic-coded LOSSLESS decode (SOF11,
`decode_jpeg_arith_lossless`): the Annex H.1.2.2 statistical model —
each sample difference coded by the DC DIFF decision tree under
two-dimensional (Da, Db) conditioning — over the same QM coder.

Restart intervals (round 11): the SOF9 sequential AND SOF10 progressive
paths implement the strict T.81 arithmetic restart (entropy segments of
Ri MCUs — or Ri blocks in non-interleaved scans — RSTn cycling 0..7
strictly validated, per-segment re-init of the QM decoder + statistics +
predictions + conditioning; E.2.4/F.1.4.0/G.2), round-trip tested
against the fixtures encoders' restart_interval support. Gate status
(r12): SOF9's default is now allow_restart=True — the flip landed with
arith_decode_audit's rotation into the r12 driver window (its DRI leg's
pinned constants moved from fake-route to the hand-derived real decode).
SOF10 stays gated OFF (allow_restart=False) until
arith_progressive_decode_audit rotates in (r13 — its DRI leg still
carries evidence classifying DRI blobs as fakes). Still out of scope
(returns None → the
documented fake): DRI in the LOSSLESS (SOF11) path — T.81's lossless
restart semantics are genuinely ambiguous about which decoded neighbor
samples the post-restart predictor may reference (full independence
would forbid the above-row neighbors every non-restart decoder uses),
so any implementation here would be a private convention round-tripping
against itself; it stays documented, matching the SOF3 Huffman-lossless
path's standing rationale.

Evidence honesty — what "encoder/decoder agreement" covers here: the
DECODE procedures below and the ENCODE procedures in
`multimodal/fixtures.py` are written separately from the Annex D
flowcharts, so round-trip agreement evidences the interval arithmetic,
conditional exchange, renormalization and the whole F.1.4.4 statistics
model. Two things are SHARED data/conventions and therefore NOT evidenced
by agreement (same status as the ZIGZAG constant): the Table D.3 state
table transcription, and the bit-transport framing (this implementation
initializes the code window with the first 16 entropy bits and applies
T.81's 0xFF byte-stuffing rule — a zero bit follows every 0xFF byte, a
post-0xFF byte > 0x8F is a marker, and exhausted streams feed 1-bits —
rather than reproducing the flowcharts' byte-aligned 32-bit register
bookkeeping, so bit-exact interop with external codecs is plausible but
UNVERIFIED in this container, which ships no reference JPEG codec).

Production guidance (r11, from the r10 advisory): the SOF11 stats-bin
layout (LL_STAT_BINS=158, ladder bases 100/129, +14 magnitude-bit offset)
is a self-defined convention validated only against this repo's fixture
encoder. Before trusting real_decode=true SOF11 output from an EXTERNAL
corpus, validate one externally-generated SOF11 stream against this
decoder (or at minimum plausibility-check the decoded plane — e.g.
residual energy vs the fake-thumb baseline); a layout mismatch would
decode to garbage without fake-routing.
"""

from __future__ import annotations

import struct

# Annex D Table D.3: (Qe, NMPS, NLPS, SWITCH) per state 0..112, plus the
# non-adaptive "fixed" state 113 (used for AC signs, F.1.4.4.2.1) that
# transitions to itself. SHARED DATA with the fixtures encoder — a
# transcription error here round-trips invisibly (documented above).
QM_TABLE: list[tuple[int, int, int, int]] = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # fixed, non-adaptive (AC sign)
]
FIXED_BIN = 113

# F.1.4.4.1 DC statistics layout: context base in {0,4,8,12,16} by the
# previous diff's class, +0 S0 / +1 SS / +2 SP / +3 SN; magnitude
# categories at 20..; magnitude bits at category bin + 14.  49 bins.
DC_STAT_BINS = 49
# F.1.4.4.2 AC layout: 3*(k-1) -> (SE, S0, X1); X2+ at 189 (k <= Kx) or
# 217 (k > Kx); magnitude bits at category bin + 14.  245 bins.
AC_STAT_BINS = 245
AC_LOW_BASE = 189
AC_HIGH_BASE = 217


class _BitSource:
    """Entropy-bit reader with T.81 arithmetic-coding framing: a zero bit
    is stuffed after every 0xFF byte (so the post-0xFF byte's MSB is the
    stuff, leaving 7 payload bits); a post-0xFF byte > 0x8F is a marker —
    from there on (and past end of data) the source feeds 1-bits
    (D.2: marker reached, decoder pads with 1s)."""

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0
        self._bits = 0
        self._nbits = 0
        self._done = False

    def _load_byte(self) -> None:
        if self._done or self._pos >= len(self._data):
            self._done = True
            self._bits = (self._bits << 8) | 0xFF
            self._nbits += 8
            return
        b = self._data[self._pos]
        self._pos += 1
        if b != 0xFF:
            self._bits = (self._bits << 8) | b
            self._nbits += 8
            return
        nxt = self._data[self._pos] if self._pos < len(self._data) else 0xFF
        if nxt > 0x8F:  # marker: do not consume, feed 1s forever
            self._done = True
            self._bits = (self._bits << 8) | 0xFF
            self._nbits += 8
            return
        # 0xFF payload byte; the NEXT byte carries a stuffed 0 MSB
        self._pos += 1
        self._bits = (self._bits << 15) | (0xFF << 7) | (nxt & 0x7F)
        self._nbits += 15

    def next_bit(self) -> int:
        if self._nbits == 0:
            self._load_byte()
        self._nbits -= 1
        return (self._bits >> self._nbits) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.next_bit()
        return v


class QMDecoder:
    """Annex D.2 QM arithmetic decoder over a _BitSource. Contexts are
    mutable [state_index, mps] pairs; LPS owns the LOW [0, Qe) subinterval
    (the fixtures encoder mirrors this), with conditional exchange when
    the MPS subinterval A-Qe falls below Qe."""

    def __init__(self, data: bytes):
        self._src = _BitSource(data)
        self.a = 1 << 16
        self.cx = self._src.read(16)

    def decode(self, ctx: list) -> int:
        i, mps = ctx
        qe = QM_TABLE[i][0]
        self.a -= qe
        if self.cx < qe:
            # low subinterval — nominal LPS
            if self.a < qe:  # conditional exchange: low belongs to MPS
                d = mps
                ctx[0] = QM_TABLE[i][1]
            else:
                d = 1 - mps
                if QM_TABLE[i][3]:
                    ctx[1] = 1 - mps
                ctx[0] = QM_TABLE[i][2]
            self.a = qe
            self._renorm()
        else:
            self.cx -= qe
            if self.a & 0x8000 == 0:
                if self.a < qe:  # conditional exchange: high belongs to LPS
                    d = 1 - mps
                    if QM_TABLE[i][3]:
                        ctx[1] = 1 - mps
                    ctx[0] = QM_TABLE[i][2]
                else:
                    d = mps
                    ctx[0] = QM_TABLE[i][1]
                self._renorm()
            else:
                d = mps
        return d

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.cx = (self.cx << 1) | self._src.next_bit()


def _new_stats(n: int) -> list[list[int]]:
    return [[0, 0] for _ in range(n)]


def fixed_ctx() -> list[int]:
    """A fresh non-adaptive 0.5-probability context (AC sign)."""
    return [FIXED_BIN, 0]


def decode_dc_diff(dec: QMDecoder, stats: list[list[int]], ctx_base: int,
                   L: int, U: int) -> tuple[int, int]:
    """Decode one DC DIFF per F.1.4.4.1 (the decode mirror of Figures
    F.4-F.7). Returns (diff, next_ctx_base) — the caller threads the
    conditioning class of THIS diff into the next block's context."""
    if dec.decode(stats[ctx_base]) == 0:
        return 0, 0
    sign = dec.decode(stats[ctx_base + 1])
    st = ctx_base + 2 + sign
    m = dec.decode(stats[st])
    if m != 0:
        st = 20
        while dec.decode(stats[st]):
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC magnitude overflow")
            st += 1
    # conditioning class of this diff for the NEXT block (F.1.4.4.1.2)
    if m < ((1 << L) >> 1):
        nxt = 0
    elif m > ((1 << U) >> 1):
        nxt = 12 + sign * 4
    else:
        nxt = 4 + sign * 4
    v = m
    st += 14
    mm = m
    while mm > 1:
        mm >>= 1
        if dec.decode(stats[st]):
            v |= mm
    v += 1
    return (-v if sign else v), nxt


def decode_ac_block(dec: QMDecoder, stats: list[list[int]], kx: int,
                    sign_ctx: list[int], coef_zz: list[int]) -> None:
    """Decode AC coefficients 1..63 into coef_zz (zigzag order) per
    F.1.4.4.2 (decode mirror of Figures F.8-F.10)."""
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(stats[base]):  # SE: end of block
            return
        while dec.decode(stats[base + 1]) == 0:  # S0: coefficient zero
            k += 1
            if k > 63:
                raise ValueError("AC run past k=63")
            base = 3 * (k - 1)
        sign = dec.decode(sign_ctx)
        st = base + 2
        m = dec.decode(stats[st])
        if m != 0:
            if dec.decode(stats[st]):
                m = 2
                st = AC_LOW_BASE if k <= kx else AC_HIGH_BASE
                while dec.decode(stats[st]):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        mm = m
        while mm > 1:
            mm >>= 1
            if dec.decode(stats[st]):
                v |= mm
        v += 1
        coef_zz[k] = -v if sign else v
        k += 1


def decode_jpeg_arith(data: bytes, allow_restart: bool = True):
    """Decode an arithmetic-coded sequential JPEG (SOF9) to the uint8 Y
    luma plane (top 8 bits at 12-bit precision), or None when the stream
    is structurally corrupt or out of scope (SOF10/SOF11). Mirrors
    `_decode_jpeg_gray`'s contract so `_decode_gray_pixels` can route to
    it transparently.

    Restart intervals: the strict T.81 arithmetic restart —
    ceil(mcus/Ri) entropy segments, RSTn markers cycling 0..7, each
    segment re-initializing the QM decoder, ALL statistics areas, the DC
    predictions and the DC conditioning state (E.2.4/F.1.4.0) — was
    implemented in r11 (see _decode_arith_scan) behind
    `allow_restart=False` while arith_decode_audit's `4_ar_dri.jpg` leg
    still carried driver evidence pinning DRI blobs as fakes; the default
    flipped to True in r12 when that audit rotated back into the driver
    window with updated real-decode constants. `allow_restart=False` is
    kept as an explicit opt-out for callers that need the old
    fake-routing behavior."""
    import numpy as np

    from seo_audit_etl_actor_spark.multimodal.binary_ops import (
        _JPEG_ZIGZAG,
        _jpeg_upsample_y,
    )

    if data[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, "np.ndarray"] = {}
    # DAC conditioning: DC (L, U) per table id; AC Kx per table id
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    sof = None
    precision = 8
    restart_interval = 0
    i, n = 2, len(data)
    try:
        while i + 4 <= n:
            if data[i] != 0xFF:
                return None
            marker = data[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                return None
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            body = data[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 15
                    j += 1
                    if pq == 0:
                        vals = np.frombuffer(body[j : j + 64], dtype=np.uint8)
                        j += 64
                    else:
                        vals = np.frombuffer(body[j : j + 128], dtype=">u2")
                        j += 128
                    if len(vals) < 64:
                        return None
                    tbl = np.zeros(64, dtype=np.int64)
                    tbl[_JPEG_ZIGZAG] = vals.astype(np.int64)
                    qtables[tq] = tbl.reshape(8, 8)
            elif marker == 0xCC:  # DAC
                j = 0
                while j + 2 <= len(body):
                    tc, tb = body[j] >> 4, body[j] & 15
                    cs = body[j + 1]
                    j += 2
                    if tc == 0:
                        dc_cond[tb] = (cs & 15, cs >> 4)  # (L, U)
                    else:
                        ac_cond[tb] = cs  # Kx
            elif marker == 0xC9:  # SOF9 arithmetic sequential
                precision, ih, iw, ncomp = struct.unpack(">BHHB", body[:6])
                if precision not in (8, 12) or ncomp == 0 or ncomp > 4 or iw == 0 or ih == 0:
                    return None
                comps = []
                for c in range(ncomp):
                    cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                    comps.append((cid, hv >> 4, hv & 15, tq))
                sof = (iw, ih, comps)
            elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # not arithmetic-sequential — wrong path
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:  # SOS
                if sof is None or (restart_interval and not allow_restart):
                    return None  # DRI gated off (see docstring)
                ns = body[0]
                scan = []
                for c in range(ns):
                    cs, tda = body[1 + c * 2 : 3 + c * 2]
                    scan.append((cs, tda >> 4, tda & 15))
                ecs = data[i + 2 + seg_len :]
                return _decode_arith_scan(
                    ecs, sof, scan, qtables, dc_cond, ac_cond, precision,
                    restart_interval,
                )
            i += 2 + seg_len
    except (ValueError, IndexError, struct.error):
        return None
    return None


def _decode_arith_scan(ecs, sof, scan, qtables, dc_cond, ac_cond, precision,
                       restart_interval=0):
    """Sequential arithmetic scan → Y plane (same MCU walk as the Huffman
    `_jpeg_decode_scan`, with QM statistics instead of Huffman tables).
    With `restart_interval` > 0 the entropy data is ceil(mcus/Ri) segments
    separated by RSTn markers cycling 0..7 (strictly validated); each
    segment starts a fresh QM decoder over fresh statistics, predictions
    and conditioning state."""
    import numpy as np

    from seo_audit_etl_actor_spark.multimodal.binary_ops import (
        _JPEG_ZIGZAG,
        _jpeg_upsample_y,
    )

    iw, ih, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax == 0 or vmax == 0:
        return None
    mcux = (iw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (ih + 8 * vmax - 1) // (8 * vmax)

    scan_by_id = {cs: (td, ta) for cs, td, ta in scan}
    order = [(cid, h, v, tq) for cid, h, v, tq in comps if cid in scan_by_id]
    if len(order) != len(scan):
        return None
    y_cid, y_h, y_v, y_tq = order[0]
    true_h, true_v = y_h, y_v
    if len(order) == 1:
        comp_w = (iw * true_h + hmax - 1) // hmax
        comp_h = (ih * true_v + vmax - 1) // vmax
        mcux, mcuy = (comp_w + 7) // 8, (comp_h + 7) // 8
        y_h = y_v = 1
        order = [(y_cid, 1, 1, y_tq)]
    if y_tq not in qtables:
        return None
    yq = qtables[y_tq]

    u = np.arange(8)
    x = np.arange(8)
    A = 0.5 * np.cos((2 * x[:, None] + 1) * u[None, :] * np.pi / 16)
    A[:, 0] *= 1 / np.sqrt(2)

    dec = QMDecoder(ecs)
    dc_stats: dict[int, list] = {}
    ac_stats: dict[int, list] = {}
    sign_ctx = fixed_ctx()
    pred = {cid: 0 for cid, _, _, _ in order}
    dc_ctx_base = {cid: 0 for cid, _, _, _ in order}
    seg_start = 0

    plane = np.zeros((mcuy * 8 * y_v, mcux * 8 * y_h), dtype=np.uint8)
    level = 1 << (precision - 1)
    maxval = (1 << precision) - 1
    try:
        for m in range(mcux * mcuy):
            if restart_interval and m > 0 and m % restart_interval == 0:
                # end of segment: the first marker at/after seg_start is
                # the restart (stuffed 0xFFs inside the segment are
                # followed by <= 0x8F and skipped by _arith_ecs_end)
                seg_end = _arith_ecs_end(ecs, seg_start)
                expect = 0xD0 + ((m // restart_interval - 1) % 8)
                if (
                    seg_end + 1 >= len(ecs)
                    or ecs[seg_end] != 0xFF
                    or ecs[seg_end + 1] != expect
                ):
                    return None  # missing / out-of-order RSTn
                seg_start = seg_end + 2
                dec = QMDecoder(ecs[seg_start:])
                dc_stats, ac_stats = {}, {}
                sign_ctx = fixed_ctx()
                pred = {cid: 0 for cid, _, _, _ in order}
                dc_ctx_base = {cid: 0 for cid, _, _, _ in order}
            my, mx = divmod(m, mcux)
            for cid, ch, cv, _tq in order:
                td, ta = scan_by_id[cid]
                if td not in dc_stats:
                    dc_stats[td] = _new_stats(DC_STAT_BINS)
                if ta not in ac_stats:
                    ac_stats[ta] = _new_stats(AC_STAT_BINS)
                L, U = dc_cond.get(td, (0, 1))
                kx = ac_cond.get(ta, 5)
                for by in range(cv):
                    for bx in range(ch):
                        coef = [0] * 64
                        diff, nxt = decode_dc_diff(
                            dec, dc_stats[td], dc_ctx_base[cid], L, U
                        )
                        dc_ctx_base[cid] = nxt
                        pred[cid] += diff
                        coef[0] = pred[cid]
                        decode_ac_block(dec, ac_stats[ta], kx, sign_ctx, coef)
                        if cid != y_cid:
                            continue
                        cz = np.zeros(64, dtype=np.int64)
                        cz[_JPEG_ZIGZAG] = np.array(
                            [coef[k] for k in range(64)], dtype=np.int64
                        )
                        block = cz.reshape(8, 8) * yq
                        spatial = A @ block.astype(np.float64) @ A.T
                        pix = np.clip(np.round(spatial) + level, 0, maxval)
                        r0 = (my * y_v + by) * 8
                        c0 = (mx * y_h + bx) * 8
                        plane[r0 : r0 + 8, c0 : c0 + 8] = (
                            pix.astype(np.int64) >> (precision - 8)
                        ).astype(np.uint8)
    except (ValueError, IndexError):
        return None
    return _jpeg_upsample_y(plane, true_h, true_v, hmax, vmax, iw, ih)


# ------------------------------------ arithmetic progressive (SOF10, r10)


def _arith_ecs_end(data: bytes, start: int) -> int:
    """End of an arithmetic-coded entropy segment: the first 0xFF followed
    by a byte > 0x8F. Within an arithmetic ECS every 0xFF is followed by a
    stuffed byte <= 0x8F (zero MSB + 7 payload bits), so anything above is
    a marker (fill bytes 0xFF 0xFF ... resolve to the marker as well)."""
    i, n = start, len(data)
    while i + 1 < n:
        if data[i] == 0xFF and data[i + 1] > 0x8F:
            return i
        i += 1
    return n


def _arith_scan_end(data: bytes, start: int) -> int:
    """End of a SCAN's entropy body: like _arith_ecs_end but RSTn markers
    (0xD0-0xD7) belong to the scan when restart intervals are in effect —
    skip them and keep scanning for the terminating marker."""
    i = start
    while True:
        j = _arith_ecs_end(data, i)
        if j + 1 < len(data) and 0xD0 <= data[j + 1] <= 0xD7:
            i = j + 2
            continue
        return j


def decode_jpeg_arith_progressive(data: bytes, allow_restart: bool = False):
    """Arithmetic-coded progressive JPEG (SOF10) decode to the uint8 Y
    plane — T.81 Annex G.2: spectral selection + successive approximation
    with the QM coder. Retires the r9-documented fake for this variant.

    Restart intervals (r11): implemented per scan — every Ri MCUs
    (interleaved DC scans) or Ri blocks (non-interleaved DC / AC scans)
    the entropy segment ends at a strictly-validated RSTn (cycling 0..7
    per scan) and the QM decoder, statistics areas, DC predictions and
    conditioning re-initialize; the persistent coefficient grid (and the
    refinement passes' kex derivation from it) is untouched. Gated OFF by
    default like the sequential path (`allow_restart=False` → DRI streams
    return None) until `arith_progressive_decode_audit` rotates back into
    the driver window (r13); see decode_jpeg_arith's docstring for the
    evidence-union rationale.

    Scan semantics (the G.2 procedures; each scan is an independent
    entropy segment with fresh statistics and a fresh QM decoder):
    - DC first (Ss=0, Ah=0): the sequential F.1.4.4.1 DIFF model applied
      to DC >> Al; the grid stores pred << Al.
    - DC refinement (Ah>0): ONE decision per block from the fixed
      (non-adaptive) context, OR-ed in at bit Al.
    - AC first (Ss>0, Ah=0, single-component per G.1.1): the sequential
      F.1.4.4.2 model over the Ss..Se band, values stored << Al.
    - AC refinement: per-k EOB decision at the k-th EOB bin — decoded
      only beyond the PREVIOUS stage's last nonzero coefficient (kex) —
      newly-significant decisions at the significance bin, signs from the
      fixed context, and correction bits for nonzero-history coefficients
      at the first-magnitude bin (bins shared with the first-scan layout).

    Like the Huffman progressive path, only Y's coefficients persist;
    chroma-only scans are skipped wholesale (independent segments) while
    interleaved DC scans entropy-decode chroma to keep the QM interval
    honest."""
    import numpy as np

    from seo_audit_etl_actor_spark.multimodal.binary_ops import (
        _JPEG_ZIGZAG,
        _jpeg_upsample_y,
    )

    if data[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, "np.ndarray"] = {}
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    sof = None
    precision = 8
    restart_interval = 0
    ycoef = None
    y_meta = None
    i, n = 2, len(data)
    try:
        while i + 2 <= n:
            if data[i] != 0xFF:
                return None
            marker = data[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                break
            if i + 4 > n:
                return None
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if i + 2 + seg_len > n:
                return None
            body = data[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 15
                    j += 1
                    if pq == 0:
                        vals = np.frombuffer(body[j : j + 64], dtype=np.uint8)
                        j += 64
                    else:
                        vals = np.frombuffer(body[j : j + 128], dtype=">u2")
                        j += 128
                    if len(vals) < 64:
                        return None
                    tbl = np.zeros(64, dtype=np.int64)
                    tbl[_JPEG_ZIGZAG] = vals.astype(np.int64)
                    qtables[tq] = tbl.reshape(8, 8)
            elif marker == 0xCC:  # DAC (may arrive between scans)
                j = 0
                while j + 2 <= len(body):
                    tc, tb = body[j] >> 4, body[j] & 15
                    cs = body[j + 1]
                    j += 2
                    if tc == 0:
                        dc_cond[tb] = (cs & 15, cs >> 4)
                    else:
                        ac_cond[tb] = cs
            elif marker == 0xCA:  # SOF10 arithmetic progressive
                precision, ih, iw, ncomp = struct.unpack(">BHHB", body[:6])
                if precision not in (8, 12) or ncomp == 0 or ncomp > 4 or iw == 0 or ih == 0:
                    return None
                comps = []
                for c in range(ncomp):
                    cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                    comps.append((cid, hv >> 4, hv & 15, tq))
                sof = (iw, ih, comps)
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if hmax == 0 or vmax == 0:
                    return None
                mcux = (iw + 8 * hmax - 1) // (8 * hmax)
                mcuy = (ih + 8 * vmax - 1) // (8 * vmax)
                y_cid, y_h, y_v, y_tq = comps[0]
                comp_w = (iw * y_h + hmax - 1) // hmax
                comp_h = (ih * y_v + vmax - 1) // vmax
                nby, nbx = (comp_h + 7) // 8, (comp_w + 7) // 8
                ycoef = np.zeros((mcuy * y_v, mcux * y_h, 64), dtype=np.int32)
                y_meta = (y_cid, y_h, y_v, y_tq, hmax, vmax, mcux, mcuy, nby, nbx)
            elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # not arithmetic-progressive — wrong path
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:  # SOS — one progressive scan
                if sof is None or ycoef is None or (
                    restart_interval and not allow_restart
                ):
                    return None  # DRI gated off (see docstring)
                ns = body[0]
                scan = []
                for c in range(ns):
                    cs, tda = body[1 + c * 2 : 3 + c * 2]
                    scan.append((cs, tda >> 4, tda & 15))
                Ss, Se, ahal = body[1 + ns * 2 : 4 + ns * 2]
                Ah, Al = ahal >> 4, ahal & 15
                ecs_start = i + 2 + seg_len
                ecs_end = (
                    _arith_scan_end(data, ecs_start)
                    if restart_interval
                    else _arith_ecs_end(data, ecs_start)
                )
                ok = _arith_progressive_scan(
                    data[ecs_start:ecs_end], sof, scan, (Ss, Se, Ah, Al),
                    dc_cond, ac_cond, ycoef, y_meta, restart_interval,
                )
                if not ok:
                    return None
                i = ecs_end
                continue
            i += 2 + seg_len
    except (ValueError, IndexError, struct.error):
        return None
    if sof is None or ycoef is None:
        return None

    iw, ih, comps = sof
    y_cid, y_h, y_v, y_tq, hmax, vmax, mcux, mcuy, nby, nbx = y_meta
    if y_tq not in qtables:
        return None
    yq = qtables[y_tq].reshape(-1)

    u = np.arange(8)
    x = np.arange(8)
    A = 0.5 * np.cos((2 * x[:, None] + 1) * u[None, :] * np.pi / 16)
    A[:, 0] *= 1 / np.sqrt(2)
    gy, gx = ycoef.shape[:2]
    plane = np.zeros((gy * 8, gx * 8), dtype=np.uint8)
    level = 1 << (precision - 1)
    maxval = (1 << precision) - 1
    for by in range(gy):
        for bx in range(gx):
            block = (ycoef[by, bx].astype(np.int64) * yq).reshape(8, 8)
            spatial = A @ block.astype(np.float64) @ A.T
            pix = np.clip(np.round(spatial) + level, 0, maxval)
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                pix.astype(np.int64) >> (precision - 8)
            ).astype(np.uint8)
    return _jpeg_upsample_y(plane, y_h, y_v, hmax, vmax, iw, ih)


def _arith_progressive_scan(ecs, sof, scan, band, dc_cond, ac_cond, ycoef, y_meta,
                            restart_interval=0):
    """Decode ONE SOF10 scan into the persistent Y coefficient grid
    (decode mirrors of the G.2 coding models; bin layout shared with the
    sequential F.1.4.4 statistics areas). Returns False on structural
    corruption; chroma-only scans return True without touching the
    segment. With `restart_interval` > 0 the segment is cut every Ri
    MCUs/blocks at a strictly-validated RSTn with full state re-init."""
    from seo_audit_etl_actor_spark.multimodal.binary_ops import _JPEG_ZIGZAG

    iw, ih, comps = sof
    Ss, Se, Ah, Al = band
    y_cid, y_h, y_v, y_tq, hmax, vmax, mcux, mcuy, nby, nbx = y_meta
    scan_by_id = {cs: (td, ta) for cs, td, ta in scan}
    if y_cid not in scan_by_id:
        return True  # chroma-only scan: independent segment, skip wholesale
    if Ss > Se or Se > 63 or (Ss == 0) != (Se == 0):
        return False
    if Ss > 0 and len(scan) != 1:
        return False  # AC scans are single-component per T.81 G.1.1

    dec = QMDecoder(ecs)
    seg_start = [0]

    def restart_at(unit_idx: int) -> QMDecoder:
        """Validate the RSTn ending the current segment, open the next;
        the caller re-initializes its statistics/prediction state."""
        seg_end = _arith_ecs_end(ecs, seg_start[0])
        expect = 0xD0 + ((unit_idx // restart_interval - 1) % 8)
        if (
            seg_end + 1 >= len(ecs)
            or ecs[seg_end] != 0xFF
            or ecs[seg_end + 1] != expect
        ):
            raise ValueError("missing or out-of-order RSTn")
        seg_start[0] = seg_end + 2
        return QMDecoder(ecs[seg_start[0]:])

    try:
        if Ss == 0:
            order = [(cid, h, v) for cid, h, v, _tq in comps if cid in scan_by_id]
            if len(order) != len(scan):
                return False
            if len(order) == 1:
                if order[0][0] != y_cid:
                    return True  # single non-Y DC scan: skippable
                grid = [(y_cid, 1, 1)]
                tx, ty = nbx, nby
            else:
                grid = order
                tx, ty = mcux, mcuy
            interleaved = len(grid) > 1
            if Ah == 0:
                dc_stats: dict[int, list] = {}
                pred = {cid: 0 for cid, _h, _v in grid}
                ctx_base = {cid: 0 for cid, _h, _v in grid}
                for idx in range(tx * ty):
                    if restart_interval and idx and idx % restart_interval == 0:
                        dec = restart_at(idx)
                        dc_stats = {}
                        pred = {cid: 0 for cid, _h, _v in grid}
                        ctx_base = {cid: 0 for cid, _h, _v in grid}
                    my, mx = divmod(idx, tx)
                    for cid, ch, cv in grid:
                        td, _ta = scan_by_id[cid]
                        if td not in dc_stats:
                            dc_stats[td] = _new_stats(DC_STAT_BINS)
                        L, U = dc_cond.get(td, (0, 1))
                        for by in range(cv):
                            for bx in range(ch):
                                diff, nxt = decode_dc_diff(
                                    dec, dc_stats[td], ctx_base[cid], L, U
                                )
                                ctx_base[cid] = nxt
                                pred[cid] += diff
                                if cid == y_cid:
                                    r0 = my * cv + by if interleaved else my
                                    c0 = mx * ch + bx if interleaved else mx
                                    ycoef[r0, c0, 0] = pred[cid] << Al
            else:
                # DC refinement: one decision per block from the FIXED
                # context (G.2.3); OR at bit Al extends negatives via
                # two's complement exactly like the Huffman path
                corr = fixed_ctx()
                for idx in range(tx * ty):
                    if restart_interval and idx and idx % restart_interval == 0:
                        dec = restart_at(idx)
                        corr = fixed_ctx()
                    my, mx = divmod(idx, tx)
                    for cid, ch, cv in grid:
                        for by in range(cv):
                            for bx in range(ch):
                                bit = dec.decode(corr)
                                if cid == y_cid and bit:
                                    r0 = my * cv + by if interleaved else my
                                    c0 = mx * ch + bx if interleaved else mx
                                    ycoef[r0, c0, 0] |= bit << Al
            return True

        # AC scan over the Y component's true block grid
        _td, ta = scan_by_id[y_cid]
        kx = ac_cond.get(ta, 5)
        stats = _new_stats(AC_STAT_BINS)
        sign_ctx = fixed_ctx()
        p1 = 1 << Al
        for idx in range(nbx * nby):
            if restart_interval and idx and idx % restart_interval == 0:
                dec = restart_at(idx)
                stats = _new_stats(AC_STAT_BINS)
                sign_ctx = fixed_ctx()
            gby, gbx = divmod(idx, nbx)
            coef = ycoef[gby, gbx]
            if Ah == 0:
                # AC first pass: the sequential model over the band
                k = Ss
                while k <= Se:
                    base = 3 * (k - 1)
                    if dec.decode(stats[base]):  # EOB
                        break
                    while dec.decode(stats[base + 1]) == 0:
                        k += 1
                        if k > Se:
                            return False
                        base = 3 * (k - 1)
                    sign = dec.decode(sign_ctx)
                    st = base + 2
                    m = dec.decode(stats[st])
                    if m != 0:
                        if dec.decode(stats[st]):
                            m = 2
                            st = AC_LOW_BASE if k <= kx else AC_HIGH_BASE
                            while dec.decode(stats[st]):
                                m <<= 1
                                if m == 0x8000:
                                    return False
                                st += 1
                    v = m
                    st += 14
                    mm = m
                    while mm > 1:
                        mm >>= 1
                        if dec.decode(stats[st]):
                            v |= mm
                    v += 1
                    coef[_JPEG_ZIGZAG[k]] = (-v if sign else v) << Al
                    k += 1
            else:
                # AC refinement pass: kex = the PREVIOUS stage's last
                # nonzero index (the accumulated grid holds exactly the
                # previous stages' value)
                kex = 0
                for j in range(Se, 0, -1):
                    if coef[_JPEG_ZIGZAG[j]] != 0:
                        kex = j
                        break
                k = Ss
                while k <= Se:
                    base = 3 * (k - 1)
                    if k > kex and dec.decode(stats[base]):
                        break  # EOB: nothing further in this band
                    while True:
                        pos = _JPEG_ZIGZAG[k]
                        if coef[pos] != 0:
                            if dec.decode(stats[base + 2]):
                                coef[pos] += p1 if coef[pos] > 0 else -p1
                            break
                        if dec.decode(stats[base + 1]):
                            coef[pos] = -p1 if dec.decode(sign_ctx) else p1
                            break
                        k += 1
                        if k > Se:
                            return False
                        base = 3 * (k - 1)
                    k += 1
        return True
    except (ValueError, IndexError):
        return False


# ------------------------------------ arithmetic lossless (SOF11, r10)

# H.1.2.2 statistics layout (shared convention with the fixtures
# encoder, same epistemic status as the F.1.4.4 bin numbering): the
# zero/sign/first-magnitude decisions are conditioned on the 5-way
# classes of the differences coded for the left (Da) and above (Db)
# neighbors — 25 contexts x 4 bins (S0, SS, SP, SN) at
# 4*(5*cls(Db)+cls(Da)); the magnitude-category ladder X1.. lives at
# 100 when Db's class is zero/small and 129 when it is large, with the
# magnitude bits at category bin + 14 as everywhere else. 158 bins.
LL_STAT_BINS = 158
LL_MAG_SMALL = 100
LL_MAG_LARGE = 129


def classify_diff(diff: int, L: int, U: int) -> int:
    """5-way conditioning class of a coded lossless difference
    (H.1.2.2.1 — the same category boundaries as the sequential DC
    model's next-block conditioning in F.1.4.4.1.2): 0 zero, 1 small
    positive, 2 small negative, 3 large positive, 4 large negative.
    `m` is the magnitude MSB the DIFF coder walks (over v = |diff| - 1),
    so the class boundaries are bit-identical to `decode_dc_diff`'s."""
    if diff == 0:
        return 0
    sign = 1 if diff < 0 else 0
    v = abs(diff) - 1
    m = 0 if v == 0 else 1 << (v.bit_length() - 1)
    if m < ((1 << L) >> 1):
        return 0
    if m > ((1 << U) >> 1):
        return 3 + sign
    return 1 + sign


def decode_lossless_diff(dec: QMDecoder, stats: list[list[int]], base: int,
                         mag_base: int) -> int:
    """Decode one lossless difference: the F.1.4.4.1 DC DIFF decision
    tree with the 2-D (Da, Db) conditioning supplied via `base` and the
    Db-selected magnitude ladder at `mag_base` (H.1.2.2). Magnitudes up
    to 32768 (diff = -32768 from the mod-2^16 wrap) fit the 15-deep
    ladder exactly; anything deeper is stream corruption."""
    if dec.decode(stats[base]) == 0:
        return 0
    sign = dec.decode(stats[base + 1])
    st = base + 2 + sign
    m = dec.decode(stats[st])
    if m != 0:
        st = mag_base
        while dec.decode(stats[st]):
            m <<= 1
            if m == 0x8000:
                raise ValueError("lossless magnitude overflow")
            st += 1
    v = m
    st += 14
    mm = m
    while mm > 1:
        mm >>= 1
        if dec.decode(stats[st]):
            v |= mm
    v += 1
    return -v if sign else v


def decode_jpeg_arith_lossless(data: bytes):
    """Arithmetic-coded LOSSLESS JPEG (SOF11) decode to the uint8 Y
    plane (top 8 bits at precision > 8) — T.81 Annex H.1.2.2: the data
    unit is one SAMPLE; each difference (to the Annex H predictor
    selected by Ss, point transform Al=Pt) is coded by the DC DIFF
    decision tree under 2-D (Da, Db) conditioning over the QM coder.
    Returns None on structural corruption or out-of-scope features
    (restart intervals — the one remaining documented fake in the
    arithmetic family; Ss outside 1-7; precision outside 8-16). Mirrors
    `_decode_jpeg_lossless`'s MCU walk, predictor boundary rules and
    output contract exactly.

    Plausibility gate (r12, ADVICE r11): the H.1.2.2 statistics-bin
    LAYOUT here is a self-defined convention validated against this
    repo's own encoder — a real-world stream using a different layout
    would QM-decode "successfully" into random differences. The gate
    catches that: for a CONFORMING stream at precision-pt <= 15 every
    reconstructed sample px+diff lies exactly in [0, 2^(P-pt)) (T.81
    H.1.1.1 computes differences modulo 2^16, whose minimal signed
    representative IS the true difference whenever |sample-pred| <
    2^15), so ANY pre-wrap out-of-range sample proves the decode model
    mismatched and the stream routes to None (-> the documented fake,
    real_decode=false) instead of returning garbage flagged real. With
    random diffs a sample stays in range with probability ~2^(P-pt)/2^16
    (~0.4% at P=8), so mismatched streams trip within a handful of
    samples. At precision-pt == 16 the wrap is semantically load-bearing
    (every value is valid modulo 2^16) and the gate necessarily stands
    down — 16-bit lossless keeps only the encoder-twin validation."""
    import numpy as np

    from seo_audit_etl_actor_spark.multimodal.binary_ops import _jpeg_upsample_y

    if data[:2] != b"\xff\xd8":
        return None
    dc_cond: dict[int, tuple[int, int]] = {}
    sof = None
    precision = 0
    restart_interval = 0
    scan = None
    band = None
    ecs_start = 0
    i, n = 2, len(data)
    try:
        while i + 4 <= n:
            if data[i] != 0xFF:
                return None
            marker = data[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                return None
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            body = data[i + 4 : i + 2 + seg_len]
            if marker == 0xCC:  # DAC (Tc=0 conditioning only is relevant)
                j = 0
                while j + 2 <= len(body):
                    tc, tb = body[j] >> 4, body[j] & 15
                    cs = body[j + 1]
                    j += 2
                    if tc == 0:
                        dc_cond[tb] = (cs & 15, cs >> 4)  # (L, U)
            elif marker == 0xCB:  # SOF11 arithmetic lossless
                precision, ih, iw, ncomp = struct.unpack(">BHHB", body[:6])
                if not 8 <= precision <= 16 or ncomp == 0 or ncomp > 4 or iw == 0 or ih == 0:
                    return None
                comps = []
                for c in range(ncomp):
                    cid, hv, _tq = body[6 + c * 3 : 9 + c * 3]
                    comps.append((cid, hv >> 4, hv & 15))
                sof = (iw, ih, comps)
            elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCD, 0xCE, 0xCF):
                return None  # not arithmetic-lossless — wrong path
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:  # SOS
                if sof is None:
                    return None
                ns = body[0]
                scan = []
                for c in range(ns):
                    cs, tda = body[1 + c * 2 : 3 + c * 2]
                    scan.append((cs, tda >> 4))
                band = (body[1 + ns * 2], body[2 + ns * 2], body[3 + ns * 2])
                ecs_start = i + 2 + seg_len
                break
            i += 2 + seg_len
        if scan is None or restart_interval:
            return None  # restart intervals: the documented fake
        psv, _se, ahal = band
        pt = ahal & 15
        if not 1 <= psv <= 7 or pt >= precision:
            return None

        iw, ih, comps = sof
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if hmax == 0 or vmax == 0:
            return None
        scan_by_id = {cs: td for cs, td in scan}
        order = [(cid, h, v) for cid, h, v in comps if cid in scan_by_id]
        if len(order) != len(scan):
            return None
        y_cid, y_h, y_v = order[0]
        true_h, true_v = y_h, y_v
        if len(order) == 1:
            # non-interleaved (H.2): MCU = one sample on the component grid
            mcux = (iw * true_h + hmax - 1) // hmax
            mcuy = (ih * true_v + vmax - 1) // vmax
            order = [(y_cid, 1, 1)]
        else:
            mcux = (iw + hmax - 1) // hmax
            mcuy = (ih + vmax - 1) // vmax

        grids = {
            cid: np.zeros((mcuy * v, mcux * h), dtype=np.int64)
            for cid, h, v in order
        }
        # per-component grid of coded differences: the (Da, Db)
        # conditioning reads the DIFFERENCES of the neighbors, not
        # their reconstructed values (zero outside the image, H.1.2.2.2)
        dgrids = {
            cid: np.zeros((mcuy * v, mcux * h), dtype=np.int64)
            for cid, h, v in order
        }
        default = 1 << (precision - pt - 1)
        dec = QMDecoder(data[ecs_start:])
        ll_stats: dict[int, list] = {}
        # plausibility gate bound (see docstring): exclusive sample
        # ceiling on the point-transformed domain; None disables the
        # gate at the 16-bit depth where mod-2^16 wrap is load-bearing
        sample_ceil = (1 << (precision - pt)) if precision - pt < 16 else None
        for my in range(mcuy):
            for mx in range(mcux):
                for cid, h, v in order:
                    td = scan_by_id[cid]
                    if td not in ll_stats:
                        ll_stats[td] = _new_stats(LL_STAT_BINS)
                    stats = ll_stats[td]
                    L, U = dc_cond.get(td, (0, 1))
                    g = grids[cid]
                    d = dgrids[cid]
                    for dy in range(v):
                        for dx in range(h):
                            row, col = my * v + dy, mx * h + dx
                            da = int(d[row, col - 1]) if col > 0 else 0
                            db = int(d[row - 1, col]) if row > 0 else 0
                            ca = classify_diff(da, L, U)
                            cb = classify_diff(db, L, U)
                            base = 4 * (5 * cb + ca)
                            mag_base = LL_MAG_SMALL if cb < 3 else LL_MAG_LARGE
                            diff = decode_lossless_diff(dec, stats, base, mag_base)
                            if row == 0 and col == 0:
                                px = default
                            elif row == 0:
                                px = int(g[0, col - 1])
                            elif col == 0:
                                px = int(g[row - 1, 0])
                            else:
                                a = int(g[row, col - 1])
                                b = int(g[row - 1, col])
                                c = int(g[row - 1, col - 1])
                                px = (
                                    a if psv == 1 else b if psv == 2 else c
                                    if psv == 3 else a + b - c if psv == 4
                                    else a + ((b - c) >> 1) if psv == 5
                                    else b + ((a - c) >> 1) if psv == 6
                                    else (a + b) >> 1
                                )
                            val = px + diff
                            if sample_ceil is not None and not 0 <= val < sample_ceil:
                                return None  # plausibility gate (docstring)
                            g[row, col] = val & 0xFFFF
                            d[row, col] = diff
        # plausibility gate, consumption leg: a conforming stream's
        # entropy data is consumed to within flush slack (this repo's
        # encoder leaves EXACTLY 4 bytes: 2 flush + the unread EOI;
        # T.81 fill bytes before a marker are legal, so 0xFF runs are
        # excused). A mismatched stats-bin layout decodes a different
        # DECISION COUNT, leaving either a large unconsumed tail
        # (caught here) or running into the D.2 1-pad, whose all-ones
        # bits blow up decoded magnitudes and trip the range leg above.
        ecs = data[ecs_start:]
        tail = len(ecs) - dec._src._pos
        if tail > 16 and sum(b != 0xFF for b in ecs[dec._src._pos : -2]) > 4:
            return None
    except (ValueError, IndexError, struct.error):
        return None

    full = np.clip(grids[y_cid] << pt, 0, (1 << precision) - 1)
    plane = (full >> (precision - 8)).astype(np.uint8)
    return _jpeg_upsample_y(plane, true_h, true_v, hmax, vmax, iw, ih)
