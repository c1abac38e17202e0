"""Minimal pure-Python baseline JPEG codec (stdlib + numpy only).

JPEG is the dominant web image format, so the multimodal decode stage needs
a real decoder branch, not a documented stub. This module implements the
baseline sequential DCT process of the public spec (ITU-T T.81 / ISO 10918):

* ``decode_jpeg_grey``: SOI → marker walk (DQT/DHT/SOF0/DRI/SOS) → Huffman
  entropy decode with byte-destuffing and restart markers → dequantize →
  inverse zigzag → 2D IDCT → level shift. Supports 8-bit baseline (SOF0),
  1-3 components, any sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0),
  restart intervals. Returns the LUMA plane as an (h, w) float grid in
  [0, 1] — the multimodal pipeline consumes greyscale grids; chroma blocks
  are still entropy-decoded (the bitstream is sequential) but not color-
  converted. Progressive (SOF2) and arithmetic coding raise ValueError.
* ``encode_jpeg_grey`` / ``encode_jpeg_rgb420``: the matching encoders so
  tests round-trip real scans without fixture binaries. Huffman tables are
  CONSTRUCTED (canonical codes: 12 DC categories at 4 bits, the 162
  baseline run/size symbols at 8 bits) rather than copied from Annex K —
  any decoder, including this one, reads them from the DHT segments.

Everything is exact integer/float64 arithmetic with no RNG, so baked
oracles can replay a decode bit-for-bit at generation time.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order (T.81 figure 5): diagonal walk, odd diagonals go
# down-left, even go up-right — generated, not transcribed
_ZIGZAG: list[tuple[int, int]] = []
for _d in range(15):
    _rows = range(max(0, _d - 7), min(_d, 7) + 1)
    for _r in (_rows if _d % 2 == 1 else reversed(_rows)):
        _ZIGZAG.append((_r, _d - _r))

# orthonormal 8-point DCT-II basis (T.81 A.3.3): F = M f M^T, f = M^T F M
_M = np.array(
    [
        [
            0.5
            * (1.0 / np.sqrt(2.0) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class UnsupportedJpegProcess(ValueError):
    """A VALID JPEG whose coding process this baseline decoder doesn't
    implement (progressive SOF2, arithmetic coding, 12-bit precision) —
    distinct from corruption so callers can fall back to the SOF header
    walk instead of flagging a good asset as parse_error."""


class _BitReader:
    """Entropy-segment bit reader: byte-destuffing (FF 00 → FF), restart
    markers surfaced via ``at_restart``/``skip_restart``, any other marker
    ends the scan."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.acc = 0

    def _next_byte(self) -> int | None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            b = d[self.pos]
            if b != 0xFF:
                self.pos += 1
                return b
            if self.pos + 1 >= n:
                return None
            m = d[self.pos + 1]
            if m == 0x00:  # stuffed data byte
                self.pos += 2
                return 0xFF
            return None  # a real marker: scan data ends here
        return None

    def read_bit(self) -> int:
        if self.bits == 0:
            b = self._next_byte()
            if b is None:
                raise ValueError("truncated JPEG entropy segment")
            self.acc = b
            self.bits = 8
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    def at_marker(self) -> int | None:
        """The marker byte at the current (byte-aligned) position, if any."""
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
            return d[self.pos + 1]
        return None

    def skip_restart(self) -> None:
        self.bits = 0  # discard pad bits: restarts are byte-aligned
        m = self.at_marker()
        if m is None or not (0xD0 <= m <= 0xD7):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _build_huffman(counts: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """DHT counts/values → canonical-code lookup {(length, code): symbol}
    (T.81 C.2 code assignment)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → the luma plane as an (h, w) uint8 array."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI marker)")
    pos = 2
    n = len(data)
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None  # (h, w, comps) where comps = [(cid, hs, vs, tq)]
    dri = 0
    scan = None

    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:
            pos -= 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue  # standalone
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                nv = sum(counts)
                values = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _build_huffman(counts, values)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # baseline / extended sequential
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise UnsupportedJpegProcess(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegProcess("only baseline sequential JPEG is supported")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            pos += seg_len
            break
        pos += seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG has no frame/scan")

    fh, fw, comps = frame
    if fh == 0 or fw == 0:
        raise ValueError("zero-sized JPEG frame")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for cid, hs, vs, _tq in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.skip_restart()
                pred = {cid: 0 for cid in pred}
            for cs, td, ta in scan:
                cid, hs, vs, tq = by_id[cs]
                dctab, actab = huff.get((0, td)), huff.get((1, ta))
                if dctab is None or actab is None or tq not in qt:
                    raise ValueError("JPEG scan references a missing table")
                q = qt[tq]
                for byi in range(vs):
                    for bxi in range(hs):
                        coef = np.zeros(64, dtype=np.float64)
                        t = reader.decode(dctab)
                        pred[cid] += _extend(reader.receive(t), t)
                        coef[0] = pred[cid] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode(actab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            coef[k] = _extend(reader.receive(s), s) * q[k]
                            k += 1
                        block = np.zeros((8, 8), dtype=np.float64)
                        for idx, (r_, c_) in enumerate(_ZIGZAG):
                            block[r_, c_] = coef[idx]
                        px = _M.T @ block @ _M + 128.0
                        y0 = (my * vs + byi) * 8
                        x0 = (mx * hs + bxi) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    luma_id, l_hs, l_vs, _ = comps[0]
    plane = planes[luma_id]
    # scale the luma grid up to full frame resolution when it is subsampled
    # relative to hmax/vmax (it never is in practice — comps[0] is Y)
    if l_hs != hmax or l_vs != vmax:
        plane = np.repeat(np.repeat(plane, vmax // l_vs, axis=0), hmax // l_hs, axis=1)
    return np.clip(plane[:fh, :fw] + 0.5, 0, 255).astype(np.uint8)


def decode_jpeg_grey(data: bytes) -> np.ndarray:
    """JPEG bytes → (h, w) float luma grid in [0, 1] — the decode contract
    shared with png_codec.decode_png_grey / gif_codec.decode_gif_grey."""
    return decode_jpeg(data).astype(np.float64) / 255.0


def jpeg_decoded_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from a FULL entropy decode — a truncated or corrupt
    scan raises, unlike the SOF header walk."""
    arr = decode_jpeg(data)
    return int(arr.shape[1]), int(arr.shape[0])


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

# constructed canonical Huffman tables (NOT Annex K): all 12 DC categories
# at 4 bits; EOB, ZRL and the 160 run/size symbols at 8 bits. Kraft-valid
# (12/16 and 162/256) and carried explicitly in DHT, so any spec decoder
# reads them.
_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALUES = list(range(12))
_AC_VALUES = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALUES), 0, 0, 0, 0, 0, 0, 0, 0]


def _encode_codes(counts: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    table = _build_huffman(counts, values)
    return {sym: (length, code) for (length, code), sym in table.items()}

_DC_ENC = _encode_codes(_DC_COUNTS, _DC_VALUES)
_AC_ENC = _encode_codes(_AC_COUNTS, _AC_VALUES)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.bits += 1
            if self.bits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.bits = 0

    def pad(self) -> None:
        while self.bits:
            self.write(1, 1)  # 1-bits pad to the byte boundary (T.81 B.1.1.5)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _write_magnitude(bw: _BitWriter, v: int) -> None:
    t = _category(v)
    if t:
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int) -> int:
    coef = _M @ (block.astype(np.float64) - 128.0) @ _M.T
    zz = np.array([coef[r, c] for r, c in _ZIGZAG])
    quant = np.round(zz / q).astype(np.int64)
    dc = int(quant[0])
    diff = dc - pred
    t = _category(diff)
    bw.write(*reversed(_DC_ENC[t]))
    _write_magnitude(bw, diff)
    run = 0
    for k in range(1, 64):
        v = int(quant[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*reversed(_AC_ENC[0xF0]))
            run -= 16
        s = _category(v)
        bw.write(*reversed(_AC_ENC[(run << 4) | s]))
        _write_magnitude(bw, v)
        run = 0
    if run:
        bw.write(*reversed(_AC_ENC[0x00]))  # EOB
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_seg(tc: int, th: int, counts: list[int], values: list[int]) -> bytes:
    return _seg(0xC4, bytes([tc << 4 | th]) + bytes(counts) + bytes(values))


def _pad_blocks(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw_ - w)), mode="edge")


def encode_jpeg_grey(
    grid: np.ndarray, quant: int = 1, restart_interval: int = 0
) -> bytes:
    """(h, w) float grid in [0, 1] → single-component baseline JPEG. A flat
    quantization table of ``quant`` bounds round-trip error at ~quant/2 per
    coefficient; ``restart_interval`` > 0 writes DRI + RSTn markers."""
    px = np.clip(np.asarray(grid, dtype=np.float64) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    h, w = px.shape
    q = np.full(64, int(quant), dtype=np.int32)
    padded = _pad_blocks(px, -(-h // 8) * 8, -(-w // 8) * 8)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _dht_seg(0, 0, _DC_COUNTS, _DC_VALUES)
    out += _dht_seg(1, 0, _AC_COUNTS, _AC_VALUES)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(padded.shape[0] // 8):
        for bx in range(padded.shape[1] // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.pad()
                out += bw.out
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                bw = _BitWriter()
                pred = 0
            pred = _encode_block(
                bw, padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q, pred
            )
            mcu += 1
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_rgb420(rgb: np.ndarray, quant: int = 1) -> bytes:
    """(h, w, 3) uint8 RGB → 3-component baseline JPEG with 4:2:0 chroma
    subsampling (the dominant web layout) — exists so the decoder's
    interleaved-MCU and subsampled paths are testable without fixtures."""
    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    mcux, mcuy = -(-w // 16), -(-h // 16)
    y_p = _pad_blocks(np.clip(y + 0.5, 0, 255).astype(np.uint8), mcuy * 16, mcux * 16)

    def sub(plane: np.ndarray) -> np.ndarray:
        p = _pad_blocks(plane, mcuy * 16, mcux * 16)
        return np.clip(
            p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3)) + 0.5,
            0,
            255,
        ).astype(np.uint8)

    cb_p, cr_p = sub(cb), sub(cr)
    q = np.full(64, int(quant), dtype=np.int32)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += _dht_seg(0, 0, _DC_COUNTS, _DC_VALUES)
    out += _dht_seg(1, 0, _AC_COUNTS, _AC_VALUES)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for my in range(mcuy):
        for mx in range(mcux):
            for byi in range(2):
                for bxi in range(2):
                    y0, x0 = (my * 2 + byi) * 8, (mx * 2 + bxi) * 8
                    preds[1] = _encode_block(
                        bw, y_p[y0 : y0 + 8, x0 : x0 + 8], q, preds[1]
                    )
            for cid, plane in ((2, cb_p), (3, cr_p)):
                y0, x0 = my * 8, mx * 8
                preds[cid] = _encode_block(
                    bw, plane[y0 : y0 + 8, x0 : x0 + 8], q, preds[cid]
                )
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
