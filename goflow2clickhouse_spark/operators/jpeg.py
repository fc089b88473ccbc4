"""Baseline JPEG (ITU-T T.81) — grayscale and 4:4:4 YCbCr color,
hand-written from the public spec: canonical Huffman coding (Annex C
code construction, the general BITS/HUFFVAL form, so the decoder reads
ANY baseline table, not just ours), zigzag + run-length entropy layer,
byte stuffing, restart markers, interleaved MCUs, and the 8x8 DCT
pair via numpy matrices.

Determinism contract (the multimodal-oracle rule): every rounding
site is floor(x + 0.5) — half-up, exactly replayable in SQL — never
a platform/bankers round. For constant 8x8 blocks the whole pipeline
collapses to exact integer arithmetic (only the DC coefficient is
nonzero), which is what lets a DuckDB oracle replay encode→decode of
block-constant images bit-for-bit while the SAME code paths (Huffman,
zigzag, bit-stuffing, IDCT) also run general images (pinned in tests
against an independent IDCT reference and a PSNR bound).

Scope, stated honestly: baseline sequential DCT, 8-bit, grayscale,
4:4:4 YCbCr color (BT.601 transforms under the same half-up rounding
rule, interleaved one-block-per-component MCUs with per-component DC
predictors), and — since r11 — 4:2:0 chroma-subsampled color (the
single most common wild-JPEG shape: Y at 2x2, chroma 2x2-mean
downsampled half-up, 16x16 MCUs of four Y blocks + Cb + Cr per T.81
A.2.3, box-replication upsample on decode) and — since r12 — 4:2:2
(the second most common shape: Y at 2x1, chroma halved horizontally
under the same half-up mean, 16x8 MCUs of two Y blocks + Cb + Cr).
Other sampling mixes (4:1:1, chroma-major), progressive, and
arithmetic coding raise NotImplementedError — the last two add a
second entropy coder, not new transform machinery.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table (row-major), the de-facto
# standard table every JPEG text reproduces.
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

# Our DHT choice: FIXED-length canonical tables (12 DC symbols at 4
# bits, 162 AC symbols at 8 bits). Deliberately suboptimal but valid
# T.81 tables (Kraft-satisfying, no all-ones code) that keep the
# encoder trivially correct; the decoder does NOT assume them — it
# rebuilds whatever BITS/HUFFVAL the stream carries.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix() -> np.ndarray:
    """M[u, x] = 0.5 * C(u) * cos((2x+1)uπ/16) — F = M f Mᵀ is the
    T.81 FDCT; the inverse is Mᵀ F M (M is orthogonal)."""
    m = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT_M = _dct_matrix()

# zigzag index vector + per-image constant tables, hoisted (r15:
# profiling showed the per-image Huffman-table rebuilds and 64-scalar
# zigzag loops cost as much as the transform on the toy geometries)
_ZIGZAG_NP = np.array(_ZIGZAG, dtype=np.int64)
_DEC_TABLE_CACHE: dict[tuple[bytes, bytes], dict] = {}
# the encoder's DQT segment body is a constant of the module's table
_DQT_BODY = bytes([0x00]) + bytes(
    int(QUANT_LUMA.flat[i]) for i in _ZIGZAG
)


def _round_half_up(a: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) — the module's single rounding rule (np.rint is
    half-even and SQL ROUND is engine-flavored; floor(+0.5) is both
    deterministic and SQL-replayable)."""
    return np.floor(a + 0.5).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C: symbol -> (code, length), codes assigned in HUFFVAL
    order, incrementing, left-shifted at each length step."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# the encoder always writes the module's fixed DHTs — build the
# canonical code maps once (r15; they were rebuilt per image)
_ENC_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_ENC_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        # MSB-first through an integer accumulator drained a byte at
        # a time (r15) — identical stream to the former per-bit loop
        # (codes are <= 16 bits, so the accumulator stays small)
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            # pad with 1s (T.81 F.1.2.3)
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a coefficient: negatives stored as
    value + 2^size - 1 (one's-complement convention, F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601 forward transform, rounded half-up and
    clipped — the module's single rounding rule, so constant-RGB
    blocks produce constant (exactly replayable) YCbCr planes."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """The JFIF inverse transform, same rounding rule."""
    y, cb, cr = (
        ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0,
    )
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255)


def _encode_block(bw: _BitWriter, block: np.ndarray, prev_dc: int,
                  dc_codes, ac_codes) -> int:
    """FDCT + quantize + zigzag + Huffman one 8x8 level-shifted block;
    returns the new DC predictor."""
    coef = _DCT_M @ block @ _DCT_M.T
    # the DC basis is constant, so F(0,0) = Σblock / 8 EXACTLY
    # (integer sum, power-of-two division) — the float matrix
    # product lands ~1e-13 off, which flips half-up ties at
    # the quantizer (measured: a constant-255 block encoded
    # 63, not 64) and breaks the module's exact-DC contract
    coef[0, 0] = float(int(block.sum())) / 8.0
    q = _round_half_up(coef / QUANT_LUMA)
    zz = q.reshape(64)[_ZIGZAG_NP].tolist()  # same ints, one gather
    # DC: difference coding
    diff = zz[0] - prev_dc
    size, bitsv = _magnitude(diff)
    c, ln = dc_codes[size]
    bw.write(c, ln)
    if size:
        bw.write(bitsv, size)
    # AC: run-length of zeros + magnitude
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size, bitsv = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(bitsv, size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return zz[0]


def _subsample_420(plane: np.ndarray) -> np.ndarray:
    """2x2 mean downsample under the module's half-up rule: the plane
    is edge-padded to even dims, each output sample is
    floor(mean_of_4 + 0.5). A constant region stays exactly constant
    (mean of equal ints is that int), which is what keeps the 4:2:0
    path inside the exact-DC oracle contract."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    s = p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
    return np.floor(s / 4.0 + 0.5)


def _subsample_422(plane: np.ndarray) -> np.ndarray:
    """Horizontal-pair mean downsample (4:2:2's chroma halving, r12)
    under the same half-up rule and constant-stays-constant property
    as _subsample_420 — vertical resolution is untouched, which is
    4:2:2's point (interlaced/video-derived stills keep per-line
    chroma)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, 0), (0, w % 2)), mode="edge")
    return np.floor((p[:, 0::2] + p[:, 1::2]) / 2.0 + 0.5)


def encode_jpeg(
    width: int, height: int, pixels: bytes,
    restart_interval: int = 0, mode: str = "L",
    subsampling: str = "444",
) -> bytes:
    """Encode row-major top-down 8-bit samples as a baseline JFIF
    stream: DQT (K.1), SOF0, our fixed-length DHTs, optional DRI, SOS,
    entropy-coded scan (RSTn emitted every `restart_interval` MCUs
    when set — byte-aligned, DC predictors reset, markers cycling
    D0-D7 per T.81 E.1.4). `mode` 'L' = grayscale (one block per
    MCU); 'RGB' (r10) = YCbCr color — BT.601 forward transform
    (floor(x+0.5), so constant-color blocks stay exactly replayable),
    interleaved MCUs with per-component DC predictors, one shared
    quant/Huffman table set (legal per T.81; chroma-specific tables
    are a quality knob, not a format requirement).

    `subsampling` (r11): '444' = one block per component per MCU
    (sampling factors 1x1 everywhere, the r10 shape); '420' = the
    single most common wild-JPEG shape — Y at 2x2, Cb/Cr at 1x1, so
    an MCU covers 16x16 pixels as FOUR Y blocks (left-to-right,
    top-to-bottom per T.81 A.2.3) plus one Cb and one Cr block over
    the 2x2-mean-downsampled chroma planes (_subsample_420 — half-up,
    so constant tiles stay exact); '422' (r12) = the second most
    common shape — Y at 2x1, chroma halved horizontally only
    (_subsample_422), 16x8 MCUs of two Y blocks + Cb + Cr. Planes are
    edge-replicated to their MCU-coverage multiples; every rounding
    site is half-up (see module docstring)."""
    n_comp = {"L": 1, "RGB": 3}[mode]
    if len(pixels) != width * height * n_comp:
        raise ValueError(f"pixels must be width*height*{n_comp} bytes")
    if subsampling not in ("444", "420", "422"):
        raise NotImplementedError(
            f"subsampling {subsampling!r} (only '444', '422' and '420')"
        )
    if subsampling != "444" and n_comp == 1:
        subsampling = "444"  # grayscale has no chroma to subsample
    if n_comp == 1:
        img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
        planes = [img.astype(np.float64)]
    else:
        rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(
            height, width, 3
        ).astype(np.float64)
        ycc = _rgb_to_ycbcr(rgb)
        planes = [ycc[..., c] for c in range(3)]

    if subsampling == "420":
        factors = [(2, 2), (1, 1), (1, 1)]
        planes = [planes[0], _subsample_420(planes[1]),
                  _subsample_420(planes[2])]
    elif subsampling == "422":
        # Y at 2x1, chroma halved horizontally only: 16x8 MCUs of two
        # Y blocks + one Cb + one Cr (T.81 A.2.3 ordering, r12)
        factors = [(2, 1), (1, 1), (1, 1)]
        planes = [planes[0], _subsample_422(planes[1]),
                  _subsample_422(planes[2])]
    else:
        factors = [(1, 1)] * n_comp
    hmax = max(hf for hf, _ in factors)
    vmax = max(vf for _, vf in factors)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    # pad each plane to its full MCU coverage (edge replication)
    padded = []
    for (hf, vf), p in zip(factors, planes):
        tw, th = mcus_x * 8 * hf, mcus_y * 8 * vf
        padded.append(np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        ))
    planes = padded

    dc_codes, ac_codes = _ENC_DC_CODES, _ENC_AC_CODES
    bw = _BitWriter()
    prev_dc = [0] * n_comp
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()  # RSTn is byte-aligned
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                prev_dc = [0] * n_comp
            mcu += 1
            for ci, ((hf, vf), plane) in enumerate(zip(factors, planes)):
                for byi in range(vf):
                    for bxi in range(hf):
                        y0 = (my * vf + byi) * 8
                        x0 = (mx * hf + bxi) * 8
                        prev_dc[ci] = _encode_block(
                            bw, plane[y0:y0 + 8, x0:x0 + 8] - 128.0,
                            prev_dc[ci], dc_codes, ac_codes,
                        )
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(_DQT_BODY)) + _DQT_BODY
    sof = struct.pack(">BHHB", 8, height, width, n_comp) + b"".join(
        bytes([ci + 1, (hf << 4) | vf, 0])
        for ci, (hf, vf) in enumerate(factors)
    )
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for cls, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([n_comp]) + b"".join(
        bytes([ci + 1, 0x00]) for ci in range(n_comp)
    ) + bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bits(self, n: int) -> int:
        # byte-at-a-time refill (r15, replacing the per-bit loop):
        # bytes are consumed EXACTLY as lazily as before — only while
        # fewer than `n` bits are buffered — so truncation/marker
        # errors fire at the same stream positions, and the leftover
        # stays under 8 bits (align() still discards just the rest of
        # the current byte)
        acc, have = self._acc, self._n
        data = self.data
        while have < n:
            if self.pos >= len(data):
                raise ValueError("JPEG scan truncated mid-symbol")
            b = data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(data):
                    raise ValueError("JPEG scan ends on a marker byte")
                nxt = data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xff{nxt:02x} inside scan"
                    )
            acc = (acc << 8) | b
            have += 8
        have -= n
        self._acc = acc & ((1 << have) - 1)
        self._n = have
        return (acc >> have) & ((1 << n) - 1)

    def bit(self) -> int:
        return self.bits(1)

    def align(self) -> None:
        self._n = 0
        self._acc = 0


def _build_decode_table(bits: list[int], vals: list[int]):
    """(code, length) -> symbol map from the stream's BITS/HUFFVAL —
    the general Annex C construction, so any baseline table decodes."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG Huffman code longer than 16 bits")


def _extend(v: int, size: int) -> int:
    """F.2.2.1 EXTEND: undo the one's-complement magnitude coding."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline sequential grayscale JPEG: marker walk (DQT /
    SOF0 / DHT / DRI honored, APPn/COM skipped by length), canonical
    Huffman rebuild from the carried tables, entropy decode with byte
    unstuffing and restart-interval DC resets, dequant, inverse
    zigzag, IDCT, half-up rounding, clip, crop to the SOF geometry.
    Returns {width, height, mode='L', pixels}. Progressive (SOF2),
    multi-component, and 12-bit streams raise NotImplementedError."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — a conformant foreign stream uses them (r10
        # review: the walk read the fill byte AS the marker and
        # unpacked a garbage segment length)
        while payload[pos + 1] == 0xFF:
            pos += 1
            if pos + 4 > len(payload):
                raise ValueError("JPEG truncated inside fill bytes")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                if b + 65 > len(body):
                    raise ValueError("JPEG DQT segment truncated")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIGZAG_NP] = np.frombuffer(
                    body[b + 1:b + 65], dtype=np.uint8
                )
                quant[tq] = tbl.reshape(8, 8)
                b += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if nf not in (1, 3):
                raise NotImplementedError(
                    "only 1-component (gray) or 3-component (YCbCr) "
                    "baseline JPEG"
                )
            if len(body) < 6 + 3 * nf:
                raise ValueError("JPEG SOF segment truncated")
            comps = {}
            for ci in range(nf):
                cid, sampling, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps[cid] = (sampling >> 4, sampling & 0x0F, tq)
            # color roles are keyed off JFIF component ids (1=Y,
            # 2=Cb, 3=Cr), never off SOF/scan POSITION (r11 advice:
            # a legal baseline stream may list components in any
            # order, and positional mapping would silently swap
            # Cb/Cr); non-JFIF id sets refuse loudly — roles cannot
            # be inferred
            if nf == 3 and set(comps) != {1, 2, 3}:
                raise NotImplementedError(
                    f"3-component JPEG with component ids "
                    f"{sorted(comps)} — Y/Cb/Cr roles are keyed off "
                    "JFIF ids 1/2/3"
                )
            samplings = sorted(
                (hf, vf) for hf, vf, _ in comps.values()
            )
            # r11 added 4:2:0, r12 adds 4:2:2 — with 4:4:4 these
            # cover nearly every wild baseline JPEG; other factor
            # mixes (4:1:1, 2x2 chroma, ...) still refuse loudly.
            # The subsampled-luma component must be LUMA (id 1) — a
            # chroma-major factor mix is not 4:2:0/4:2:2
            if not (
                samplings == [(1, 1)] * nf
                or (nf == 3 and samplings == [(1, 1), (1, 1), (2, 2)]
                    and comps[1][:2] == (2, 2))
                or (nf == 3 and samplings == [(1, 1), (1, 1), (2, 1)]
                    and comps[1][:2] == (2, 1))
            ):
                raise NotImplementedError(
                    "unsupported sampling factors "
                    f"{samplings} (4:4:4, 4:2:2 and 4:2:0 supported)"
                )
            sof = (w, h, nf, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xff{marker:02x})"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                vals = list(body[b + 17:b + 17 + n])
                # a truncated segment yields short bits/vals lists —
                # indexing past them crashed with a raw IndexError
                # under corruption fuzzing (r10); refuse loudly
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("JPEG DHT segment truncated")
                key = (bytes(bits), bytes(vals))
                tbl = _DEC_TABLE_CACHE.get(key)
                if tbl is None:
                    if len(_DEC_TABLE_CACHE) > 256:
                        _DEC_TABLE_CACHE.clear()  # foreign-table bound
                    tbl = _build_decode_table(bits, vals)
                    _DEC_TABLE_CACHE[key] = tbl
                huff[(tc, th)] = tbl
                b += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            w, h, nf, sof_comps = sof
            ns = body[0]
            if ns != nf:
                raise NotImplementedError(
                    "non-interleaved multi-scan JPEG"
                )
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("JPEG SOS segment truncated")
            comps = []
            for ci in range(ns):
                cid = body[1 + 2 * ci]
                td, ta = body[2 + 2 * ci] >> 4, body[2 + 2 * ci] & 0x0F
                if cid not in sof_comps:
                    raise ValueError(f"SOS component {cid} not in SOF")
                hf, vf, tq = sof_comps[cid]
                if (
                    tq not in quant
                    or (0, td) not in huff
                    or (1, ta) not in huff
                ):
                    raise ValueError("JPEG scan references missing tables")
                comps.append(
                    (hf, vf, quant[tq], huff[(0, td)], huff[(1, ta)],
                     cid)
                )
            scan = payload[pos + 2 + seglen:]
            return _decode_scan(scan, w, h, comps, restart_interval)
        pos += 2 + seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_block(br: _BitReader, qt: np.ndarray, dc_table, ac_table,
                  prev_dc: int) -> tuple[np.ndarray, int]:
    """Huffman-decode + dequantize + IDCT one block; returns the 8x8
    spatial samples (pre-clip floats) and the new DC predictor."""
    zz = [0] * 64
    size = _read_symbol(br, dc_table)
    diff = _extend(br.bits(size), size) if size else 0
    prev_dc += diff
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = _read_symbol(br, ac_table)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    coef = np.zeros(64, dtype=np.int64)
    coef[_ZIGZAG_NP] = zz  # one scatter, same ints (r15)
    block = (coef.reshape(8, 8) * qt).astype(np.float64)
    # mirror the encoder's exact-DC contract: the DC contribution
    # is dequant/8 added uniformly (constant basis), kept out of
    # the float matrix product so block-constant images replay
    # bit-exactly in an oracle
    dc = block[0, 0]
    block[0, 0] = 0.0
    spatial = _DCT_M.T @ block @ _DCT_M + (dc / 8.0 + 128.0)
    return spatial, prev_dc


def _decode_scan(
    scan: bytes, width: int, height: int, comps: list, restart_interval: int
) -> dict:
    """Interleaved MCU decode: `comps` is the per-component
    (h factor, v factor, quant table, DC table, AC table, component
    id) list IN SCAN ORDER — each MCU carries hf x vf blocks per
    component, left-to-right then top-to-bottom (T.81 A.2.3). At
    4:4:4 every factor is 1x1 (one block per component per MCU;
    grayscale is the 1-component case); at 4:2:0 (r11) the MCU covers
    16x16 pixels as four Y blocks plus one block per chroma plane,
    and the decoded chroma planes upsample by sample replication
    (each chroma sample covers its hmax/hf x vmax/vf pixel footprint
    — the exactly-replayable box upsample) before the BT.601 inverse
    transform. Y/Cb/Cr roles come from the JFIF component ids (1/2/3,
    gated upstream), NOT from scan position (r11 advice: a legal
    stream may interleave components in any order)."""
    n_comp = len(comps)
    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    planes = [
        np.zeros((mcus_y * 8 * vf, mcus_x * 8 * hf), dtype=np.float64)
        for hf, vf, *_ in comps
    ]
    br = _BitReader(scan)
    prev_dc = [0] * n_comp
    for mi in range(n_mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            # RSTn sits byte-aligned between entropy segments
            br.align()
            if (
                br.pos + 2 > len(br.data)
                or br.data[br.pos] != 0xFF
                or not 0xD0 <= br.data[br.pos + 1] <= 0xD7
            ):
                raise ValueError("missing restart marker")
            br.pos += 2
            prev_dc = [0] * n_comp
        my, mx = divmod(mi, mcus_x)
        for ci, (hf, vf, qt, dc_t, ac_t, _cid) in enumerate(comps):
            for byi in range(vf):
                for bxi in range(hf):
                    spatial, prev_dc[ci] = _decode_block(
                        br, qt, dc_t, ac_t, prev_dc[ci]
                    )
                    y0 = (my * vf + byi) * 8
                    x0 = (mx * hf + bxi) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
    if n_comp == 1:
        out = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return {
            "width": width,
            "height": height,
            "mode": "L",
            "pixels": out[:height, :width].tobytes(),
        }
    # color: round each YCbCr plane (the encoder quantized rounded
    # planes), upsample subsampled chroma by replication, inverse-
    # transform, round again — every rounding site half-up. Planes
    # stack in COMPONENT-ID order (1=Y, 2=Cb, 3=Cr), not scan order
    full = []
    for i in sorted(range(n_comp), key=lambda j: comps[j][5]):
        hf, vf = comps[i][0], comps[i][1]
        r = np.clip(np.floor(planes[i] + 0.5), 0, 255)
        if hf != hmax or vf != vmax:
            r = np.repeat(np.repeat(r, vmax // vf, axis=0),
                          hmax // hf, axis=1)
        full.append(r[:height, :width])
    rgb = _ycbcr_to_rgb(np.stack(full, axis=-1)).astype(np.uint8)
    return {
        "width": width,
        "height": height,
        "mode": "RGB",
        "pixels": rgb.tobytes(),
    }
