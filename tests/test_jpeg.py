"""Baseline JPEG codec (operators/jpeg.py): exact-DC contract,
lossy-quality bounds, restart markers, an independent IDCT reference,
and the guard paths."""

from __future__ import annotations

import math

import numpy as np
import pytest

from goflow2clickhouse_spark.operators.jpeg import (
    _DCT_M,
    _ZIGZAG,
    QUANT_LUMA,
    decode_jpeg,
    encode_jpeg,
)


def _expected_const(v: int) -> int:
    """The module's documented exact-DC pipeline for a constant block:
    quantize F00 = 8(v-128) by Q00=16 half-up, dequantize, IDCT DC
    term, half-up, clip — all integer arithmetic."""
    dcq = math.floor((8 * (v - 128)) / 16.0 + 0.5)
    rec = 16 * dcq / 8.0 + 128
    return max(0, min(255, math.floor(rec + 0.5)))


def test_constant_blocks_decode_exactly():
    for v in (0, 1, 63, 127, 128, 129, 131, 200, 254, 255):
        dec = decode_jpeg(encode_jpeg(8, 8, bytes([v]) * 64))
        assert (dec["width"], dec["height"], dec["mode"]) == (8, 8, "L")
        assert set(dec["pixels"]) == {_expected_const(v)}, v


def test_multi_block_dc_difference_coding():
    w, h = 24, 16
    img = np.zeros((h, w), dtype=np.uint8)
    vals = [10, 60, 130, 190, 250, 35]
    cells = [(y, x) for y in range(0, 16, 8) for x in range(0, 24, 8)]
    for i, (by, bx) in enumerate(cells):
        img[by:by + 8, bx:bx + 8] = vals[i]
    out = np.frombuffer(
        decode_jpeg(encode_jpeg(w, h, img.tobytes()))["pixels"],
        dtype=np.uint8,
    ).reshape(h, w)
    for i, (by, bx) in enumerate(cells):
        assert set(out[by:by + 8, bx:bx + 8].flat) == {
            _expected_const(vals[i])
        }, i


def test_lossy_quality_bounds_and_crop():
    # smooth gradient: small error; noise: real JPEG behaviour
    # (high-frequency content is what K.1 quantizes away)
    x = np.linspace(0, 255, 64)
    grad = np.tile(x, (40, 1)).astype(np.uint8)
    out = np.frombuffer(
        decode_jpeg(encode_jpeg(64, 40, grad.tobytes()))["pixels"],
        dtype=np.uint8,
    ).reshape(40, 64)
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 4

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)  # non-8 dims
    dec = decode_jpeg(encode_jpeg(53, 37, img.tobytes()))
    assert (dec["width"], dec["height"]) == (53, 37)
    out = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(37, 53)
    mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 20, psnr  # measured 22.5 dB at authoring


def test_restart_markers_equal_plain_decode():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(48, 32, img.tobytes()))["pixels"]
    for ri in (1, 3, 5, 24):
        withrst = decode_jpeg(
            encode_jpeg(48, 32, img.tobytes(), restart_interval=ri)
        )["pixels"]
        assert withrst == plain, ri


def test_idct_matches_independent_reference():
    """The decoder's matrix IDCT (with the exact-DC split) must agree
    with the T.81 Annex A.3.3 double-sum written out directly — a
    SECOND implementation, so a transposed matrix or mis-scaled basis
    can't hide inside a round-trip."""
    rng = np.random.default_rng(9)
    coef = rng.integers(-200, 200, (8, 8)).astype(np.float64)

    def ref_idct(F):
        out = np.zeros((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * F[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[x, y] = s / 4
        return out

    dc = coef[0, 0]
    hollow = coef.copy()
    hollow[0, 0] = 0.0
    ours = _DCT_M.T @ hollow @ _DCT_M + dc / 8.0
    assert np.abs(ours - ref_idct(coef)).max() < 1e-9


def test_zigzag_is_an_involution_of_the_spec_order():
    # the first and last few entries of the T.81 Figure 5 order, plus
    # the permutation property
    assert _ZIGZAG[:8] == [0, 1, 8, 16, 9, 2, 3, 10]
    assert _ZIGZAG[-4:] == [47, 55, 62, 63]
    assert sorted(_ZIGZAG) == list(range(64))
    assert QUANT_LUMA[0, 0] == 16 and QUANT_LUMA[7, 7] == 99


def test_jpeg_guards():
    enc = encode_jpeg(8, 8, bytes(64))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG" + bytes(60))
    with pytest.raises(ValueError):
        decode_jpeg(enc[:40])  # truncated before/inside the scan
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, bytes(63))
    prog = bytearray(enc)
    sof_at = prog.index(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2  # claim progressive
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(prog))


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker — a conformant foreign stream must decode (r10 review)."""
    enc = encode_jpeg(8, 8, bytes([77]) * 64)
    # inject fill bytes before the DQT and SOF0 markers
    padded = enc.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1).replace(
        b"\xff\xc0", b"\xff\xff\xff\xff\xc0", 1
    )
    assert decode_jpeg(padded)["pixels"] == decode_jpeg(enc)["pixels"]


def _expect_const_rgb(r, g, b):
    """The documented exact chain for a constant-RGB block: BT.601
    forward (half-up, clip), per-plane DC quant/dequant, BT.601
    inverse (half-up, clip) — pure integer arithmetic end to end."""
    def hu(x):
        return math.floor(x + 0.5)

    def clip(x):
        return min(255, max(0, x))

    y = clip(hu(0.299 * r + 0.587 * g + 0.114 * b))
    cb = clip(hu(-0.168736 * r - 0.331264 * g + 0.5 * b + 128))
    cr = clip(hu(0.5 * r - 0.418688 * g - 0.081312 * b + 128))

    def dc_chain(v):
        dcq = math.floor((8 * (v - 128)) / 16.0 + 0.5)
        return clip(hu(16 * dcq / 8.0 + 128))

    y, cb, cr = dc_chain(y), dc_chain(cb), dc_chain(cr)
    return (
        clip(hu(y + 1.402 * (cr - 128))),
        clip(hu(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))),
        clip(hu(y + 1.772 * (cb - 128))),
    )


def test_color_constant_blocks_match_exact_chain():
    for rgb in [(255, 0, 0), (0, 255, 0), (0, 0, 255),
                (128, 128, 128), (17, 200, 99), (255, 255, 255)]:
        dec = decode_jpeg(encode_jpeg(8, 8, bytes(rgb) * 64, mode="RGB"))
        assert dec["mode"] == "RGB"
        got = set(zip(dec["pixels"][0::3], dec["pixels"][1::3],
                      dec["pixels"][2::3]))
        assert got == {_expect_const_rgb(*rgb)}, rgb


def test_color_quality_and_restart():
    x = np.linspace(0, 255, 48)
    grad = np.stack(
        [np.tile(x, (24, 1)), np.tile(x[::-1], (24, 1)),
         np.full((24, 48), 90.0)], axis=-1,
    ).astype(np.uint8)
    out = np.frombuffer(
        decode_jpeg(encode_jpeg(48, 24, grad.tobytes(), mode="RGB"))["pixels"],
        dtype=np.uint8,
    ).reshape(24, 48, 3)
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 6

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(40, 24, img.tobytes(), mode="RGB"))
    assert (plain["width"], plain["height"]) == (40, 24)
    for ri in (2, 5):
        withrst = decode_jpeg(
            encode_jpeg(40, 24, img.tobytes(), mode="RGB",
                        restart_interval=ri)
        )
        assert withrst["pixels"] == plain["pixels"], ri
    # interleaved MCU ordering: Y/Cb/Cr per MCU with separate DC
    # predictors — a cross-wired predictor shows as gross color error
    mse = ((np.frombuffer(plain["pixels"], dtype=np.uint8)
            .reshape(24, 40, 3).astype(float) - img.astype(float)) ** 2
           ).mean()
    assert 10 * np.log10(255**2 / mse) > 15  # measured 18.6 at authoring


def _expect_const_gray420(t: int) -> tuple[int, int, int]:
    """Gray-RGB constant region through the 4:2:0 chain: r=g=b=t gives
    Y=t exactly and Cb=Cr=128 exactly (the BT.601 coefficients sum to
    1.0 and the chroma terms cancel; half-up can't move an exact
    value), the 2x2 chroma mean of a constant is that constant, the
    DC chain reconstructs _expected_const per plane, and the inverse
    transform of (y', 128, 128) is (y', y', y')."""
    y = _expected_const(t)
    return (y, y, y)


def test_jpeg420_constant_tiles_decode_exactly():
    """16x16-constant gray tiles through the 4:2:0 path: every pixel
    of every tile decodes to the exact-DC chain's value — the oracle
    contract multimodal_decode_jpeg420 rides. restart_interval=2
    also proves RSTn at 16x16-MCU counting."""
    w = h = 32
    vals = [10, 130, 200, 255]
    rgb = bytearray(w * h * 3)
    for m, t in enumerate(vals):
        my, mx = divmod(m, 2)
        for y in range(16):
            for x in range(16):
                o = ((my * 16 + y) * w + mx * 16 + x) * 3
                rgb[o:o + 3] = bytes([t] * 3)
    dec = decode_jpeg(encode_jpeg(
        w, h, bytes(rgb), mode="RGB", subsampling="420",
        restart_interval=2,
    ))
    assert (dec["width"], dec["height"], dec["mode"]) == (w, h, "RGB")
    px = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w, 3)
    for m, t in enumerate(vals):
        my, mx = divmod(m, 2)
        tile = px[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16]
        assert (tile == _expect_const_gray420(t)[0]).all(), (m, t)


def test_jpeg420_y_block_order_within_mcu():
    """Four DIFFERENT constant 8x8 gray quadrants inside ONE 16x16
    MCU: chroma stays constant (gray), so each quadrant decodes to
    its own exact-DC value — any swap of the four Y blocks'
    left-to-right/top-to-bottom order (T.81 A.2.3) shows immediately."""
    qv = [40, 90, 160, 220]
    rgb = bytearray(16 * 16 * 3)
    for q, t in enumerate(qv):
        qy, qx = divmod(q, 2)
        for y in range(8):
            for x in range(8):
                o = ((qy * 8 + y) * 16 + qx * 8 + x) * 3
                rgb[o:o + 3] = bytes([t] * 3)
    dec = decode_jpeg(encode_jpeg(
        16, 16, bytes(rgb), mode="RGB", subsampling="420"
    ))
    px = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(16, 16, 3)
    for q, t in enumerate(qv):
        qy, qx = divmod(q, 2)
        tile = px[qy * 8:(qy + 1) * 8, qx * 8:(qx + 1) * 8]
        assert (tile == _expected_const(t)).all(), (q, t)


def test_jpeg420_quality_restart_and_odd_dims():
    """General images through 4:2:0: smooth gradients reconstruct
    within a PSNR bound (measured 38.8 dB at authoring — chroma
    subsampling costs ~3 dB vs the 444 path's 42.2 on the same
    image), restart markers don't change the decode, and non-16-
    multiple dims pad/crop correctly."""
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(
        48, 32, img.tobytes(), mode="RGB", subsampling="420"
    ))
    out = np.frombuffer(plain["pixels"], dtype=np.uint8).reshape(32, 48, 3)
    mse = float(np.mean((img.astype(float) - out.astype(float)) ** 2))
    assert 10 * np.log10(255 ** 2 / mse) > 30

    for ri in (1, 3):
        withrst = decode_jpeg(encode_jpeg(
            48, 32, img.tobytes(), mode="RGB", subsampling="420",
            restart_interval=ri,
        ))
        assert withrst["pixels"] == plain["pixels"], ri

    rng = np.random.default_rng(9)
    for (w, h) in ((20, 12), (17, 33)):
        im = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        d = decode_jpeg(encode_jpeg(
            w, h, im.tobytes(), mode="RGB", subsampling="420"
        ))
        assert (d["width"], d["height"]) == (w, h)
        assert len(d["pixels"]) == w * h * 3


def _ref_decode_subsampled(payload):
    """From-scratch reference decoder for subsampled baseline color
    streams — double-sum IDCT, explicit per-plane geometry read from
    the SOF factors (so it covers 4:4:4, 4:2:2 AND 4:2:0), no shared
    helpers with production beyond the table constants and the
    bitreader primitives. The independent-second-implementation pin
    for every subsampling shape."""
    import struct as _struct

    from goflow2clickhouse_spark.operators.jpeg import (
        _build_decode_table,
        _extend,
        _BitReader,
        _read_symbol,
    )

    def ref_decode(payload):
        pos = 2
        quant = {}
        huff = {}
        sof = None
        while True:
            marker = payload[pos + 1]
            if marker == 0xD9:
                break
            (seglen,) = _struct.unpack_from(">H", payload, pos + 2)
            body = payload[pos + 4:pos + 2 + seglen]
            if marker == 0xDB:
                b = 0
                while b < len(body):
                    tq = body[b] & 0x0F
                    tbl = np.zeros(64)
                    for i, z in enumerate(_ZIGZAG):
                        tbl[z] = body[b + 1 + i]
                    quant[tq] = tbl.reshape(8, 8)
                    b += 65
            elif marker == 0xC0:
                _, h, w, nf = _struct.unpack_from(">BHHB", body, 0)
                comps = []
                for ci in range(nf):
                    cid, smp, tq = body[6 + 3 * ci:9 + 3 * ci]
                    comps.append((cid, smp >> 4, smp & 15, tq))
                sof = (w, h, comps)
            elif marker == 0xC4:
                b = 0
                while b < len(body):
                    tc, th = body[b] >> 4, body[b] & 0x0F
                    bits = list(body[b + 1:b + 17])
                    n = sum(bits)
                    huff[(tc, th)] = _build_decode_table(
                        bits, list(body[b + 17:b + 17 + n])
                    )
                    b += 17 + n
            elif marker == 0xDA:
                w, h, comps = sof
                scan = payload[pos + 2 + seglen:]
                return ref_scan(scan, w, h, comps, quant, huff)
            pos += 2 + seglen
        raise AssertionError("no scan")

    def idct2(coef):
        # textbook double sum, O(64^2) per block
        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (cu * cv / 4.0 * coef[u, v]
                              * np.cos((2 * y + 1) * u * np.pi / 16)
                              * np.cos((2 * x + 1) * v * np.pi / 16))
                out[y, x] = s
        return out

    def ref_scan(scan, w, h, comps, quant, huff):
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mx_n = -(-w // (8 * hmax))
        my_n = -(-h // (8 * vmax))
        planes = {}
        for cid, hf, vf, tq in comps:
            planes[cid] = np.zeros((my_n * 8 * vf, mx_n * 8 * hf))
        br = _BitReader(scan)
        prev = {cid: 0 for cid, *_ in comps}
        for mi in range(mx_n * my_n):
            my, mx = divmod(mi, mx_n)
            for cid, hf, vf, tq in comps:
                for byi in range(vf):
                    for bxi in range(hf):
                        zz = [0] * 64
                        size = _read_symbol(br, huff[(0, 0)])
                        prev[cid] += (_extend(br.bits(size), size)
                                      if size else 0)
                        zz[0] = prev[cid]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(br, huff[(1, 0)])
                            if sym == 0:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += sym >> 4
                            zz[k] = _extend(br.bits(sym & 15), sym & 15)
                            k += 1
                        coef = np.zeros(64)
                        for i, z in enumerate(_ZIGZAG):
                            coef[z] = zz[i]
                        coef = coef.reshape(8, 8) * quant[tq]
                        # the production decoder's exact-DC split
                        dc = coef[0, 0]
                        coef[0, 0] = 0.0
                        blk = idct2(coef) + dc / 8.0 + 128.0
                        y0 = (my * vf + byi) * 8
                        x0 = (mx * hf + bxi) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = blk
        full = []
        for cid, hf, vf, tq in comps:
            r = np.clip(np.floor(planes[cid] + 0.5), 0, 255)
            r = np.repeat(np.repeat(r, vmax // vf, axis=0),
                          hmax // hf, axis=1)
            full.append(r[:h, :w])
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        rgb = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ], axis=-1)
        return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)

    return ref_decode(payload)


def test_jpeg420_matches_independent_420_reference():
    """Independent second implementation for the 4:2:0 machinery (the
    module rule: every hand-written algorithm gets a second-path pin):
    byte equality against _ref_decode_subsampled."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    enc = encode_jpeg(24, 16, img.tobytes(), mode="RGB", subsampling="420")
    ours = np.frombuffer(
        decode_jpeg(enc)["pixels"], dtype=np.uint8
    ).reshape(16, 24, 3)
    ref = _ref_decode_subsampled(enc)
    assert np.array_equal(ours, ref)


def test_jpeg420_guards():
    """4:1:1-style factor mixes still refuse loudly (4:2:2 joined the
    supported set at r12), and unsupported subsampling strings refuse
    at encode."""
    with pytest.raises(NotImplementedError, match="subsampling"):
        encode_jpeg(8, 8, bytes(192), mode="RGB", subsampling="411")
    # hand-build a SOF with 4x1 (4:1:1) factors: decode must refuse
    enc = bytearray(encode_jpeg(16, 16, bytes(16 * 16 * 3), mode="RGB",
                                subsampling="420"))
    i = enc.find(b"\xff\xc0")
    assert enc[i + 11] == 0x22  # Y sampling byte
    enc[i + 11] = 0x41
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_jpeg(bytes(enc))
    # 4:4:0 (vertical-only halving) is also out of scope
    enc[i + 11] = 0x12
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_jpeg(bytes(enc))


def _swap_components_23(enc: bytes) -> bytes:
    """Swap the SOF and SOS entries of components 2 and 3 in an
    encoded 4:4:4 color stream. The entropy data is untouched, so the
    SECOND interleaved plane (physically the Cb data) now belongs to
    component id 3 = Cr per the headers — a legal baseline stream
    with a non-canonical component order."""
    out = bytearray(enc)
    i = out.find(b"\xff\xc0")
    assert i >= 0 and out[i + 9] == 3  # nf
    # SOF entries start at i+10, 3 bytes each: (cid, sampling, tq)
    e2, e3 = out[i + 13:i + 16], out[i + 16:i + 19]
    assert e2[0] == 2 and e3[0] == 3
    out[i + 13:i + 16], out[i + 16:i + 19] = e3, e2
    j = out.find(b"\xff\xda")
    assert j >= 0 and out[j + 4] == 3  # ns
    # SOS entries start at j+5, 2 bytes each: (cid, tables)
    s2, s3 = out[j + 7:j + 9], out[j + 9:j + 11]
    assert s2[0] == 2 and s3[0] == 3
    out[j + 7:j + 9], out[j + 9:j + 11] = s3, s2
    return bytes(out)


def _expect_const_rgb_swapped(r, g, b):
    """_expect_const_rgb with the chroma DATA swapped at the role
    level: the stream's second interleaved plane (Cb data) is
    declared Cr and vice versa, so the inverse transform must consume
    (y, cb=cr_data, cr=cb_data)."""
    def hu(x):
        return math.floor(x + 0.5)

    def clip(x):
        return min(255, max(0, x))

    y = clip(hu(0.299 * r + 0.587 * g + 0.114 * b))
    cb = clip(hu(-0.168736 * r - 0.331264 * g + 0.5 * b + 128))
    cr = clip(hu(0.5 * r - 0.418688 * g - 0.081312 * b + 128))

    def dc_chain(v):
        dcq = math.floor((8 * (v - 128)) / 16.0 + 0.5)
        return clip(hu(16 * dcq / 8.0 + 128))

    y, cb, cr = dc_chain(y), dc_chain(cb), dc_chain(cr)
    cb, cr = cr, cb  # the role swap the permuted headers declare
    return (
        clip(hu(y + 1.402 * (cr - 128))),
        clip(hu(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))),
        clip(hu(y + 1.772 * (cb - 128))),
    )


def test_component_roles_keyed_by_id_not_position():
    """T.81 fixes nothing about component ORDER — a legal baseline
    stream may list Y/Cb/Cr in any order, and a decoder that maps
    planes positionally silently swaps the chroma channels (r11
    advice). Swap components 2 and 3 in the headers of an encoded
    solid-color stream: the id-keyed decode must produce EXACTLY the
    constant-chain result with the chroma roles exchanged (a
    positional decoder would return the original colors)."""
    rgb = (200, 60, 100)
    enc = encode_jpeg(8, 8, bytes(rgb) * 64, mode="RGB")
    dec = decode_jpeg(_swap_components_23(enc))
    got = set(zip(dec["pixels"][0::3], dec["pixels"][1::3],
                  dec["pixels"][2::3]))
    assert got == {_expect_const_rgb_swapped(*rgb)}
    # and the swap is not a no-op on this fixture
    plain = decode_jpeg(enc)
    assert plain["pixels"] != dec["pixels"]


def test_non_jfif_component_ids_refuse_loudly():
    """Y/Cb/Cr roles are keyed off JFIF ids 1/2/3; a 3-component
    stream with any other id set has no inferable roles and must
    refuse instead of guessing positionally."""
    enc = bytearray(encode_jpeg(8, 8, bytes((10, 20, 30)) * 64,
                                mode="RGB"))
    i = enc.find(b"\xff\xc0")
    j = enc.find(b"\xff\xda")
    for k in range(3):
        enc[i + 10 + 3 * k] += 4  # SOF ids 5,6,7
        enc[j + 5 + 2 * k] += 4   # SOS ids match
    with pytest.raises(NotImplementedError, match="component ids"):
        decode_jpeg(bytes(enc))


def test_jpeg422_constant_tiles_decode_exactly():
    """16x8-constant tiles through the 4:2:2 chain: gray input gives
    Y = t and Cb = Cr = 128 exactly, the horizontal-pair chroma mean
    of a constant is that constant, so every pixel decodes to the
    documented DC chain — the exact-oracle contract extends to the
    third subsampling shape."""
    w, h = 32, 16
    img = np.zeros((h, w, 3), dtype=np.uint8)
    vals = [17, 130, 200, 255]  # one per 16x8 MCU (2 rows x 2 cols)
    k = 0
    for my in range(h // 8):
        for mx in range(w // 16):
            img[my * 8:(my + 1) * 8, mx * 16:(mx + 1) * 16, :] = vals[k]
            k += 1
    enc = encode_jpeg(w, h, img.tobytes(), mode="RGB", subsampling="422")
    dec = decode_jpeg(enc)
    assert (dec["mode"], dec["width"], dec["height"]) == ("RGB", w, h)
    out = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(h, w, 3)
    k = 0
    for my in range(h // 8):
        for mx in range(w // 16):
            want = _expected_const(vals[k])
            got = out[my * 8:(my + 1) * 8, mx * 16:(mx + 1) * 16, :]
            assert (got == want).all(), (vals[k], want)
            k += 1


def test_jpeg422_matches_independent_422_reference():
    """The independent-second-implementation pin for 4:2:2 — byte
    equality of a general (random) image against the from-scratch
    factor-generic reference decoder, including restart markers at
    the 16x8-MCU cadence."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (16, 48, 3), dtype=np.uint8)
    enc = encode_jpeg(48, 16, img.tobytes(), mode="RGB",
                      subsampling="422")
    plain = decode_jpeg(enc)["pixels"]
    ours = np.frombuffer(plain, dtype=np.uint8).reshape(16, 48, 3)
    assert np.array_equal(ours, _ref_decode_subsampled(enc))
    # restart markers at the 16x8-MCU cadence change nothing (the
    # reference decoder doesn't speak RSTn, so pin against plain)
    withrst = decode_jpeg(encode_jpeg(
        48, 16, img.tobytes(), mode="RGB", subsampling="422",
        restart_interval=2,
    ))["pixels"]
    assert withrst == plain


def test_jpeg422_odd_width_and_quality():
    """Odd dimensions edge-replicate to MCU coverage and crop back;
    lossy quality stays bounded on a smooth gradient (the 4:4:4/4:2:0
    bounds carry over — chroma is halved only horizontally)."""
    x = np.linspace(0, 255, 37)
    grad = np.stack(
        [np.tile(x, (11, 1)), np.tile(x[::-1], (11, 1)),
         np.full((11, 37), 120.0)], axis=-1,
    ).astype(np.uint8)
    enc = encode_jpeg(37, 11, grad.tobytes(), mode="RGB",
                      subsampling="422")
    dec = decode_jpeg(enc)
    assert (dec["width"], dec["height"]) == (37, 11)
    out = np.frombuffer(dec["pixels"], dtype=np.uint8).reshape(11, 37, 3)
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 12
