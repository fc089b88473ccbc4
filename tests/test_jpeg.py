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
