"""Multimodal columns (SURVEY.md §2.C): image/audio/video as opaque
binary columns + typed metadata, processed by Arrow-batched pandas
functions over mapInPandas.

The Spark-side plumbing is real — BinaryType columns, metadata structs,
mapInPandas with a declared output schema, per-batch processing. The
codec layer is REAL for five formats: pure-Python uncompressed 24-bpp
BMP and 16-bit PCM WAV encode/decode (since r3) and — since r10 — two
COMPRESSED formats: 8-bit gray/RGB/RGBA PNG (zlib DEFLATE via the
stdlib, all five scanline filters, chunk CRC validation) and paletted
GIF87a/89a with the variable-width LZW entropy coder implemented BY
HAND from the public spec (encode and decode, dictionary growth, the
KwKwK case, 12-bit reset, interlace) — plus baseline JPEG (gray AND
4:4:4 YCbCr color) in the sibling `operators/jpeg.py` (hand-written
canonical Huffman + numpy DCT, exact-DC contract). Each has an
oracle-checked round-trip query
(`multimodal_decode_image`/`_audio`/`_png`/`_gif`/`_jpeg`);
the decoders raise NotImplementedError only for OTHER variants
(compressed BMP, non-PCM WAV, paletted/16-bit/interlaced PNG,
subsampled/progressive JPEG, MP3... — this container has no
imaging/audio libraries). The deterministic
`extract_features` fake computes features from the actual bytes
(length + byte checksum) so the pipeline is testable end-to-end and
oracle-checkable (the same arithmetic is expressible in SQL over the
utf-8 encoding of the source text).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("checksum", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_blob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct
    (modality tag, byte length) — the multimodal storage layout.
    Parquet stores BinaryType natively; at scale keep blobs in their
    own column chunk so metadata-only queries never read them."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("blob", blob).withColumn(
        "meta",
        F.struct(
            F.lit("text").alias("modality"),
            F.octet_length(blob).cast("long").alias("byte_len"),
        ),
    )


# ---------------------------------------------------------------------------
# real codecs: BMP (24-bpp BI_RGB) and WAV (16-bit PCM) — pure-Python
# struct walks of the public wire formats, no imaging/audio library.
# Formats beyond these still need a library; decode raises for them.
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Build an uncompressed 24-bpp BMP from row-major top-down RGB
    triplets (len == width*height*3): BITMAPFILEHEADER +
    BITMAPINFOHEADER, rows stored bottom-up as BGR, padded to 4 bytes."""
    row = width * 3
    if len(pixels) != row * height:
        raise ValueError("pixels must be width*height*3 bytes")
    pad = (4 - row % 4) % 4
    image_size = (row + pad) * height
    out = bytearray(struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54))
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size,
        2835, 2835, 0, 0,
    )
    for y in range(height - 1, -1, -1):
        r = pixels[y * row:(y + 1) * row]
        bgr = bytearray(r)
        bgr[0::3], bgr[2::3] = r[2::3], r[0::3]
        out += bgr + b"\x00" * pad
    return bytes(out)


def decode_image(payload: bytes) -> dict:
    """Decode an uncompressed 24-bpp BI_RGB BMP: returns
    {width, height, mode, pixels} with pixels as row-major top-down RGB
    bytes (padding stripped, BGR→RGB, bottom-up or top-down handled).
    Any other image format still needs a real imaging library."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    _, width, height = struct.unpack_from("<Iii", payload, 14)
    _, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bpp BMP supported")
    top_down = height < 0
    height = abs(height)
    row = width * 3
    stride = (row + 3) & ~3
    if height > 0 and len(payload) < offset + (height - 1) * stride + row:
        # a truncated payload used to shrink px SILENTLY (bytearray
        # slice assignment accepts short rows) and hand the caller
        # corrupt pixels with the full claimed geometry (r8 review)
        raise ValueError(
            f"BMP payload truncated: header claims {width}x{height} "
            f"({offset + height * stride} bytes needed), got {len(payload)}"
        )
    px = bytearray(row * height)
    for y in range(height):
        src = offset + (y if top_down else height - 1 - y) * stride
        bgr = payload[src:src + row]
        rgb = bytearray(bgr)
        rgb[0::3], rgb[2::3] = bgr[2::3], bgr[0::3]
        px[y * row:(y + 1) * row] = rgb
    return {"width": width, "height": height, "mode": "RGB", "pixels": bytes(px)}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> channels per pixel (8-bit depth only): the three
# non-paletted, non-interlaced layouts a training-data pipeline
# actually stores. Palette (3) needs PLTE handling; 16-bit and Adam7
# are rare in corpora and raise below.
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}
_PNG_MODE = {0: "L", 2: "RGB", 6: "RGBA"}


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §6.6 / RFC 2083): pick whichever
    of left/above/upper-left is closest to a+b-c, ties broken in
    that order."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, pixels: bytes, mode: str = "RGB"
) -> bytes:
    """Build an 8-bit non-interlaced PNG (W3C PNG spec / RFC 2083)
    from row-major top-down samples: IHDR + one zlib-DEFLATE IDAT +
    IEND, chunk CRCs included. `mode` is 'L' (gray), 'RGB' or 'RGBA'.
    Each scanline is filtered with filter type y % 5, so a round-trip
    through decode_png exercises ALL FIVE filters (None/Sub/Up/
    Average/Paeth) — the part of the format a naive decoder gets
    wrong — not just the trivial one."""
    import zlib

    ch = {"L": 1, "RGB": 3, "RGBA": 4}[mode]
    ctype = {"L": 0, "RGB": 2, "RGBA": 6}[mode]
    row = width * ch
    if len(pixels) != row * height:
        raise ValueError(f"pixels must be width*height*{ch} bytes")
    raw = bytearray()
    prev = bytes(row)
    for y in range(height):
        line = pixels[y * row:(y + 1) * row]
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:  # Sub: left neighbour, ch bytes back
            raw += bytes(
                (line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(row)
            )
        elif ft == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(row))
        elif ft == 3:  # Average
            raw += bytes(
                (line[i] - ((line[i - ch] if i >= ch else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(row)
            )
        else:  # Paeth
            raw += bytes(
                (line[i] - _paeth(
                    line[i - ch] if i >= ch else 0,
                    prev[i],
                    prev[i - ch] if i >= ch else 0,
                )) & 0xFF
                for i in range(row)
            )
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Decode an 8-bit non-interlaced gray/RGB/RGBA PNG: walk the
    chunks (validating each CRC — bit rot in a 100 TB blob store
    should fail loudly, not hand back shifted pixels), inflate the
    concatenated IDATs, reverse the per-scanline filter, and return
    {width, height, mode, pixels} with pixels as row-major top-down
    samples. Paletted, 16-bit, and interlaced PNGs raise
    NotImplementedError (they need PLTE indirection / Adam7 passes);
    anything structurally broken raises ValueError."""
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise ValueError("PNG payload truncated mid-chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not ended:
        raise ValueError("PNG missing IHDR, IDAT, or IEND")
    if len(ihdr) != 13:
        raise ValueError(f"PNG IHDR is {len(ihdr)} bytes, expected 13")
    width, height, depth, ctype_n, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if comp != 0 or filt != 0:
        raise ValueError("PNG with nonstandard compression/filter method")
    if depth != 8 or ctype_n not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            "only 8-bit non-interlaced gray/RGB/RGBA PNG supported"
        )
    ch = _PNG_CHANNELS[ctype_n]
    row = width * ch
    # bounded inflate (decompression-bomb guard): the scanline size is
    # known EXACTLY from the header, so never inflate a byte past it —
    # an untrusted blob in a 100 TB corpus must not be able to balloon
    # a worker's memory through a crafted IDAT
    want = (row + 1) * height
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), want)
    extra = d.decompress(d.unconsumed_tail, 1) if d.unconsumed_tail else b""
    if len(raw) != want or extra:
        raise ValueError(
            f"PNG scanline data is not exactly {want} bytes "
            f"(got {len(raw)}{'+extra' if extra else ''})"
        )
    px = bytearray(row * height)
    prev = bytes(row)
    for y in range(height):
        ft = raw[(row + 1) * y]
        line = bytearray(raw[(row + 1) * y + 1:(row + 1) * (y + 1)])
        if ft == 1:
            for i in range(row):
                line[i] = (line[i] + (line[i - ch] if i >= ch else 0)) & 0xFF
        elif ft == 2:
            for i in range(row):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(row):
                line[i] = (
                    line[i]
                    + ((line[i - ch] if i >= ch else 0) + prev[i]) // 2
                ) & 0xFF
        elif ft == 4:
            for i in range(row):
                line[i] = (line[i] + _paeth(
                    line[i - ch] if i >= ch else 0,
                    prev[i],
                    prev[i - ch] if i >= ch else 0,
                )) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG scanline {y} has invalid filter {ft}")
        px[y * row:(y + 1) * row] = line
        prev = bytes(line)
    return {
        "width": width,
        "height": height,
        "mode": _PNG_MODE[ctype_n],
        "pixels": bytes(px),
    }


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Build a 16-bit mono PCM WAV (RIFF/WAVE with fmt + data chunks)."""
    data = struct.pack("<%dh" % len(samples), *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_audio(payload: bytes) -> dict:
    """Decode a PCM WAV by walking RIFF chunks: returns
    {sample_rate, n_channels, bits, samples} with 16-bit samples as a
    list of ints. Compressed/float formats still need a library."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("WAV fmt chunk truncated")
    audio_format, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format != 1 or bits != 16:
        raise NotImplementedError("only 16-bit PCM WAV supported")
    if len(data) % 2:
        # an odd data chunk is a truncated final sample — raw
        # struct.error under corruption fuzzing (r10); refuse loudly
        raise ValueError("WAV data chunk is odd-length for 16-bit PCM")
    samples = list(struct.unpack("<%dh" % (len(data) // 2), data))
    return {"sample_rate": rate, "n_channels": n_ch, "bits": bits, "samples": samples}


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over the binary column: Arrow
    batches in, Arrow batches out; one Python worker per partition.
    Features are deterministic functions of the real bytes:
      byte_len  = len(blob)
      checksum  = sum(blob bytes) % 65536
      width     = byte_len % 640 + 1      (fake decode geometry)
      height    = byte_len * 7 % 480 + 1
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL blobs (attach_blob over NULL text emits them) are
            # treated as zero-length payloads — len(None) killed the
            # whole task with an opaque TypeError (r8 review)
            blobs = pdf["blob"].map(lambda b: b if b is not None else b"")
            byte_len = blobs.map(len)
            checksum = blobs.map(lambda b: sum(b) % 65536)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": byte_len.astype("int64"),
                    "checksum": checksum.astype("int64"),
                    "width": (byte_len % 640 + 1).astype("int32"),
                    "height": (byte_len * 7 % 480 + 1).astype("int32"),
                }
            )

    return df.select(id_col, "blob").mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("blob", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_image(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing over mapInPandas: Arrow batch in → per-row
    transformed payload out. The stub 'resampler' is deterministic
    (truncate/cycle the real bytes to width*height); a real deployment
    swaps the inner function for PIL/opencv — the schema, batch shape,
    and partitioning stay identical."""
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def stub_resample(b: bytes | None) -> bytes | None:
                if b is None:
                    return None  # NULL payload passes through (r8)
                if len(b) >= target:
                    return bytes(b[:target])
                reps = target // max(len(b), 1) + 1
                return bytes((b * reps)[:target])

            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "blob": pdf["blob"].map(stub_resample),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, "blob").mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling plumbing: treat the payload as fixed-size frames,
    emit every n-th — a 1→N mapInPandas (output rows ≠ input rows, the
    video-decode batch shape). Deterministic fake framing (byte slices)
    stands in for a codec; partitioning is inherited from the input, so
    at scale frames of one video stay on one partition unless
    explicitly repartitioned for downstream balance."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf["blob"]):
                if blob is None:
                    continue  # NULL payload: no frames (r8)
                n_frames = len(blob) // frame_bytes
                for f in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    nos.append(f)
                    frames.append(bytes(blob[f * frame_bytes:(f + 1) * frame_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return df.select(id_col, "blob").mapInPandas(batches, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# GIF codec (r10): 87a/89a, hand-implemented LZW — unlike PNG (whose
# DEFLATE comes from stdlib zlib), the entropy coder here is written
# out from the public spec (GIF89a specification / Welch 1984).
# ---------------------------------------------------------------------------

def _gif_palette() -> list[tuple[int, int, int]]:
    """The deterministic 256-entry palette the encoder writes:
    palette[i] = (i, i*3 % 256, i*7 % 256) — full 8-bit index space,
    arithmetic an oracle replays in SQL."""
    return [(i, i * 3 % 256, i * 7 % 256) for i in range(256)]


# per-image constant tables, hoisted to module scope (r15: profiling
# the codec showed the per-call rebuilds — palette bytes, the LZW base
# dictionaries — cost as much as the actual compression on the toy
# geometries; a dict/list COPY of the cached base is ~4x cheaper than
# re-running the comprehension, and the copies keep per-image
# dictionary state fully isolated)
_GIF_PALETTE_BYTES = b"".join(bytes(rgb) for rgb in _gif_palette())
_LZW_ENC_BASES: dict[int, dict[bytes, int]] = {}
_LZW_DEC_BASES: dict[int, list] = {}


def _lzw_enc_base(clear: int) -> dict[bytes, int]:
    t = _LZW_ENC_BASES.get(clear)
    if t is None:
        t = {bytes([i]): i for i in range(clear)}
        _LZW_ENC_BASES[clear] = t
    return t


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    """Variable-width LZW (GIF flavor): codes start at
    min_code_size+1 bits, clear = 2^min, end = clear+1, dictionary
    grows per emitted code, width bumps when the NEXT code would not
    fit, table resets via a clear code at the 12-bit cap. LSB-first
    bit packing (the GIF rule). Bits pack through an integer
    accumulator drained a byte at a time (r15) — identical LSB-first
    stream to the former bit-list, without the per-bit Python loop."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    packed = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = dict(_lzw_enc_base(clear))
    next_code, width = end + 1, min_code_size + 1
    emit(clear, width)
    buf = b""
    for ch in indices:
        cand = buf + bytes([ch])
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code - 1 == (1 << 12):
            emit(clear, width)
            table = dict(_lzw_enc_base(clear))
            next_code, width = end + 1, min_code_size + 1
        buf = bytes([ch])
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        packed.append(acc & 0xFF)  # zero-padded tail, as before
    return bytes(packed)


def _lzw_decode(
    data: bytes, min_code_size: int, max_out: int | None = None
) -> bytes:
    """The decoder half: rebuilds the dictionary from the code stream
    (including the deferred 'code == next entry' KwKwK case), honors
    clear/end codes and the 12-bit width cap. `max_out` bounds the
    inflated size (decompression-bomb guard — LZW expands up to
    ~4000x, and an untrusted corpus blob must not balloon a worker);
    decode_gif passes the image's exact pixel count."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    pos, nbits = 0, len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            raise ValueError("GIF LZW stream truncated mid-code")
        # the code's bits live in at most 3 bytes; slice + shift
        # replaces the per-bit loop (r15), same LSB-first value
        v = (
            int.from_bytes(
                data[pos >> 3:(pos + width + 7) >> 3], "little"
            )
            >> (pos & 7)
        ) & ((1 << width) - 1)
        pos += width
        return v

    base = _LZW_DEC_BASES.get(clear)
    if base is None:
        base = [bytes([i]) for i in range(clear)]
        base += [None, None]  # clear/end placeholders
        _LZW_DEC_BASES[clear] = base

    def fresh() -> tuple[list[bytes | None], int, int]:
        return list(base), len(base), min_code_size + 1

    table, next_code, width = fresh()
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError(f"GIF LZW: invalid first code {code}")
            entry = table[code]
        elif code < next_code and table[code] is not None:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case (Welch 1984)
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table")
        out += entry
        if max_out is not None and len(out) > max_out:
            raise ValueError(
                f"GIF LZW output exceeds the declared pixel count "
                f"({max_out}) — refusing to inflate further"
            )
        if prev is not None and next_code < (1 << 12):
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def encode_gif(width: int, height: int, indices: bytes) -> bytes:
    """Build a GIF89a: logical screen descriptor, the deterministic
    256-entry global color table (_gif_palette), one non-interlaced
    image compressed with real variable-width LZW, trailer. `indices`
    are row-major top-down palette indices (one byte per pixel)."""
    if len(indices) != width * height:
        raise ValueError("indices must be width*height bytes")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256
    out += _GIF_PALETTE_BYTES
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW min code size
    data = _lzw_encode(indices, 8)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """Decode a GIF87a/89a's FIRST image: walk the header, global
    color table, extensions (skipped by sub-block length, the spec's
    rule) and the image descriptor (local palette and interlace
    handled), LZW-decompress the index stream and map through the
    palette. Returns {width, height, mode='RGB', pixels} as row-major
    top-down RGB bytes. Structural corruption raises ValueError."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = [tuple(payload[pos + 3 * i:pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n

    def subblocks(p: int) -> tuple[bytes, int]:
        parts = bytearray()
        while True:
            if p >= len(payload):
                raise ValueError("GIF sub-blocks truncated")
            ln = payload[p]
            p += 1
            if ln == 0:
                return bytes(parts), p
            if len(payload) - p < ln:
                # compare the remaining payload, not the cumulative
                # parts length — the old guard was dead from the
                # second sub-block on (r10 review)
                raise ValueError("GIF sub-block truncated")
            parts += payload[p:p + ln]
            p += ln

    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            _, pos = subblocks(pos + 2)
        elif block == 0x2C:
            left, top, w, h, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            pal = palette
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = [
                    tuple(payload[pos + 3 * i:pos + 3 * i + 3])
                    for i in range(n)
                ]
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image has no color table")
            min_code = payload[pos]
            data, pos = subblocks(pos + 1)
            idx = _lzw_decode(data, min_code, max_out=w * h)
            if len(idx) < w * h:
                raise ValueError(
                    f"GIF pixel data is {len(idx)} indices, "
                    f"expected {w * h}"
                )
            idx = idx[:w * h]
            if ipacked & 0x40:  # interlaced: 4-pass row shuffle
                rows = [idx[y * w:(y + 1) * w] for y in range(h)]
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                deinter: list[bytes] = [b""] * h
                for src_row, dst_y in zip(rows, order):
                    deinter[dst_y] = src_row
                idx = b"".join(deinter)
            if len(pal) < 256 and idx:
                bad = max(idx)
                if bad >= len(pal):
                    # report the FIRST offending index, as the
                    # per-pixel loop did
                    i = next(i for i in idx if i >= len(pal))
                    raise ValueError(f"GIF index {i} outside palette")
            pal_bytes = [bytes(p) for p in pal]
            px = b"".join(map(pal_bytes.__getitem__, idx))
            return {"width": w, "height": h, "mode": "RGB",
                    "pixels": px}
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    raise ValueError("GIF contains no image block")


# ---------------------------------------------------------------------------
# DCT perceptual hash (r13, the r12 verdict's #3: the multimodal dedup
# bridge) — pHash over DECODED image planes, bucketed like SimHash so
# 100 TB of images dedups through the same never-all-pairs join shape.
# Every arithmetic step is INTEGER-EXACT (fixed-point DCT table
# embedded below, floor sampling, division-free threshold), so the
# whole hash replays bit-for-bit in any SQL engine — the registry
# oracle recomputes it per image in DuckDB.
# ---------------------------------------------------------------------------

PHASH_GRID = 32  # sampled luma grid feeding the DCT

# Q14 fixed-point DCT-II basis: PHASH_DCT_Q14[u][x] =
# round(cos((2x+1)*u*pi/64) * 2^14) for u in 0..7, x in 0..31 —
# EMBEDDED as integers (not recomputed from math.cos at import) so a
# 1-ulp libm difference can never flip a rounding and fork the hash
# across platforms. Rows u>=1 sum to EXACTLY 0 in this table, which
# makes the hash invariant to uniform brightness shifts by
# construction (a +c shift perturbs no AC coefficient at all).
PHASH_DCT_Q14: tuple[tuple[int, ...], ...] = (
    (16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384,
     16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384,
     16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384,
     16384, 16384, 16384, 16384, 16384, 16384, 16384, 16384),
    (16364, 16207, 15893, 15426, 14811, 14053, 13160, 12140,
     11003, 9760, 8423, 7005, 5520, 3981, 2404, 804,
     -804, -2404, -3981, -5520, -7005, -8423, -9760, -11003,
     -12140, -13160, -14053, -14811, -15426, -15893, -16207, -16364),
    (16305, 15679, 14449, 12665, 10394, 7723, 4756, 1606,
     -1606, -4756, -7723, -10394, -12665, -14449, -15679, -16305,
     -16305, -15679, -14449, -12665, -10394, -7723, -4756, -1606,
     1606, 4756, 7723, 10394, 12665, 14449, 15679, 16305),
    (16207, 14811, 12140, 8423, 3981, -804, -5520, -9760,
     -13160, -15426, -16364, -15893, -14053, -11003, -7005, -2404,
     2404, 7005, 11003, 14053, 15893, 16364, 15426, 13160,
     9760, 5520, 804, -3981, -8423, -12140, -14811, -16207),
    (16069, 13623, 9102, 3196, -3196, -9102, -13623, -16069,
     -16069, -13623, -9102, -3196, 3196, 9102, 13623, 16069,
     16069, 13623, 9102, 3196, -3196, -9102, -13623, -16069,
     -16069, -13623, -9102, -3196, 3196, 9102, 13623, 16069),
    (15893, 12140, 5520, -2404, -9760, -14811, -16364, -14053,
     -8423, -804, 7005, 13160, 16207, 15426, 11003, 3981,
     -3981, -11003, -15426, -16207, -13160, -7005, 804, 8423,
     14053, 16364, 14811, 9760, 2404, -5520, -12140, -15893),
    (15679, 10394, 1606, -7723, -14449, -16305, -12665, -4756,
     4756, 12665, 16305, 14449, 7723, -1606, -10394, -15679,
     -15679, -10394, -1606, 7723, 14449, 16305, 12665, 4756,
     -4756, -12665, -16305, -14449, -7723, 1606, 10394, 15679),
    (15426, 8423, -2404, -12140, -16364, -13160, -3981, 7005,
     14811, 15893, 9760, -804, -11003, -16207, -14053, -5520,
     5520, 14053, 16207, 11003, 804, -9760, -15893, -14811,
     -7005, 3981, 13160, 16364, 12140, 2404, -8423, -15426),
)


def gray_plane(dec: dict) -> tuple[list[int], int, int]:
    """Decoded-image dict -> (luma samples, width, height). Gray modes
    pass through; RGB/RGBA collapse by the exact integer BT.601 luma
    (299r + 587g + 114b + 500) // 1000 — for r=g=b=v this is EXACTLY v
    (the weights sum to 1000), so a gray image re-encoded through an
    RGB codec hashes identically (the r12 exact-DC playbook)."""
    px, mode = dec["pixels"], dec.get("mode", "L")
    w, h = int(dec["width"]), int(dec["height"])
    if mode in ("L", "gray"):
        return list(px), w, h
    step = {"RGB": 3, "RGBA": 4}.get(mode)
    if step is None:
        raise ValueError(f"gray_plane: unsupported decoded mode {mode!r}")
    out = [
        (299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2] + 500) // 1000
        for i in range(0, len(px), step)
    ]
    return out, w, h


def phash64(pixels, width: int, height: int) -> int:
    """63-bit DCT perceptual hash of a grayscale plane, every step
    integer-exact so any SQL engine replays it bit-for-bit:

      1. sample a PHASH_GRID^2 luma grid by floor-index nearest
         neighbor: g[i][j] = p[(i*H)//32][(j*W)//32];
      2. separable fixed-point DCT with the embedded Q14 table:
         R = g x K^T (32x8), C = K x R (8x8) — pure int64, max
         |C| < 2^47, no rounding anywhere;
      3. threshold each AC coefficient against the AC mean WITHOUT
         dividing: bit(u,v) = 63*C[u,v] > sum(AC), DC excluded;
      4. pack the 63 AC bits into bits 0..62 of a NON-NEGATIVE int64
         (bit k-1 for coefficient k = 8u+v), so band extraction and
         xor/bit_count downstream never meet a sign bit.

    Uniform brightness shifts perturb NO bit (the Q14 rows u>=1 sum
    to exactly 0); re-encoding through any lossless codec perturbs
    no bit either (same decoded plane). Hamming distance between
    hashes is the dedup radius."""
    import numpy as np

    p = np.asarray(list(pixels), dtype=np.int64).reshape(height, width)
    ys = (np.arange(PHASH_GRID) * height) // PHASH_GRID
    xs = (np.arange(PHASH_GRID) * width) // PHASH_GRID
    g = p[np.ix_(ys, xs)]
    k = np.asarray(PHASH_DCT_Q14, dtype=np.int64)
    c = k @ (g @ k.T)
    s = int(c.sum()) - int(c[0, 0])
    h = 0
    for idx in range(1, 64):
        if 63 * int(c[idx // 8, idx % 8]) > s:
            h |= 1 << (idx - 1)
    return h


def _phash_band_buckets(
    sigs: DataFrame, id_col: str, hash_col: str
) -> DataFrame:
    """(band_no, band_key, members) pHash band buckets of ≥2 images —
    the shared first stage of candidate expansion and the hot-bucket
    monitor (the dedup._band_buckets shape on the 16-bit bands).
    `members` is the sorted (_id, _sig) struct array; the hash rides
    along so the pair stage verifies hamming inline."""
    bands = F.array(*[
        F.struct(
            F.lit(j).alias("band_no"),
            F.expr(f"shiftright({hash_col}, {16 * j}) & 65535")
            .alias("band_key"),
        )
        for j in range(4)
    ])
    return (
        sigs.select(
            F.col(id_col).alias("_id"),
            F.col(hash_col).alias("_sig"),
            F.explode(bands).alias("b"),
        )
        .groupBy("b.band_no", "b.band_key")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_id"), F.col("_sig")))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )


def oversize_phash_buckets(
    sigs: DataFrame,
    max_bucket_size: int,
    id_col: str = "doc_id",
    hash_col: str = "phash",
) -> DataFrame:
    """The pHash band buckets a `max_bucket_size` cap would drop:
    (band_no, band_key, n_ids, n_pairs_avoided) — the
    dedup.oversize_lsh_buckets twin for the image side. Run this
    alongside a capped near-dup pass to COUNT what was skipped — a
    capped run that reports nothing dropped is equivalent to the
    uncapped run."""
    return _phash_band_buckets(sigs, id_col, hash_col).filter(
        F.size("members") > max_bucket_size
    ).select(
        "band_no",
        "band_key",
        F.size("members").alias("n_ids"),
        (F.size("members").cast("long") * (F.size("members") - 1) / 2)
        .cast("long")
        .alias("n_pairs_avoided"),
    )


def phash_near_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Image near-dup candidates + exact verify over phash64 values —
    the SimHash join shape applied to the 63-bit image hash: four
    16-bit band keys (pigeonhole: hamming <= 3 over 63 bits leaves at
    least one band untouched), candidate pairs from four equi-joins on
    the band key — shuffle-hash joins, NEVER an all-pairs cross — then
    one exact hamming = bit_count(xor) verify. Returns
    (id_a, id_b, hamming). Raises for max_hamming > 3: a fourth
    differing bit can land one per band and the pair would silently
    never become a candidate (the simhash_near_pairs rule).

    Shape (r14 optimization round — the lsh_candidate_pairs bucket
    expansion applied here): each hash explodes into its four
    (band_no, band_key) rows CARRYING the hash, buckets gather by one
    groupBy, and each ≥2-member bucket expands its sorted (id, hash)
    array into ordered pairs with pure array expressions — hamming
    verifies inline from the carried hashes. ONE content shuffle (the
    bucket groupBy) plus the pair distinct, versus the former four
    band self-joins + union + distinct + two verify fetch-joins
    (seven exchanges; measured 1.7 s of the 2.3 s query at sf0.1,
    nearly all stage latency over KB-sized data). Same candidate set,
    same hamming values — pairs sharing several bands dedupe in the
    distinct, exactly as the union-of-joins did; the strict
    id_a < id_b filter also excludes self-pairs from duplicated input
    ids, as the join form's filter did (r14 review). Hot-bucket bound:
    a bucket of k members expands to k²/2 structs inside one row —
    the lsh_candidate_pairs trade (inherent to LSH banding; a
    degenerate corpus of near-identical images concentrates one band
    key exactly as boilerplate documents concentrate a MinHash band).
    `max_bucket_size` (r15) bounds that row width exactly like
    lsh_candidate_pairs' cap: oversize buckets are dropped — their
    members are near-identical to each other and almost always caught
    by the other three bands or the exact-dup gate; audit what a cap
    skipped with `oversize_phash_buckets` before relying on that."""
    if max_hamming > 3:
        raise ValueError(
            "4-band pigeonhole is only complete for max_hamming <= 3; "
            f"got {max_hamming}"
        )
    buckets = _phash_band_buckets(sigs, id_col, hash_col)
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("members") <= max_bucket_size)
    m = F.col("members")
    pairs = F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.slice(m, i + F.lit(2), F.size(m)),
                lambda y: F.struct(
                    x["_id"].alias("id_a"),
                    y["_id"].alias("id_b"),
                    x["_sig"].alias("sig_a"),
                    y["_sig"].alias("sig_b"),
                ),
            ),
        )
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b", "p.sig_a", "p.sig_b")
        # strict: sort_array guarantees id_a <= id_b, so this only
        # drops self-pairs from duplicated input ids (r14 review —
        # the replaced join shape's id_a < id_b filter dropped them)
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
