"""Real PNG/WAV codecs: hand-computed spec vectors (every PNG filter type
reconstructed by hand per https://www.w3.org/TR/png-3/), writer/parser
round-trips, corruption detection, and the distributed decode paths."""

import struct
import zlib
from binascii import crc32

import numpy as np
import pytest

from ape_dts_spark.functions import media_codec as mc


def _hand_png(w, h, filtered_scanlines: bytes, color_type=0, bit_depth=8) -> bytes:
    """Assemble a PNG from HAND-WRITTEN filtered scanline bytes — independent
    of encode_png, so parser bugs can't hide behind writer symmetry."""
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc32(tag + body) & 0xFFFFFFFF)

    return (
        mc.PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(filtered_scanlines))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# hand vectors, one per filter type
# ---------------------------------------------------------------------------


def test_png_filter0_none_hand():
    # 3x1 gray [10, 20, 30], filter 0: bytes pass through
    out = mc.parse_png(_hand_png(3, 1, bytes([0, 10, 20, 30])))
    assert (out["px_sum"], out["px_min"], out["px_max"], out["n_px"]) == (60, 10, 30, 3)


def test_png_filter1_sub_hand():
    # raw [10, 20, 30] -> Sub filtered [10, 10, 10] (each minus left)
    out = mc.parse_png(_hand_png(3, 1, bytes([1, 10, 10, 10])))
    assert (out["px_sum"], out["px_min"], out["px_max"]) == (60, 10, 30)


def test_png_filter2_up_hand():
    # row0 raw [5, 6] (filter 0); row1 raw [15, 26] -> Up filtered [10, 20]
    out = mc.parse_png(_hand_png(2, 2, bytes([0, 5, 6, 2, 10, 20])))
    assert (out["px_sum"], out["px_min"], out["px_max"]) == (5 + 6 + 15 + 26, 5, 26)


def test_png_filter3_average_hand():
    # raw rows [100,200] / [50,250]; Average-filtered per spec:
    # row0: [100-0, 200-floor(100/2)] = [100, 150]
    # row1: [50-floor((0+100)/2), 250-floor((50+200)/2)] = [0, 125]
    out = mc.parse_png(_hand_png(2, 2, bytes([3, 100, 150, 3, 0, 125])))
    assert (out["px_sum"], out["px_min"], out["px_max"]) == (600, 50, 250)


def test_png_filter4_paeth_hand():
    # raw rows [10,20] / [30,40]; Paeth-filtered per spec:
    # row0: pred(0,0,0)=0 -> 10; pred(10,0,0)=10 -> 10
    # row1: pred(0,10,0)=10 -> 20; pred(30,20,10)=30 -> 10
    out = mc.parse_png(_hand_png(2, 2, bytes([4, 10, 10, 4, 20, 10])))
    assert (out["px_sum"], out["px_min"], out["px_max"]) == (100, 10, 40)


def test_png_average_mod256_wraparound():
    # regression for deferred-mod bugs: Sub filter pushing a byte past 255
    # (raw [200, 100]: filtered [200, 156] since 100-200 = -100 = 156 mod 256)
    # then row1 Average reads the REDUCED 100, not 356
    # row1 raw [130, 228]: f(0) = 130 - floor((0+200)/2) = 30,
    #                      f(1) = 228 - floor((130+100)/2) = 113
    out = mc.parse_png(_hand_png(2, 2, bytes([1, 200, 156, 3, 30, 113])))
    assert (out["px_sum"], out["px_min"], out["px_max"]) == (200 + 100 + 130 + 228, 100, 228)


# ---------------------------------------------------------------------------
# round-trips, RGB, errors
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters_gray(ftype):
    px = ((np.arange(11 * 7) * 37 + ftype) % 256).astype(np.uint8).reshape(7, 11)
    out = mc.parse_png(mc.encode_png(px, filter_type=ftype))
    assert out["width"] == 11 and out["height"] == 7 and out["color_type"] == 0
    assert out["px_sum"] == int(px.astype(np.int64).sum())
    assert out["px_min"] == int(px.min()) and out["px_max"] == int(px.max())


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters_rgb(ftype):
    px = ((np.arange(5 * 4 * 3) * 91 + ftype * 7) % 256).astype(np.uint8).reshape(4, 5, 3)
    out = mc.parse_png(mc.encode_png(px, filter_type=ftype))
    assert out["color_type"] == 2 and out["n_px"] == 60
    assert out["px_sum"] == int(px.astype(np.int64).sum())


def test_png_crc_corruption_detected():
    b = bytearray(mc.encode_png(np.full((2, 2), 7, dtype=np.uint8)))
    b[20] ^= 0xFF  # flip a byte inside IHDR without fixing its CRC
    with pytest.raises(ValueError, match="CRC"):
        mc.parse_png(bytes(b))


def test_png_bad_signature_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        mc.parse_png(b"JFIF" + b"\0" * 20)
    # 16-bit depth is honestly unsupported, not silently wrong
    ihdr16 = _hand_png(1, 1, bytes([0, 1, 2]), bit_depth=16)
    with pytest.raises(NotImplementedError):
        mc.parse_png(ihdr16)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_hand_bytes():
    # two mono PCM16 samples: 1000, -2000 @ 8 kHz, hand-assembled RIFF
    data = struct.pack("<hh", 1000, -2000)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 4) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    out = mc.parse_wav(wav)
    assert out == {
        "sample_rate": 8000, "n_channels": 1, "bits_per_sample": 16,
        "n_samples": 2, "peak_abs": 2000, "sum_abs": 3000,
    }


def test_wav_unknown_chunk_skipped_and_padding():
    # odd-length LIST chunk before data must be skipped with word alignment
    data = struct.pack("<h", -5)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 3) + b"abc" + b"\0"  # pad byte
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 2) + data
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert mc.parse_wav(wav)["sum_abs"] == 5


def test_wav_roundtrip_stereo():
    s = (((np.arange(40) * 13) % 4001) - 2000).astype(np.int16)
    out = mc.parse_wav(mc.encode_wav(s, 44100, n_channels=2))
    assert out["n_samples"] == 20 and out["n_channels"] == 2
    assert out["sum_abs"] == int(np.abs(s.astype(np.int64)).sum())


def test_wav_non_pcm_rejected():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", 0)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        mc.parse_wav(wav)


# ---------------------------------------------------------------------------
# distributed decode (mapInPandas + binaryFile source)
# ---------------------------------------------------------------------------


def test_decode_png_distributed(spark):
    rows = []
    for k in range(24):
        px = ((np.arange(6 * 4) + k) % 256).astype(np.uint8).reshape(4, 6)
        rows.append((k, bytearray(mc.encode_png(px, filter_type=k % 5))))
    df = spark.createDataFrame(rows, "id long, payload binary").repartition(4)
    out = {r["id"]: r for r in mc.decode_png(df).collect()}
    assert len(out) == 24
    for k in range(24):
        px = ((np.arange(24) + k) % 256).astype(np.int64)
        assert out[k]["px_sum"] == int(px.sum())


def test_decode_wav_via_binaryfile_source(spark, tmp_path):
    import os

    for k in range(6):
        s = (((np.arange(30) * 7 + k) % 4001) - 2000).astype(np.int16)
        with open(tmp_path / f"{k}.wav", "wb") as fh:
            fh.write(mc.encode_wav(s, 16000))
    from pyspark.sql import functions as F

    payloads = (
        spark.read.format("binaryFile")
        .load(str(tmp_path))
        .select(
            F.regexp_extract("path", r"(\d+)\.wav$", 1).cast("long").alias("id"),
            F.col("content").alias("payload"),
        )
    )
    out = mc.decode_wav(payloads).collect()
    assert len(out) == 6 and all(r["n_samples"] == 30 for r in out)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp_hand_bytes():
    # 2x1 RGB: pixels (10,20,30), (40,50,60); BMP stores BGR bottom-up with
    # row padding to 4 bytes (2*3=6 -> pad 2)
    row = bytes([30, 20, 10, 60, 50, 40, 0, 0])
    info = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(row), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(row), 0, 0, 54)
    out = mc.parse_bmp(hdr + info + row)
    assert (out["width"], out["height"], out["n_px"]) == (2, 1, 6)
    assert (out["px_sum"], out["px_min"], out["px_max"]) == (210, 10, 60)


def test_bmp_roundtrip_and_bottom_up():
    px = ((np.arange(7 * 5 * 3) * 17) % 256).astype(np.uint8).reshape(5, 7, 3)
    out = mc.parse_bmp(mc.encode_bmp(px))
    assert out["px_sum"] == int(px.astype(np.int64).sum())
    assert out["px_min"] == int(px.min()) and out["px_max"] == int(px.max())


def test_bmp_rejects():
    with pytest.raises(ValueError, match="magic"):
        mc.parse_bmp(b"XX" + b"\0" * 60)
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    b = bytearray(mc.encode_bmp(px))
    b[28] = 8  # bpp=8 palette image
    with pytest.raises(NotImplementedError):
        mc.parse_bmp(bytes(b))


# ---------------------------------------------------------------------------
# JPEG header metadata
# ---------------------------------------------------------------------------


def test_jpeg_meta_baseline_and_progressive():
    out = mc.parse_jpeg_meta(mc.encode_jpeg_headers(640, 480, 3))
    assert out == {"precision": 8, "width": 640, "height": 480,
                   "n_components": 3, "progressive": False}
    out = mc.parse_jpeg_meta(mc.encode_jpeg_headers(31, 17, 1, progressive=True))
    assert out["progressive"] is True and out["n_components"] == 1


def test_jpeg_meta_scan_skip_with_stuffing_and_rst():
    # SOF placed AFTER a scan whose bytes contain stuffed 0xFF00 and an RST
    # marker — the skip must not mistake either for a real marker
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sos = seg(0xDA, bytes([1, 1, 0, 0, 63, 0]))
    scan = b"\x12\xff\x00\x34" + b"\xff\xd3" + b"\x56"  # stuffing + RST3
    sof = seg(0xC0, struct.pack(">BHHB", 8, 7, 9, 1) + struct.pack(">BBB", 1, 0x11, 0))
    jpeg = b"\xff\xd8" + sos + scan + sof + b"\xff\xd9"
    out = mc.parse_jpeg_meta(jpeg)
    assert (out["width"], out["height"]) == (9, 7)


def test_jpeg_meta_rejects():
    with pytest.raises(ValueError, match="SOI"):
        mc.parse_jpeg_meta(b"\x89PNG")
    with pytest.raises(ValueError, match="SOF"):
        mc.parse_jpeg_meta(b"\xff\xd8\xff\xd9")


def test_parse_image_dispatch_and_jpeg_refusal():
    px = np.full((2, 2), 9, dtype=np.uint8)
    assert mc.parse_image(mc.encode_png(px))["format"] == "png"
    rgb = np.full((2, 2, 3), 9, dtype=np.uint8)
    assert mc.parse_image(mc.encode_bmp(rgb))["format"] == "bmp"
    with pytest.raises(NotImplementedError, match="entropy"):
        mc.parse_image(mc.encode_jpeg_headers(4, 4))
    with pytest.raises(ValueError, match="magic"):
        mc.parse_image(b"????")


def test_decode_image_mixed_distributed(spark):
    rows = []
    for k in range(16):
        if k % 2:
            px = ((np.arange(3 * 4 * 3) + k) % 256).astype(np.uint8).reshape(4, 3, 3)
            rows.append((k, bytearray(mc.encode_bmp(px))))
        else:
            px = ((np.arange(3 * 4) + k) % 256).astype(np.uint8).reshape(4, 3)
            rows.append((k, bytearray(mc.encode_png(px, filter_type=k % 5))))
    df = spark.createDataFrame(rows, "id long, payload binary").repartition(3)
    out = {r["id"]: r["format"] for r in mc.decode_image(df).collect()}
    assert all(out[k] == ("bmp" if k % 2 else "png") for k in range(16))
