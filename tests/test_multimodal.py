"""Pixel-decode tests for operators/multimodal.py.

The decoders are pinned against INDEPENDENT test-local encoders (written
from the format specs, not by importing the operator's synth closure),
so an encoder/decoder bug pair that round-trips cannot hide: the synth
path is itself decoded and compared to the closed-form pixel formula,
and hand-built payloads (including a top-down BMP, which the synth
never emits) must decode to known tensors.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from air_quality_etl_pipeline_spark.operators.multimodal import (
    decode_image,
    synth_image_payload,
)


def ref_ppm(pix: bytes, w: int, h: int) -> bytes:
    """Independent P6 packer (with a header comment, which the synth
    closure never writes — exercises the decoder's comment handling)."""
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + pix


def ref_bmp(pix: bytes, w: int, h: int, top_down: bool = False) -> bytes:
    """Independent 24-bit BMP packer built from the format spec."""
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        row = bytearray()
        for x in range(w):
            r, g, b = pix[(y * w + x) * 3 : (y * w + x) * 3 + 3]
            row += bytes((b, g, r))
        row += b"\x00" * (stride - w * 3)
        rows.append(bytes(row))
    data = b"".join(rows)
    hdr_h = -h if top_down else h
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, hdr_h, 1, 24, 0, len(data), 0, 0, 0, 0
        )
        + data
    )


def _decode_payloads(spark, payloads):
    df = spark.createDataFrame(
        list(payloads.items()), "doc_id long, payload binary"
    )
    return {
        r["doc_id"]: (r["fmt"], r["width"], r["height"], list(r["pixels"]))
        for r in decode_image(df).collect()
    }


def test_decode_ppm_and_bmp_known_tensor(spark):
    # 3x2 image, distinct per-byte values so any reorder is visible
    w, h = 3, 2
    pix = bytes(range(10, 10 + 3 * w * h))
    got = _decode_payloads(
        spark,
        {
            1: ref_ppm(pix, w, h),
            2: ref_bmp(pix, w, h),               # bottom-up (standard)
            3: ref_bmp(pix, w, h, top_down=True),  # negative-height form
        },
    )
    want = list(pix)
    assert got[1] == ("ppm", w, h, want)
    assert got[2] == ("bmp", w, h, want)
    assert got[3] == ("bmp", w, h, want)


@pytest.mark.parametrize("w", [3, 4, 5, 6])  # stride pads 3,0,1,2 bytes
def test_decode_bmp_every_stride_padding(spark, w):
    h = 3
    pix = bytes((7 * j + 1) % 256 for j in range(3 * w * h))
    got = _decode_payloads(spark, {1: ref_bmp(pix, w, h)})
    assert got[1] == ("bmp", w, h, list(pix))


def test_synth_decodes_to_closed_form(spark):
    ids = [0, 1, 2, 3, 17, 252, 1001]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {
        r["doc_id"]: r
        for r in decode_image(synth_image_payload(df)).collect()
    }
    for i in ids:
        w, h = 8 + i % 9, 8 + i % 7
        r = out[i]
        assert r["fmt"] == ("ppm" if i % 2 == 0 else "bmp")
        assert (r["width"], r["height"]) == (w, h)
        assert list(r["pixels"]) == [
            (i * 7 + j) % 256 for j in range(3 * w * h)
        ]


def test_decode_rejects_unknown_and_compressed(spark):
    from py4j.protocol import Py4JJavaError

    bad = {1: b"\x89PNG\r\n\x1a\nxxxx"}
    with pytest.raises(Exception) as ei:
        _decode_payloads(spark, bad)
    assert isinstance(ei.value, Py4JJavaError) or "magic" in str(ei.value)
    # 8-bit (palette) BMP must raise, not silently misdecode
    hdr = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0
    )
    with pytest.raises(Exception):
        _decode_payloads(spark, {1: hdr + b"\x00" * 16})


@pytest.mark.parametrize(
    "payload",
    [
        b"P6",  # magic only
        b"P6\n100",  # dies mid-first-token
        b"P6\n100 100\n",  # trailing whitespace, maxval missing
        b"P6\n# comment with no newline",  # comment runs off the end
        b"P6\n100 100 ",  # token loop ends exactly at EOF
    ],
)
def test_decode_truncated_ppm_header_raises_not_hangs(spark, payload):
    """Regression (round-8 advisor): the header token loops scanned
    with 'while not payload[pos:pos+1].isspace()' — past the end the
    slice is EMPTY (never whitespace) so a truncated header spun the
    executor task forever instead of raising like every other
    malformed-input path."""
    with pytest.raises(Exception) as ei:
        _decode_payloads(spark, {1: payload})
    assert "truncated PPM header" in str(ei.value)


# ---------------------------------------------------------------------------
# Audio (PCM WAV) decode
# ---------------------------------------------------------------------------

def ref_wav(samples, rate=8000, n_ch=1, extra_chunk=True, odd_meta=False):
    """Independent WAV packer from the RIFF spec: optional metadata
    chunk before data (with an ODD body size, exercising the spec's
    pad byte), interleaved int16 LE data."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, rate, rate * 2 * n_ch, 2 * n_ch, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        meta = b"hello" if odd_meta else b"meta"
        body += b"LIST" + struct.pack("<I", len(meta)) + meta
        if len(meta) % 2:
            body += b"\x00"  # RIFF pad byte (not counted in size)
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_audio_payloads(spark, payloads):
    from air_quality_etl_pipeline_spark.operators.multimodal import (
        decode_audio,
    )

    df = spark.createDataFrame(
        list(payloads.items()), "doc_id long, payload binary"
    )
    return {
        r["doc_id"]: (
            r["sample_rate"],
            r["n_channels"],
            list(r["samples"]),
        )
        for r in decode_audio(df).collect()
    }


def test_decode_wav_known_samples(spark):
    smp = [0, 1, -1, 32767, -32768, 12345, -12345]
    got = _decode_audio_payloads(
        spark,
        {
            1: ref_wav(smp),
            2: ref_wav(smp, rate=44100, extra_chunk=False),
            3: ref_wav(smp + [7], n_ch=2),       # stereo interleaved
            4: ref_wav(smp, odd_meta=True),       # odd-size chunk pad
        },
    )
    assert got[1] == (8000, 1, smp)
    assert got[2] == (44100, 1, smp)
    assert got[3] == (8000, 2, smp + [7])
    assert got[4] == (8000, 1, smp)


def test_synth_audio_decodes_to_closed_form(spark):
    from air_quality_etl_pipeline_spark.operators.multimodal import (
        decode_audio,
        synth_audio_payload,
    )

    ids = [0, 1, 2, 127, 128, 1001]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {
        r["doc_id"]: r
        for r in decode_audio(synth_audio_payload(df)).collect()
    }
    for i in ids:
        n = 256 + i % 128
        r = out[i]
        assert r["sample_rate"] == 8000 + (i % 3) * 4000
        assert r["n_channels"] == 1
        assert list(r["samples"]) == [
            ((i * 13 + j * 7) % 65536) - 32768 for j in range(n)
        ]


def test_decode_audio_rejects_compressed_and_foreign(spark):
    # mu-law (fmt 7) must raise, not silently misdecode
    smp = [1, 2, 3]
    data = b"".join(struct.pack("<h", s) for s in smp)
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    bad = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(Exception):
        _decode_audio_payloads(spark, {1: bad})
    with pytest.raises(Exception):
        _decode_audio_payloads(spark, {1: b"OggS" + b"\x00" * 32})


# ---------------------------------------------------------------------------
# Video (RIFF/AVI) decode
# ---------------------------------------------------------------------------

def ref_avi(frames_rgb, w, h, declared_frames=None, compression=0):
    """Independent RIFF/AVI packer from the spec: hdrl LIST with
    avih/strh/strf, a JUNK chunk, movi LIST of bottom-up BGR padded
    DIB frames, idx1 index. frames_rgb = list of flat top-down RGB
    tensors. declared_frames lets a test lie in avih to exercise the
    parser's frame-count cross-check."""
    stride = (w * 3 + 3) // 4 * 4
    dibs = []
    for rgb in frames_rgb:
        rows = []
        for y in range(h - 1, -1, -1):
            row = bytearray()
            for x in range(w):
                r, g, b = rgb[3 * (y * w + x): 3 * (y * w + x) + 3]
                row += bytes((b, g, r))
            row += b"\x00" * (stride - 3 * w)
            rows.append(bytes(row))
        dibs.append(b"".join(rows))
    n = len(dibs) if declared_frames is None else declared_frames

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<IIIIIIIIIIIIII", 40000, 0, 0, 0x10, n, 0, 1,
        stride * h, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vidsDIB "
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, 25, 0, n,
                      stride * h, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, stride * h,
        0, 0, 0, 0,
    )
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih) + strl)
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00db", d) for d in dibs))
    idx1 = chunk(b"idx1", b"".join(
        b"00db" + struct.pack("<III", 0x10, 4, len(d)) for d in dibs
    ))
    body = b"AVI " + hdrl + chunk(b"JUNK", b"\x00" * 6) + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _video_frames(spark, payloads, stride=1):
    from air_quality_etl_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    df = spark.createDataFrame(
        list(payloads.items()), "doc_id long, payload binary"
    )
    out = {}
    for r in sample_frames(df, stride=stride).collect():
        out.setdefault(r["doc_id"], {})[r["frame_idx"]] = list(r["pixels"])
    return out


def test_avi_decode_known_tensor_from_independent_packer(spark):
    """Hand-built AVI (independent packer, odd width -> real stride
    padding, odd JUNK size -> pad byte) decodes to the exact tensors."""
    w, h = 5, 3
    f0 = list(range(3 * w * h))  # 0..44: distinct per position
    f1 = [(200 + j) % 256 for j in range(3 * w * h)]
    got = _video_frames(spark, {7: ref_avi([f0, f1], w, h)})
    assert got == {7: {0: f0, 1: f1}}


def test_avi_meta_reports_parsed_headers(spark):
    from air_quality_etl_pipeline_spark.operators.multimodal import (
        decode_meta,
    )

    w, h = 6, 4
    payload = ref_avi([[0] * (3 * w * h)] * 5, w, h)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    r = decode_meta(df).collect()[0]
    assert (r["width"], r["height"], r["n_frames"]) == (w, h, 5)
    assert r["byte_len"] == len(payload)


def test_avi_frame_sampling_stride(spark):
    w, h = 4, 2
    frames = [[(f * 10 + j) % 256 for j in range(3 * w * h)] for f in range(7)]
    got = _video_frames(spark, {1: ref_avi(frames, w, h)}, stride=3)
    assert sorted(got[1]) == [0, 3, 6]
    assert got[1][3] == frames[3]


def test_avi_rejects_malformed(spark):
    w, h = 4, 2
    f = [[0] * (3 * w * h)]
    good = ref_avi(f, w, h)
    bad = {
        "magic": b"RIFX" + good[4:],
        "not_avi": good[:8] + b"WAVE" + good[12:],
        # avih declares 3 frames, movi carries 1
        "count": ref_avi(f, w, h, declared_frames=3),
        # compressed stream (biCompression != 0)
        "compressed": ref_avi(f, w, h, compression=1),
        # RIFF size runs past the payload end
        "truncated": good[:4] + struct.pack("<I", len(good) + 50) + good[8:],
    }
    for name, payload in bad.items():
        df = spark.createDataFrame(
            [(1, payload)], "doc_id long, payload binary"
        )
        from air_quality_etl_pipeline_spark.operators.multimodal import (
            decode_meta,
        )

        with pytest.raises(Exception):
            decode_meta(df).collect()


def test_avi_synth_decodes_to_closed_form(spark):
    """The synth path itself decodes back to the documented closed
    form — packer and parser cannot share a hidden convention bug."""
    from air_quality_etl_pipeline_spark.operators.multimodal import (
        synth_video_payload,
    )

    ids = [0, 1, 2, 3, 4, 11, 123]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in synth_video_payload(df).collect()
    }
    got = _video_frames(spark, payloads, stride=1)
    for i in ids:
        w, h, n = 8 + i % 5, 6 + i % 4, 2 + i % 9
        stride = (w * 3 + 3) // 4 * 4
        assert len(payloads[i]) == 244 + n * (24 + stride * h)
        assert sorted(got[i]) == list(range(n))
        for fidx in range(n):
            want = [(i * 7 + fidx * 11 + j) % 256 for j in range(3 * w * h)]
            assert got[i][fidx] == want
