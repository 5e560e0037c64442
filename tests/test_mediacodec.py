"""From-scratch PNG/WAV codecs + the real media feature operators."""
import struct
import zlib

import numpy as np
import pytest

from oroch_spark.operators import mediacodec as mc
from oroch_spark.operators import multimodal


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def test_png_roundtrip_shapes():
    rng = np.random.default_rng(0)
    for shape in [(1, 1), (5, 7), (16, 16, 3), (9, 4, 4), (3, 3, 2),
                  (64, 3), (2, 33, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        back = mc.png_decode(mc.png_encode(img))
        assert back.shape == img.shape
        assert np.array_equal(back, img), shape


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Assemble a PNG whose scanlines use the GIVEN filter types, by
    applying the spec's forward filters (RFC 2083 §6) — exercises the
    decoder's unfilter paths our encoder (always 0) never emits."""
    a = img if img.ndim == 3 else img[:, :, None]
    h, w, c = a.shape
    stride = w * c
    flat = a.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y]
        up = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        line = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            left = cur[x - c] if x >= c else 0
            ul = int(up[x - c]) if x >= c else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - left
            elif f == 2:
                v = cur[x] - up[x]
            elif f == 3:
                v = cur[x] - ((left + int(up[x])) >> 1)
            else:
                v = cur[x] - mc._paeth(int(left), int(up[x]), ul)
            line[x] = v & 0xFF
        out.append(f)
        out.extend(line.astype(np.uint8).tobytes())

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (mc._PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(filters):
    rng = np.random.default_rng(sum(filters) + 1)
    for shape in [(6, 5), (7, 9, 3), (5, 4, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        payload = _png_with_filters(img, filters)
        assert np.array_equal(mc.png_decode(payload), img), \
            (filters, shape)


def test_png_rejects_garbage_and_out_of_scope():
    with pytest.raises(ValueError):
        mc.png_decode(b"not a png at all")
    # 16-bit depth is declared out of scope, loudly
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    body = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    with pytest.raises(NotImplementedError):
        mc.png_decode(mc._PNG_SIG + body)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def test_wav_roundtrip_mono_stereo():
    rng = np.random.default_rng(1)
    for ch in (1, 2):
        shape = (500,) if ch == 1 else (500, 2)
        s = rng.integers(-32768, 32767, shape).astype(np.int16)
        back, rate = mc.wav_decode(mc.wav_encode(s, 22050))
        assert rate == 22050 and back.shape == (500, ch)
        exp = s[:, None] if s.ndim == 1 else s
        assert np.array_equal(back, exp.astype(np.int32))


def test_wav_8bit_and_rejects():
    # hand-build an 8-bit PCM file: 4 samples, recentered on decode
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([128, 255, 0, 128])
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    samples, rate = mc.wav_decode(wav)
    assert rate == 8000
    assert samples[:, 0].tolist() == [0, 127, -128, 0]
    with pytest.raises(ValueError):
        mc.wav_decode(b"RIFFxxxxNOPE")


# ---------------------------------------------------------------------------
# Spark operators over real payloads
# ---------------------------------------------------------------------------

def test_image_features_real_png(spark):
    media = multimodal.synthetic_png_media(spark, n=12, seed=3)
    got = {r.media_id: r
           for r in multimodal.image_features(media).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(got) == 12
    for mid, r in got.items():
        img = mc.png_decode(src[mid].payload)
        a = img if img.ndim == 3 else img[:, :, None]
        assert (r.width, r.height) == (a.shape[1], a.shape[0])
        assert r.channels == a.shape[2]
        exp_mean = a.reshape(-1, a.shape[2]).astype(np.float64) \
            .mean(axis=0)
        np.testing.assert_allclose(r.mean, exp_mean, rtol=1e-5)
        assert len(r.std) == a.shape[2]


def test_image_features_non_png_null(spark):
    media = multimodal.synthetic_media(spark, n=5)  # random bytes
    rows = multimodal.image_features(media).collect()
    assert len(rows) == 5
    assert all(r.width is None and r.mean is None for r in rows)
    assert all(r.n_bytes > 0 for r in rows)


def test_audio_features_real_wav(spark):
    media = multimodal.synthetic_wav_media(spark, n=8, seed=5)
    got = {r.media_id: r
           for r in multimodal.audio_features(media).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(got) == 8
    for mid, r in got.items():
        samples, rate = mc.wav_decode(src[mid].payload)
        assert r.sample_rate == rate
        assert r.channels == samples.shape[1]
        # sine waves: duration matches the metadata and rms is ~A/√2
        assert abs(r.duration_ms - src[mid].duration_ms) <= 1
        assert r.rms > 0 and 0 < r.zero_cross_rate < 1


# ---------------------------------------------------------------------------
# Y4M video + resize
# ---------------------------------------------------------------------------

def test_y4m_roundtrip_and_sampling():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (13, 6, 8), dtype=np.uint8)
    payload = mc.y4m_encode(frames, rate=(30, 1))
    back, rate = mc.y4m_decode(payload)
    assert rate == (30, 1)
    assert np.array_equal(back, frames)
    sampled, _ = mc.y4m_decode(payload, every=5)
    assert np.array_equal(sampled, frames[::5])
    capped, _ = mc.y4m_decode(payload, every=1, max_frames=4)
    assert np.array_equal(capped, frames[:4])
    with pytest.raises(ValueError):
        mc.y4m_decode(b"MPEG4...nope")


def test_resize_primitives():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    up = mc.resize_nearest(img, 16, 24)
    assert up.shape == (16, 24, 3)
    assert np.array_equal(up[::2, ::2], img)     # exact 2x nearest
    down = mc.downscale_area(img, 2)
    assert down.shape == (4, 6, 3)
    exp = np.round(img.reshape(4, 2, 6, 2, 3).astype(np.float64)
                   .mean(axis=(1, 3))).astype(np.uint8)
    assert np.array_equal(down, exp)
    grey = rng.integers(0, 256, (9, 9), dtype=np.uint8)
    assert mc.resize_nearest(grey, 3, 3).shape == (3, 3)
    assert mc.downscale_area(grey, 3).shape == (3, 3)


def test_video_frame_features_real_y4m(spark):
    media = multimodal.synthetic_y4m_media(spark, n=6, seed=9)
    got = {r.media_id: r
           for r in multimodal.video_frame_features(
               media, every=5, max_frames=4).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(got) == 6
    for mid, r in got.items():
        frames, (fn, fd) = mc.y4m_decode(src[mid].payload, every=5,
                                         max_frames=4)
        assert (r.width, r.height) == (src[mid].width, src[mid].height)
        assert r.n_frames_sampled == len(frames)
        assert r.fps == fn / fd
        np.testing.assert_allclose(
            r.frame_means,
            frames.astype(np.float64).mean(axis=(1, 2)), rtol=1e-5)
        assert r.motion > 0  # the gradient moves every frame


def test_resize_images_operator(spark):
    media = multimodal.synthetic_png_media(spark, n=8, seed=11)
    out = {r.media_id: r
           for r in multimodal.resize_images(media, 6, 6).collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(out) == 8
    for mid, r in out.items():
        assert (r.width, r.height) == (6, 6)
        resized = mc.png_decode(r.payload)
        exp = mc.resize_nearest(mc.png_decode(src[mid].payload), 6, 6)
        assert np.array_equal(resized, exp)   # re-encode is lossless
    # non-PNG rows pass through untouched
    junk = multimodal.synthetic_media(spark, n=3)
    rows = multimodal.resize_images(junk, 6, 6).collect()
    assert all(r.width is None for r in rows)
    exp_pay = {r.media_id: bytes(r.payload) for r in junk.collect()}
    assert all(bytes(r.payload) == exp_pay[r.media_id] for r in rows)


# ---------------------------------------------------------------------------
# JPEG (from-scratch baseline codec)
# ---------------------------------------------------------------------------

def _smooth_rgb(h=48, w=40):
    yy = np.linspace(0, 255, h)
    xx = np.linspace(0, 255, w)
    base = np.add.outer(yy, xx) / 2
    return np.clip(np.stack([base, base[::-1], 255 - base], axis=2),
                   0, 255).astype(np.uint8)


def test_jpeg_q100_near_lossless():
    """Quality 100 makes every quant step 1 — the only loss is DCT
    rounding, bounded by a couple of levels."""
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    out = mc.jpeg_decode(mc.jpeg_encode(gray, quality=100))
    assert out.shape == gray.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - gray.astype(int)).max() <= 2
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = mc.jpeg_decode(mc.jpeg_encode(rgb, quality=100,
                                        subsample="444"))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_jpeg_subsampling_roundtrip(sub):
    """All three sampling layouts decode through the generic MCU walk;
    smooth content keeps subsampled chroma accurate."""
    img = _smooth_rgb()
    out = mc.jpeg_decode(mc.jpeg_encode(img, quality=85, subsample=sub))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() <= 12


def test_jpeg_odd_dimensions_crop():
    img = _smooth_rgb()[:37, :29]
    out = mc.jpeg_decode(mc.jpeg_encode(img, quality=90,
                                        subsample="420"))
    assert out.shape == (37, 29, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_jpeg_restart_intervals_bit_equivalent():
    """DRI/RSTn structure must not change decoded pixels: same image,
    any restart interval, identical output (DC predictors reset at
    each RST on both sides)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    base = mc.jpeg_decode(mc.jpeg_encode(img, quality=95,
                                         subsample="420"))
    for r in (1, 3, 7):
        b = mc.jpeg_encode(img, quality=95, subsample="420", restart=r)
        assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))
        assert np.array_equal(mc.jpeg_decode(b), base)


def test_jpeg_rejects_out_of_scope():
    with pytest.raises(ValueError):
        mc.jpeg_decode(b"definitely not a jpeg")
    good = bytearray(mc.jpeg_encode(np.zeros((8, 8), dtype=np.uint8)))
    i = good.find(b"\xff\xc0")
    # a baseline file rebranded SOF2 is ILLEGAL progressive syntax
    # (one scan with Ss=0, Se=63) — progressive itself is supported
    prog = bytes(good[:i + 1]) + b"\xc2" + bytes(good[i + 2:])
    with pytest.raises(ValueError, match="Ss=0"):
        mc.jpeg_decode(prog)
    lossless = bytes(good[:i + 1]) + b"\xc3" + bytes(good[i + 2:])
    with pytest.raises(NotImplementedError):
        mc.jpeg_decode(lossless)  # SOF3 lossless stays out of scope


def test_jpeg_decoder_uses_file_tables():
    """The decoder must dequantize with the FILE's tables, not
    constants: doubling the DQT table in the bytestream changes the
    decoded pixels predictably (2x the AC energy around the mean)."""
    img = _smooth_rgb(16, 16)[:, :, 0]
    b = bytearray(mc.jpeg_encode(img, quality=50))
    i = b.find(b"\xff\xdb")
    # DQT body: len(2) + id(1) + 64 zigzag bytes
    tab = np.frombuffer(bytes(b[i + 5:i + 69]), dtype=np.uint8)
    base = mc.jpeg_decode(bytes(b)).astype(int)
    b[i + 5:i + 69] = bytes(np.minimum(tab.astype(int) * 2, 255)
                            .astype(np.uint8))
    doubled = mc.jpeg_decode(bytes(b)).astype(int)
    assert not np.array_equal(base, doubled)
    # energy around the per-image mean roughly doubles
    e0 = np.abs(base - base.mean()).sum()
    e1 = np.abs(doubled - doubled.mean()).sum()
    assert e1 > 1.5 * e0


def test_image_decode_dispatch():
    img = _smooth_rgb(12, 12)
    assert mc.image_decode(mc.png_encode(img)).shape == (12, 12, 3)
    assert mc.image_decode(
        mc.jpeg_encode(img, quality=95)).shape == (12, 12, 3)
    with pytest.raises(ValueError):
        mc.image_decode(b"GIF89a...")


def test_image_features_real_jpeg(spark):
    """image_features computes genuine stats from decoded JPEG pixels:
    matches a local decode of the same payloads."""
    df = multimodal.synthetic_jpeg_media(spark, n=10)
    pdf = multimodal.image_features(df).toPandas() \
        .set_index("media_id").sort_index()
    rows = df.select("media_id", "payload").collect()
    assert pdf["width"].notna().all()
    for r in rows:
        img = mc.image_decode(bytes(r.payload))
        if img.ndim == 2:
            img = img[:, :, None]
        got = pdf.loc[r.media_id]
        assert (got["height"], got["width"]) == img.shape[:2]
        assert got["channels"] == img.shape[2]
        exp = img.reshape(-1, img.shape[2]).astype(np.float64).mean(axis=0)
        assert np.allclose(np.array(got["mean"]), exp, atol=1e-3)


def test_resize_images_jpeg_payloads(spark):
    """resize_images re-encodes JPEG payloads as JPEG (source format
    preserved) and the resized pixels decode to the target shape."""
    df = multimodal.synthetic_jpeg_media(spark, n=6)
    out = multimodal.resize_images(df, 8, 8).toPandas()
    assert (out["width"] == 8).all() and (out["height"] == 8).all()
    for p in out["payload"]:
        b = bytes(p)
        assert b[:2] == b"\xff\xd8"
        assert mc.image_decode(b).shape[:2] == (8, 8)


# ---------------------------------------------------------------------------
# AVI / Motion-JPEG + media probes
# ---------------------------------------------------------------------------

def _avi_fixture(n=8, h=24, w=32, q=92):
    yy = np.linspace(0, 255, h)
    xx = np.linspace(0, 255, w)
    base = np.add.outer(yy, xx) / 2
    frames = np.stack([
        np.clip(np.stack([base + 5 * t, base[::-1], 255 - base],
                         axis=2), 0, 255).astype(np.uint8)
        for t in range(n)])
    return frames, mc.avi_mjpeg_encode(frames, rate=(30, 1), quality=q)


def test_avi_mjpeg_roundtrip_and_sampling():
    frames, avi = _avi_fixture()
    luma, rate = mc.avi_mjpeg_decode(avi)
    assert luma.shape == (8, 24, 32) and rate == (30, 1)
    exp = np.stack([mc._rgb_to_luma(f) for f in frames])
    assert np.abs(luma.astype(int) - exp.astype(int)).mean() < 2.0
    # frame sampling: every 3rd, capped — identical to slicing the
    # full decode (the skipped chunks are never JPEG-decoded)
    part, _ = mc.avi_mjpeg_decode(avi, every=3, max_frames=2)
    assert np.array_equal(part, luma[::3][:2])
    with pytest.raises(ValueError):
        mc.avi_mjpeg_decode(b"RIFFxxxxWAVE")


def test_video_decode_dispatch():
    frames, avi = _avi_fixture(n=4)
    exp = np.stack([mc._rgb_to_luma(f) for f in frames])
    y4m = mc.y4m_encode(exp, rate=(30, 1))
    a, _ = mc.video_decode(avi)
    b, _ = mc.video_decode(y4m)
    assert a.shape == b.shape == (4, 24, 32)
    assert np.array_equal(b, exp)          # Y4M luma is lossless
    with pytest.raises(ValueError):
        mc.video_decode(b"\x00\x01\x02")


def _mp4_fixture(duration_ms=5500, w=640, h=360, codec=b"avc1"):
    import struct as st

    def box(t, body):
        return st.pack(">I", 8 + len(body)) + t + body

    # spec-layout v0 boxes (ISO 14496-12): mvhd = ver/flags(4) +
    # ctime(4) + mtime(4) + timescale(4) + duration(4) + rest;
    # tkhd = ver/flags(4) + ctime(4)+mtime(4)+track_id(4)+reserved(4)
    # + duration(4) + reserved[8] + layer/alt/vol/reserved(8) +
    # matrix(36) + width/height (16.16 fixed)
    mvhd = box(b"mvhd", bytes(4) + bytes(8)
               + st.pack(">II", 1000, duration_ms) + bytes(80))
    tkhd = box(b"tkhd", bytes(4) + bytes(20) + bytes(8)
               + st.pack(">HHHH", 0, 0, 0, 0) + bytes(36)
               + st.pack(">II", w << 16, h << 16))
    stsd = box(b"stsd", bytes(4) + st.pack(">I", 1)
               + box(codec, bytes(70)))
    mdia = box(b"mdia", box(b"minf", box(b"stbl", stsd)))
    return (box(b"ftyp", b"isom" + bytes(8))
            + box(b"moov", mvhd + box(b"trak", tkhd + mdia)))


def test_mp4_probe():
    p = mc.mp4_probe(_mp4_fixture())
    assert p["brand"] == "isom" and p["duration_ms"] == 5500
    assert p["tracks"] == [
        {"codec": "avc1", "width": 640, "height": 360}]
    with pytest.raises(ValueError):
        mc.mp4_probe(b"not an mp4 at all!")


def test_media_probe_all_formats():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
    gray = img[:, :, 0]
    probes = {
        "png": mc.media_probe(mc.png_encode(img)),
        "jpeg": mc.media_probe(mc.jpeg_encode(img, quality=90)),
        "wav": mc.media_probe(mc.wav_encode(
            np.zeros(16000, dtype=np.int16), 16000)),
        "y4m": mc.media_probe(mc.y4m_encode(
            np.stack([gray[:12, :20]] * 5), rate=(25, 1))),
        "avi": mc.media_probe(_avi_fixture(n=6)[1]),
        "mp4": mc.media_probe(_mp4_fixture()),
    }
    assert probes["png"] == {"container": "png", "kind": "image",
                             "width": 20, "height": 12,
                             "duration_ms": None, "codec": "png8c2",
                             "n_frames": None}
    assert (probes["jpeg"]["width"], probes["jpeg"]["height"]) == (20, 12)
    assert probes["jpeg"]["codec"] == "jpeg-baseline"
    assert probes["wav"]["duration_ms"] == 1000
    assert probes["y4m"]["n_frames"] == 5
    assert probes["y4m"]["duration_ms"] == 200
    assert probes["avi"]["n_frames"] == 6 and probes["avi"]["codec"] \
        == "mjpeg"
    assert probes["mp4"]["codec"] == "avc1"
    assert probes["mp4"]["duration_ms"] == 5500
    with pytest.raises(ValueError):
        mc.media_probe(b"GIF89a nope")


def test_video_frame_features_avi(spark):
    df = multimodal.synthetic_avi_media(spark, n=4)
    got = multimodal.video_frame_features(df, every=2, max_frames=8) \
        .toPandas().set_index("media_id").sort_index()
    assert got["n_frames_sampled"].notna().all()
    rows = df.select("media_id", "payload").collect()
    for r in rows:
        luma, (fn, fd) = mc.video_decode(bytes(r.payload), every=2,
                                         max_frames=8)
        g = got.loc[r.media_id]
        assert g["n_frames_sampled"] == len(luma)
        assert np.allclose(
            np.array(g["frame_means"]),
            luma.astype(np.float64).mean(axis=(1, 2)), atol=1e-3)


def test_media_metadata_operator(spark):
    """One probe operator over a MIXED table of all six containers."""
    import pyarrow as pa  # noqa: F401  (import parity with operators)

    parts = [
        multimodal.synthetic_png_media(spark, n=3),
        multimodal.synthetic_jpeg_media(spark, n=3),
        multimodal.synthetic_wav_media(spark, n=3),
        multimodal.synthetic_y4m_media(spark, n=3),
        multimodal.synthetic_avi_media(spark, n=3),
    ]
    from pyspark.sql import functions as SF
    dfs = [p.withColumn("media_id",
                        SF.col("media_id") + SF.lit(100 * i))
           for i, p in enumerate(parts)]
    df = dfs[0]
    for d in dfs[1:]:
        df = df.union(d)
    got = multimodal.media_metadata(df).toPandas()
    assert len(got) == 15 and got["container"].notna().all()
    assert set(got["container"]) == {"png", "jpeg", "wav", "y4m", "avi"}
    by_kind = got.groupby("kind").size().to_dict()
    assert by_kind == {"image": 6, "audio": 3, "video": 6}
    # video rows carry real frame counts; audio rows real durations
    vid = got[got["kind"] == "video"]
    assert (vid["n_frames"] > 0).all()
    aud = got[got["kind"] == "audio"]
    assert (aud["duration_ms"] > 0).all()


# ---------------------------------------------------------------------------
# review fixes: non-interleaved JPEG, tkhd v1, Y4M probe exactness
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_jpeg_non_interleaved_scans(sub):
    """Baseline files with one SOS per component (T.81 A.2.2) decode
    bit-identically to the interleaved layout — and combined with
    restart intervals."""
    img = _smooth_rgb(56, 40)
    il = mc.jpeg_decode(mc.jpeg_encode(img, quality=92, subsample=sub))
    b = mc.jpeg_encode(img, quality=92, subsample=sub,
                       interleave=False)
    assert b.count(b"\xff\xda") == 3      # three scans
    assert np.array_equal(mc.jpeg_decode(b), il)
    br = mc.jpeg_encode(img, quality=92, subsample=sub,
                        interleave=False, restart=3)
    assert np.array_equal(mc.jpeg_decode(br), il)


def test_jpeg_gray_with_declared_sampling():
    """A single-component scan walks the COMPONENT's true block
    raster even when the frame declares 2x2 sampling factors (the
    declared factors only matter interleaved)."""
    img = _smooth_rgb(24, 40)[:, :, 0]
    b = bytearray(mc.jpeg_encode(img, quality=100))
    base = mc.jpeg_decode(bytes(b))
    i = b.find(b"\xff\xc0")
    assert b[i + 11] == 0x11              # id(+10) hv(+11)
    b[i + 11] = 0x22                      # declare 2x2 on the lone comp
    patched = mc.jpeg_decode(bytes(b))
    assert np.array_equal(patched, base)


def test_mp4_probe_tkhd_v1():
    import struct as st

    def box(t, body):
        return st.pack(">I", 8 + len(body)) + t + body

    mvhd = box(b"mvhd", b"\x01" + bytes(3) + bytes(16)
               + st.pack(">IQ", 1000, 7250) + bytes(80))
    tkhd = box(b"tkhd", b"\x01" + bytes(3) + bytes(32) + bytes(8)
               + st.pack(">HHHH", 0, 0, 0, 0) + bytes(36)
               + st.pack(">II", 1920 << 16, 1080 << 16))
    stsd = box(b"stsd", bytes(4) + st.pack(">I", 1)
               + box(b"hvc1", bytes(70)))
    mp4 = (box(b"ftyp", b"mp42" + bytes(8))
           + box(b"moov", mvhd + box(b"trak", tkhd + box(
               b"mdia", box(b"minf", box(b"stbl", stsd))))))
    p = mc.mp4_probe(mp4)
    assert p["duration_ms"] == 7250
    assert p["tracks"] == [
        {"codec": "hvc1", "width": 1920, "height": 1080}]


def test_y4m_probe_frame_params_and_chroma_modes():
    """Frame markers may carry parameters and chroma may be
    422/444/mono: the probe walks markers with the exact per-mode
    frame size instead of dividing by a guessed stride."""
    frames = np.stack([np.full((8, 8), v, dtype=np.uint8)
                       for v in (0, 50, 100, 150)])
    y = mc.y4m_encode(frames, rate=(25, 1))
    assert mc.media_probe(y)["n_frames"] == 4
    y_params = y.replace(b"FRAME\n", b"FRAME Ip\n")
    assert mc.media_probe(y_params)["n_frames"] == 4
    luma, _ = mc.y4m_decode(y_params)     # decode tolerates params too
    assert np.array_equal(luma, frames)
    # a 422 stream: decode (luma) and probe agree on the frame count
    h, w = 8, 8
    head = b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C422\n"
    fb = h * w + 2 * h * (w // 2)
    body = b"".join(b"FRAME\n" + bytes([i]) * fb for i in range(3))
    p = mc.media_probe(head + body)
    assert p["n_frames"] == 3 and p["codec"] == "yuv422"
    luma, _ = mc.y4m_decode(head + body)
    assert luma.shape == (3, 8, 8)
    # unknown chroma: header probes, frame count honestly None
    weird = head.replace(b"C422", b"C410") + body
    assert mc.media_probe(weird)["n_frames"] is None


# ---------------------------------------------------------------------------
# MP4 / Motion-JPEG: sample-table demux + real frame decode
# ---------------------------------------------------------------------------

def _mp4_frames(n=8, h=24, w=32):
    yy = np.linspace(0, 255, h)
    xx = np.linspace(0, 255, w)
    base = np.add.outer(yy, xx) / 2
    return np.stack([
        np.clip(np.stack([base + 5 * t, base[::-1], 255 - base],
                         axis=2), 0, 255).astype(np.uint8)
        for t in range(n)])


def test_mp4_mjpeg_roundtrip_and_sampling():
    frames = _mp4_frames()
    mp4 = mc.mp4_mjpeg_encode(frames, rate=(30, 1), quality=92)
    luma, rate = mc.mp4_mjpeg_decode(mp4)
    assert luma.shape == (8, 24, 32) and rate == (30, 1)
    exp = np.stack([mc._rgb_to_luma(f) for f in frames])
    assert np.abs(luma.astype(int) - exp.astype(int)).mean() < 2.0
    part, _ = mc.mp4_mjpeg_decode(mp4, every=3, max_frames=2)
    assert np.array_equal(part, luma[::3][:2])
    with pytest.raises(ValueError):
        mc.mp4_mjpeg_decode(b"\x00\x00\x00\x08free")


def test_mp4_multichunk_stsc_expansion():
    # 8 samples in chunks of 3 -> chunks of (3,3,2): two stsc entries,
    # three stco offsets; decode must reassemble the exact same frames
    frames = _mp4_frames()
    one = mc.mp4_mjpeg_encode(frames, quality=92)
    many = mc.mp4_mjpeg_encode(frames, quality=92, samples_per_chunk=3)
    assert one != many                      # layout genuinely differs
    a, _ = mc.mp4_mjpeg_decode(one)
    b, _ = mc.mp4_mjpeg_decode(many)
    assert np.array_equal(a, b)
    tr = [t for t in mc._mp4_tracks(many) if t["codec"] == b"jpeg"][0]
    assert len(tr["stco"]) == 3 and len(tr["stsc"]) == 2


def test_mp4_probe_and_media_probe_on_real_file():
    frames = _mp4_frames(n=6)
    mp4 = mc.mp4_mjpeg_encode(frames, rate=(30, 1), samples_per_chunk=4)
    p = mc.mp4_probe(mp4)
    assert p["tracks"][0]["codec"] == "jpeg"
    assert p["tracks"][0]["width"] == 32
    assert p["tracks"][0]["height"] == 24
    assert p["duration_ms"] == 200          # 6 frames at 30 fps
    d = mc.media_probe(mp4)
    assert d["container"] == "mp4" and d["kind"] == "video"
    assert d["n_frames"] == 6
    assert d["codec"] == "jpeg"


def test_mp4_non_jpeg_codec_raises_not_implemented():
    frames = _mp4_frames(n=2)
    mp4 = mc.mp4_mjpeg_encode(frames)
    # moov sits after mdat, so the LAST 'jpeg' occurrence is the stsd
    # sample-entry fourcc; rebrand it avc1 to simulate an H.264 track
    i = mp4.rindex(b"jpeg")
    fake = mp4[:i] + b"avc1" + mp4[i + 4:]
    with pytest.raises(NotImplementedError, match="avc1"):
        mc.mp4_mjpeg_decode(fake)


def test_video_decode_dispatch_mp4():
    frames = _mp4_frames(n=4)
    mp4 = mc.mp4_mjpeg_encode(frames, rate=(30, 1), quality=92)
    a, rate = mc.video_decode(mp4, every=2)
    direct, _ = mc.mp4_mjpeg_decode(mp4, every=2)
    assert np.array_equal(a, direct) and rate == (30, 1)


def test_video_frame_features_mp4(spark):
    frames = _mp4_frames(n=6)
    rows = [(i, bytearray(mc.mp4_mjpeg_encode(
        frames[: 3 + (i % 3)], rate=(30, 1), quality=92,
        samples_per_chunk=2))) for i in range(3)]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    got = multimodal.video_frame_features(df, every=2, max_frames=8) \
        .toPandas().set_index("media_id").sort_index()
    for i, payload in rows:
        luma, _ = mc.video_decode(bytes(payload), every=2, max_frames=8)
        g = got.loc[i]
        assert g["n_frames_sampled"] == len(luma)
        assert np.allclose(np.array(g["frame_means"]),
                           luma.astype(np.float64).mean(axis=(1, 2)),
                           atol=1e-3)


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------

def _noisy_gray(h, w, seed=5, sigma=12):
    rng = np.random.default_rng(seed)
    yy = np.linspace(0, 255, h)
    xx = np.linspace(0, 255, w)
    base = np.add.outer(yy, xx) / 2
    return np.clip(base + rng.normal(0, sigma, (h, w)),
                   0, 255).astype(np.uint8)


def test_jpeg_progressive_equals_baseline_gray():
    """Both scan structures reconstruct the SAME quantized coefficient
    matrix, so decoded pixels must be bit-identical — a full check of
    DC/AC first + refinement passes against an independent path."""
    for h, w in [(8, 8), (16, 24), (33, 41)]:
        g = _noisy_gray(h, w)
        a = mc.jpeg_decode(mc.jpeg_encode(g, quality=85))
        b = mc.jpeg_decode(mc.jpeg_encode_progressive(g, quality=85))
        assert np.array_equal(a, b), (h, w)


def test_jpeg_progressive_equals_baseline_color():
    rng = np.random.default_rng(9)
    rgb = np.clip(np.stack([_noisy_gray(32, 45, s) for s in (1, 2, 3)],
                           axis=2) + rng.normal(0, 5, (32, 45, 3)),
                  0, 255).astype(np.uint8)
    for sub in ("444", "422", "420"):
        a = mc.jpeg_decode(mc.jpeg_encode(rgb, quality=80,
                                          subsample=sub))
        b = mc.jpeg_decode(mc.jpeg_encode_progressive(
            rgb, quality=80, subsample=sub))
        assert np.array_equal(a, b), sub


def test_jpeg_progressive_adversarial_content():
    """Content chosen to force every bitstream path: dense noise
    (refinement correction bits + ZRL-in-refine), dark images
    (negative DC chains), checkerboard (pure high-frequency), and
    near-flat blocks (EOBn runs with n >= 1)."""
    rng = np.random.default_rng(13)
    cases = [
        rng.integers(0, 256, (40, 56)).astype(np.uint8),
        rng.integers(0, 30, (24, 88)).astype(np.uint8),
        (np.indices((48, 32)).sum(0) % 2 * 255).astype(np.uint8),
        np.full((64, 64), 130, dtype=np.uint8),
    ]
    cases[3][::16, ::16] = 255               # isolated spikes
    for q in (30, 75, 95, 100):
        for g in cases:
            a = mc.jpeg_decode(mc.jpeg_encode(g, quality=q))
            b = mc.jpeg_decode(mc.jpeg_encode_progressive(g, quality=q))
            assert np.array_equal(a, b), q


def test_jpeg_progressive_is_smaller_with_optimal_tables():
    g = _noisy_gray(64, 64)
    prog = mc.jpeg_encode_progressive(g, quality=85)
    base = mc.jpeg_encode(g, quality=85)
    assert len(prog) < len(base)             # per-scan optimal tables


def test_jpeg_progressive_probe_and_features(spark):
    g = _noisy_gray(24, 24)
    prog = mc.jpeg_encode_progressive(g, quality=90)
    d = mc.media_probe(prog)
    assert d["codec"] == "jpeg-progressive"
    assert (d["width"], d["height"]) == (24, 24)
    # Spark image_features dispatches through the same jpeg_decode
    df = spark.createDataFrame([(1, bytearray(prog))],
                               "media_id: long, payload: binary")
    got = multimodal.image_features(df).collect()[0]
    exp = mc.jpeg_decode(prog)
    assert (got["width"], got["height"]) == (24, 24)
    np.testing.assert_allclose(
        got["mean"], [exp.astype(np.float64).mean()], rtol=1e-5)
