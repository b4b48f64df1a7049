"""Real multimodal decoders: PNG / WAV / RAWV round-trips, all PNG filter
types, and content-derived features (no Spark needed — the codecs are the
pure-python functions the Arrow UDFs call)."""

import struct
import zlib

import numpy as np
import pytest

from apt_bron_re_spark.operators import multimodal as mm


def test_png_roundtrip_none_sub_filters():
    w, h = 9, 6
    pixels = mm._byte_stream("t1", w * h * 3)
    data = mm.png_encode(pixels, w, h)
    rw, rh, c, out = mm.png_decode(data)
    assert (rw, rh, c) == (w, h, 3)
    assert out == pixels          # encoder alternates None/Sub filters


def _png_with_filters(w, h, pixels, filters):
    """Hand-built PNG using one explicit filter type per scanline —
    exercises Up/Average/Paeth, which png_encode doesn't emit."""
    stride = w * 3
    prev = bytearray(stride)
    raw = bytearray()
    for y in range(h):
        row = bytearray(pixels[y * stride:(y + 1) * stride])
        ft = filters[y % len(filters)]
        raw.append(ft)
        enc = bytearray(stride)
        for i in range(stride):
            a = row[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                enc[i] = row[i]
            elif ft == 1:
                enc[i] = (row[i] - a) & 0xFF
            elif ft == 2:
                enc[i] = (row[i] - b) & 0xFF
            elif ft == 3:
                enc[i] = (row[i] - ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                enc[i] = (row[i] - mm._paeth(a, b, c)) & 0xFF
        raw.extend(enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (mm._PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
            + mm._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + mm._png_chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(filters):
    w, h = 7, 10
    pixels = mm._byte_stream(f"t2-{filters}", w * h * 3)
    data = _png_with_filters(w, h, pixels, filters)
    rw, rh, c, out = mm.png_decode(data)
    assert (rw, rh, c) == (w, h, 3)
    assert out == pixels


def test_png_rejects_corruption():
    data = bytearray(mm.png_encode(mm._byte_stream("t3", 4 * 4 * 3), 4, 4))
    with pytest.raises(ValueError):
        mm.png_decode(b"JUNK" + bytes(data))
    data[40] ^= 0xFF               # flip a byte inside a chunk body
    with pytest.raises(ValueError):
        mm.png_decode(bytes(data))  # CRC check must fire


def test_wav_roundtrip_and_stats():
    samples = np.array([0, 1000, -1000, 32767, -32768, 5], dtype="<i2")
    data = mm.wav_encode(samples, sample_rate=4000)
    rate, ch, out = mm.wav_decode(data)
    assert rate == 4000 and ch == 1
    assert np.array_equal(out, samples)
    feat = mm.decode_features(data, "audio")
    assert feat[0] == len(samples) and feat[1] == 4000
    assert feat[4] == pytest.approx(1.0)       # peak == |-32768|/32768


def test_rawv_roundtrip_and_frame_pick():
    frames = [mm._byte_stream(f"fr{i}", 4 * 3 * 3) for i in range(3)]
    data = mm.rawv_encode(frames, 4, 3, fps=2)
    w, h, fps, out = mm.rawv_decode(data)
    assert (w, h, fps) == (4, 3, 2) and out == frames
    with pytest.raises(ValueError):
        mm.rawv_decode(data[:-1])


def test_image_features_match_numpy():
    w, h = 5, 4
    pixels = mm._byte_stream("t4", w * h * 3)
    feat = mm.decode_features(mm.png_encode(pixels, w, h), "image")
    a = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64) / 255.0
    assert feat[:3] == [w, h, 3]
    assert feat[3] == pytest.approx(a.mean())
    assert feat[5] == pytest.approx(a.reshape(-1, 3)[:, 0].mean())


def test_synth_assets_payloads_are_real(spark):
    rows = {r.asset_id: r
            for r in mm.synth_assets(spark, 9).collect()}
    img = rows[0]
    assert bytes(img.payload)[:8] == mm._PNG_SIG
    w, h, _c, _p = mm.png_decode(bytes(img.payload))
    assert (w, h) == (img.meta.width, img.meta.height)
    aud = rows[1]
    rate, _ch, samples = mm.wav_decode(bytes(aud.payload))
    assert aud.meta.duration_ms == int(len(samples) * 1000 / rate)
    vid = rows[2]
    vw, vh, fps, frames = mm.rawv_decode(bytes(vid.payload))
    assert (vw, vh) == (vid.meta.width, vid.meta.height)
    assert vid.meta.duration_ms == int(len(frames) * 1000 / fps)


def test_asset_features_are_content_derived(spark):
    feats = {r.asset_id: r
             for r in mm.asset_features(mm.synth_assets(spark, 9)).collect()}
    assert all(r.err is None for r in feats.values())
    # recompute one image feature independently of the Spark path
    a0 = mm.make_asset(0)
    want = mm.decode_features(a0[2], "image")
    assert feats[0].feature == pytest.approx(want, rel=1e-6)


def test_gold_png_second_decoder_differential():
    """Round-5 verdict #4: the gold generator's independent PNG decoder
    (stdlib zlib + scalar per-spec unfilter) must agree byte-for-byte
    with the operator decoder on the asset corpus — a bug in either
    implementation surfaces here instead of propagating into the gold."""
    import importlib.util as iu
    from pathlib import Path
    spec = iu.spec_from_file_location(
        "gen_gold_mod",
        Path(__file__).resolve().parents[1]
        / "scripts" / "gen_multimodal_gold.py")
    g = iu.module_from_spec(spec)
    spec.loader.exec_module(g)
    n_img = 0
    for i in range(60):
        _aid, kind, payload, _meta = mm.make_asset(i)
        if kind != "image":
            continue
        n_img += 1
        assert g._gold_png_decode(payload) == mm.png_decode(payload)
        assert (g._gold_image_features(payload)
                == mm.decode_features(payload, "image"))
    assert n_img >= 10  # the corpus mixes kinds; make sure we covered PNGs
