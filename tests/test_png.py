"""Stdlib PNG codec: the image sibling of the r4 wav_features tests
(r4 VERDICT item 4). Every test here runs the REAL decode path — no
importorskip, no stub — because _png_decode is pure zlib/struct/numpy.
The previously PIL-gated integration tests keep their skips for exotic
formats; these are their non-skipped stdlib siblings."""

import hashlib

import numpy as np
import pytest

from qamd_spark.ops import multimodal as mm


def _expected_pixels(i: int, seed: int = 11) -> np.ndarray:
    """Closed-form recomputation of synth_png_media's planted patterns
    (independent of the encoder — the golden, not a round-trip)."""
    w = 8 + (i * 3 + seed) % 25
    h = 8 + (i * 5 + seed) % 17
    nch = 1 + i % 4
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255) // max(w - 1, 1) if i % 2 == 0 else (
        ((xx // 4 + yy // 4) % 2) * 255
    )
    return np.stack(
        [(base + 31 * c + i) % 256 for c in range(nch)], axis=2
    ).astype(np.uint8)


def test_png_roundtrip_all_ctypes_and_filters():
    """encode→decode is the identity for every color type × every
    scanline filter (incl. mixed per-row filters), so all five
    reconstruction branches (None/Sub/Up/Average/Paeth, PNG spec §9)
    are exercised against a real encoder."""
    rng = np.random.RandomState(3)
    for nch in (1, 2, 3, 4):
        for filters in (None, [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            a = rng.randint(0, 256, (13, 7, nch)).astype(np.uint8)
            b = mm._png_decode(mm._png_encode(a, row_filters=filters))
            assert b.shape == (13, 7, nch)
            assert (a == b).all(), (nch, filters)
    # 2-D grayscale input round-trips as (h, w, 1)
    g = rng.randint(0, 256, (5, 9)).astype(np.uint8)
    assert (mm._png_decode(mm._png_encode(g))[:, :, 0] == g).all()
    # 1×1 and single-row/column edge shapes
    for shape in ((1, 1, 3), (1, 17, 1), (23, 1, 4)):
        a = rng.randint(0, 256, shape).astype(np.uint8)
        assert (mm._png_decode(mm._png_encode(a, row_filters=[4])) == a).all()


def test_png_decode_rejects_exotic_and_corrupt():
    import struct
    import zlib

    a = np.zeros((4, 4, 3), dtype=np.uint8)
    good = mm._png_encode(a)
    with pytest.raises(ValueError, match="not a PNG"):
        mm._png_decode(b"GIF89a" + good[6:])
    with pytest.raises(ValueError):
        mm._png_decode(good[:20])  # truncated mid-chunk
    # palette (ctype 3), 16-bit, interlaced: flagged unsupported, not
    # misdecoded — these stay on the PIL-gated path

    def rebuild(depth, ctype, interlace):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0, interlace)
        chunk = (
            struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )
        return good[:8] + chunk + good[8 + 12 + 13 :]

    for depth, ctype, interlace in ((8, 3, 0), (16, 2, 0), (8, 2, 1)):
        with pytest.raises(ValueError, match="unsupported PNG"):
            mm._png_decode(rebuild(depth, ctype, interlace))
    # corrupt zlib stream surfaces as an exception, not garbage pixels
    with pytest.raises(Exception):
        mm._png_decode(good[:-30] + bytes(30))


def test_png_profile_closed_form_goldens(spark):
    """Dimensions, exact channel means (int sum + one IEEE division),
    and the planted-gradient pixel hash must match the closed-form
    recomputation of the synthesis arithmetic; corrupt/empty payloads
    take the dead-letter NULL row."""
    media = mm.synth_png_media(spark, n=40, seed=11)
    got = {int(r["media_id"]): r for r in mm.png_profile(media).collect()}
    assert len(got) == 40
    for i in range(40):
        r = got[i]
        if i % 16 in (13, 15):
            assert r["width"] is None and r["pixel_sha256"] is None
            continue
        px = _expected_pixels(i)
        h, w, nch = px.shape
        assert (r["width"], r["height"], r["n_channels"]) == (w, h, nch)
        sums = px.reshape(h * w, nch).astype(np.int64).sum(axis=0)
        want_means = [float(s / (h * w)) for s in sums]
        assert r["channel_means"] == want_means  # bit-exact: one division
        assert r["pixel_sha256"] == hashlib.sha256(px.tobytes()).hexdigest()
    # determinism across partitionings (the Arrow batching must not leak
    # into values)
    re = {
        int(r["media_id"]): r["pixel_sha256"]
        for r in mm.png_profile(media.repartition(7)).collect()
    }
    assert re == {k: v["pixel_sha256"] for k, v in got.items()}


def test_real_decode_features_runs_stdlib_png(spark):
    """decode_stub=False no longer raises in this codec-free container
    when payloads are PNG: the stdlib path executes (the non-skipped
    sibling of the PIL importorskip test), and the histogram matches a
    pure-numpy recomputation via the same ITU-R 601 luminance."""
    # n=13 keeps the planted corrupt row (i%16==13) out: extract_features
    # is the STRICT stage (a corrupt payload raises when no codec can
    # take the fallthrough); png_profile is the dead-letter sweep.
    media = mm.synth_png_media(spark, n=13, seed=11)
    feats = {
        int(r["media_id"]): list(r["features"])
        for r in mm.extract_features(media, decode_stub=False).collect()
    }
    for i in range(13):
        px = _expected_pixels(i).astype(np.int64)
        if px.shape[2] >= 3:
            lum = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
        else:
            lum = px[:, :, 0]
        lum = lum.astype(np.uint8).ravel()
        hist = np.bincount(lum >> 4, minlength=16).astype(np.float32)
        want = (hist / max(lum.size, 1)).tolist()
        assert feats[i] == pytest.approx(want, abs=0), i


def test_resize_images_real_png_nearest(spark):
    """Real resize over PNG payloads without PIL: output is the
    documented NEAREST-neighbor index resample of the ITU-R 601
    luminance plane — verified byte-for-byte against the closed form."""
    media = mm.synth_png_media(spark, n=12, seed=11)
    out = {
        int(r["media_id"]): r
        for r in mm.resize_images(
            media, width=16, height=12, decode_stub=False
        ).collect()
    }
    for i, r in out.items():
        assert (r["width"], r["height"]) == (16, 12)
        if i % 16 in (13, 15):
            continue
        px = _expected_pixels(i).astype(np.int64)
        if px.shape[2] >= 3:
            lum = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
        else:
            lum = px[:, :, 0]
        sh, sw = lum.shape
        yi = (np.arange(12, dtype=np.int64) * sh) // 12
        xi = (np.arange(16, dtype=np.int64) * sw) // 16
        want = lum[np.ix_(yi, xi)].astype(np.uint8).tobytes()
        assert bytes(r["payload"]) == want, i


def test_phash_links_byte_different_pngs_with_same_pixels(spark):
    """Decoded-content dedup through the REAL codec: the same pixel
    grid encoded with different per-row filter choices produces
    byte-DIFFERENT payloads (a byte hash cannot link them), but the
    stdlib decode feeds phash identical luminance histograms, so the
    perceptual near-dup join links every re-encoding at Hamming 0 —
    the multimodal analogue of text near-dup surviving whitespace
    re-encoding."""
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    distractor = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    encodings = [None, [1], [2], [3], [4], [0, 3, 1, 4, 2]]
    rows = [
        (i, mm._png_encode(px, row_filters=f),
         {"media_type": "image", "mime": "image/png", "width": None,
          "height": None, "duration_ms": None})
        for i, f in enumerate(encodings)
    ] + [
        (99, mm._png_encode(distractor),
         {"media_type": "image", "mime": "image/png", "width": None,
          "height": None, "duration_ms": None})
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    payloads = {r[0]: r[1] for r in rows}
    # byte-different payloads (the filter choice changes the IDAT bytes)
    assert len({payloads[i] for i in range(len(encodings))}) == len(encodings)
    # ...but identical decoded pixels
    for i in range(len(encodings)):
        assert (mm._png_decode(payloads[i]) == px).all()
    dups = {
        int(r["media_id"]): (int(r["dup_of"]), int(r["hamming"]))
        for r in mm.phash_neardups(
            media, max_hamming=0, decode_stub=False
        ).collect()
    }
    # every re-encoding links to the min-id representative at Hamming 0
    for i in range(1, len(encodings)):
        assert dups[i] == (0, 0), (i, dups.get(i))
    # the distractor's histogram differs; at max_hamming=0 it must not
    # link unless its aHash collides — assert on the signature directly
    sigs = {
        int(r["media_id"]): int(r["sig"])
        for r in mm.phash_signatures(media, decode_stub=False).collect()
    }
    assert len({sigs[i] for i in range(len(encodings))}) == 1
    if sigs[99] != sigs[0]:
        assert 99 not in dups
