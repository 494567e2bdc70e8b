"""Property-based pinning of the stdlib media decoders.

The PNG/WAV decode paths are real in-container code (zlib/struct/wave),
so they get the same treatment as the decimal conventions: random
inputs round-trip through the encoder twin and the decoded statistics
must equal an exact driver-side reference computed directly from the
raw samples — across every color type, scanline filter, channel
layout, and sample width the decoders claim to support.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from oracle_duckdb_sync_spark.operators import multimodal as MM
from tests.test_training_ops import _write_png, _write_wav

_PROP_SETTINGS = settings(max_examples=40, deadline=None)


@st.composite
def png_cases(draw):
    color_type = draw(st.sampled_from([0, 2, 4, 6]))
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    w = draw(st.integers(min_value=1, max_value=12))
    h = draw(st.integers(min_value=1, max_value=10))
    pixels = [
        tuple(
            draw(st.integers(min_value=0, max_value=255)) for _ in range(ch)
        )
        for _ in range(w * h)
    ]
    filters = [draw(st.integers(min_value=0, max_value=4)) for _ in range(h)]
    return color_type, ch, w, h, pixels, filters


@given(case=png_cases())
@_PROP_SETTINGS
def test_png_roundtrip_exact_means(case):
    color_type, ch, w, h, pixels, filters = case
    blob = _write_png(w, h, pixels, color_type, filters=filters)
    gw, gh, gch, means = MM.decode_png(blob)
    assert (gw, gh, gch) == (w, h, ch)
    n = w * h
    for c in range(ch):
        exact = sum(px[c] for px in pixels) / (n * 255.0)
        assert means[c] == exact  # integer sums + one division: bit-exact


@st.composite
def wav_cases(draw):
    channels = draw(st.integers(min_value=1, max_value=2))
    n_frames = draw(st.integers(min_value=1, max_value=200))
    sampwidth = draw(st.sampled_from([1, 2]))
    if sampwidth == 2:
        samples = [
            draw(st.integers(min_value=-32768, max_value=32767))
            for _ in range(n_frames * channels)
        ]
    else:
        samples = [
            draw(st.integers(min_value=0, max_value=255))
            for _ in range(n_frames * channels)
        ]
    sr = draw(st.sampled_from([4000, 8000, 16000, 44100]))
    return channels, n_frames, sampwidth, samples, sr


@given(case=wav_cases())
@_PROP_SETTINGS
def test_wav_roundtrip_exact_stats(case):
    channels, n_frames, sampwidth, samples, sr = case
    blob = _write_wav(sr, channels, samples, sampwidth=sampwidth)
    gsr, gn, gch, st_ = MM.decode_wav(blob)
    assert (gsr, gn, gch) == (sr, n_frames, channels)
    signed = samples if sampwidth == 2 else [s - 128 for s in samples]
    scale = 32768.0 if sampwidth == 2 else 128.0
    assert st_["mean"] == sum(signed) / (len(signed) * scale)
    assert st_["rms"] == math.sqrt(
        sum(s * s for s in signed) / len(signed)
    ) / scale
    assert st_["peak"] == max(abs(s) for s in signed) / scale
    ch0 = signed[::channels]
    crossings = sum(1 for a, b in zip(ch0, ch0[1:]) if (a >= 0) != (b >= 0))
    assert st_["zcr"] == crossings / max(1, len(ch0) - 1)


@st.composite
def bmp_cases(draw):
    bpp = draw(st.sampled_from([24, 32]))
    ch = bpp // 8
    w = draw(st.integers(min_value=1, max_value=12))
    h = draw(st.integers(min_value=1, max_value=10))
    pixels = [
        tuple(
            draw(st.integers(min_value=0, max_value=255)) for _ in range(ch)
        )
        for _ in range(w * h)
    ]
    top_down = draw(st.booleans())
    return bpp, ch, w, h, pixels, top_down


@given(case=bmp_cases())
@_PROP_SETTINGS
def test_bmp_roundtrip_exact_means(case):
    from tests.test_training_ops import _write_bmp

    bpp, ch, w, h, pixels, top_down = case
    blob = _write_bmp(w, h, pixels, bpp=bpp, top_down=top_down)
    gw, gh, gch, means = MM.decode_bmp(blob)
    assert (gw, gh, gch) == (w, h, ch)
    n = w * h
    for c in range(ch):
        exact = sum(px[c] for px in pixels) / (n * 255.0)
        assert means[c] == exact  # integer sums + one division: bit-exact


@st.composite
def gif_cases(draw):
    w = draw(st.integers(min_value=1, max_value=14))
    h = draw(st.integers(min_value=1, max_value=10))
    n_colors = draw(st.integers(min_value=1, max_value=min(256, w * h)))
    palette = draw(
        st.lists(
            st.tuples(*[st.integers(min_value=0, max_value=255)] * 3),
            min_size=n_colors,
            max_size=n_colors,
            unique=True,
        )
    )
    pixels = [
        palette[draw(st.integers(min_value=0, max_value=len(palette) - 1))]
        for _ in range(w * h)
    ]
    local = draw(st.booleans())
    gce = draw(st.booleans())
    interlace = draw(st.booleans())
    return w, h, pixels, local, gce, interlace


@given(case=gif_cases())
@_PROP_SETTINGS
def test_gif_roundtrip_exact_means(case):
    from tests.test_training_ops import _write_gif

    w, h, pixels, local, gce, interlace = case
    blob = _write_gif(
        w, h, pixels,
        use_local_table=local, with_gce=gce, interlace_flag=interlace,
    )
    gw, gh, gch, means = MM.decode_gif(blob)
    assert (gw, gh, gch) == (w, h, 3)
    n = w * h
    for c in range(3):
        exact = sum(px[c] for px in pixels) / (n * 255.0)
        assert means[c] == exact  # integer sums + one division: bit-exact


@st.composite
def jpeg_cases(draw):
    import random

    mc = draw(st.integers(min_value=1, max_value=4))
    mr = draw(st.integers(min_value=1, max_value=3))
    gray = draw(st.booleans())
    hy, vy = draw(st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]))
    q0 = draw(st.sampled_from([1, 4, 8, 16, 33, 255]))
    ri = draw(st.sampled_from([0, 1, 2, 5]))
    seed = draw(st.integers(min_value=0, max_value=2**31))
    rng = random.Random(seed)

    def grid(hh, vv):
        return [
            [rng.randrange(256) for _ in range(mc * hh)]
            for _ in range(mr * vv)
        ]

    if gray:
        comps = [(1, 1, grid(1, 1))]
        hmax = vmax = 1
    else:
        comps = [(hy, vy, grid(hy, vy)), (1, 1, grid(1, 1)), (1, 1, grid(1, 1))]
        hmax, vmax = hy, vy
    ac = random.Random(seed + 1) if draw(st.booleans()) else None
    # optionally declare non-MCU-aligned dims (edge blocks partially
    # visible — the decoder must weight them by visible pixels)
    crop_w = draw(st.integers(min_value=0, max_value=8 * hmax - 1))
    crop_h = draw(st.integers(min_value=0, max_value=8 * vmax - 1))
    wd = mc * 8 * hmax - crop_w
    ht = mr * 8 * vmax - crop_h
    return comps, q0, ri, ac, wd, ht


@given(case=jpeg_cases())
@_PROP_SETTINGS
def test_jpeg_roundtrip_exact_dc_means(case):
    from tests.test_training_ops import _jpeg_rgb_means, _write_jpeg_dc

    comps, q0, ri, ac, wd, ht = case
    blob, exp = _write_jpeg_dc(
        comps, q0=q0, restart_interval=ri, ac_noise=ac, width=wd, height=ht
    )
    gw, gh, gch, means = MM.decode_jpeg_stats(blob)
    assert (gw, gh) == (wd, ht)
    assert gch == len(comps)
    want = exp if len(comps) == 1 else _jpeg_rgb_means(exp)
    for got, exact in zip(means, want):
        assert abs(got - exact) < 1e-12


@st.composite
def prog_jpeg_cases(draw):
    import random

    mc = draw(st.integers(min_value=1, max_value=4))
    mr = draw(st.integers(min_value=1, max_value=3))
    gray = draw(st.booleans())
    hy, vy = draw(st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]))
    q0 = draw(st.sampled_from([1, 4, 8, 16, 33, 255]))
    ri = draw(st.sampled_from([0, 1, 2, 5]))
    al = draw(st.integers(min_value=0, max_value=3))
    refine = draw(st.booleans())
    single = draw(st.booleans())
    seed = draw(st.integers(min_value=0, max_value=2**31))
    rng = random.Random(seed)

    def grid(hh, vv):
        return [
            [rng.randrange(256) for _ in range(mc * hh)]
            for _ in range(mr * vv)
        ]

    if gray:
        comps = [(1, 1, grid(1, 1))]
        hmax = vmax = 1
    else:
        comps = [(hy, vy, grid(hy, vy)), (1, 1, grid(1, 1)),
                 (1, 1, grid(1, 1))]
        hmax, vmax = hy, vy
    crop_w = draw(st.integers(min_value=0, max_value=8 * hmax - 1))
    crop_h = draw(st.integers(min_value=0, max_value=8 * vmax - 1))
    wd = mc * 8 * hmax - crop_w
    ht = mr * 8 * vmax - crop_h
    noise = random.Random(seed + 1)
    return comps, q0, ri, al, refine, single, noise, wd, ht


@given(case=prog_jpeg_cases())
@_PROP_SETTINGS
def test_progressive_jpeg_roundtrip_exact_dc_means(case):
    from tests.test_training_ops import _jpeg_rgb_means, _write_jpeg_prog

    comps, q0, ri, al, refine, single, noise, wd, ht = case
    blob, exp = _write_jpeg_prog(
        comps, q0=q0, al=al, restart_interval=ri, ac_noise=noise,
        dc_single_scans=single, refine=refine, width=wd, height=ht,
    )
    gw, gh, gch, means = MM.decode_jpeg_stats(blob)
    assert (gw, gh) == (wd, ht)
    assert gch == len(comps)
    want = exp if len(comps) == 1 else _jpeg_rgb_means(exp)
    for got, exact in zip(means, want):
        assert abs(got - exact) < 1e-12


@st.composite
def tiff_cases(draw):
    ch = draw(st.sampled_from([1, 3, 4]))
    w = draw(st.integers(min_value=1, max_value=14))
    h = draw(st.integers(min_value=1, max_value=10))
    bits = draw(st.sampled_from([8, 16]))
    # biased palette makes PackBits/LZW runs actually occur
    top = (1 << bits) - 1
    palette = [0, 1, top] + [draw(st.integers(0, top)) for _ in range(2)]
    pixels = [
        tuple(
            palette[draw(st.integers(0, len(palette) - 1))]
            for _ in range(ch)
        )
        for _ in range(w * h)
    ]
    big = draw(st.booleans())
    comp = draw(st.sampled_from(["none", "packbits", "lzw"]))
    rps = draw(st.sampled_from([None, 1, 2, 7]))
    wiz = ch == 1 and draw(st.booleans())
    pred = draw(st.sampled_from([1, 2]))
    tile = draw(st.sampled_from([None, (4, 4), (3, 5), (16, 16)]))
    planar = draw(st.sampled_from([1, 2]))
    return ch, w, h, pixels, big, comp, rps, wiz, pred, tile, bits, planar


@given(case=tiff_cases())
@_PROP_SETTINGS
def test_tiff_roundtrip_exact_means(case):
    from tests.test_training_ops import _write_tiff

    ch, w, h, pixels, big, comp, rps, wiz, pred, tile, bits, planar = case
    blob = _write_tiff(
        w, h, pixels, ch,
        big_endian=big, packbits=comp == "packbits", rows_per_strip=rps,
        white_is_zero=wiz, lzw=comp == "lzw", predictor=pred, tile=tile,
        bits=bits, planar=planar,
    )
    gw, gh, gch, means = MM.decode_tiff(blob)
    assert (gw, gh, gch) == (w, h, ch)
    n = w * h
    maxv = (1 << bits) - 1
    for c in range(ch):
        exact = sum(px[c] for px in pixels) / (n * float(maxv))
        if wiz:
            exact = 1.0 - exact
        assert means[c] == exact


# ---------------------------------------------------------------------------
# corruption fuzzing (VERDICT r12 #7): random truncation / bit flips over
# valid GIF/JPEG/TIFF streams. The decoders' contract on corrupt input is
# TYPED failure — ValueError (malformed) or NotImplementedError (a feature
# the mutation faked, e.g. a flipped bit turning baseline into progressive)
# — never an unhandled IndexError/struct.error/KeyError crash. A mutation
# may also legitimately still decode (a flipped palette byte is a valid
# different image): then the result must be well-formed (sane dims/channel
# count, finite means in [0,1]) — corruption can change the image but must
# never produce NaN/out-of-range statistics.
# ---------------------------------------------------------------------------

_TYPED_FAILURES = (ValueError, NotImplementedError)


def _fuzz_blobs_gif():
    from tests.test_training_ops import _write_gif

    px = [(i % 7 * 36, (i * 5) % 256, 255 - i % 11 * 23) for i in range(48)]
    pal = sorted(set(px))
    pixels = [pal[hash(p) % len(pal)] for p in px]
    from tests.test_training_ops import _strip_gct

    return [
        _write_gif(8, 6, pixels, use_local_table=False, with_gce=True),
        _write_gif(8, 6, pixels, use_local_table=True, interlace_flag=True),
        # tableless GIF (r14 decoder-default grayscale ramp path)
        _strip_gct(_write_gif(8, 6, pixels)),
    ]


def _fuzz_blobs_jpeg():
    import random

    from tests.test_training_ops import _write_jpeg_dc, _write_jpeg_prog

    rng = random.Random(7)

    def grid(mc, mr, hh, vv):
        return [
            [rng.randrange(256) for _ in range(mc * hh)]
            for _ in range(mr * vv)
        ]

    gray, _ = _write_jpeg_dc([(1, 1, grid(3, 2, 1, 1))], q0=8)
    color, _ = _write_jpeg_dc(
        [(2, 2, grid(2, 2, 2, 2)), (1, 1, grid(2, 2, 1, 1)),
         (1, 1, grid(2, 2, 1, 1))],
        q0=16, restart_interval=2, width=29, height=27,
    )
    prog, _ = _write_jpeg_prog(
        [(2, 1, grid(2, 2, 2, 1)), (1, 1, grid(2, 2, 1, 1)),
         (1, 1, grid(2, 2, 1, 1))],
        q0=16, al=1, restart_interval=2, ac_noise=rng,
        width=27, height=25,
    )
    return [gray, color, prog]


def _fuzz_blobs_tiff():
    from tests.test_training_ops import _write_tiff

    pixels = [((i * 37) % 256, (i * 11) % 256, 255 - i % 13 * 19)
              for i in range(7 * 5)]
    return [
        _write_tiff(7, 5, pixels, 3, big_endian=False, packbits=True,
                    rows_per_strip=2),
        _write_tiff(7, 5, [(p[0],) for p in pixels], 1, big_endian=True,
                    packbits=False, rows_per_strip=None),
        _write_tiff(7, 5, pixels, 3, lzw=True, predictor=2, tile=(4, 4)),
        _write_tiff(7, 5, [tuple(v * 257 for v in p) for p in pixels], 3,
                    bits=16, planar=2, lzw=True),
        _jpeg_in_tiff_blob(),
    ]


def _jpeg_in_tiff_blob():
    from tests.test_training_ops import (
        _split_jpeg_tables, _write_jpeg_dc, _write_tiff_jpeg,
    )

    blob, _ = _write_jpeg_dc([(1, 1, [[16, 240], [64, 128]])])
    tables, abbrev = _split_jpeg_tables(blob)
    return _write_tiff_jpeg(16, 16, [abbrev], channels=1,
                            jpegtables=tables)


def _fuzz_blobs_webp():
    from tests.test_training_ops import _write_vp8l

    pixels = [((i * 37) % 256, (i * 11) % 256, 255 - i % 13 * 19)
              for i in range(9 * 6)]
    return [
        _write_vp8l(9, 6, pixels, use_lz77=True, cache_bits=4),
        _write_vp8l(9, 6, pixels, subtract_green=True,
                    predictor=(2, [7] * 6)),
        _write_vp8l(9, 6, [pixels[i % 5] for i in range(54)],
                    palette=True),
    ]


@st.composite
def vp8l_cases(draw):
    w = draw(st.integers(min_value=1, max_value=18))
    h = draw(st.integers(min_value=1, max_value=12))
    alpha = draw(st.booleans())
    # small palette biases runs so lz77/cache branches actually fire
    pool = [
        tuple(draw(st.integers(0, 255)) for _ in range(4 if alpha else 3))
        for _ in range(draw(st.integers(1, 5)))
    ]
    px = [pool[draw(st.integers(0, len(pool) - 1))] for _ in range(w * h)]
    kw = {}
    form = draw(st.sampled_from(["plain", "lz", "cache", "lzcache",
                                 "subgreen", "palette", "pred"]))
    if form in ("lz", "lzcache"):
        kw["use_lz77"] = True
    if form in ("cache", "lzcache"):
        kw["cache_bits"] = draw(st.integers(1, 8))
    if form == "subgreen":
        kw["subtract_green"] = True
    if form == "palette":
        kw["palette"] = True
    if form == "pred":
        sb = draw(st.integers(2, 4))
        mw = (w + (1 << sb) - 1) >> sb
        mh = (h + (1 << sb) - 1) >> sb
        kw["predictor"] = (
            sb, [draw(st.integers(0, 13)) for _ in range(mw * mh)]
        )
    return w, h, alpha, px, kw


@given(case=vp8l_cases())
@_PROP_SETTINGS
def test_vp8l_roundtrip_exact_means(case):
    from tests.test_training_ops import _vp8l_exact_means, _write_vp8l

    w, h, alpha, px, kw = case
    gw, gh, gch, means = MM.decode_webp(
        _write_vp8l(w, h, px, alpha=alpha, **kw)
    )
    assert (gw, gh, gch) == (w, h, 4 if alpha else 3)
    want = _vp8l_exact_means(px, w * h, alpha)
    for got, exact in zip(means, want):
        assert abs(got - exact) < 1e-12


def _assert_fuzz_contract(decode, blob):
    try:
        out = decode(blob)
    except _TYPED_FAILURES:
        return  # typed failure — the documented corrupt-input contract
    w, h, ch, means = out
    assert 0 <= w <= 0xFFFF and 0 <= h <= 0xFFFF
    assert 1 <= ch <= 4 and len(means) == ch
    for m in means:
        assert not math.isnan(m) and 0.0 <= m <= 1.0, means


@st.composite
def corruptions(draw):
    mode = draw(st.sampled_from(["truncate", "bitflip", "both"]))
    # fractions/indices resolved against the blob inside the test (blob
    # lengths differ per codec/variant)
    cut = draw(st.floats(min_value=0.0, max_value=1.0))
    flips = draw(
        st.lists(
            st.tuples(
                st.floats(min_value=0.0, max_value=1.0),
                st.integers(min_value=0, max_value=7),
            ),
            min_size=1,
            max_size=8,
        )
    )
    variant = draw(st.integers(min_value=0, max_value=2))
    return mode, cut, flips, variant


def _mutate(blob: bytes, mode: str, cut: float, flips) -> bytes:
    b = bytearray(blob)
    if mode in ("bitflip", "both"):
        for frac, bit in flips:
            b[min(len(b) - 1, int(frac * len(b)))] ^= 1 << bit
    if mode in ("truncate", "both"):
        b = b[: int(cut * len(b))]
    return bytes(b)


_GIF_BLOBS = _fuzz_blobs_gif()
_JPEG_BLOBS = _fuzz_blobs_jpeg()
_TIFF_BLOBS = _fuzz_blobs_tiff()
_WEBP_BLOBS = _fuzz_blobs_webp()

_FUZZ_SETTINGS = settings(max_examples=120, deadline=None)


@given(c=corruptions())
@_FUZZ_SETTINGS
def test_gif_corruption_fails_typed(c):
    mode, cut, flips, variant = c
    blob = _GIF_BLOBS[variant % len(_GIF_BLOBS)]
    _assert_fuzz_contract(MM.decode_gif, _mutate(blob, mode, cut, flips))


@given(c=corruptions())
@_FUZZ_SETTINGS
def test_jpeg_corruption_fails_typed(c):
    mode, cut, flips, variant = c
    blob = _JPEG_BLOBS[variant % len(_JPEG_BLOBS)]
    _assert_fuzz_contract(
        MM.decode_jpeg_stats, _mutate(blob, mode, cut, flips)
    )


@given(c=corruptions())
@_FUZZ_SETTINGS
def test_tiff_corruption_fails_typed(c):
    mode, cut, flips, variant = c
    blob = _TIFF_BLOBS[variant % len(_TIFF_BLOBS)]
    _assert_fuzz_contract(MM.decode_tiff, _mutate(blob, mode, cut, flips))


@given(c=corruptions())
@_FUZZ_SETTINGS
def test_webp_corruption_fails_typed(c):
    mode, cut, flips, variant = c
    blob = _WEBP_BLOBS[variant % len(_WEBP_BLOBS)]
    _assert_fuzz_contract(MM.decode_webp, _mutate(blob, mode, cut, flips))


@st.composite
def pnm_cases(draw):
    ch = draw(st.sampled_from([1, 3]))
    w = draw(st.integers(min_value=1, max_value=12))
    h = draw(st.integers(min_value=1, max_value=10))
    maxval = draw(st.integers(min_value=1, max_value=255))
    pixels = [
        tuple(
            draw(st.integers(min_value=0, max_value=maxval))
            for _ in range(ch)
        )
        for _ in range(w * h)
    ]
    comment = draw(st.booleans())
    return ch, w, h, maxval, pixels, comment


@given(case=pnm_cases())
@_PROP_SETTINGS
def test_pnm_roundtrip_exact_means(case):
    from tests.test_training_ops import _write_pnm

    ch, w, h, maxval, pixels, comment = case
    blob = _write_pnm(w, h, pixels, ch, maxval=maxval, comment=comment)
    gw, gh, gch, means = MM.decode_pnm(blob)
    assert (gw, gh, gch) == (w, h, ch)
    n = w * h
    for c in range(ch):
        exact = sum(px[c] for px in pixels) / (n * float(maxval))
        assert means[c] == exact
