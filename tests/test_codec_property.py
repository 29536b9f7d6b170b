"""Property-based round-trips for the pure-stdlib media codecs: any
builder-parameter combination must survive build -> parse (and for GIF,
full pixel decode) exactly. Complements the fixed-fixture gates with
randomized structural coverage (chunk alignment, odd dimensions, frame
sub-rectangles, interlacing)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cefspark import multimodal


@settings(max_examples=60, deadline=None)
@given(sample_rate=st.integers(8000, 48000),
       n_frames=st.integers(1, 400),
       channels=st.integers(1, 2),
       with_list=st.booleans())
def test_wav_build_parse_roundtrip(sample_rate, n_frames, channels, with_list):
    blob = multimodal.build_wav(sample_rate, n_frames, channels=channels,
                                with_list_chunk=with_list)
    meta = multimodal.parse_wav(blob)
    assert meta["sample_rate"] == sample_rate
    assert meta["n_frames"] == n_frames
    assert meta["channels"] == channels
    assert meta["duration_ms"] == n_frames * 1000 // sample_rate
    stats = multimodal._wav_block_stats(blob)
    assert sum(n for _, n in stats) == n_frames * channels
    # exact closed form of the sawtooth's sum of squares
    want = sum(((i * 257) % 65536 - 32768) ** 2
               for i in range(n_frames * channels))
    assert sum(s for s, _ in stats) == want


@settings(max_examples=60, deadline=None)
@given(width=st.integers(1, 40), height=st.integers(1, 40),
       with_gap=st.booleans())
def test_bmp_build_parse_roundtrip(width, height, with_gap):
    blob = multimodal.build_bmp(width, height, with_gap=with_gap)
    meta = multimodal.parse_bmp(blob)
    assert (meta["width"], meta["height"]) == (width, height)
    row_bytes = ((width * 24 + 31) // 32) * 4
    assert meta["n_pixel_bytes"] == row_bytes * height


@settings(max_examples=40, deadline=None)
@given(width=st.integers(3, 24), height=st.integers(2, 20),
       n_frames=st.integers(1, 5), comment=st.booleans(),
       interlace=st.booleans())
def test_gif_build_decode_roundtrip(width, height, n_frames, comment,
                                    interlace):
    blob = multimodal.build_gif(width, height, n_frames,
                                with_comment=comment, interlace=interlace)
    meta = multimodal.parse_gif(blob)
    assert meta["n_frames"] == n_frames
    frames = multimodal.decode_gif_pixels(blob)
    for f, px in enumerate(frames):
        fw, fh = width - f % 3, height - f % 2
        assert px.shape == (fh, fw)
        want = np.fromfunction(lambda y, x: (x + y + f) % 4, (fh, fw))
        assert np.array_equal(px, want)


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    ct=st.sampled_from([0, 2, 4, 6]),
    il=st.sampled_from([0, 1]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=120, deadline=None)
def test_png_roundtrip_random_pixels(w, h, ct, il, seed):
    """PNG encode->decode is the identity for ARBITRARY pixel content (not
    just the gradient fixture) across every color type, interlace mode, and
    all five cycled scanline filters — random bytes are the worst case for
    the predictors (no spatial correlation to hide an off-by-one)."""
    import numpy as np

    from cefspark import multimodal as mm

    rng = np.random.default_rng(seed)
    ch = mm._PNG_CHANNELS[ct]
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    blob = mm.build_png(w, h, color_type=ct, interlace=il, pixels=px)
    meta = mm.parse_png(blob)
    assert (meta["width"], meta["height"], meta["interlace"]) == (w, h, il)
    out = mm.decode_png_pixels(blob)
    assert out.shape == px.shape and (out == px).all()


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_flips=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=200, deadline=None)
def test_png_corruption_never_escapes_typed_errors(seed, n_flips):
    """Random byte corruption of a valid PNG must either still decode (the
    flip landed in a slack byte) or raise ONLY the documented typed errors
    (ValueError / NotImplementedError) — never struct.error, zlib.error,
    IndexError, or a numpy crash escaping through the mapInPandas stages."""
    import numpy as np

    from cefspark import multimodal as mm

    rng = np.random.default_rng(seed)
    blob = bytearray(mm.build_png(6 + seed % 5, 4 + seed % 3,
                                  color_type=(0, 2, 4, 6)[seed % 4],
                                  interlace=seed % 2))
    for _ in range(n_flips):
        blob[rng.integers(0, len(blob))] ^= int(rng.integers(1, 256))
    try:
        mm.decode_png_pixels(bytes(blob))
    except (ValueError, NotImplementedError):
        pass  # typed rejection: the contract
