"""Real BMP resize (operators/multimodal.image_resize)."""
import numpy as np
import pytest

from claims_data_spark.operators.codecs import decode_bmp, encode_bmp
from claims_data_spark.operators.multimodal import image_resize


def _gradient(h, w, base=0):
    px = np.zeros((h, w, 3), np.uint8)
    for r in range(h):
        for c in range(w):
            px[r, c] = [(r * 16 + c + base) % 256, (c * 3) % 256, 7]
    return px


def _media_df(spark, imgs):
    return spark.createDataFrame(
        [(i, bytearray(encode_bmp(px))) for i, px in imgs],
        "media_id long, content binary",
    )


def test_nearest_is_exact_index_map(spark):
    px = _gradient(8, 8)
    out = image_resize(_media_df(spark, [(1, px)]), 4, 4).collect()[0]
    h, w, got = decode_bmp(bytes(out.content))
    assert (h, w) == (4, 4)
    ri = (np.arange(4) * 8) // 4
    ci = (np.arange(4) * 8) // 4
    expect = px[ri][:, ci]
    assert np.array_equal(got, expect)
    assert out.pixel_sum == int(expect.astype(np.int64).sum())


def test_area_is_truncating_block_mean(spark):
    px = _gradient(4, 4)
    out = image_resize(_media_df(spark, [(2, px)]), 2, 2, method="area").collect()[0]
    _, _, got = decode_bmp(bytes(out.content))
    expect = np.zeros((2, 2, 3), np.int64)
    for r in range(2):
        for c in range(2):
            block = px[2 * r : 2 * r + 2, 2 * c : 2 * c + 2].astype(np.int64)
            expect[r, c] = block.reshape(-1, 3).sum(axis=0) // 4
    assert np.array_equal(got, expect.astype(np.uint8))


def test_upscale_nearest_repeats_pixels(spark):
    px = _gradient(2, 2)
    out = image_resize(_media_df(spark, [(3, px)]), 4, 4).collect()[0]
    _, _, got = decode_bmp(bytes(out.content))
    for r in range(4):
        for c in range(4):
            assert tuple(got[r, c]) == tuple(px[(r * 2) // 4, (c * 2) // 4])


def test_uneven_area_blocks_counted_correctly(spark):
    # 5 -> 2: blocks of 3 and 2 rows/cols; counts must match the map
    px = _gradient(5, 5)
    out = image_resize(_media_df(spark, [(4, px)]), 2, 2, method="area").collect()[0]
    _, _, got = decode_bmp(bytes(out.content))
    rmap = (np.arange(5) * 2) // 5
    cmap = (np.arange(5) * 2) // 5
    for r in range(2):
        for c in range(2):
            rows = np.where(rmap == r)[0]
            cols = np.where(cmap == c)[0]
            block = px[np.ix_(rows, cols)].astype(np.int64)
            expect = block.reshape(-1, 3).sum(axis=0) // (len(rows) * len(cols))
            assert tuple(got[r, c]) == tuple(expect.astype(np.uint8))


def test_validation(spark):
    df = _media_df(spark, [(1, _gradient(2, 2))])
    with pytest.raises(ValueError):
        image_resize(df, 2, 2, method="bicubic")
    with pytest.raises(ValueError):
        image_resize(df, 0, 2)
