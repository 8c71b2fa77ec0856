"""BitmapMasks / PolygonMasks structures (`mmdet/core/mask/structures.py`)."""

import numpy as np
import pytest

from panoswintransformerobjectdetection_tpu.core import (
    BitmapMasks, PolygonMasks, encode_mask_results, split_combined_polys)


def square_bitmap():
    m = np.zeros((1, 8, 16), np.uint8)
    m[0, 2:6, 4:12] = 1
    return BitmapMasks(m, 8, 16)


class TestBitmapMasks:
    def test_resize_rescale(self):
        bm = square_bitmap()
        r = bm.resize((16, 32))
        assert (r.height, r.width) == (16, 32)
        assert r.masks[0, 8, 16] == 1 and r.masks[0, 0, 0] == 0
        r2 = bm.rescale(2.0)
        assert (r2.height, r2.width) == (16, 32)

    def test_flip_involution(self):
        bm = square_bitmap()
        for d in ("horizontal", "vertical", "diagonal"):
            np.testing.assert_array_equal(bm.flip(d).flip(d).masks, bm.masks)
        f = bm.flip("horizontal")
        assert f.masks[0, 3, 15 - 5] == bm.masks[0, 3, 5]

    def test_pad_crop(self):
        bm = square_bitmap()
        p = bm.pad((10, 20))
        assert (p.height, p.width) == (10, 20) and p.masks[:, 8:].sum() == 0
        c = bm.crop(np.array([4, 2, 12, 6]))
        assert (c.height, c.width) == (4, 8) and c.masks.all()

    def test_crop_and_resize(self):
        bm = square_bitmap()
        out = bm.crop_and_resize(np.array([[4., 2., 12., 6.]]), (4, 4),
                                 np.array([0]))
        assert out.masks.shape == (1, 4, 4) and out.masks.all()

    def test_expand_translate(self):
        bm = square_bitmap()
        e = bm.expand(12, 20, 2, 3)
        assert e.masks[0, 4, 7] == 1 and e.masks[0, 0].sum() == 0
        t = bm.translate((8, 16), 4)
        assert t.masks[0, 3, 8 + 4] == 1 and t.masks[0, 3, 4] == 0

    def test_rotate_180_and_areas(self):
        bm = square_bitmap()
        r = bm.rotate((8, 16), 180.0)
        np.testing.assert_array_equal(r.masks, bm.flip("diagonal").masks)
        assert bm.areas[0] == 32.0

    def test_index_iter_random(self):
        bm = BitmapMasks.random(num_masks=4)
        assert len(bm[1]) == 1 and len(list(iter(bm))) == 4
        assert bm.to_ndarray().shape == (4, 32, 32)


class TestPolygonMasks:
    def poly(self):
        # rectangle (4,2)-(12,6) as a polygon
        return PolygonMasks([[[4, 2, 12, 2, 12, 6, 4, 6]]], 8, 16)

    def test_to_bitmap_matches_rect(self):
        pm = self.poly()
        bm = pm.to_bitmap()
        assert bm.masks.shape == (1, 8, 16)
        assert bm.masks[0, 3, 5] == 1 and bm.masks[0, 0, 0] == 0

    def test_resize_flip_area(self):
        pm = self.poly()
        r = pm.resize((16, 32))
        assert r.masks[0][0][0] == 8.0   # x scaled by 2
        f = pm.flip("horizontal")
        assert f.masks[0][0][0] == 12.0  # 16 - 4
        np.testing.assert_allclose(pm.areas, [32.0])

    def test_crop_and_getitem(self):
        pm = self.poly()
        c = pm.crop(np.array([4, 2, 12, 6]))
        assert (c.height, c.width) == (4, 8)
        assert c.masks[0][0][0] == 0.0
        assert len(pm[[0]]) == 1

    def test_crop_and_resize_via_bitmap(self):
        pm = self.poly()
        out = pm.crop_and_resize(np.array([[4., 2., 12., 6.]]), (4, 4),
                                 np.array([0]))
        assert out.masks.shape == (1, 4, 4)


class TestMaskUtils:
    def test_encode_mask_results(self):
        m = np.zeros((4, 4), np.uint8)
        m[1:3, 1:3] = 1
        out = encode_mask_results([[m], []])
        assert len(out) == 2 and len(out[0]) == 1
        from panoswintransformerobjectdetection_tpu.core import rle as R
        np.testing.assert_array_equal(R.decode(out[0][0]), m)

    def test_split_combined_polys(self):
        polys = [np.array([0., 0., 1., 0., 1., 1., 0., 0., 2., 0., 2., 2.])]
        lens = [[6, 6]]
        ppm = [[2]]
        out = split_combined_polys([polys[0]], lens, ppm)
        assert len(out) == 1 and len(out[0]) == 1 and len(out[0][0]) == 2
        np.testing.assert_allclose(out[0][0][1], [0., 0., 2., 0., 2., 2.])
