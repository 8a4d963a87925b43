"""Letterboxed-canvas cache (data/cache.py) + native host prep in the
datasets (VERDICT r3 next-4: the real loader must not re-decode every
epoch — the reference does, /root/reference/src/dataset.py:288-303).

Pinned contracts:
* cached epoch == fresh epoch, bit-identical (uint8 and float paths);
* a complete cache serves samples with ZERO image decodes (PIL/cv2
  never touched — proven by breaking the image files);
* the cache key separates resolutions and prep modes, and invalidates
  when a source file changes;
* host_prep="native" routes the datasets through the C++ bicubic engine
  (±1 LSB vs the cv2 path, same tolerance as test_native_letterbox).
"""

import os

import numpy as np
import pytest

from realtimeobjectdetection_tpu.data.cache import CanvasCache
from realtimeobjectdetection_tpu.data.coco import COCODataset
from realtimeobjectdetection_tpu.data.voc import VOCDataset
from realtimeobjectdetection_tpu.testing import (make_synthetic_coco,
                                                 make_synthetic_voc)


def _epoch(ds):
    return [ds[i] for i in range(len(ds))]


@pytest.mark.parametrize("uint8", [True, False])
def test_coco_cached_epoch_bit_identical(tmp_path, uint8):
    ann, imgs = make_synthetic_coco(tmp_path, n_images=4)
    cache_dir = str(tmp_path / "cache")
    fresh = COCODataset(ann, imgs, resolution=96, uint8=uint8)
    cached = COCODataset(ann, imgs, resolution=96, uint8=uint8,
                         cache_dir=cache_dir)
    # epoch 1 fills the cache; epoch 2 serves from it
    e1 = _epoch(cached)
    assert cached._cache.complete()
    e2 = _epoch(cached)
    ref = _epoch(fresh)
    for (s1, b1), (s2, b2), (sr, br) in zip(e1, e2, ref):
        np.testing.assert_array_equal(s1, sr)
        np.testing.assert_array_equal(s2, sr)
        np.testing.assert_array_equal(b1, br)
        np.testing.assert_array_equal(b2, br)


def test_coco_cache_hit_skips_decode_entirely(tmp_path):
    ann, imgs = make_synthetic_coco(tmp_path, n_images=3)
    cache_dir = str(tmp_path / "cache")
    ds = COCODataset(ann, imgs, resolution=96, uint8=True,
                     cache_dir=cache_dir)
    e1 = _epoch(ds)
    # corrupt every image file IN PLACE (same size, preserved mtime so
    # the cache key is unchanged): any decode attempt now fails, so a
    # clean second epoch proves zero decodes happen
    for f in sorted(os.listdir(imgs)):
        p = os.path.join(imgs, f)
        st = os.stat(p)
        with open(p, "r+b") as fh:
            fh.write(b"\x00" * st.st_size)
        os.utime(p, (st.st_atime, st.st_mtime))
    ds2 = COCODataset(ann, imgs, resolution=96, uint8=True,
                      cache_dir=cache_dir)
    e2 = _epoch(ds2)
    for (s1, _), (s2, _) in zip(e1, e2):
        np.testing.assert_array_equal(s1, s2)


def test_voc_cached_epoch_bit_identical(tmp_path):
    xml_dir, img_dir = make_synthetic_voc(tmp_path, n_images=3)
    cache_dir = str(tmp_path / "cache")
    fresh = VOCDataset(xml_dir, img_dir, resolution=96, uint8=True)
    cached = VOCDataset(xml_dir, img_dir, resolution=96, uint8=True,
                        cache_dir=cache_dir)
    e1 = _epoch(cached)
    e2 = _epoch(cached)
    ref = _epoch(fresh)
    for (s1, b1), (s2, b2), (sr, br) in zip(e1, e2, ref):
        np.testing.assert_array_equal(s1, sr)
        np.testing.assert_array_equal(s2, sr)
        if br is None:
            assert b1 is None and b2 is None
        else:
            np.testing.assert_array_equal(b1, br)
            np.testing.assert_array_equal(b2, br)


def test_cache_key_separates_resolution_prep_and_content(tmp_path):
    ann, imgs = make_synthetic_coco(tmp_path, n_images=2)
    paths = [os.path.join(imgs, f) for f in sorted(os.listdir(imgs))]
    cd = str(tmp_path / "cache")
    k96 = CanvasCache(cd, paths, 96).key
    k128 = CanvasCache(cd, paths, 128).key
    knat = CanvasCache(cd, paths, 96, prep_tag="native").key
    assert len({k96, k128, knat}) == 3
    # touching a source file (size or mtime) invalidates
    st = os.stat(paths[0])
    os.utime(paths[0], (st.st_atime, st.st_mtime + 10))
    assert CanvasCache(cd, paths, 96).key != k96


def test_cache_torn_write_not_served(tmp_path):
    ann, imgs = make_synthetic_coco(tmp_path, n_images=2)
    paths = [os.path.join(imgs, f) for f in sorted(os.listdir(imgs))]
    c = CanvasCache(str(tmp_path / "cache"), paths, 96)
    assert c.get(0) is None and c.get(1) is None
    canvas = np.full((96, 96, 3), 7, np.uint8)
    c.put(1, canvas)
    assert c.get(0) is None
    np.testing.assert_array_equal(c.get(1), canvas)
    assert c.hits() == 1 and not c.complete()


def _native_available():
    from realtimeobjectdetection_tpu.native import available
    return available()


@pytest.mark.skipif(not _native_available(),
                    reason="native letterbox engine unavailable")
def test_coco_native_prep_close_to_cv2(tmp_path):
    """host_prep='native' in the dataset: C++ bicubic canvas within
    ±1 LSB of the cv2 path on the resized region (pad region exact).
    NOTE the native path decodes with cv2.imread, the cv2 path with
    PIL — identical for baseline JPEG (both libjpeg), pinned here."""
    ann, imgs = make_synthetic_coco(tmp_path, n_images=2)
    a = COCODataset(ann, imgs, resolution=96, uint8=True)
    b = COCODataset(ann, imgs, resolution=96, uint8=True,
                    host_prep="native")
    for i in range(len(a)):
        sa, ba = a[i]
        sb, bb = b[i]
        diff = np.abs(sa.astype(np.int16) - sb.astype(np.int16))
        assert diff.max() <= 1, diff.max()
        np.testing.assert_array_equal(ba, bb)


@pytest.mark.skipif(not _native_available(),
                    reason="native letterbox engine unavailable")
def test_voc_native_prep_with_cache(tmp_path):
    """native prep + cache compose: second epoch bit-equal to first."""
    xml_dir, img_dir = make_synthetic_voc(tmp_path, n_images=2)
    ds = VOCDataset(xml_dir, img_dir, resolution=96, uint8=True,
                    cache_dir=str(tmp_path / "cache"), host_prep="native")
    e1 = _epoch(ds)
    assert ds._cache.complete()
    e2 = _epoch(ds)
    for (s1, _), (s2, _) in zip(e1, e2):
        np.testing.assert_array_equal(s1, s2)
