"""Native IO library tests: build, decode parity vs PIL, segment packing."""

import numpy as np
import pytest

from siu3r_tpu.data import native_io


@pytest.fixture(scope="module")
def lib():
    lib = native_io.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_jpeg_decode_matches_pil(lib, tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    p = tmp_path / "a.jpg"
    Image.fromarray(img).save(p, quality=95)
    ours = native_io.decode_batch([str(p)], "jpeg", 64, 48)[0]
    ref = np.asarray(Image.open(p).convert("RGB"))
    # both decode the same compressed stream; allow off-by-one from IDCT
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_png_rgb_and_gray16(lib, tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    p = tmp_path / "a.png"
    Image.fromarray(img).save(p)
    ours = native_io.decode_batch([str(p)], "png_rgb", 32, 32)[0]
    np.testing.assert_array_equal(ours, img)

    depth = (rng.rand(32, 32) * 60000).astype(np.uint16)
    p16 = tmp_path / "d.png"
    Image.fromarray(depth.astype(np.int32), mode="I").convert("I;16").save(p16)
    ours16 = native_io.decode_batch([str(p16)], "png_gray16", 32, 32)[0]
    np.testing.assert_array_equal(ours16, depth)


def test_image_size(lib, tmp_path):
    from PIL import Image

    Image.fromarray(np.zeros((20, 30, 3), np.uint8)).save(tmp_path / "s.jpg")
    assert native_io.image_size(tmp_path / "s.jpg") == (30, 20)


def test_segment_pack_native_matches_numpy(lib):
    rng = np.random.RandomState(2)
    sem = rng.randint(0, 21, (17, 13)).astype(np.int32)
    ins = rng.randint(0, 999, (17, 13)).astype(np.int32)
    rgb = native_io.pack_segments(sem, ins)
    from siu3r_tpu.visualizer import pack_segment_rgb

    np.testing.assert_array_equal(rgb, pack_segment_rgb(sem, ins))
    sem2, ins2 = native_io.unpack_segments(rgb)
    np.testing.assert_array_equal(sem2, sem)
    np.testing.assert_array_equal(ins2, ins)
