"""Native _fastimage extension: bit-exact parity with the PIL path.

The C++ data-loader component (native/fastimage.cpp) must be numerically
invisible: JPEG decode identical to PIL's (both sit on libjpeg with the
default ISLOW DCT), and the bilinear resampler reproduces Pillow's
Resample.c fixed-point arithmetic exactly. If these hold, fitted dataset
statistics, crops, and eval numbers never depend on which path ran.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from pytorch_ddp_resnet_tpu import native

fi = native.load()
pytestmark = pytest.mark.skipif(
    fi is None, reason="native toolchain/libjpeg unavailable")


def _jpeg_bytes(arr, mode=None, **kw):
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, "JPEG", **kw)
    return buf.getvalue()


def test_decode_matches_pil_exactly():
    rng = np.random.default_rng(0)
    for q in (50, 75, 95):
        for shape in ((37, 53), (128, 97)):
            arr = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
            data = _jpeg_bytes(arr, quality=q)
            pix, h, w = fi.decode_jpeg(data)
            nat = np.frombuffer(pix, np.uint8).reshape(h, w, 3)
            pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            assert nat.shape == pil.shape
            np.testing.assert_array_equal(nat, pil)


def test_decode_grayscale_jpeg():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
    data = _jpeg_bytes(g, "L")
    pix, h, w = fi.decode_jpeg(data)
    nat = np.frombuffer(pix, np.uint8).reshape(h, w, 3)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(nat, pil)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        fi.decode_jpeg(b"not a jpeg at all")


def test_resize_matches_pillow_bitexactly():
    rng = np.random.default_rng(2)
    cases = [((100, 150), (256, 384)),   # upscale
             ((500, 333), (256, 170)),   # downscale
             ((77, 31), (32, 13)),       # heavy downscale
             ((9, 9), (300, 300)),       # heavy upscale
             ((64, 64), (64, 48))]       # one axis unchanged
    for (h, w), (nh, nw) in cases:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = np.frombuffer(
            fi.resize_bilinear(arr.tobytes(), h, w, nh, nw),
            np.uint8).reshape(nh, nw, 3)
        pil = np.asarray(Image.fromarray(arr).resize((nw, nh), Image.BILINEAR))
        np.testing.assert_array_equal(out, pil)


def test_fused_decode_resize_matches_python_path(tmp_path, monkeypatch):
    """HostSampleProcessor output is identical with and without the native
    fast path (the whole point: the C++ component is a pure accelerant)."""
    from pytorch_ddp_resnet_tpu.data import streaming
    from pytorch_ddp_resnet_tpu.data.streaming import HostSampleProcessor
    from pytorch_ddp_resnet_tpu.data.transforms import RandomScaleTransform

    rng = np.random.default_rng(3)
    paths = []
    for i, shape in enumerate([(300, 220), (180, 260), (97, 401)]):
        arr = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(arr).save(p, "JPEG", quality=92)
        paths.append(str(p))

    host = [RandomScaleTransform((None, None, 3), target_short_side=144)]
    proc = HostSampleProcessor(host, crop_size=128, random_crop=True, seed=7)

    native_out = [proc(p, epoch=2, index=i) for i, p in enumerate(paths)]
    monkeypatch.setattr(streaming, "_native", lambda: None)
    pil_out = [proc(p, epoch=2, index=i) for i, p in enumerate(paths)]
    for a, b in zip(native_out, pil_out):
        np.testing.assert_array_equal(a, b)


def test_decode_image_falls_back_for_non_jpeg_content(tmp_path):
    """A .jpg path holding non-JPEG bytes decodes via the PIL fallback."""
    from pytorch_ddp_resnet_tpu.data.streaming import _decode_image

    arr = np.random.default_rng(4).integers(
        0, 256, size=(20, 30, 3), dtype=np.uint8)
    p = tmp_path / "actually_a_png.jpg"
    Image.fromarray(arr).save(p, "PNG")  # lossless -> exact roundtrip
    np.testing.assert_array_equal(_decode_image(str(p)), arr)


def test_build_is_idempotent_and_cached():
    so = native.build()
    assert os.path.exists(so)
    assert native.build() == so  # mtime-cached, no rebuild


def test_threaded_decode_stress(tmp_path):
    """The GIL-released native calls are thread-safe: 8 workers decoding
    the same and different files concurrently produce serial-identical
    results (this is exactly StreamingPipeline's ThreadPoolExecutor use)."""
    from concurrent.futures import ThreadPoolExecutor

    from pytorch_ddp_resnet_tpu.data.streaming import HostSampleProcessor
    from pytorch_ddp_resnet_tpu.data.transforms import RandomScaleTransform

    rng = np.random.default_rng(5)
    paths = []
    for i in range(12):
        h, w = int(rng.integers(80, 300)), int(rng.integers(80, 300))
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        p = tmp_path / f"s{i}.jpg"
        Image.fromarray(arr).save(p, "JPEG", quality=90)
        paths.append(str(p))

    host = [RandomScaleTransform((None, None, 3), target_short_side=72)]
    proc = HostSampleProcessor(host, crop_size=64, random_crop=True, seed=3)
    serial = [proc(p, epoch=1, index=i) for i, p in enumerate(paths * 4)]
    with ThreadPoolExecutor(max_workers=8) as pool:
        threaded = list(pool.map(
            lambda t: proc(t[1], epoch=1, index=t[0]),
            enumerate(paths * 4)))
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)


def test_decompression_bomb_cap():
    """The native path enforces PIL's MAX_IMAGE_PIXELS-equivalent cap
    instead of silently bypassing it (fastimage.cpp MAX_PIXELS)."""
    buf = io.BytesIO()
    Image.new("L", (12000, 8000)).save(buf, "JPEG", quality=10)  # 96M px
    with pytest.raises(ValueError, match="pixel cap"):
        fi.decode_jpeg(buf.getvalue())


def test_png_decode_matches_pil():
    rng = np.random.default_rng(6)
    # RGB, grayscale, and palette PNGs decode bit-identically to PIL
    rgb = rng.integers(0, 256, size=(45, 61, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(30, 41), dtype=np.uint8)
    pal = Image.fromarray(rgb).convert("P", palette=Image.ADAPTIVE)
    for im in (Image.fromarray(rgb), Image.fromarray(gray, "L"), pal):
        buf = io.BytesIO()
        im.save(buf, "PNG")
        data = buf.getvalue()
        pix, h, w = fi.decode_png(data)
        nat = np.frombuffer(pix, np.uint8).reshape(h, w, 3)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(nat, pil)


def test_png_alpha_falls_back(tmp_path):
    """Alpha PNGs raise in native (compositing differs from PIL's strip)
    and _decode_image silently takes the PIL path."""
    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, size=(20, 25, 4), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgba, "RGBA").save(buf, "PNG")
    with pytest.raises(ValueError):
        fi.decode_png(buf.getvalue())

    from pytorch_ddp_resnet_tpu.data.streaming import _decode_image

    p = tmp_path / "a.png"
    p.write_bytes(buf.getvalue())
    out = _decode_image(str(p))
    pil = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    np.testing.assert_array_equal(out, pil)


def test_png_16bit_falls_back():
    """16-bit PNGs raise in native (libpng gamma-converts, PIL truncates
    the high byte — different pixels) so the PIL path keeps parity."""
    rng = np.random.default_rng(8)
    arr16 = rng.integers(0, 65536, size=(10, 12), dtype=np.uint16)
    buf = io.BytesIO()
    Image.fromarray(arr16).save(buf, "PNG")  # uint16 -> 16-bit grayscale
    with pytest.raises(ValueError):
        fi.decode_png(buf.getvalue())


def test_decode_resize_rejects_bad_targets():
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG")
    for bad in (0, -3, 100000):
        with pytest.raises(ValueError):
            fi.decode_resize_jpeg(buf.getvalue(), (bad,))


def _smooth_image(rng, h, w):
    """Natural-image-like content: coarse field upsampled (low-frequency),
    so the DCT-scaled decode should track the full decode closely."""
    coarse = rng.normal(128, 40, size=(h // 16 + 1, w // 16 + 1, 3))
    field = np.kron(coarse, np.ones((16, 16, 1)))[:h, :w, :]
    return np.clip(field, 0, 255).astype(np.uint8)


def test_dct_scale_decode_contract():
    """decode_resize_jpeg's optional dct_min_short: same output dims as the
    full-decode path, min_short=0 bit-identical to the 2-arg form, and a
    smaller-than-target source falls through to a full decode."""
    rng = np.random.default_rng(11)
    arr = _smooth_image(rng, 500, 400)
    data = _jpeg_bytes(arr, quality=90)

    ref, h0, w0 = fi.decode_resize_jpeg(data, (256,))
    z, hz, wz = fi.decode_resize_jpeg(data, (256,), 0)
    assert (hz, wz) == (h0, w0) and z == ref  # 0 = feature off, exact path

    out, h1, w1 = fi.decode_resize_jpeg(data, (256,), 256)
    assert (h1, w1) == (h0, w0)  # resize contract unchanged
    a = np.frombuffer(ref, np.uint8).astype(np.int32)
    b = np.frombuffer(out, np.uint8).astype(np.int32)
    # smooth content: the scaled IDCT only drops above-Nyquist energy
    assert np.abs(a - b).mean() < 4.0

    # source short side (400) < target (600): scaled path must be the
    # identical full decode
    full, hf, wf = fi.decode_resize_jpeg(data, (600,), 600)
    plain, hp, wp_ = fi.decode_resize_jpeg(data, (600,))
    assert (hf, wf) == (hp, wp_) and full == plain


def test_dct_scale_rejects_bad_min_short():
    rng = np.random.default_rng(12)
    arr = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    data = _jpeg_bytes(arr)
    for bad in (-1, 70000):
        with pytest.raises(ValueError):
            fi.decode_resize_jpeg(data, (16,), bad)


def test_dct_scale_streaming_processor(tmp_path):
    """HostSampleProcessor(dct_scale=True) delivers the same shapes and
    near-identical pixels as the exact path on smooth content."""
    from pytorch_ddp_resnet_tpu.data.streaming import HostSampleProcessor
    from pytorch_ddp_resnet_tpu.data.transforms import (
        RandomScaleTransform,
    )

    rng = np.random.default_rng(13)
    p = tmp_path / "img.jpeg"
    Image.fromarray(_smooth_image(rng, 480, 360)).save(p, quality=90)
    scale = RandomScaleTransform((None, None, 3), target_short_side=64)
    exact = HostSampleProcessor([scale], crop_size=56, random_crop=False)
    fast = HostSampleProcessor([scale], crop_size=56, random_crop=False,
                               dct_scale=True)
    a = exact(str(p), 0, 0)
    b = fast(str(p), 0, 0)
    assert a.shape == b.shape == (56, 56, 3)
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).mean() < 4.0
