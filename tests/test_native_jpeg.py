"""Native libjpeg decode path (tennis_tpu/native/jpeg*): bit-exactness vs cv2,
SIMD-only DCT scaling, and the cv2 fallback chain in the dataset reader."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tennis_tpu.data.tennis_set import _read_image_rgb
from tennis_tpu.native.jpeg import HAVE_NATIVE_JPEG, decode_jpeg, decode_jpeg_file

needs_native = pytest.mark.skipif(not HAVE_NATIVE_JPEG,
                                  reason="no native toolchain/libjpeg")


@pytest.fixture(scope="module")
def jpg(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpg")
    rng = np.random.default_rng(0)
    img = cv2.resize(rng.integers(0, 255, (45, 80, 3), np.uint8), (1280, 720),
                     interpolation=cv2.INTER_CUBIC)
    p = str(d / "frame.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    return p


@needs_native
def test_full_decode_bit_exact_with_cv2(jpg):
    """cv2 links the same libjpeg-turbo generation: full-scale output must be
    IDENTICAL, so the native path is a pure speedup, not a deviation."""
    ours = decode_jpeg_file(jpg)
    ref = cv2.cvtColor(cv2.imread(jpg), cv2.COLOR_BGR2RGB)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


@needs_native
def test_scaled_decode_simd_factors_only(jpg):
    # 720 short side, min 544 -> no SIMD scale fits, full decode
    assert decode_jpeg_file(jpg, 544).shape == (720, 1280, 3)
    # min 360 -> 1/2 scale fits exactly
    half = decode_jpeg_file(jpg, 360)
    assert half.shape == (360, 640, 3)
    # and the scaled image resembles a downscaled full decode (DCT vs area
    # averaging differ, so compare loosely)
    full = decode_jpeg_file(jpg)
    area = cv2.resize(full, (640, 360), interpolation=cv2.INTER_AREA)
    assert np.abs(half.astype(int) - area.astype(int)).mean() < 16
    # min 90 -> 1/8
    assert decode_jpeg_file(jpg, 90).shape == (90, 160, 3)


def test_non_jpeg_returns_none_and_reader_falls_back(tmp_path):
    png = str(tmp_path / "x.png")
    cv2.imwrite(png, np.full((32, 48, 3), 17, np.uint8))
    assert decode_jpeg_file(png) is None
    img = _read_image_rgb(png, 544)  # cv2 fallback path
    assert img.shape == (32, 48, 3) and int(img[0, 0, 0]) == 17


def test_garbage_bytes_return_none():
    assert decode_jpeg(b"not a jpeg at all") is None
    assert decode_jpeg(b"") is None


@needs_native
def test_dataset_reader_uses_native(jpg):
    ours = _read_image_rgb(jpg, None)
    ref = cv2.cvtColor(cv2.imread(jpg), cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(ours, ref)


def test_concurrent_first_use_compiles_once(tmp_path):
    """N processes racing the first-use build must all end up with a valid
    library and leave no temp artifacts (the build is locked + atomic)."""
    import shutil
    import subprocess
    import sys

    import tennis_tpu.native as native

    src_dir = tmp_path / "native"
    shutil.copytree(os.path.dirname(native.__file__), src_dir,
                    ignore=shutil.ignore_patterns("*.so", "*.lock", "__pycache__"))
    (tmp_path / "tennis_tpu").mkdir()
    (tmp_path / "tennis_tpu" / "__init__.py").write_text("")
    shutil.move(str(src_dir), str(tmp_path / "tennis_tpu" / "native"))

    code = (
        "import numpy as np\n"
        "from tennis_tpu.native import jpeg\n"
        "import tennis_tpu.native as n\n"
        "assert n._load() is not None\n"
        "assert jpeg._load() is not None\n"
        "print('ok')\n"
    )
    env = dict(os.environ, PYTHONPATH=str(tmp_path))
    procs = [subprocess.Popen([sys.executable, "-c", code], env=env,
                              cwd=str(tmp_path),  # keep /root/repo off sys.path
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True) for _ in range(4)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        assert out.strip() == "ok"
    built = os.listdir(tmp_path / "tennis_tpu" / "native")
    assert "libbatch_ops.so" in built and "libjpeg_decode.so" in built
    assert not [f for f in built if ".tmp." in f]


def test_unwritable_dir_degrades_to_fallback(tmp_path, monkeypatch):
    """A read-only install dir (no prebuilt .so, lock file uncreatable) must
    return False — the numpy/cv2 fallback contract — not raise."""
    import builtins

    from tennis_tpu import native

    src = tmp_path / "x.cpp"
    src.write_text("int f() { return 0; }\n")
    lib = str(tmp_path / "libx.so")

    real_open = builtins.open

    def deny_lock(path, *a, **k):
        # chmod can't simulate this under root; deny the lock file directly
        if str(path).endswith(".lock"):
            raise PermissionError(13, "Permission denied", str(path))
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", deny_lock)
    assert native.compile_shared(str(src), lib) is False
