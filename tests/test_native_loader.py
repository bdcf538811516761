"""Native C++ experiment loader tests (compiled on first use)."""

import numpy as np
import pytest

from geodiffuser_tpu.ops import camera
from geodiffuser_tpu.utils import exp_io


@pytest.fixture(scope="module")
def exp_folder(tmp_path_factory):
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("exps")
    folders = []
    for i in range(3):
        folder = str(root / "Translation_2D" / str(i + 1))
        img = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
        mask = (rng.rand(64, 48) > 0.5).astype(np.float32)
        depth = rng.rand(64, 48).astype(np.float32)
        t = camera.compose_transform(tx=0.1 * (i + 1))
        exp_io.save_exp(folder, img, depth, mask, t, image_shape=(64, 48))
        folders.append(folder)
    return folders


def test_native_npy_png(exp_folder):
    from geodiffuser_tpu.native import loader

    ref = exp_io.read_exp(exp_folder[0])
    img = loader.load_png(exp_folder[0] + "/input_image.png")
    np.testing.assert_array_equal(img, ref.input_image)
    d = loader.load_npy(exp_folder[0] + "/depth.npy")
    np.testing.assert_allclose(d, ref.depth, rtol=1e-6)
    t = loader.load_npy(exp_folder[0] + "/transform.npy")
    np.testing.assert_allclose(t, ref.transform, rtol=1e-12)


def test_native_prefetcher(exp_folder):
    from geodiffuser_tpu.native import loader

    got = list(loader.NativePrefetcher(exp_folder, threads=2))
    assert len(got) == 3
    paths = sorted(e.path for e in got)
    assert paths == sorted(exp_folder)
    for e in got:
        ref = exp_io.read_exp(e.path)
        np.testing.assert_array_equal(e.input_image, ref.input_image)
        np.testing.assert_allclose(e.input_mask, ref.input_mask, atol=1e-6)
        np.testing.assert_allclose(e.depth, ref.depth, rtol=1e-6)
        np.testing.assert_allclose(e.transform, ref.transform, rtol=1e-12)
