"""Evaluation subsystem tests (offline-runnable parts)."""

import numpy as np
import pytest

from geodiffuser_tpu.config import ModelConfig
from geodiffuser_tpu.core.pipeline import Pipeline
from geodiffuser_tpu.evaluation import dift
from geodiffuser_tpu.ops import camera


def test_harris_keypoints_find_corners():
    img = np.zeros((64, 64), np.float32)
    img[20:44, 20:44] = 1.0  # a square: corners at (20,20),(20,43),(43,20),(43,43)
    kps = dift.harris_keypoints(img, max_points=8)
    assert len(kps) >= 4
    corners = np.array([[20, 20], [43, 20], [20, 43], [43, 43]], np.float64)
    for c in corners:
        d = np.abs(kps - c).sum(-1).min()
        assert d <= 4, (c, kps)


def test_md_metric_identity_transform_small():
    pipe = Pipeline.create(ModelConfig.tiny(), image_size=64)
    feat = dift.SDFeaturizer(pipe, t=261, up_block=1, ensemble=2)
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64, 3).astype(np.float32)
    img[20:44, 20:44] += 1.0
    img = np.clip(img / img.max(), 0, 1)
    mask = np.zeros((64, 64), np.float32)
    mask[20:44, 20:44] = 1.0
    tc = np.asarray(camera.identity_field(64, 64))
    md, n = dift.mean_distance_metric(feat, img, img, mask, tc, max_points=10)
    assert n > 0 and np.isfinite(md)
    # identical images + identity transform: matches should be near-exact up
    # to the latent-grid quantization (feature res is 1/8 of image -> allow a
    # couple of feature cells; with a tiny random UNet allow slack)
    assert md < 40.0, md


def test_md_featurizer_sd21_geometry():
    """The MD featurizer builds with SD-2.x geometry (the reference's DIFT
    model, dift_sd.py:16) and the metric runs against it (VERDICT r2
    next-#5).  Tiny-scale stand-in for the weight-gated full model."""
    pipe = Pipeline.create(ModelConfig.tiny_sd21(), image_size=64)
    feat = dift.SDFeaturizer(pipe, t=261, up_block=1, ensemble=2)
    rng = np.random.RandomState(1)
    img = np.clip(rng.rand(64, 64, 3), 0, 1).astype(np.float32)
    img[16:40, 16:40] += 0.8
    img = img / img.max()
    mask = np.zeros((64, 64), np.float32)
    mask[16:40, 16:40] = 1.0
    tc = np.asarray(camera.identity_field(64, 64))
    md, n = dift.mean_distance_metric(feat, img, img, mask, tc, max_points=8)
    assert n > 0 and np.isfinite(md)


def test_lpips_network_shapes():
    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.evaluation.lpips import LPIPS

    m = LPIPS()
    a = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), a, a)
    d = m.apply(params, a, a)
    assert d.shape == (1,) and float(d[0]) == 0.0
    b = jnp.ones((1, 64, 64, 3)) * 0.5
    d2 = m.apply(params, a, b)
    assert float(d2[0]) != 0.0


def test_study_csv_and_gallery(tmp_path):
    from geodiffuser_tpu.evaluation import study
    from geodiffuser_tpu.utils import exp_io

    csv_path = tmp_path / "study.csv"
    csv_path.write_text("ours,dragon\nours,ours\nzero123,ours\n")
    res = study.analyze_study_csv([str(csv_path)], ["ours", "dragon", "zero123"])
    assert res["ours"]["count"] == 4 and res["dragon"]["count"] == 1
    assert abs(sum(v["rate"] for v in res.values()) - 1.0) < 1e-3  # rates rounded to 4dp

    rng = np.random.RandomState(0)
    folder = str(tmp_path / "Mix" / "1")
    exp_io.save_exp(folder, (rng.rand(32, 32, 3) * 255).astype(np.uint8),
                    rng.rand(32, 32), (rng.rand(32, 32) > 0.5).astype(np.float32),
                    np.eye(4))
    out = study.build_gallery(str(tmp_path), str(tmp_path / "gallery.png"))
    import os
    assert os.path.exists(out)


def test_evaluation_cli_offline_and_json(tmp_path):
    """python -m geodiffuser_tpu.evaluation over a synthetic experiment tree
    (reference workflow: evaluation/eval.txt) — offline metrics always work;
    weight-gated ones degrade gracefully."""
    import json

    import numpy as np

    from geodiffuser_tpu.evaluation.__main__ import main
    from geodiffuser_tpu.ops import camera
    from geodiffuser_tpu.utils import exp_io

    rng = np.random.RandomState(0)
    size = 32
    for cat, n in (("Translation_2D", 2), ("Rotation_3D", 1)):
        for i in range(n):
            folder = str(tmp_path / cat / str(i))
            img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            mask = np.zeros((size, size), np.float32)
            mask[8:16, 8:16] = 1.0
            depth = np.full((size, size), 0.5, np.float32)
            t = camera.compose_transform(tx=0.05)
            exp_io.save_exp(folder, img, depth, mask, t, image_shape=(size, size))
            from PIL import Image

            Image.fromarray(img).save(folder + "/result_ls.png")
            # one baseline-method result (reference folder layout)
            import os
            os.makedirs(folder + "/zero123", exist_ok=True)
            Image.fromarray(img).save(
                folder + "/zero123/lama_followed_by_zero123_result.png"
            )

    out = str(tmp_path / "summary.json")
    rc = main(["--exp_root", str(tmp_path), "--metric", "offline", "--output", out])
    assert rc == 0
    summary = json.load(open(out))
    assert "Translation_2D/ours" in summary
    assert "Translation_2D/zero123" in summary
    assert "Rotation_3D/ours" in summary
    # identical image -> warp error small but nonzero (splat blur), ssim ~ 1
    assert summary["Translation_2D/ours"]["ssim"] > 0.99

    # weight-gated path degrades to psnr/ssim without raising
    rc = main(["--exp_root", str(tmp_path), "--metric", "lpips",
               "--evaluation_type", "2D", "--output", out])
    assert rc == 0
    summary = json.load(open(out))
    assert set(summary) == {"Translation_2D/ours", "Translation_2D/zero123"}
    assert "psnr" in summary["Translation_2D/ours"]
    assert "lpips" not in summary["Translation_2D/ours"]

    # md without weights -> warp-only, skips non-md categories
    rc = main(["--exp_root", str(tmp_path), "--metric", "md", "--output", out])
    assert rc == 0
    summary = json.load(open(out))
    assert "Translation_2D/ours" in summary
    assert "warp_l1" in summary["Translation_2D/ours"]


def test_sift_dog_keypoints():
    """DoG detector fires on blob/corner structure, respects the mask, and
    the MD metric consumes it (reference uses cv2.SIFT positions only)."""
    import numpy as np

    from geodiffuser_tpu.evaluation.dift import detect_keypoints, sift_keypoints

    rng = np.random.RandomState(0)
    img = np.zeros((64, 64))
    img[20:40, 20:40] = 1.0
    img += rng.rand(64, 64) * 0.02
    kps = sift_keypoints(img)
    assert len(kps) >= 4
    # the square's corners are all detected (within a few px)
    corners = np.asarray([[20, 20], [20, 39], [39, 39], [39, 20]], float)
    d = np.linalg.norm(kps[:, None, :] - corners[None], axis=-1).min(axis=0)
    assert (d < 4).all(), d

    mask = np.zeros((64, 64))
    mask[:, :32] = 1.0
    kps_m = detect_keypoints(img, mask)
    assert len(kps_m) > 0 and (kps_m[:, 0] < 32).all()

    # featureless in-mask region -> Harris fallback path still returns
    flat = rng.rand(64, 64) * 0.01
    kps_f = detect_keypoints(flat, mask, max_points=5)
    assert kps_f.shape[1] == 2


def test_evaluation_cli_fid(tmp_path):
    """--metric fid sweeps the tree per method (fid_is_score_geodiff flow);
    degrades to a pixel embedder without CLIP weights."""
    import json

    import numpy as np
    from PIL import Image

    from geodiffuser_tpu.evaluation.__main__ import main
    from geodiffuser_tpu.ops import camera
    from geodiffuser_tpu.utils import exp_io

    rng = np.random.RandomState(0)
    size = 32
    for i in range(3):
        folder = str(tmp_path / "Translation_2D" / str(i))
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        mask = np.zeros((size, size), np.float32)
        mask[8:16, 8:16] = 1.0
        exp_io.save_exp(folder, img, np.full((size, size), 0.5, np.float32),
                        mask, camera.compose_transform(tx=0.05),
                        image_shape=(size, size))
        Image.fromarray(img).save(folder + "/result_ls.png")

    out = str(tmp_path / "fid.json")
    rc = main(["--exp_root", str(tmp_path), "--metric", "fid", "--output", out])
    assert rc == 0
    summary = json.load(open(out))
    # identical result images -> FID ~ 0
    assert summary["ours"]["fid"] < 1e-4
