"""Behavioral fingerprint regression test.

The reference relies on fixed seeds + determinism flags in place of
regression tests (SURVEY.md §4.3).  This pins the full tiny-model edit
pipeline's output statistics on CPU: any unintentional change to the
scheduler math, loss wiring, update rules, warps or histogram matching will
shift these numbers.  Tolerances are loose enough for cross-platform f32
noise but tight enough to catch semantic drift.

If a change is *supposed* to alter behavior, update the constants and say so
in the commit message.
"""

import numpy as np
import pytest

from geodiffuser_tpu.config import EditConfig, ModelConfig
from geodiffuser_tpu.core.editor import EditSession
from geodiffuser_tpu.core.pipeline import Pipeline
from geodiffuser_tpu.ops import camera

# Fingerprints recorded 2026-08-16 (round 1 final).
EDITED_MEAN = 109.96
EDITED_STD = 81.09
RECON_MEAN = 81.94
RECON_STD = 54.09
LOSS_STEP0 = 44.32
LOSS_STEP2 = 257.19


def test_edit_pipeline_fingerprint():
    pipe = Pipeline.create(ModelConfig.tiny(), image_size=128)
    cfg = EditConfig(
        num_ddim_steps=4, skip_optim_steps=2, optimize_steps=0.65, latent_replace=0.3
    )
    rng = np.random.RandomState(0)
    image = rng.rand(128, 128, 3).astype(np.float32)
    yy, xx = np.mgrid[0:128, 0:128]
    mask = (((xx - 50) ** 2 + (yy - 70) ** 2) < 25 ** 2).astype(np.float32)
    depth = np.full((128, 128), 0.5, np.float32)
    sess = EditSession(pipe, cfg)
    res = sess.run(image, depth, mask, camera.compose_transform(tx=0.05), prompt="a thing")

    e = res.edited_image.astype(np.float64)
    r = res.images[0].astype(np.float64)
    assert e.mean() == pytest.approx(EDITED_MEAN, abs=1.5), e.mean()
    assert e.std() == pytest.approx(EDITED_STD, abs=1.5), e.std()
    assert r.mean() == pytest.approx(RECON_MEAN, abs=1.5), r.mean()
    assert r.std() == pytest.approx(RECON_STD, abs=1.5), r.std()
    assert res.loss_log[0]["total"] == pytest.approx(LOSS_STEP0, rel=0.05)
    assert res.loss_log[2]["total"] == pytest.approx(LOSS_STEP2, rel=0.05)
