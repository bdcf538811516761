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

# Per-step goldens recorded 2026-08-19 (round 4): total loss at EVERY
# optimize step and the adaptive-weight trajectory of a 64^2 tiny edit
# (6 DDIM steps, skip_optim_steps=1 -> optimize steps 0..3), recorded under
# the test env (8 virtual CPU devices) where runs are bit-deterministic
# across processes.  Tolerances: 1% on the early steps; 4% on the later ones,
# because XLA:CPU codegen differences (flags/ISA) reassociate float
# accumulation and the drift compounds through the optimize updates
# (measured 1.9% at step 3 between two compile envs on one machine).  The
# adaptive-weight trajectory is exact (threshold rules) and pinned to 1e-6.
# Update policy: only with an intentional behavior change, re-recorded by
# the capture snippet in the commit that changes them, and said so in the
# commit message.
LOSS_CURVE_GOLDEN = {0: 29.6965, 1: 120.4855, 2: 111.1792, 3: 143.3811}
LOSS_CURVE_REL = {0: 0.01, 1: 0.01, 2: 0.04, 3: 0.04}
# self/removal is the one adaptively-driven weight in the editor mode
# (adaptive_step): its doubling trajectory pins the controller.
REMOVAL_WEIGHT_GOLDEN = {0: 3.38, 1: 4.394, 2: 5.7122, 3: 11.4244}
STATIC_WEIGHTS_GOLDEN = {
    "cross/amodal": 3.5, "cross/movement": 30.34, "cross/removal": 2.6,
    "cross/sim": 45.0, "cross/smoothness": 15.0, "self/amodal": 80.5,
    "self/movement": 30.5, "self/sim": 55.0, "self/smoothness": 30.0,
}


@pytest.mark.fast
def test_loss_curve_golden():
    """Per-step loss curve + adaptive-weight trajectory at 64^2 (the fast
    tier's full-edit regression net)."""
    size = 64
    pipe = Pipeline.create(ModelConfig.tiny(), image_size=size)
    cfg = EditConfig(
        num_ddim_steps=6, skip_optim_steps=1, optimize_steps=0.65, latent_replace=0.3
    )
    rng = np.random.RandomState(0)
    image = rng.rand(size, size, 3).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    mask = (((xx - 25) ** 2 + (yy - 35) ** 2) < 12 ** 2).astype(np.float32)
    depth = np.full((size, size), 0.5, np.float32)
    sess = EditSession(pipe, cfg)
    res = sess.run(image, depth, mask, camera.compose_transform(tx=0.05), prompt="a thing")

    assert sorted(res.loss_log) == sorted(LOSS_CURVE_GOLDEN)
    for step, total in LOSS_CURVE_GOLDEN.items():
        assert res.loss_log[step]["total"] == pytest.approx(
            total, rel=LOSS_CURVE_REL[step]
        ), (step, res.loss_log[step]["total"])
    for step, w in REMOVAL_WEIGHT_GOLDEN.items():
        assert res.weight_log[step]["self/removal"] == pytest.approx(w, rel=1e-6), (
            step, res.weight_log[step])
    for key, w in STATIC_WEIGHTS_GOLDEN.items():
        assert res.weight_log[3][key] == pytest.approx(w, rel=1e-6), key


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
