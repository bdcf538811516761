"""One-command real-weights rehearsal (VERDICT r3 next-#3).

When the released checkpoints arrive, this script is the single command that
proves the framework loads and reproduces them:

    python scripts/verify_checkpoints.py --sd /weights/stable-diffusion-v1-4 \
        --vae /weights/sd-vae-ft-mse --expect-real \
        [--sam sam_vit_h.pth] [--depth depth_anything_vitl14.pth] \
        [--exp <experiment-folder>] [--weights_dir /weights/metrics] \
        --output report.json

Stages (each prints PASS/FAIL/SKIP; exit code 0 iff no FAIL):

  scheduler   alphas_cumprod pinned against the diffusers DDIMScheduler
              constants the reference constructs (scaled_linear betas in
              [0.00085, 0.012], 1000 steps; reference
              GeoDiffuser/utils/diffusion.py:110, inversion.py:143).
  manifests   on-disk checkpoint key->shape layout must EXACTLY match the
              pinned manifests (geodiffuser_tpu/models/manifests/*.json)
              — released-geometry runs only.
  convert     diffusers checkpoint -> flax trees with exact structural
              agreement (load_sd_checkpoint), optional swap-VAE overlay
              (the reference swaps in stabilityai/sd-vae-ft-mse,
              diffusion.py:126-128).
  tokenizer   fixed-prompt token ids vs transformers' CLIPTokenizer from the
              same checkpoint dir.
  text_golden our CLIP text tower vs transformers' CLIPTextModel loaded from
              the same checkpoint dir (max-abs <= 2e-3 on the last hidden
              state) — a true activation pin that also runs against
              synthetic HF-format checkpoints.
  unet_golden our UNet vs diffusers' UNet2DConditionModel on a fixed
              (latents, t, context) probe — gated on diffusers being
              importable (it is not baked into this image).
  vae_golden  encode->decode roundtrip PSNR on a smooth synthetic image
              (>= 20 dB with real weights; reported, not asserted, without
              --expect-real since random/zero weights cannot reconstruct).
  edit        one full geometric edit on a shipped-format experiment folder
              (--exp, or a synthesized one), saved via save_results —
              the reference's large_scale_editor.py flow.
  eval        the LPIPS/CLIP parity table over that folder via the existing
              evaluation CLI (workflow: GeoDiffuser/evaluation/eval.txt:1-11).

Today (no network egress, no released weights) the whole flow is rehearsed
end to end by tests/test_verify_checkpoints.py against synthetic checkpoints
in the exact diffusers file layout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# diffusers DDIMScheduler(beta_start=8.5e-4, beta_end=1.2e-2, scaled_linear,
# 1000 train steps) cumulative-alpha constants (float64 reference values).
SCHED_GOLDEN = {0: 0.99915, 499: 0.27766965045646763, 999: 0.004660098513077238}
SCHED_SUM = 373.3766305691685

# Released-geometry parameter counts (from the pinned manifests).
PARAM_COUNT_GOLDEN = {"sd14_unet": 859_520_964, "sd_vae": 83_653_863,
                      "sd14_text_encoder": 123_060_480}

FIXED_PROMPT = "a photo of a cat sitting on a wooden chair"


class Report:
    def __init__(self):
        self.stages = {}
        self.failed = False

    def record(self, stage: str, status: str, detail: str = "", **extra):
        self.stages[stage] = {"status": status, "detail": detail, **extra}
        if status == "FAIL":
            self.failed = True
        print(f"[{stage:12s}] {status}  {detail}", flush=True)


def stage(report: Report, name: str):
    """Decorator: run a stage function, catching failures into the report.
    The function returns (status, detail) or raises."""

    def wrap(fn):
        t0 = time.time()
        try:
            status, detail = fn()
        except Exception as exc:  # noqa: BLE001 - every stage failure is a report row
            status, detail = "FAIL", f"{type(exc).__name__}: {exc}"
        report.record(name, status, detail, seconds=round(time.time() - t0, 2))

    return wrap


def _manifest(name: str) -> dict:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "geodiffuser_tpu", "models", "manifests", name + ".json")
    with open(path) as f:
        return json.load(f)


def _state_keys(path: str):
    """Key -> shape of an on-disk torch/safetensors state dict (no tensor
    data loaded for safetensors)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = tuple(f.get_slice(k).get_shape())
        return out
    import torch

    state = torch.load(path, map_location="meta", weights_only=True)
    return {k: tuple(v.shape) for k, v in state.items()}


def _find_weight_file(base: str, *rels: str) -> str:
    for rel in rels:
        p = os.path.join(base, rel)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"none of {rels} under {base}")


def _check_manifest(name: str, path: str) -> str:
    man = _manifest(name)
    disk = _state_keys(path)
    want = {k: tuple(s) for k, s in man["keys"].items()}
    missing = sorted(set(want) - set(disk))
    extra = sorted(set(disk) - set(want))
    bad = sorted(k for k in set(want) & set(disk) if want[k] != disk[k])
    if missing or extra or bad:
        raise ValueError(
            f"{name}: missing={missing[:5]} extra={extra[:5]} "
            f"shape-mismatch={[(k, want[k], disk[k]) for k in bad[:5]]}")
    n_params = sum(int(np.prod(s)) for s in disk.values())
    golden = PARAM_COUNT_GOLDEN.get(name)
    if golden is not None and n_params != golden:
        raise ValueError(f"{name}: param count {n_params} != {golden}")
    return f"{len(disk)} keys, {n_params:,} params"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sd", required=True,
                    help="diffusers StableDiffusion checkpoint directory")
    ap.add_argument("--vae", default=None,
                    help="swap-VAE directory (stabilityai/sd-vae-ft-mse)")
    ap.add_argument("--sam", default=None, help="SAM .pth checkpoint")
    ap.add_argument("--depth", default=None, help="Depth-Anything .pth checkpoint")
    ap.add_argument("--exp", default=None,
                    help="shipped-format experiment folder; synthesized when absent")
    ap.add_argument("--config", choices=["sd14", "tiny"], default="sd14",
                    help="model geometry (tiny = the test rehearsal geometry)")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50, help="DDIM steps for the edit")
    ap.add_argument("--expect-real", action="store_true",
                    help="assert reconstruction-quality pins (real weights)")
    ap.add_argument("--skip-edit", action="store_true")
    ap.add_argument("--weights_dir", default=None,
                    help="LPIPS/CLIP metric weights for the eval stage")
    ap.add_argument("--workdir", default=None,
                    help="where to synthesize the experiment folder")
    ap.add_argument("--output", default=None, help="write the report as JSON")
    args = ap.parse_args(argv)

    report = Report()
    released = args.config == "sd14"

    # ------------------------------------------------------------ scheduler
    @stage(report, "scheduler")
    def _scheduler():
        from geodiffuser_tpu.core import scheduler as sched

        s = sched.make_schedule()
        ac = np.asarray(s.alphas_cumprod, np.float64)
        for t, v in SCHED_GOLDEN.items():
            if abs(ac[t] - v) > 5e-7:
                raise ValueError(f"alphas_cumprod[{t}]={ac[t]!r} != {v!r}")
        if abs(float(ac.sum()) - SCHED_SUM) > 1e-3:
            raise ValueError(f"sum {ac.sum()} != {SCHED_SUM}")
        return "PASS", f"alphas_cumprod pinned at t=0/499/999 (+sum) vs diffusers"

    # ------------------------------------------------------------ manifests
    @stage(report, "manifests")
    def _manifests():
        if not released:
            return "SKIP", "manifests pin released geometry (--config sd14 only)"
        details = []
        for name, rels in (
            ("sd14_unet", ("unet/diffusion_pytorch_model.safetensors",
                           "unet/diffusion_pytorch_model.bin")),
            ("sd_vae", ("vae/diffusion_pytorch_model.safetensors",
                        "vae/diffusion_pytorch_model.bin")),
            ("sd14_text_encoder", ("text_encoder/model.safetensors",
                                   "text_encoder/pytorch_model.bin")),
        ):
            details.append(_check_manifest(name, _find_weight_file(args.sd, *rels)))
        if args.vae:
            details.append(_check_manifest("sd_vae", _find_weight_file(
                args.vae, "diffusion_pytorch_model.safetensors",
                "diffusion_pytorch_model.bin", "vae/diffusion_pytorch_model.safetensors")))
        return "PASS", "; ".join(details)

    # -------------------------------------------------------------- convert
    pipe_box = {}

    @stage(report, "convert")
    def _convert():
        from geodiffuser_tpu.config import ModelConfig
        from geodiffuser_tpu.core.pipeline import Pipeline
        from geodiffuser_tpu.models import weights as W

        cfg = ModelConfig() if released else ModelConfig.tiny()
        pipe = Pipeline.create(cfg, image_size=args.size, checkpoint_dir=args.sd)
        detail = "unet+vae+text converted, structure exact"
        if args.vae:
            pipe.params["vae"] = W.load_vae_override(args.vae, pipe.params["vae"], cfg)
            detail += "; swap-VAE overlaid (sd-vae-ft-mse slot)"
        pipe_box["pipe"] = pipe
        return "PASS", detail

    # ------------------------------------------------------------ tokenizer
    @stage(report, "tokenizer")
    def _tokenizer():
        vocab = os.path.join(args.sd, "tokenizer", "vocab.json")
        if not os.path.exists(vocab):
            return "SKIP", "no tokenizer/vocab.json in checkpoint"
        try:
            from transformers import CLIPTokenizer
        except Exception:
            return "SKIP", "transformers unavailable"
        hf = CLIPTokenizer.from_pretrained(os.path.join(args.sd, "tokenizer"))
        theirs = hf([FIXED_PROMPT], padding="max_length", max_length=77,
                    truncation=True)["input_ids"][0]
        ours = np.asarray(pipe_box["pipe"].tokenizer([FIXED_PROMPT]))[0]
        if list(ours) != list(theirs):
            raise ValueError(f"token ids diverge: {list(ours)[:12]} vs {list(theirs)[:12]}")
        return "PASS", f"fixed-prompt ids match transformers ({int(ours[1])}, ...)"

    # ---------------------------------------------------------- text golden
    @stage(report, "text_golden")
    def _text_golden():
        te_dir = os.path.join(args.sd, "text_encoder")
        if not os.path.exists(os.path.join(te_dir, "config.json")):
            return "SKIP", "no text_encoder/config.json (HF-format model needed)"
        try:
            import torch
            from transformers import CLIPTextModel
        except Exception:
            return "SKIP", "transformers unavailable"
        hf = CLIPTextModel.from_pretrained(te_dir).eval()
        pipe = pipe_box["pipe"]
        ids = np.asarray(pipe.tokenizer([FIXED_PROMPT]), np.int32)
        ours = np.asarray(pipe.encode_text([FIXED_PROMPT]), np.float32)
        with torch.no_grad():
            theirs = hf(torch.tensor(ids)).last_hidden_state.numpy()
        err = float(np.abs(ours - theirs).max())
        scale = float(np.abs(theirs).max()) or 1.0
        if err > max(2e-3, 2e-3 * scale):
            raise ValueError(f"text tower max-abs diff {err:.2e} (scale {scale:.2e})")
        return "PASS", f"last_hidden_state max-abs diff {err:.2e} vs transformers"

    # ---------------------------------------------------------- unet golden
    @stage(report, "unet_golden")
    def _unet_golden():
        try:
            import torch
            from diffusers import UNet2DConditionModel
        except Exception:
            return "SKIP", "diffusers not importable in this image"
        import jax.numpy as jnp

        pipe = pipe_box["pipe"]
        hf = UNet2DConditionModel.from_pretrained(os.path.join(args.sd, "unet")).eval()
        rng = np.random.RandomState(0)
        lat = rng.randn(1, 8, 8, 4).astype(np.float32)
        ctx = rng.randn(1, 77, pipe.config.cross_attention_dim).astype(np.float32)
        ours = np.asarray(pipe.unet_apply(
            pipe.params["unet"], jnp.asarray(lat), jnp.int32(421), jnp.asarray(ctx)
        ), np.float32)
        with torch.no_grad():
            theirs = hf(torch.tensor(lat.transpose(0, 3, 1, 2)), 421,
                        torch.tensor(ctx)).sample.numpy().transpose(0, 2, 3, 1)
        err = float(np.abs(ours - theirs).max())
        if err > 5e-2:
            raise ValueError(f"unet max-abs diff {err:.2e}")
        return "PASS", f"eps prediction max-abs diff {err:.2e} vs diffusers"

    # ----------------------------------------------------------- vae golden
    @stage(report, "vae_golden")
    def _vae_golden():
        pipe = pipe_box["pipe"]
        yy, xx = np.mgrid[0:args.size, 0:args.size].astype(np.float32) / args.size
        img = np.stack([0.5 + 0.4 * np.sin(6 * xx), 0.5 + 0.4 * np.cos(5 * yy),
                        0.5 + 0.3 * np.sin(4 * (xx + yy))], -1).astype(np.float32)
        z = pipe.encode_image(img)
        rec = pipe.decode_latents(z)[0].astype(np.float32) / 255.0
        mse = float(np.mean((rec - img) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        if args.expect_real and psnr < 20.0:
            raise ValueError(f"roundtrip PSNR {psnr:.1f} dB < 20 (real weights expected)")
        status = "PASS" if args.expect_real else "INFO"
        return status, f"encode->decode roundtrip PSNR {psnr:.1f} dB at {args.size}^2"

    # ----------------------------------------------------------------- SAM
    @stage(report, "sam")
    def _sam():
        if not args.sam:
            return "SKIP", "--sam not given"
        import jax

        from geodiffuser_tpu.models import weights as W
        from geodiffuser_tpu.models.sam import Sam, SamConfig

        if released:
            _check_manifest("sam_vit_h", args.sam)
        state = W._load_state(args.sam)
        converted = W.convert_sam(state)
        cfg = SamConfig.vit_h()
        m = Sam(cfg)
        init = jax.eval_shape(
            lambda k: m.init(k, np.zeros((1, cfg.img_size, cfg.img_size, 3)),
                             np.zeros((1, 1, 2)), np.zeros((1, 1), np.int32)),
            jax.random.PRNGKey(0))
        W._check_same_structure(init, converted, "sam")
        return "PASS", f"{len(state)} keys converted, structure exact (vit_h)"

    # ---------------------------------------------------------------- depth
    @stage(report, "depth")
    def _depth():
        if not args.depth:
            return "SKIP", "--depth not given"
        import jax

        from geodiffuser_tpu.models import weights as W
        from geodiffuser_tpu.models.depth_anything import (DepthAnything,
                                                           DepthAnythingConfig)

        if released:
            _check_manifest("depth_anything_vitl14", args.depth)
        state = W._load_state(args.depth)
        converted = W.convert_depth_anything(state)
        m = DepthAnything(DepthAnythingConfig())
        init = jax.eval_shape(
            lambda k: m.init(k, np.zeros((1, 518, 518, 3))), jax.random.PRNGKey(0))
        W._check_same_structure(init, converted, "depth_anything")
        return "PASS", f"{len(state)} keys converted, structure exact (vitl14)"

    # ----------------------------------------------------------------- edit
    exp_box = {}

    @stage(report, "edit")
    def _edit():
        if args.skip_edit:
            return "SKIP", "--skip-edit"
        import dataclasses

        from geodiffuser_tpu.config import EditConfig
        from geodiffuser_tpu.core.editor import perform_geometric_edit
        from geodiffuser_tpu.ops import camera
        from geodiffuser_tpu.utils import exp_io

        folder = args.exp
        if folder is None:
            folder = os.path.join(args.workdir or ".", "rehearsal_exp",
                                  "Translation_3D", "0")
            rng = np.random.RandomState(0)
            s = args.size
            img = (rng.rand(s, s, 3) * 255).astype(np.uint8)
            yy, xx = np.mgrid[0:s, 0:s]
            mask = (((xx - s * 0.4) ** 2 + (yy - s * 0.55) ** 2) < (s * 0.18) ** 2)
            exp_io.save_exp(folder, img, np.full((s, s), 0.5, np.float32),
                            mask.astype(np.float32),
                            camera.compose_transform(tx=0.08),
                            image_shape=(s, s))
        exp = exp_io.read_exp(folder)
        cfg = EditConfig(num_ddim_steps=args.steps, image_size=args.size)
        if not released:
            cfg = dataclasses.replace(cfg, skip_optim_steps=1, optimize_steps=0.65)
        res = perform_geometric_edit(
            pipe_box["pipe"], exp.input_image, exp.depth, exp.input_mask,
            exp.transform, cfg=cfg, prompt="")
        if not np.isfinite(res.edited_image.astype(np.float32)).all():
            raise ValueError("non-finite edit output")
        exp_io.save_results(exp, res.edited_image, res.loss_log)
        exp_box["root"] = os.path.dirname(os.path.dirname(folder.rstrip("/")))
        losses = [res.loss_log[k]["total"] for k in sorted(res.loss_log)]
        return "PASS", (f"{args.steps}-step edit on {folder}; "
                        f"loss {losses[0]:.2f} -> {losses[-1]:.2f}; result_ls.png saved")

    # ----------------------------------------------------------------- eval
    @stage(report, "eval")
    def _eval():
        if "root" not in exp_box:
            return "SKIP", "no edit output to evaluate"
        from geodiffuser_tpu.evaluation.__main__ import main as eval_main

        out = os.path.join(args.workdir or ".", "parity_table.json")
        argv2 = ["--exp_root", exp_box["root"], "--metric", "lpips", "--output", out]
        if args.weights_dir:
            argv2 += ["--weights_dir", args.weights_dir]
        rc = eval_main(argv2)
        if rc != 0:
            raise ValueError(f"evaluation CLI rc={rc}")
        with open(out) as f:
            table = json.load(f)
        keys = sorted(k for v in table.values() for k in v)
        return "PASS", f"parity table at {out} (metrics: {', '.join(sorted(set(keys)))})"

    if args.output:
        with open(args.output, "w") as f:
            json.dump(report.stages, f, indent=2)
        print(f"[report      ] wrote {args.output}", flush=True)
    n_pass = sum(1 for s in report.stages.values() if s["status"] in ("PASS", "INFO"))
    n_skip = sum(1 for s in report.stages.values() if s["status"] == "SKIP")
    print(f"[summary     ] {'FAIL' if report.failed else 'OK'} "
          f"({n_pass} passed, {n_skip} skipped)", flush=True)
    return 1 if report.failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
