"""SAM parity test against the vendored torch reference (small custom config).

Instantiates the vendored segment_anything modeling components with tiny
dimensions, converts the random-init state_dict, and compares mask/IoU
outputs end to end.  Skips if the reference tree is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

CFG = dict(img_size=64, patch=8, dim=48, depth=3, heads=2, global_idx=(1,),
           window=4, out_chans=32, dec_dim=32, dec_heads=2, dec_mlp=64)


@pytest.fixture(scope="module")
def torch_sam():
    if not os.path.isdir(os.path.join(REF, "GeoDiffuser", "segment_anything")):
        pytest.skip("reference tree not available")
    import torch

    # the vendored package __init__ pulls in torchvision (only for image
    # resizing in SamPredictor, unused here); stub it out
    import importlib.machinery
    import types

    def _mk(name):
        m = types.ModuleType(name)
        # transformers probes module.__spec__ when checking availability
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    if "torchvision" not in sys.modules:
        tv = _mk("torchvision")
        tvt = _mk("torchvision.transforms")
        tvf = _mk("torchvision.transforms.functional")
        tvf.resize = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
        tvf.to_pil_image = tvf.resize
        tvo = _mk("torchvision.ops")
        tvob = _mk("torchvision.ops.boxes")
        tvob.batched_nms = tvf.resize
        tvob.box_area = tvf.resize
        tv.transforms = tvt
        tvt.functional = tvf
        tv.ops = tvo
        tvo.boxes = tvob
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
        sys.modules["torchvision.ops"] = tvo
        sys.modules["torchvision.ops.boxes"] = tvob

    sys.path.insert(0, REF)
    from functools import partial

    from GeoDiffuser.segment_anything.modeling import (
        ImageEncoderViT, MaskDecoder, PromptEncoder, Sam, TwoWayTransformer,
    )

    c = CFG
    torch.manual_seed(0)
    grid = c["img_size"] // c["patch"]
    sam = Sam(
        image_encoder=ImageEncoderViT(
            depth=c["depth"], embed_dim=c["dim"], img_size=c["img_size"],
            mlp_ratio=4, norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
            num_heads=c["heads"], patch_size=c["patch"], qkv_bias=True,
            use_rel_pos=True, global_attn_indexes=c["global_idx"],
            window_size=c["window"], out_chans=c["out_chans"],
        ),
        prompt_encoder=PromptEncoder(
            embed_dim=c["dec_dim"], image_embedding_size=(grid, grid),
            input_image_size=(c["img_size"], c["img_size"]), mask_in_chans=16,
        ),
        mask_decoder=MaskDecoder(
            num_multimask_outputs=3,
            transformer=TwoWayTransformer(
                depth=2, embedding_dim=c["dec_dim"], mlp_dim=c["dec_mlp"],
                num_heads=c["dec_heads"],
            ),
            transformer_dim=c["dec_dim"],
            iou_head_depth=3, iou_head_hidden_dim=c["dec_dim"],
        ),
        pixel_mean=[0.0] * 3, pixel_std=[1.0] * 3,
    ).eval()
    return sam


def _our_cfg():
    from geodiffuser_tpu.models.sam import SamConfig

    c = CFG
    return SamConfig(
        img_size=c["img_size"], patch_size=c["patch"], embed_dim=c["dim"],
        depth=c["depth"], num_heads=c["heads"], global_attn_indexes=c["global_idx"],
        window_size=c["window"], out_chans=c["out_chans"], decoder_dim=c["dec_dim"],
        decoder_heads=c["dec_heads"], decoder_mlp_dim=c["dec_mlp"],
    )


def test_sam_encoder_and_decoder_parity(torch_sam):
    import torch

    import jax
    import jax.numpy as jnp

    from geodiffuser_tpu.models import weights as W
    from geodiffuser_tpu.models.sam import Sam as OurSam

    # out_chans must equal decoder dim for the decoder to consume embeddings
    state = {k: v.detach().numpy() for k, v in torch_sam.state_dict().items()}
    ours = OurSam(_our_cfg())

    rng = np.random.RandomState(1)
    x = rng.rand(1, CFG["img_size"], CFG["img_size"], 3).astype(np.float32)
    pts = np.array([[[40.0, 24.0], [10.0, 50.0]]], np.float32)
    lbl = np.array([[1, 0]], np.int32)

    params0 = jax.eval_shape(
        lambda: ours.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pts), jnp.asarray(lbl)
        )
    )
    converted = W.convert_sam(state)
    W._check_same_structure(params0, converted, "sam")

    masks_ours, iou_ours = ours.apply(
        converted, jnp.asarray(x), jnp.asarray(pts), jnp.asarray(lbl)
    )
    masks_ours = np.asarray(masks_ours)
    iou_ours = np.asarray(iou_ours)

    with torch.no_grad():
        emb = torch_sam.image_encoder(torch.tensor(x.transpose(0, 3, 1, 2)))
        sparse, dense = torch_sam.prompt_encoder(
            points=(torch.tensor(pts), torch.tensor(lbl)), boxes=None, masks=None
        )
        low_res, iou_ref = torch_sam.mask_decoder(
            image_embeddings=emb,
            image_pe=torch_sam.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=False,
        )
    # torch multimask_output=False returns mask 0 only; compare all 4 via our
    # outputs against a full-mask reference call
    with torch.no_grad():
        low_res_all, iou_all = torch_sam.mask_decoder(
            image_embeddings=emb,
            image_pe=torch_sam.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=True,
        )
    # multimask_output=True drops mask 0 -> compare our masks[1:4]
    ref = low_res_all.numpy()
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(masks_ours[:, 1:4] - ref).max() / scale < 2e-4
    assert np.abs(iou_ours[:, 1:4] - iou_all.numpy()).max() < 2e-4
