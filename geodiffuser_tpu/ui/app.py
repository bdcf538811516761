"""Gradio app — thin layer over ui/callbacks.py.

Rebuilds the two-tab reference UI (geo_diff_ui.py:62-1272: "Editing Real
Image" and "Inpainting") against the callback layer.  Gated on gradio being
installed (not present in the TPU build image); everything testable lives in
callbacks.py.
"""

from __future__ import annotations

import numpy as np

from geodiffuser_tpu.config import EditConfig, ModelConfig
from geodiffuser_tpu.ui import callbacks as cb


def build_app(checkpoint_dir=None, image_size: int = 512):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "gradio is not installed in this environment; use the programmatic "
            "API (core.editor.perform_geometric_edit) or the batch driver "
            "(parallel.driver) instead"
        ) from e

    import jax.numpy as jnp

    from geodiffuser_tpu.core.pipeline import Pipeline

    state = cb.UIState()
    state.pipeline = Pipeline.create(
        ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16),
        image_size=image_size, checkpoint_dir=checkpoint_dir,
    )

    def on_upload(img):
        return cb.load_image(state, img)

    def on_click(img, evt: "gr.SelectData"):
        x, y = evt.index
        h, w = state.image.shape[:2]
        return cb.get_mask(state, x / w, y / h)

    def on_depth(model, translate_factor):
        return cb.get_depth(state, model, translate_factor)

    def on_preview(tx, ty, tz, rx, ry, rz, sx, sy, sz, focal):
        cb.compose_transform_from_sliders(state, tx, ty, tz, rx, ry, rz, sx, sy, sz)
        return cb.get_transformed_preview(state, focal_length=focal)

    def on_edit(prompt, guidance, steps, lr, optimize_steps, latent_replace,
                skip, diffusion_correction, progress=None):
        cfg = EditConfig(
            guidance_scale=guidance, num_ddim_steps=int(steps), lr=lr,
            optimize_steps=optimize_steps, latent_replace=latent_replace,
            skip_optim_steps=int(skip), obj_edit_step=1.0 - diffusion_correction,
        )
        return cb.get_edited_image(state, prompt, cfg)

    def on_inpaint(prompt):
        return cb.inpaint_mask(state, prompt)

    with gr.Blocks(title="GeoDiffuser-TPU") as demo:
        with gr.Tab("Editing Real Image"):
            with gr.Row():
                inp = gr.Image(label="Input")
                mask_view = gr.Image(label="Mask (click object)")
                prev = gr.Image(label="Transformed preview")
                out = gr.Image(label="Edited")
            with gr.Row():
                depth_model = gr.Dropdown(
                    ["depth_anything", "constant"], value="depth_anything", label="Depth model"
                )
                translate_factor = gr.Slider(0.0, 2.0, 0.7, label="translate factor")
                depth_view = gr.Image(label="Depth")
                depth_btn = gr.Button("Get Depth")
            sliders = [
                gr.Slider(-0.5, 0.5, 0.0, label=n) for n in ("tx", "ty", "tz")
            ] + [
                gr.Slider(-90, 90, 0.0, label=n) for n in ("rx", "ry", "rz")
            ] + [
                gr.Slider(0.5, 1.5, 1.0, label=n) for n in ("sx", "sy", "sz")
            ]
            focal = gr.Slider(100, 1000, 550, label="focal length")
            preview_btn = gr.Button("Check Transformed Image")
            with gr.Accordion("Advanced", open=False):
                prompt = gr.Textbox(label="prompt", value="")
                guidance = gr.Slider(1.0, 10.0, 3.0, label="guidance")
                steps = gr.Slider(25, 50, 50, step=1, label="DDIM steps")
                lr = gr.Slider(0.0, 0.1, 0.03, label="lr")
                optimize_steps = gr.Slider(0.0, 1.0, 0.65, label="optimize steps")
                latent_replace = gr.Slider(0.0, 1.0, 0.1, label="latent replace")
                skip = gr.Slider(1, 5, 2, step=1, label="skip optim steps")
                diffusion_correction = gr.Slider(0.0, 0.4, 0.1, label="diffusion correction")
            edit_btn = gr.Button("Move Object")

            inp.upload(on_upload, inp, inp)
            inp.select(on_click, inp, mask_view)
            depth_btn.click(on_depth, [depth_model, translate_factor], depth_view)
            preview_btn.click(on_preview, sliders + [focal], prev)
            edit_btn.click(
                on_edit,
                [prompt, guidance, steps, lr, optimize_steps, latent_replace,
                 skip, diffusion_correction],
                out,
            )

        with gr.Tab("Inpainting"):
            with gr.Row():
                inp2 = gr.Image(label="Input")
                mask_view2 = gr.Image(label="Mask (click object)")
                out2 = gr.Image(label="Inpainted")
            prompt2 = gr.Textbox(label="prompt", value="")
            inpaint_btn = gr.Button("Inpaint Mask")
            inp2.upload(on_upload, inp2, inp2)
            inp2.select(on_click, inp2, mask_view2)
            inpaint_btn.click(on_inpaint, prompt2, out2)

    return demo


if __name__ == "__main__":
    build_app().queue().launch()
