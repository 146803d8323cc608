"""Gradio object-removal app (reference web-demos/hugging_face/app.py).

3-step flow, matching the reference UI surface:
  1. upload & extract frames, scrub to any template frame with a slider;
  2. click the template frame to segment (positive/negative points, painted
     preview with click dots), accumulate MULTIPLE masks with Add mask /
     Remove mask and a selection dropdown (app.py:166-201);
  3. track the selected masks through the video and inpaint, with sliders
     for resize ratio / dilate radius / raft iters / subvideo length /
     neighbor length / ref stride (the reference's inpaint_video controls,
     app.py:264-296) and an optional tracking end frame.

Requires `gradio` (not bundled in the TPU image); the module degrades to a
clear error message so the rest of the package never depends on it. All
mask/state logic lives in gradio-free helpers (demo/multimask.py, tested in
tests/test_demo.py) — this file only wires widgets.

Run: python -m propainter_tpu.demo.app --weights weights
"""

from __future__ import annotations

import argparse

import numpy as np

from propainter_tpu.demo.multimask import MultiMaskSession


def build_app(facade):
    import gradio as gr

    state = {"frames": [], "points": [], "labels": [], "mask": None,
             "select_frame": 0, "fps": 24, "track_end": None}
    multi = MultiMaskSession()

    def extract_frames(video_path):
        from propainter_tpu.utils.video import read_frames

        frames, fps, _, _ = read_frames(video_path)
        state["frames"] = [np.asarray(f) for f in frames]
        state["fps"] = fps or 24
        state["points"], state["labels"] = [], []
        state["select_frame"] = 0
        multi.remove_all()
        n = len(state["frames"])
        return (state["frames"][0], f"{n} frames @ {fps} fps",
                gr.update(maximum=n - 1, value=0),
                gr.update(maximum=n, value=n))

    def select_template(frame_idx):
        """Scrub to the template frame (reference select_template,
        app.py:128-140); clicks reset, the segmenter re-embeds."""
        state["select_frame"] = int(frame_idx)
        state["points"], state["labels"] = [], []
        seg = getattr(facade, "segmenter", None)
        if seg is not None and hasattr(seg, "sam_controler"):
            seg.sam_controler.reset_image()
        return state["frames"][state["select_frame"]]

    def on_click(point_type, evt: "gr.SelectData"):
        x, y = evt.index
        state["points"].append([x, y])
        state["labels"].append(1 if point_type == "foreground" else 0)
        mask, _, painted = facade.first_frame_click(
            state["frames"][state["select_frame"]],
            np.array(state["points"]), np.array(state["labels"]))
        state["mask"] = mask
        return painted

    def clear_clicks():
        state["points"], state["labels"] = [], []
        return (state["frames"][state["select_frame"]]
                if state["frames"] else None)

    # -- multi-mask management (reference app.py:166-201) -------------------
    def add_mask(mask_dropdown):
        if state["mask"] is None:
            return gr.update(), gr.update(), \
                "Click the image to generate a mask first."
        name = multi.add_mask(state["mask"])
        selected = list(mask_dropdown) + [name]
        painted = multi.show(state["frames"][state["select_frame"]].copy(),
                             selected)
        state["points"], state["labels"] = [], []
        return (gr.update(choices=multi.mask_names, value=selected),
                painted, f"Added {name}.")

    def remove_masks():
        multi.remove_all()
        return (gr.update(choices=[], value=[]),
                state["frames"][state["select_frame"]]
                if state["frames"] else None,
                "Removed all masks.")

    def show_masks(mask_dropdown):
        if not state["frames"]:
            return None
        return multi.show(state["frames"][state["select_frame"]].copy(),
                          list(mask_dropdown))

    def track_and_inpaint(mask_dropdown, track_end, ratio, dilate, raft_iter,
                          subvideo, neighbor, ref_stride):
        # template composition (reference vos_tracking_video,
        # app.py:210-230): selected masks -> id-labeled template
        if multi.masks:
            template = multi.template_mask(
                list(mask_dropdown) or [multi.mask_names[0]])
        else:
            template = state["mask"]
        start = state["select_frame"]
        end = int(track_end) if track_end else len(state["frames"])
        following = state["frames"][start:end]
        masks, _, _ = facade.generator(following, template)
        out = facade.inpaint(
            np.stack(following), np.stack(masks), ratio=ratio,
            dilate_radius=int(dilate), raft_iter=int(raft_iter),
            subvideo_length=int(subvideo), neighbor_length=int(neighbor),
            ref_stride=int(ref_stride))
        import imageio, tempfile, os

        path = os.path.join(tempfile.mkdtemp(), "inpaint_out.mp4")
        imageio.mimwrite(path, list(out), fps=state["fps"], quality=7)
        return path

    with gr.Blocks() as app:
        gr.Markdown("## ProPainter-TPU — interactive object removal")
        with gr.Row():
            video_in = gr.Video(label="input video")
            first_frame = gr.Image(label="template frame (click the object)")
        status = gr.Textbox(label="status")
        frame_slider = gr.Slider(0, 1, 0, step=1, label="template frame")
        point_type = gr.Radio(["foreground", "background"],
                              value="foreground", label="click type")
        with gr.Row():
            clear_btn = gr.Button("Clear clicks")
            add_mask_btn = gr.Button("Add mask")
            remove_mask_btn = gr.Button("Remove mask")
        mask_dropdown = gr.Dropdown(multiselect=True, value=[], choices=[],
                                    label="masks for tracking/inpainting")
        track_end = gr.Slider(1, 1, 1, step=1, label="tracking end frame")
        with gr.Row():
            ratio = gr.Slider(0.1, 1.0, 1.0, label="resize ratio")
            dilate = gr.Slider(0, 16, 8, step=1, label="mask dilation")
            raft_iter = gr.Slider(1, 40, 20, step=1, label="RAFT iterations")
        with gr.Row():
            subvideo = gr.Slider(10, 200, 80, step=1, label="subvideo length")
            neighbor = gr.Slider(2, 40, 10, step=1, label="neighbor length")
            ref_stride = gr.Slider(2, 40, 10, step=1, label="ref stride")
        run_btn = gr.Button("Track & Inpaint")
        video_out = gr.Video(label="inpainted")

        video_in.upload(extract_frames, video_in,
                        [first_frame, status, frame_slider, track_end])
        frame_slider.release(select_template, frame_slider, first_frame)
        first_frame.select(on_click, point_type, first_frame)
        clear_btn.click(clear_clicks, None, first_frame)
        add_mask_btn.click(add_mask, mask_dropdown,
                           [mask_dropdown, first_frame, status])
        remove_mask_btn.click(remove_masks, None,
                              [mask_dropdown, first_frame, status])
        mask_dropdown.change(show_masks, mask_dropdown, first_frame)
        run_btn.click(track_and_inpaint,
                      [mask_dropdown, track_end, ratio, dilate, raft_iter,
                       subvideo, neighbor, ref_stride], video_out)
    return app


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="weights")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)

    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment. The demo's "
            "programmatic API is available without it:\n"
            "  from propainter_tpu.demo import TrackingFacade\n"
            "  facade = TrackingFacade(params)\n"
            "  mask, _, _ = facade.first_frame_click(frame, points, labels)\n"
            "  masks, _, _ = facade.generator(frames, mask)\n"
            "  out = facade.inpaint(frames, masks)")

    from propainter_tpu.demo.tracking import TrackingFacade, load_demo_params

    params, sam_type = load_demo_params(args.weights)
    facade = TrackingFacade(params, sam_model_type=sam_type)
    build_app(facade).launch(server_port=args.port)


if __name__ == "__main__":
    main()
