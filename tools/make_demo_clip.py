"""Regenerate the bundled demo fixture clip (assets/demo_clip/).

The reference ships real example clips under inputs/ (SURVEY.md section 1
data artifacts); this repo has no egress, so the bundled analogue is a
deterministic synthetic scene: a textured panning background with a
camera-independent moving box to remove, plus per-frame object masks.
CLI smoke tests and the demo run from this committed asset.

Run from the repo root: python tools/make_demo_clip.py
"""

import os

import numpy as np


T, H, W = 12, 120, 216


def make_clip():
    rng = np.random.default_rng(1234)
    # textured background wider than the frame; pan 3 px/frame
    tex = rng.integers(40, 200, (H, W + 3 * T, 3)).astype(np.float32)
    # smooth it so flow is recoverable (3-tap box blur, twice)
    for _ in range(2):
        tex = (np.roll(tex, 1, 1) + tex + np.roll(tex, -1, 1)) / 3
        tex = (np.roll(tex, 1, 0) + tex + np.roll(tex, -1, 0)) / 3
    frames, masks = [], []
    for t in range(T):
        f = tex[:, 3 * t: 3 * t + W].copy()
        # the object: a bright box moving down-right, 2 px/frame
        y, x = 30 + 2 * t, 60 + 4 * t
        f[y: y + 28, x: x + 36] = [230.0, 60.0, 60.0]
        m = np.zeros((H, W), np.uint8)
        m[y: y + 28, x: x + 36] = 255
        frames.append(f.clip(0, 255).astype(np.uint8))
        masks.append(m)
    return frames, masks


def main():
    import imageio.v2 as imageio

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "demo_clip")
    frames, masks = make_clip()
    os.makedirs(os.path.join(root, "frames"), exist_ok=True)
    os.makedirs(os.path.join(root, "masks"), exist_ok=True)
    for i, (f, m) in enumerate(zip(frames, masks)):
        imageio.imwrite(os.path.join(root, "frames", f"{i:05d}.png"), f)
        imageio.imwrite(os.path.join(root, "masks", f"{i:05d}.png"), m)
    # mp4 variant: the demo app's example-gallery input (gr.Examples takes
    # a video file, like the reference's bundled inputs/*.mp4)
    from propainter_tpu.utils.video import write_video

    write_video(frames, os.path.join(root, "clip.mp4"), fps=12)
    print(f"wrote {len(frames)} frames (+clip.mp4) to {root}")


if __name__ == "__main__":
    main()
