"""End-to-end smoke tests for every CLI main the suite didn't yet drive.

Each test runs the real argparse main() exactly as a user would (VERDICT r3
item 3): inference (inpainting + outpainting + --save_frames), evaluate,
evaluate_flow_completion, compute_flow's .flo round-trip, and the GAN-stage
train branch (dis_2d + warm start). Reference entry points:
inference_propainter.py:177, scripts/evaluate_propainter.py:37,
scripts/evaluate_flow_completion.py, scripts/compute_flow.py, train.py:36.

All runs use random weights, tiny resolutions, and the committed fixture
clip assets/demo_clip (tools/make_demo_clip.py regenerates it) — the
repo's analogue of the reference's bundled inputs/ examples.
"""

import json
import os
import shutil

import numpy as np
import pytest

CLIP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "assets", "demo_clip")


# ---------------------------------------------------------------------------
# inference CLI
# ---------------------------------------------------------------------------

def test_inference_cli_inpainting_save_frames(tmp_path):
    from propainter_tpu.cli.inference import main

    out = tmp_path / "results"
    main(["--video", os.path.join(CLIP, "frames"),
          "--mask", os.path.join(CLIP, "masks"),
          "--output", str(out),
          "--height", "64", "--width", "96",
          "--raft_iter", "2", "--subvideo_length", "80",
          "--neighbor_length", "4", "--ref_stride", "4",
          "--weights", "random", "--save_frames"])

    save_root = out / "frames"  # video_name = basename of the frame folder
    assert (save_root / "inpaint_out.mp4").exists()
    assert (save_root / "masked_in.mp4").exists()
    pngs = sorted((save_root / "frames").glob("*.png"))
    assert len(pngs) == 12
    import imageio.v2 as imageio

    im = imageio.imread(pngs[0])
    assert im.shape == (64, 96, 3)


def test_inference_cli_outpainting(tmp_path):
    from propainter_tpu.cli.inference import main

    out = tmp_path / "results"
    main(["--video", os.path.join(CLIP, "frames"),
          "--mask", os.path.join(CLIP, "masks"),  # unused in outpainting
          "--output", str(out),
          "--mode", "video_outpainting",
          "--scale_h", "1.0", "--scale_w", "1.2",
          "--height", "64", "--width", "80",
          "--raft_iter", "2", "--subvideo_length", "80",
          "--neighbor_length", "4", "--ref_stride", "4",
          "--weights", "random"])

    save_root = out / "frames"
    assert (save_root / "inpaint_out.mp4").exists()
    import cv2

    vid = cv2.VideoCapture(str(save_root / "inpaint_out.mp4"))
    ok, frame = vid.read()
    assert ok
    # outpainted width: 80 * 1.2 = 96 (already /8-aligned)
    assert frame.shape[1] == 96 and frame.shape[0] == 64


# ---------------------------------------------------------------------------
# evaluation CLIs (2-video synthetic TestDataset from the fixture clip)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def eval_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_ds")
    names = {}
    for v in ("clip_a", "clip_b"):
        shutil.copytree(os.path.join(CLIP, "frames"), root / "videos" / v)
        shutil.copytree(os.path.join(CLIP, "masks"), root / "masks" / v)
        names[v] = 12
    with open(root / "test.json", "w") as f:
        json.dump(names, f)
    return root


def test_evaluate_cli(eval_dataset, tmp_path, monkeypatch):
    from propainter_tpu.cli.evaluate import main

    monkeypatch.chdir(tmp_path)
    # height/width must exceed the SSIM protocol's win_size=65 (the
    # reference's skimage call errors below that; ours returns nan)
    main(["--dataset", "davis",
          "--video_root", str(eval_dataset / "videos"),
          "--mask_root", str(eval_dataset / "masks"),
          "--json_path", str(eval_dataset / "test.json"),
          "--height", "96", "--width", "128",
          "--raft_iter", "2", "--neighbor_length", "4",
          "--max_videos", "2",
          "--weights", "random",
          "--i3d_path", "does_not_exist.pt",
          "--output", str(tmp_path / "results_eval")])

    mtxt = tmp_path / "results_eval" / "davis_rs_10_nl_4" / "davis_metrics.txt"
    assert mtxt.exists()
    metrics = dict(line.split(": ") for line in
                   mtxt.read_text().strip().splitlines())
    assert metrics["videos"] == "2"
    assert float(metrics["avg s/frame"]) > 0
    # random weights -> low but finite quality numbers
    assert np.isfinite(float(metrics["psnr"]))
    assert 0.0 <= float(metrics["ssim"]) <= 1.0


def test_evaluate_flow_completion_cli(eval_dataset, tmp_path, monkeypatch,
                                      capsys):
    from propainter_tpu.cli.evaluate_flow_completion import main

    monkeypatch.chdir(tmp_path)
    main(["--video_root", str(eval_dataset / "videos"),
          "--mask_root", str(eval_dataset / "masks"),
          "--json_path", str(eval_dataset / "test.json"),
          "--height", "64", "--width", "96",
          "--raft_iter", "2", "--max_videos", "1",
          "--weights", "random"])
    tail = capsys.readouterr().out.strip().splitlines()[-1]
    assert tail.startswith("avg epe:")
    assert np.isfinite(float(tail.split("avg epe: ")[1].split(";")[0]))


# ---------------------------------------------------------------------------
# compute_flow CLI (.flo fp16 round-trip)
# ---------------------------------------------------------------------------

def test_compute_flow_cli(tmp_path):
    from propainter_tpu.cli.compute_flow import main
    from propainter_tpu.utils.flow_io import flowread
    from tests.test_train_cli import _fake_raft_ckpt

    vdir = tmp_path / "videos" / "clip"
    vdir.mkdir(parents=True)
    for i in range(3):
        shutil.copy(os.path.join(CLIP, "frames", f"{i:05d}.png"),
                    vdir / f"{i:05d}.png")
    ckpt = tmp_path / "raft_fake.pth"
    _fake_raft_ckpt(ckpt)

    out = tmp_path / "flows"
    main(["--root", str(tmp_path / "videos"),
          "--save_path", str(out),
          "--height", "128", "--width", "128",
          "--raft_iter", "2", "--raft_path", str(ckpt)])

    # reference naming: {cur}_{next}_f.flo / {next}_{cur}_b.flo
    f01 = out / "clip" / "00000_00001_f.flo"
    b10 = out / "clip" / "00001_00000_b.flo"
    assert f01.exists() and b10.exists()
    assert (out / "clip" / "00001_00002_f.flo").exists()
    flow = flowread(str(f01))
    assert flow.shape == (128, 128, 2) and np.isfinite(flow).all()


# ---------------------------------------------------------------------------
# GAN-stage train CLI (dis_2d + warm start)
# ---------------------------------------------------------------------------

def _fake_flowcomp_ckpt(path):
    import torch
    from tests.torch_ref import import_reference_module

    mod = import_reference_module("model.recurrent_flow_completion")
    torch.manual_seed(0)
    torch.save(mod.RecurrentFlowCompleteNet().state_dict(), path)


def _fake_gen_ckpt(path):
    import torch
    from tests.torch_ref import import_reference_module

    mod = import_reference_module("model.propainter")
    torch.manual_seed(0)
    torch.save(mod.InpaintGenerator(init_weights=False).state_dict(), path)


def _fake_dis2d_ckpt(path):
    import torch
    from tests.torch_ref import import_reference_module

    mod = import_reference_module("model.propainter")
    torch.manual_seed(0)
    torch.save(mod.Discriminator_2D(in_channels=3,
                                    use_sigmoid=False).state_dict(), path)


def test_train_gan_stage_two_steps(tmp_path, monkeypatch):
    """GAN-stage branch: dis_2d discriminator, hinge loss, warm start from
    synthesized gen/dis torch checkpoints, 2 optimizer steps (reference
    train.py + configs/train_propainter.json semantics)."""
    from tests.test_train_cli import _fake_raft_ckpt

    T, H, W = 14, 64, 96
    rng = np.random.default_rng(0)
    import imageio.v2 as imageio

    names = {}
    for v in ("vid0",):
        d = tmp_path / "videos" / v
        d.mkdir(parents=True)
        for i in range(T):
            imageio.imwrite(d / f"{i:05d}.jpg",
                            rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        names[v] = T
    json_dir = tmp_path / "datasets" / "smoke_gan"
    json_dir.mkdir(parents=True)
    with open(json_dir / "train.json", "w") as f:
        json.dump(names, f)

    raft_ckpt = tmp_path / "raft_fake.pth"
    _fake_raft_ckpt(raft_ckpt)
    flowcomp_ckpt = tmp_path / "flowcomp_fake.pth"
    _fake_flowcomp_ckpt(flowcomp_ckpt)
    gen_ckpt = tmp_path / "gen_fake.pth"
    _fake_gen_ckpt(gen_ckpt)
    dis_ckpt = tmp_path / "dis2d_fake.pth"
    _fake_dis2d_ckpt(dis_ckpt)

    config = {
        "seed": 7,
        "train_data_loader": {
            "name": "smoke_gan",
            "video_root": str(tmp_path / "videos"),
            "w": W, "h": H,
            "num_local_frames": 5,
            "num_ref_frames": 1,
            "load_flow": 0,
        },
        "losses": {"hole_weight": 1.0, "valid_weight": 1.0,
                   "adversarial_weight": 0.01, "GAN_LOSS": "hinge"},
        "model": {"net": "propainter",
                  "raft_path": str(raft_ckpt),
                  "flowcomp_path": str(flowcomp_ckpt),
                  "gen_path": str(gen_ckpt),
                  "dis_path": str(dis_ckpt),
                  "dis_2d": True},
        "trainer": {
            "version": "trainer",
            "lr": 1e-4, "batch_size": 1, "num_workers": 1,
            "log_freq": 1, "save_freq": 1000, "iterations": 2,
            "raft_iters": 2,
        },
    }
    cfg_path = tmp_path / "smoke_gan.json"
    with open(cfg_path, "w") as f:
        json.dump(config, f)

    monkeypatch.chdir(tmp_path)
    from propainter_tpu.cli.train import main

    main(["-c", str(cfg_path), "--max_iters", "2"])

    exp = tmp_path / "experiments_model"
    runs = list(exp.glob("*/logs/metrics.jsonl"))
    assert runs, f"no metrics.jsonl under {exp}"
    lines = [json.loads(l) for l in open(runs[0])]
    assert lines
    last = lines[-1]
    # generator AND discriminator losses must both be present and finite
    # (the dis optimizer plumbing is exactly what this test protects)
    gen_keys = [k for k in last if "gen" in k or "hole" in k or "valid" in k]
    dis_keys = [k for k in last if "dis" in k or k.endswith("/d")]
    assert gen_keys, last.keys()
    assert dis_keys, last.keys()
    assert all(np.isfinite(last[k]) for k in (*gen_keys, *dis_keys))
