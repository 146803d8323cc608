"""Train CLI end-to-end smoke: synthetic dataset -> 2 optimizer steps.

Drives python -m propainter_tpu.cli.train exactly as a user would (config
file, dataset folder layout, fake torch checkpoints through the converter),
and checks metrics/TensorBoard artifacts appear. This is the automated
version of the reference's "run train.py and watch TensorBoard" workflow
(SURVEY.md section 4.3).
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def smoke_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("smoke_ds")
    video_root = root / "videos"
    T, H, W = 14, 64, 96
    rng = np.random.default_rng(0)
    import imageio.v2 as imageio

    names = {}
    for v in ("vid0", "vid1"):
        d = video_root / v
        d.mkdir(parents=True)
        for i in range(T):
            imageio.imwrite(
                d / f"{i:05d}.jpg",
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        names[v] = T
    json_dir = root / "datasets" / "smoke"
    json_dir.mkdir(parents=True)
    with open(json_dir / "train.json", "w") as f:
        json.dump(names, f)
    return root, (T, H, W)


def _fake_raft_ckpt(path):
    """Reference-shaped RAFT state dict with random weights (exercises the
    real converter, including the DataParallel 'module.' prefix)."""
    import torch
    from tests.torch_ref import import_reference_module
    import argparse

    raft_mod = import_reference_module("RAFT.raft")
    args = argparse.Namespace(small=False, dropout=0, alternate_corr=False,
                              mixed_precision=False)
    net = raft_mod.RAFT(args)
    sd = {f"module.{k}": v for k, v in net.state_dict().items()}
    torch.save(sd, path)


def test_train_flowcomp_two_steps(smoke_dataset, tmp_path, monkeypatch):
    root, (T, H, W) = smoke_dataset
    ckpt = tmp_path / "raft_fake.pth"
    _fake_raft_ckpt(ckpt)

    config = {
        "seed": 7,
        "train_data_loader": {
            "name": "smoke",
            "video_root": str(root / "videos"),
            "w": W, "h": H,
            "num_local_frames": 5,
            "num_ref_frames": 1,
            "load_flow": 0,
        },
        "losses": {"flow_weight": 0.25},
        "model": {"net": "recurrent_flow_completion",
                  "raft_path": str(ckpt)},
        "trainer": {
            "version": "trainer_flow_w_edge",
            "lr": 5e-5, "batch_size": 1, "num_workers": 1,
            "log_freq": 1, "save_freq": 1000, "iterations": 2,
            "raft_iters": 2,
        },
    }
    cfg_path = tmp_path / "smoke_flowcomp.json"
    with open(cfg_path, "w") as f:
        json.dump(config, f)

    monkeypatch.chdir(tmp_path)
    # the CLI resolves datasets/<name>/train.json relative to cwd
    os.symlink(root / "datasets", tmp_path / "datasets")

    from propainter_tpu.cli.train import main

    main(["-c", str(cfg_path), "--max_iters", "2"])

    exp = tmp_path / "experiments_model"
    runs = list(exp.glob("*/logs/metrics.jsonl"))
    assert runs, f"no metrics.jsonl under {exp}"
    lines = [json.loads(l) for l in open(runs[0])]
    assert lines and "loss/loss" in lines[-1]
    assert np.isfinite(lines[-1]["loss/loss"])
