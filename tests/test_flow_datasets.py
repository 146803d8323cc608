"""RAFT-standalone extras: flow benchmark dataset loaders, augmentors,
flow-format IO, and the raft_demo CLI (reference RAFT/datasets.py,
RAFT/utils/{augmentor,frame_utils}.py, RAFT/demo.py) — exercised on
synthetic miniature dataset trees."""

import os

import numpy as np
import pytest

from propainter_tpu.core.flow_datasets import (
    ConcatFlowDataset,
    FlowAugmentor,
    FlowIndex,
    FlowPairDataset,
    SparseFlowAugmentor,
    fetch_flow_dataset,
    flying_chairs_index,
    hd1k_index,
    kitti_index,
    resize_sparse_flow,
    sintel_index,
)
from propainter_tpu.utils.flow_io import (
    flowwrite,
    read_flow_any,
    read_flow_kitti,
    read_pfm,
    write_flow_kitti,
    write_pfm,
)

cv2 = pytest.importorskip("cv2")


def _png(path, h=64, w=96, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    cv2.imwrite(path, rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


# ---------------------------------------------------------------------------
# IO round-trips
# ---------------------------------------------------------------------------


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((17, 23, 3)).astype(np.float32)
    p = str(tmp_path / "f.pfm")
    write_pfm(arr, p)
    got = read_pfm(p)
    np.testing.assert_array_equal(got, arr)
    # dispatch returns the (u, v) channels
    np.testing.assert_array_equal(read_flow_any(p), arr[..., :2])


def test_kitti_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    flow = (rng.standard_normal((20, 30, 2)) * 10).astype(np.float32)
    valid = (rng.random((20, 30)) > 0.5).astype(np.float32)
    p = str(tmp_path / "k.png")
    write_flow_kitti(flow, p, valid)
    got_f, got_v = read_flow_kitti(p)
    # 1/64 px quantization
    assert np.abs(got_f - flow).max() <= 1 / 64 + 1e-6
    np.testing.assert_array_equal(got_v, valid)
    f2, v2 = read_flow_any(p)
    np.testing.assert_array_equal(f2, got_f)


# ---------------------------------------------------------------------------
# Index builders on synthetic trees
# ---------------------------------------------------------------------------


def _make_sintel(root, scenes=("alley_1", "market_2"), frames=4):
    for s in scenes:
        for i in range(frames):
            _png(os.path.join(root, "training", "clean", s,
                              f"frame_{i:04d}.png"), seed=i)
        for i in range(frames - 1):
            flowwrite(np.zeros((64, 96, 2), np.float32),
                      os.path.join(root, "training", "flow", s,
                                   f"frame_{i:04d}.flo"))


def test_sintel_index(tmp_path):
    root = str(tmp_path / "Sintel")
    _make_sintel(root)
    idx = sintel_index(root, "training", "clean")
    assert len(idx) == 2 * 3 and len(idx.flow_paths) == 6
    assert idx.extra[0] == ("alley_1", 0)
    ds = FlowPairDataset(idx)
    s = ds[0]
    assert s["image1"].shape == (64, 96, 3)
    assert s["flow"].shape == (64, 96, 2)
    assert s["valid"].min() == 1.0  # zero flow => all valid


def test_flying_chairs_index(tmp_path):
    root = str(tmp_path / "chairs")
    os.makedirs(root)
    tags = []
    for i in range(5):
        for k in (1, 2):
            _png(os.path.join(root, f"{i:05d}_img{k}.ppm"), seed=i)
        flowwrite(np.zeros((64, 96, 2), np.float32),
                  os.path.join(root, f"{i:05d}_flow.flo"))
        tags.append(1 if i % 2 == 0 else 2)
    np.savetxt(os.path.join(root, "chairs_split.txt"), tags, fmt="%d")
    train = flying_chairs_index(root, "training")
    val = flying_chairs_index(root, "validation")
    assert len(train) == 3 and len(val) == 2
    a, b = train.image_pairs[0]
    assert a.endswith("img1.ppm") and b.endswith("img2.ppm")


def test_kitti_hd1k_index(tmp_path):
    kroot = str(tmp_path / "KITTI")
    for i in range(3):
        _png(os.path.join(kroot, "training", "image_2",
                          f"{i:06d}_10.png"), seed=i)
        _png(os.path.join(kroot, "training", "image_2",
                          f"{i:06d}_11.png"), seed=i + 9)
        write_flow_kitti(
            np.ones((64, 96, 2), np.float32),
            os.path.join(kroot, "training", "flow_occ", f"{i:06d}_10.png"))
    idx = kitti_index(kroot, "training")
    assert len(idx) == 3 and idx.sparse
    ds = FlowPairDataset(idx)
    s = ds[1]
    assert s["flow"].shape == (64, 96, 2) and s["valid"].shape == (64, 96)

    hroot = str(tmp_path / "HD1k")
    for seq in range(2):
        for i in range(3):
            _png(os.path.join(hroot, "hd1k_input", "image_2",
                              f"{seq:06d}_{i:02d}.png"), seed=i)
            write_flow_kitti(
                np.ones((64, 96, 2), np.float32),
                os.path.join(hroot, "hd1k_flow_gt", "flow_occ",
                             f"{seq:06d}_{i:02d}.png"))
    hidx = hd1k_index(hroot)
    # 2 sequences x (3 flows - 1) pairs
    assert len(hidx) == 4 and hidx.sparse


def test_index_arithmetic(tmp_path):
    root = str(tmp_path / "Sintel")
    _make_sintel(root, scenes=("a",), frames=3)
    idx = sintel_index(root, "training", "clean")
    tripled = 3 * idx
    assert len(tripled) == 6 and len(tripled.flow_paths) == 6
    with pytest.raises(ValueError):
        idx + FlowIndex(sparse=True)


# ---------------------------------------------------------------------------
# Augmentors
# ---------------------------------------------------------------------------


def test_dense_augmentor_shapes_and_flow_scaling():
    rng = np.random.default_rng(0)
    img1 = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
    img2 = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
    flow = rng.standard_normal((80, 120, 2)).astype(np.float32)
    aug = FlowAugmentor((48, 64))
    for seed in range(5):
        r = np.random.default_rng(seed)
        a, b, f = aug(r, img1, img2, flow)
        assert a.shape == (48, 64, 3) and b.shape == (48, 64, 3)
        assert f.shape == (48, 64, 2) and f.dtype == np.float32
    # determinism under a fixed rng stream
    a1, b1, f1 = aug(np.random.default_rng(7), img1, img2, flow)
    a2, b2, f2 = aug(np.random.default_rng(7), img1, img2, flow)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(f1, f2)


def test_sparse_augmentor_and_resize():
    rng = np.random.default_rng(0)
    img1 = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
    img2 = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
    flow = np.zeros((80, 120, 2), np.float32)
    flow[10, 20] = (4.0, -2.0)
    valid = np.zeros((80, 120), np.float32)
    valid[10, 20] = 1.0

    f2, v2 = resize_sparse_flow(flow, valid, 2.0, 2.0)
    assert f2.shape == (160, 240, 2) and v2.sum() == 1
    yy, xx = np.nonzero(v2)
    np.testing.assert_allclose(f2[yy[0], xx[0]], [8.0, -4.0])
    # the measurement moved to its scaled location, not interpolated
    assert (yy[0], xx[0]) == (20, 40)

    aug = SparseFlowAugmentor((48, 64), do_flip=True)
    a, b, f, v = aug(np.random.default_rng(3), img1, img2, flow, valid)
    assert a.shape == (48, 64, 3) and f.shape == (48, 64, 2)
    assert v.shape == (48, 64) and set(np.unique(v)) <= {0.0, 1.0}


# ---------------------------------------------------------------------------
# Stage recipe + concat
# ---------------------------------------------------------------------------


def test_fetch_sintel_stage_mixture(tmp_path):
    sroot = str(tmp_path / "Sintel")
    _make_sintel(sroot, scenes=("a",), frames=3)
    for d in ("clean", "final"):
        for i in range(3):
            _png(os.path.join(sroot, "training", d, "a",
                              f"frame_{i:04d}.png"), seed=i)
    troot = str(tmp_path / "Things")
    seq = os.path.join(troot, "frames_cleanpass", "TRAIN", "A", "0000",
                       "left")
    fl_f = os.path.join(troot, "optical_flow", "TRAIN", "A", "0000",
                        "into_future", "left")
    fl_p = os.path.join(troot, "optical_flow", "TRAIN", "A", "0000",
                        "into_past", "left")
    for i in range(3):
        _png(os.path.join(seq, f"{i:04d}.png"), seed=i)
        for d in (fl_f, fl_p):
            write_pfm(np.zeros((64, 96, 3), np.float32),
                      os.path.join(d, f"{i:04d}.pfm"))
    kroot = str(tmp_path / "KITTI")
    _png(os.path.join(kroot, "training", "image_2", "000000_10.png"))
    _png(os.path.join(kroot, "training", "image_2", "000000_11.png"))
    write_flow_kitti(np.ones((64, 96, 2), np.float32),
                     os.path.join(kroot, "training", "flow_occ",
                                  "000000_10.png"))
    hroot = str(tmp_path / "HD1k")
    for i in range(3):
        _png(os.path.join(hroot, "hd1k_input", "image_2",
                          f"000000_{i:02d}.png"), seed=i)
        write_flow_kitti(np.ones((64, 96, 2), np.float32),
                         os.path.join(hroot, "hd1k_flow_gt", "flow_occ",
                                      f"000000_{i:02d}.png"))

    ds = fetch_flow_dataset(
        "sintel", (48, 64),
        roots={"sintel": sroot, "things": troot, "kitti": kroot,
               "hd1k": hroot})
    assert isinstance(ds, ConcatFlowDataset)
    # dense part: 100*(2 sintel scenes' pairs: clean 2 + final 2) -> 400
    # + things 2 directions x 2 pairs = 4; kitti 200*1; hd1k 5*2
    assert len(ds) == 100 * 2 + 100 * 2 + 4 + 200 + 10
    first = ds[0]
    assert first["flow"].shape == (48, 64, 2)
    sparse_sample = ds[len(ds) - 1]
    assert sparse_sample["valid"].shape == (48, 64)


def test_things_pfm_sample(tmp_path):
    troot = str(tmp_path / "Things")
    seq = os.path.join(troot, "frames_cleanpass", "TRAIN", "A", "0000",
                       "left")
    for i in range(3):
        _png(os.path.join(seq, f"{i:04d}.png"), seed=i)
    for d in ("into_future", "into_past"):
        for i in range(3):
            flow3 = np.zeros((64, 96, 3), np.float32)
            flow3[..., 0] = 1.5
            write_pfm(flow3, os.path.join(
                troot, "optical_flow", "TRAIN", "A", "0000", d, "left",
                f"{i:04d}.pfm"))
    from propainter_tpu.core.flow_datasets import flying_things_index

    idx = flying_things_index(troot, "frames_cleanpass")
    assert len(idx) == 4  # 2 pairs x 2 directions
    s = FlowPairDataset(idx)[0]
    np.testing.assert_allclose(s["flow"][..., 0], 1.5)
    # into_past pairs are time-reversed
    a, b = idx.image_pairs[-1]
    assert a.endswith("0002.png") and b.endswith("0001.png")


# ---------------------------------------------------------------------------
# raft_demo CLI (random weights, tiny frames)
# ---------------------------------------------------------------------------


def test_raft_demo_cli(tmp_path):
    frames = tmp_path / "frames"
    for i in range(3):
        _png(str(frames / f"{i:03d}.png"), h=48, w=72, seed=i)
    out = tmp_path / "out"
    from propainter_tpu.cli.raft_demo import main

    main(["--path", str(frames), "--output", str(out),
          "--iters", "2", "--weights", "random", "--save_flo"])
    pngs = sorted(os.listdir(out))
    assert "000_flow.png" in pngs and "001_flow.png" in pngs
    flo = read_flow_any(str(out / "000.flo"))
    assert flo.shape == (48, 72, 2)
