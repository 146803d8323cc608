"""Mechanical PyTorch state-dict -> flax params conversion.

Our flax module trees mirror the reference's torch attribute trees, so one
generic walk converts any of the released checkpoints (raft-things.pth,
recurrent_flow_completion.pth, ProPainter.pth — reference weights/README.md):

  * path: split on '.', merge integer segments into the parent name with '_'
    (torch "layer1.0.conv1.weight" -> flax "layer1_0/conv1/kernel");
  * conv2d weight (O,I,kh,kw) -> HWIO; conv3d (O,I,kd,kh,kw) -> DHWIO;
    linear (O,I) -> (I,O); 1-D 'weight' -> 'scale' (norm layers);
  * BatchNorm modules (detected by a running_mean sibling) map to
    FrozenBatchNorm {scale, bias, mean, var};
  * per-model `rename` regex hooks handle structural differences (e.g. RAFT's
    nn.scan wrapper), `skip` drops torch-side duplicates (e.g. the reference
    registers ResidualBlock.norm3 both as an attribute and inside
    downsample — RAFT/extractor.py:44-45).

This module is the only place in the framework that imports torch, and only
lazily (torch is never needed at inference/training time once weights are
converted and saved with orbax).
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Sequence

import numpy as np


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor
    return v.detach().cpu().numpy()


def _flax_path(torch_key: str) -> list[str]:
    parts = torch_key.split(".")
    out: list[str] = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def _insert(tree: dict, path: Sequence[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
        if not isinstance(node, dict):
            raise ValueError(f"path conflict at {p} for {'/'.join(path)}")
    if path[-1] in node:
        raise ValueError(f"duplicate leaf {'/'.join(path)}")
    node[path[-1]] = value


def convert_state_dict(
    sd: Mapping[str, Any],
    rename: Sequence[tuple[str, str]] = (),
    skip: Sequence[str] = (),
) -> dict:
    """Convert a torch state dict to a flax params tree (no 'params' wrapper).

    Args:
      sd:     torch state dict (str -> tensor/ndarray).
      rename: list of (regex, replacement) applied to torch keys first.
      skip:   list of regexes; matching keys are dropped.
    """
    # strip DataParallel prefix (reference loads RAFT via nn.DataParallel,
    # model/modules/flow_comp_raft.py:18-20)
    items = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        items[k] = v

    skip_res = [re.compile(s) for s in skip]
    rename_res = [(re.compile(p), r) for p, r in rename]

    # detect batchnorm module prefixes
    bn_prefixes = {
        k[: -len(".running_mean")] for k in items if k.endswith(".running_mean")
    }

    tree: dict = {}
    for k, v in items.items():
        if k.endswith("num_batches_tracked"):
            continue
        if any(s.search(k) for s in skip_res):
            continue
        kk = k
        for pat, repl in rename_res:
            kk = pat.sub(repl, kk)

        prefix, _, leaf = kk.rpartition(".")
        orig_prefix, _, _ = k.rpartition(".")
        arr = _to_numpy(v)

        if orig_prefix in bn_prefixes:
            leaf_map = {
                "weight": "scale",
                "bias": "bias",
                "running_mean": "mean",
                "running_var": "var",
            }
            leaf = leaf_map[leaf]
        elif leaf == "weight":
            if arr.ndim == 4:
                arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
                leaf = "kernel"
            elif arr.ndim == 5:
                arr = np.transpose(arr, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO
                leaf = "kernel"
            elif arr.ndim == 2:
                arr = arr.T
                leaf = "kernel"
            elif arr.ndim == 1:
                leaf = "scale"  # LayerNorm / affine norm
            else:
                raise ValueError(f"unhandled weight ndim {arr.ndim} for {k}")
        elif leaf in ("bias",):
            pass
        else:
            # non-standard leaf (buffers etc.) — keep name as-is
            pass

        path = _flax_path(prefix) + [leaf] if prefix else [leaf]
        _insert(tree, path, arr)
    return tree


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth file into a plain {key: ndarray} dict (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd and isinstance(
        sd["state_dict"], dict
    ):
        sd = sd["state_dict"]
    return {k: _to_numpy(v) for k, v in sd.items()}


def assert_tree_shapes_match(converted: dict, reference: dict, path=""):
    """Raise if the converted tree doesn't structurally match a flax init."""
    ref_keys = set(reference.keys())
    conv_keys = set(converted.keys())
    if ref_keys != conv_keys:
        missing = ref_keys - conv_keys
        extra = conv_keys - ref_keys
        raise ValueError(
            f"tree mismatch at '{path}': missing={sorted(missing)} "
            f"extra={sorted(extra)}"
        )
    for k in ref_keys:
        r, c = reference[k], converted[k]
        if isinstance(r, dict):
            assert_tree_shapes_match(c, r, f"{path}/{k}")
        else:
            if tuple(np.shape(r)) != tuple(np.shape(c)):
                raise ValueError(
                    f"shape mismatch at '{path}/{k}': "
                    f"ref {np.shape(r)} vs converted {np.shape(c)}"
                )
