"""Middlebury .flo flow file IO with optional fp16 quantization.

Same file format and conventions as reference utils/flow_util.py:28-99
(magic 'PIEH' float 202021.25, little-endian W, H, then H*W*2 floats; the
`quantize` variant stores fp16 payload as the reference's compute_flow.py
does for precomputed training flows).
"""

from __future__ import annotations

import os

import numpy as np

_MAGIC = 202021.25


def flowread(path: str, quantize: bool | None = None) -> np.ndarray:
    """Read a .flo file -> (H, W, 2) float32.

    quantize: True = fp16 payload, False = fp32; None (default) detects the
    payload width from the file size (both variants share the 12-byte
    header, so the remaining byte count is unambiguous).
    """
    with open(path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.float32)[0]
        if magic != _MAGIC:
            raise ValueError(f"invalid .flo magic in {path}: {magic}")
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        if quantize is None:
            quantize = os.path.getsize(path) - 12 == h * w * 2 * 2
        if quantize:
            data = np.frombuffer(f.read(h * w * 2 * 2), np.float16)
            flow = data.astype(np.float32)
        else:
            flow = np.frombuffer(f.read(h * w * 2 * 4), np.float32).copy()
        return flow.reshape(h, w, 2)


def flowwrite(flow: np.ndarray, path: str, quantize: bool = False):
    """Write (H, W, 2) flow to a .flo file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        f.write(np.float32(_MAGIC).tobytes())
        f.write(np.int32(w).tobytes())
        f.write(np.int32(h).tobytes())
        if quantize:
            f.write(flow.astype(np.float16).tobytes())
        else:
            f.write(flow.astype(np.float32).tobytes())


def resize_flow(flow: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Resize (H, W, 2) flow to `size`=(H', W'), scaling components.

    Matches reference utils/flow_util.py:6-25 (bilinear resize, multiply u by
    W'/W and v by H'/H).
    """
    import cv2

    h, w = flow.shape[:2]
    nh, nw = size
    out = cv2.resize(flow, (nw, nh), interpolation=cv2.INTER_LINEAR)
    out = out * np.array([nw / w, nh / h], np.float32)
    return out
