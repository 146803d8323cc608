"""Smaller components: E_warp metric, discriminator converter, downloads."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp


def test_warping_error_zero_for_exact_translation(rng):
    from propainter_tpu.core.metrics import calculate_warping_error

    T, H, W = 4, 32, 48
    base = rng.uniform(0, 255, (H, W + T, 3)).astype(np.uint8)
    frames = np.stack([base[:, t : t + W] for t in range(T)])
    # frame t+1 content at x equals frame t at x+1 -> forward flow (+1, 0)?
    # pixel p in frame t matches pixel p-1 in frame t+1: F_f = (-1, 0)
    flows_f = np.zeros((T - 1, H, W, 2), np.float32)
    flows_f[..., 0] = -1.0
    flows_b = -flows_f
    err = calculate_warping_error(frames, flows_f, flows_b)
    assert err < 1e-4, err

    # probe: wrong flow produces a clearly larger error
    err_bad = calculate_warping_error(frames, -flows_f, -flows_b)
    assert err_bad > err * 10


def test_discriminator_converter_roundtrip(rng):
    from propainter_tpu.models.discriminator import (
        Discriminator, convert_discriminator_state_dict)

    torch.manual_seed(0)
    # reference-shaped torch T-PatchGAN (conv.{0..10} Sequential with
    # spectral-norm weight_orig keys)
    convs = {
        0: tnn.Conv3d(3, 32, (3, 5, 5), (1, 2, 2), 1, bias=False),
        2: tnn.Conv3d(32, 64, (3, 5, 5), (1, 2, 2), (1, 2, 2), bias=False),
        4: tnn.Conv3d(64, 128, (3, 5, 5), (1, 2, 2), (1, 2, 2), bias=False),
        6: tnn.Conv3d(128, 128, (3, 5, 5), (1, 2, 2), (1, 2, 2), bias=False),
        8: tnn.Conv3d(128, 128, (3, 5, 5), (1, 2, 2), (1, 2, 2), bias=False),
        10: tnn.Conv3d(128, 128, (3, 5, 5), (1, 2, 2), (1, 2, 2)),
    }
    sd = {}
    for i, c in convs.items():
        suffix = "weight" if i == 10 else "weight_orig"
        sd[f"conv.{i}.{suffix}"] = c.weight.detach()
        if i == 10:
            sd[f"conv.{i}.bias"] = c.bias.detach()
        else:
            sd[f"conv.{i}.weight_u"] = torch.zeros(c.weight.shape[0])

    params = convert_discriminator_state_dict(sd)
    model = Discriminator(in_channels=3)
    x = jnp.asarray(rng.standard_normal((1, 5, 64, 64, 3)).astype(np.float32))
    init_vars = model.init(jax.random.PRNGKey(0), x, update_stats=False)
    assert jax.tree_util.tree_structure(
        init_vars["params"]) == jax.tree_util.tree_structure(params)
    out = model.apply(
        {"params": params, "batch_stats": init_vars["batch_stats"]},
        x, update_stats=False)
    assert np.isfinite(np.asarray(out)).all()


def test_download_helper_offline(tmp_path):
    from propainter_tpu.utils.download import load_file_from_url

    # existing file short-circuits (no network touched)
    f = tmp_path / "x.pth"
    f.write_bytes(b"123")
    assert load_file_from_url("http://invalid.invalid/x.pth",
                              str(tmp_path)) == str(f)
    # missing file in an offline env raises with instructions
    with pytest.raises(RuntimeError, match="offline|download"):
        load_file_from_url("http://invalid.invalid/y.pth", str(tmp_path))


def test_file_client(tmp_path):
    from propainter_tpu.utils.file_client import FileClient

    f = tmp_path / "a.bin"
    f.write_bytes(b"\x01\x02")
    fc = FileClient("disk")
    assert fc.get(str(f)) == b"\x01\x02"
    with pytest.raises(ValueError, match="not supported"):
        FileClient("nosuch")
    with pytest.raises(ImportError, match="lmdb"):
        FileClient("lmdb", db_paths=str(tmp_path))


class _FakeMemcached:
    """Minimal in-process memcached (text protocol get/set) for tests."""

    def __init__(self):
        import socket
        import threading

        self.store = {}
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(2)
        self.port = self.srv.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        try:
            conn, _ = self.srv.accept()
        except OSError:
            return
        buf = b""
        while True:
            try:
                chunk = conn.recv(65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            while b"\r\n" in buf:
                line, buf = buf.split(b"\r\n", 1)
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == b"get":
                    key = parts[1].decode()
                    if key in self.store:
                        v = self.store[key]
                        conn.sendall(
                            b"VALUE %s 0 %d\r\n%s\r\nEND\r\n"
                            % (parts[1], len(v), v))
                    else:
                        conn.sendall(b"END\r\n")
                elif parts[0] == b"set":
                    nbytes = int(parts[4])
                    while len(buf) < nbytes + 2:
                        buf += conn.recv(65536)
                    self.store[parts[1].decode()] = buf[:nbytes]
                    buf = buf[nbytes + 2:]
                    conn.sendall(b"STORED\r\n")
        conn.close()

    def close(self):
        self.srv.close()


def test_memcached_backend(tmp_path):
    from propainter_tpu.utils.file_client import FileClient

    f = tmp_path / "x.bin"
    f.write_bytes(b"payload-123")
    fake = _FakeMemcached()
    try:
        fc = FileClient("memcached", server=f"127.0.0.1:{fake.port}")
        # miss -> disk read + populate
        assert fc.get(str(f)) == b"payload-123"
        assert len(fake.store) == 1
        # hit: served from the cache even after the file changes
        f.write_bytes(b"changed")
        assert fc.get(str(f)) == b"payload-123"
    finally:
        fake.close()

    # unreachable server degrades to plain disk reads
    fc2 = FileClient("memcached", server="127.0.0.1:1", timeout=0.2)
    assert fc2.get(str(f)) == b"changed"
