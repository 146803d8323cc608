"""Multi-host bootstrap plumbing (parallel/mesh.maybe_initialize_distributed).

The TPU-native analogue of the reference's DDP env discovery + process-group
init (/root/reference/core/dist.py:5-47, /root/reference/train.py:41-45).
A real multi-host run is impossible on this single-host harness, so these
tests pin (a) the single-process no-op default and (b) that the CLI flags /
env vars reach jax.distributed.initialize with the right kwargs.
"""

import json

import pytest

import jax

from propainter_tpu.parallel.mesh import maybe_initialize_distributed


class _Recorder:
    def __init__(self):
        self.calls = []

    def __call__(self, **kwargs):
        self.calls.append(kwargs)


def test_noop_without_config(monkeypatch):
    # no flag, no env var -> never touches jax.distributed (single-process
    # default: current behavior everywhere in this repo)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)

    def boom(**kwargs):
        raise AssertionError("initialize must not be called")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    assert maybe_initialize_distributed() is False


def test_explicit_flags_plumbed(monkeypatch):
    rec = _Recorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    ok = maybe_initialize_distributed(
        coordinator_address="10.0.0.1:1234", num_processes=4, process_id=2,
        local_device_ids="0,1")
    assert ok is True
    assert rec.calls == [{
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
        "local_device_ids": [0, 1],
    }]


def test_env_var_triggers_auto_init(monkeypatch):
    # JAX_COORDINATOR_ADDRESS alone triggers initialize() with no kwargs
    # (jax's own env-based discovery fills the rest)
    rec = _Recorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert maybe_initialize_distributed() is True
    assert rec.calls == [{}]


def test_train_cli_flags_reach_initialize(monkeypatch, tmp_path):
    """cli.train plumbs --coordinator_address/--num_processes/--process_id
    into jax.distributed.initialize (stubbed; a sentinel stops main before
    any heavy work)."""
    from propainter_tpu.cli import train as train_cli

    class _Sentinel(Exception):
        pass

    rec = _Recorder()

    def init_and_stop(**kwargs):
        rec(**kwargs)
        raise _Sentinel

    monkeypatch.setattr(jax.distributed, "initialize", init_and_stop)
    cfg = {"trainer": {"version": "trainer_flow_w_edge", "batch_size": 8,
                       "lr": 1e-4, "iterations": 1},
           "train_data_loader": {"name": "x", "video_root": "x",
                                 "num_local_frames": 2, "num_ref_frames": 1,
                                 "w": 32, "h": 32},
           "model": {"net": "flowcomp"}}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    with pytest.raises(_Sentinel):
        train_cli.main(["-c", str(cfg_path),
                        "--coordinator_address", "1.2.3.4:999",
                        "--num_processes", "2", "--process_id", "1"])
    assert rec.calls == [{"coordinator_address": "1.2.3.4:999",
                          "num_processes": 2, "process_id": 1}]
