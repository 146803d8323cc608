"""Training driver.

Equivalent of reference train.py + core/trainer.py orchestration:
  python -m propainter_tpu.cli.train -c configs/train_propainter.json
  python -m propainter_tpu.cli.train -c configs/train_flowcomp.json

Differences from the reference (by design, TPU-native):
  * one process drives all local devices; data parallelism is sharding
    annotations over a jax Mesh (XLA inserts the gradient all-reduce over
    ICI) instead of mp.spawn + DDP/NCCL (reference train.py:86-105);
  * checkpoints are orbax with a latest-step manager instead of
    .pth triples + latest.ckpt (reference core/trainer.py:274-319);
  * logging: python logging + optional tensorboardX-free scalar JSONL.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import numpy as np


def main(argv=None):

    from propainter_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--max_iters", type=int, default=None,
                   help="override config iterations (for smoke runs)")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"],
                   help="force a jax backend (the image pins "
                        "JAX_PLATFORMS=axon at interpreter start)")
    # multi-host bootstrap (pod slice / multi-slice). TPU-native analogue of
    # the reference's DDP env discovery + init_process_group
    # (/root/reference/core/dist.py:5-47, /root/reference/train.py:41-45).
    # Default (no flags, no JAX_COORDINATOR_ADDRESS env) = single-process.
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 for jax.distributed."
                        "initialize; also honors JAX_COORDINATOR_ADDRESS")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--local_device_ids", type=str, default=None,
                   help="comma-separated local device ids for this process")
    args = p.parse_args(argv)

    with open(args.config) as f:
        config = json.load(f)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from propainter_tpu.parallel.mesh import (
        make_mesh, maybe_initialize_distributed)

    distributed = maybe_initialize_distributed(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
        local_device_ids=args.local_device_ids)
    if distributed:
        print(f"jax.distributed initialized: process "
              f"{jax.process_index()}/{jax.process_count()}, "
              f"{len(jax.local_devices())} local of "
              f"{len(jax.devices())} global devices", flush=True)
    is_main = jax.process_index() == 0
    from propainter_tpu.core.dataset import (
        TrainDataset, TrainDatasetConfig, PrefetchLoader)
    from propainter_tpu.checkpoints import TrainCheckpointManager

    trainer_version = config["trainer"]["version"]
    train_args = config["trainer"]
    data_args = config["train_data_loader"]
    save_dir = os.path.join(
        "experiments_model",
        f"{config['model']['net']}_{os.path.basename(args.config)[:-5]}")
    os.makedirs(save_dir, exist_ok=True)
    logging.basicConfig(
        filename=os.path.join(save_dir, "train.log"), level=logging.INFO,
        format="%(asctime)s %(message)s")

    batch_size = train_args["batch_size"]
    # data parallelism cannot exceed the global batch: use the largest
    # device count that divides it (reference splits batch over all GPUs,
    # core/trainer.py:47, and asserts divisibility implicitly)
    avail = len(jax.devices())
    if distributed:
        # multi-host: every process must drive all its local devices — the
        # mesh spans the full global device list, no truncation
        assert batch_size % avail == 0, (
            f"global batch {batch_size} must divide over {avail} devices")
        n_dev = avail
    else:
        n_dev = next(n for n in range(min(avail, batch_size), 0, -1)
                     if batch_size % n == 0)
    if n_dev != avail:
        print(f"using {n_dev}/{avail} devices (batch {batch_size})")
    mesh = make_mesh(n_dev)

    ds_cfg = TrainDatasetConfig(
        video_root=data_args["video_root"],
        json_path=os.path.join("datasets", data_args["name"], "train.json"),
        flow_root=data_args.get("flow_root"),
        num_local_frames=data_args["num_local_frames"],
        num_ref_frames=data_args["num_ref_frames"],
        w=data_args["w"], h=data_args["h"],
        load_flow=data_args.get("load_flow", False),
    )
    dataset = TrainDataset(ds_cfg)
    # multi-process DP: each process loads its slice of the global batch
    # (the analogue of the reference's DistributedSampler + per-rank batch
    # split, /root/reference/core/trainer.py:40-47)
    n_proc = jax.process_count()
    assert batch_size % n_proc == 0, (
        f"global batch {batch_size} must divide over {n_proc} processes")
    loader = PrefetchLoader(dataset, batch_size // n_proc,
                            num_workers=train_args.get("num_workers", 4))

    rng = jax.random.PRNGKey(config.get("seed", 2023))
    iterations = args.max_iters or int(train_args["iterations"])
    ckpt = TrainCheckpointManager(os.path.join(save_dir, "ckpt"))

    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    sample_shape = (batch_size, ds_cfg.num_local_frames + ds_cfg.num_ref_frames,
                    ds_cfg.h, ds_cfg.w)

    if trainer_version == "trainer_flow_w_edge":
        from propainter_tpu.core.trainer import (
            FlowTrainConfig, init_flow_state, make_flow_train_step)
        from propainter_tpu.models.raft import RAFT, convert_raft_state_dict
        from propainter_tpu.convert.torch_to_jax import load_torch_checkpoint

        raft_params = convert_raft_state_dict(load_torch_checkpoint(
            config["model"].get("raft_path", "weights/raft-things.pth")))
        tcfg = FlowTrainConfig(
            num_local_frames=ds_cfg.num_local_frames,
            lr=config["trainer"]["lr"])
        state, tx = init_flow_state(rng, tcfg, raft_params,
                                    sample_shape=(1, *sample_shape[1:]))
        # donate the state: the optimizer/param trees are the step's
        # largest buffers and the old state is dead after each step
        step_fn = jax.jit(make_flow_train_step(
            tcfg, tx, raft_iters=int(train_args.get("raft_iters", 20)),
            use_precomputed_flows=ds_cfg.load_flow), donate_argnums=(0,))
    else:
        from propainter_tpu.core.trainer import (
            PropainterTrainConfig, init_propainter_state,
            make_propainter_train_step)
        from propainter_tpu.models.raft import convert_raft_state_dict
        from propainter_tpu.models.flow_completion import (
            convert_flowcomp_state_dict)
        from propainter_tpu.convert.torch_to_jax import load_torch_checkpoint

        raft_params = convert_raft_state_dict(load_torch_checkpoint(
            config["model"].get("raft_path", "weights/raft-things.pth")))
        flowcomp_params = convert_flowcomp_state_dict(load_torch_checkpoint(
            config["model"].get("flowcomp_path",
                                "weights/recurrent_flow_completion.pth")))
        losses = config.get("losses", {})
        tcfg = PropainterTrainConfig(
            num_local_frames=ds_cfg.num_local_frames,
            lr=config["trainer"]["lr"],
            hole_weight=losses.get("hole_weight", 1.0),
            valid_weight=losses.get("valid_weight", 1.0),
            adversarial_weight=losses.get("adversarial_weight", 0.01),
            perceptual_weight=losses.get("perceptual_weight", 0.0),
            gan_type=losses.get("GAN_LOSS", "hinge"),
            use_discriminator=not config["model"].get("no_dis", False),
            dis_2d=config["model"].get("dis_2d", False))
        lpips_params = None
        if tcfg.perceptual_weight > 0:
            # reference core/trainer.py:66-69 gates LPIPS the same way
            from propainter_tpu.models.vgg import convert_lpips_state_dict

            lpips_params = convert_lpips_state_dict(
                load_torch_checkpoint(config["model"]["lpips_path"]),
                load_torch_checkpoint(config["model"]["vgg16_path"]))
        state, g_tx, d_tx = init_propainter_state(
            rng, tcfg, raft_params, flowcomp_params,
            sample_shape=(1, *sample_shape[1:]))
        step_fn = jax.jit(make_propainter_train_step(
            tcfg, g_tx, d_tx,
            raft_iters=int(train_args.get("raft_iters", 20)),
            use_precomputed_flows=ds_cfg.load_flow,
            lpips_params=lpips_params), donate_argnums=(0,))

    # resume
    latest = ckpt.latest_step()
    if latest is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {latest}")
    elif trainer_version != "trainer_flow_w_edge":
        # warm start from released torch checkpoints
        # (reference core/trainer.py:248-268 gen_path/dis_path)
        from propainter_tpu.convert.torch_to_jax import load_torch_checkpoint

        if config["model"].get("gen_path"):
            from propainter_tpu.models.propainter import (
                convert_inpaint_state_dict)

            state = state.replace(gen_params=convert_inpaint_state_dict(
                load_torch_checkpoint(config["model"]["gen_path"])))
            print(f"warm-started G from {config['model']['gen_path']}")
        if config["model"].get("dis_path"):
            from propainter_tpu.models.discriminator import (
                convert_discriminator_state_dict)

            state = state.replace(dis_params=convert_discriminator_state_dict(
                load_torch_checkpoint(config["model"]["dis_path"])))
            print(f"warm-started D from {config['model']['dis_path']}")

    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    save_freq = int(train_args.get("save_freq", 10000))
    log_freq = int(train_args.get("log_freq", 100))

    from propainter_tpu.utils.tb import MetricLogger
    from propainter_tpu.utils.flow_viz import flow_to_image

    tb = MetricLogger(os.path.join(save_dir, "logs"))
    viz_freq = int(train_args.get("viz_freq", 200))

    t0 = time.time()
    start = int(np.asarray(state.step))
    if distributed:
        # process-local shard -> global sharded array (each process holds
        # batch_size/n_proc rows of the 'data'-sharded global batch)
        def place_batch(batch):
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    batch_sharding, np.asarray(x)), batch)
    else:
        def place_batch(batch):
            return jax.tree.map(
                lambda x: jax.device_put(x, batch_sharding), batch)

    for it in range(start, iterations):
        batch = place_batch(loader.next())
        with mesh:
            state, metrics, viz = step_fn(state, batch)
        for k, v in metrics.items():
            tb.add(f"loss/{k}", v)
        if (it + 1) % log_freq == 0:
            m = tb.flush_scalars(it + 1)
            rate = (it + 1 - start) / (time.time() - t0)
            if is_main:  # rank-0 logging, reference core/trainer.py:480-500
                logging.info("iter %d %s %.2f it/s", it + 1, m, rate)
                print(f"[{it + 1}/{iterations}] "
                      f"{ {k: round(v, 4) for k, v in m.items()} } "
                      f"({rate:.2f} it/s)", flush=True)
        if (it + 1) % viz_freq == 0 and is_main:
            # image/flow grids (reference core/trainer.py:449-478)
            v = {k: np.asarray(x) for k, x in viz.items()}
            for key in ("comp_local", "masked_local", "gt_local"):
                if key in v:
                    tb.add_images(f"img/{key}", (v[key][0] + 1) / 2, it + 1)
            for key in ("pred_flow_f", "gt_flow_f"):
                if key in v:
                    tb.add_images(f"flow/{key}",
                                  flow_to_image(v[key][0]), it + 1)
            if "pred_edge_f" in v:
                tb.add_images("img/pred_edge_f",
                              np.repeat(v["pred_edge_f"][0], 3, -1), it + 1)
        if (it + 1) % save_freq == 0 and is_main:
            ckpt.save(it + 1, jax.device_get(state))
    loader.stop()
    tb.close()
    print("End training.")


if __name__ == "__main__":
    main()
