"""ProPainter-TPU: a TPU-native JAX/XLA/Pallas video-inpainting framework.

A from-scratch re-design of the capabilities of sczhou/ProPainter (ICCV 2023,
flow-guided video inpainting) for TPU hardware:

  * all models are pure-functional flax.linen modules in NHWC layout,
  * temporal/iterative recurrences are `lax.scan`s (no Python loops under jit),
  * the hot ops (RAFT correlation lookup, modulated deformable convolution,
    sparse window attention) have Pallas TPU kernels with XLA fallbacks,
  * multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` over ICI,
  * checkpoints use orbax, with a one-time converter from the reference's
    released PyTorch `.pth` files.

Layer map (mirrors SURVEY.md section 1):
  ops/       L2 foundation ops (warp, patches, deform, corr, canny, interp)
  models/    L3 models (RAFT, RecurrentFlowCompleteNet, InpaintGenerator, ...)
  core/      L4 training runtime (datasets, losses, trainers, schedulers)
  parallel/  mesh / sharding helpers
  utils/     L1 generic utils (flow IO, image IO, masks, video IO)
  cli/       L5 entry points (inference, train, evaluate, compute_flow)
  convert/   PyTorch -> JAX weight conversion
"""

__version__ = "0.1.0"
