"""Model zoo (L3): RAFT optical flow, recurrent flow completion,
ProPainter inpainting generator, T-PatchGAN discriminators, I3D (for VFID)."""

from propainter_tpu.models.raft import RAFT
