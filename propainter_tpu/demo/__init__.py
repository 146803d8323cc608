"""Interactive object-removal demo layer (L6).

Equivalent of the reference web demo (web-demos/hugging_face/): a
segment -> track -> inpaint facade plus a gradio app. The reference vendors
SAM (segmentation) and Cutie (VOS tracking); here the default implementations
are self-contained — GrabCut click/box segmentation and a RAFT-flow mask
tracker — with the same facade interfaces so SAM/Cutie-class models can be
plugged in.
"""

from propainter_tpu.demo.tracking import (
    ClickSegmenter, FlowMaskTracker, TrackingFacade)

__all__ = ["ClickSegmenter", "FlowMaskTracker", "TrackingFacade"]
