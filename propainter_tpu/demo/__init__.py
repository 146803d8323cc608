"""Interactive object-removal demo layer (L6).

Equivalent of the reference web demo (web-demos/hugging_face/): a
segment -> track -> inpaint facade plus a gradio app. Like the reference,
the full stack is SAM (promptable segmentation, models/sam.py +
demo/segmenter.py) + Cutie (memory-based VOS tracking, models/cutie.py +
demo/cutie_core.py) + ProPainter; when those checkpoints are absent the
facade degrades to self-contained stand-ins — GrabCut click/box segmentation
and a RAFT-flow mask tracker — behind the same interfaces.
"""

from propainter_tpu.demo.tracking import (
    ClickSegmenter, CutieTracker, FlowMaskTracker, TrackingFacade,
    load_demo_params)

__all__ = ["ClickSegmenter", "CutieTracker", "FlowMaskTracker",
           "TrackingFacade", "load_demo_params"]
