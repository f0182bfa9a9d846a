"""Functional pipeline layers (proposal generation, detection postprocess,
training-target assignment) — vmapped static-shape programs replacing the
reference's per-image Python loops."""

from objectdetection_tpu.layers.proposals import proposal_layer  # noqa: F401
from objectdetection_tpu.layers.detection import detection_layer  # noqa: F401
