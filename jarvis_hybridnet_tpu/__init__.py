"""JARVIS-HybridNet TPU — a TPU-native multi-view markerless 3D motion
capture framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
JARVIS-MoCap/JARVIS-HybridNet (reference layout: jarvis/ in the upstream
repo): a three-stage cascade of CenterDetect (EfficientNet+BiFPN subject
localization), KeypointDetect (2D keypoint heatmaps on fixed crops) and
HybridNet (calibrated voxel reprojection + 3D CNN + soft-argmax), remaining
file-format compatible with existing JARVIS projects (config.yaml, COCO-style
dataset JSON, OpenCV calibration YAMLs, ``.pth`` weight import, CSV outputs).

Design: pure functions over parameter pytrees, ``jax.jit`` everywhere on the
compute path, NHWC layouts, static shapes, ``lax.cond`` gates instead of
Python control flow, ``jax.sharding`` meshes for multi-chip scale-out.
"""

__version__ = "0.1.0"
