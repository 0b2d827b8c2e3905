"""stroke_derenderer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) handwriting
de-rendering framework.

Re-implements, TPU-first, the capabilities of the reference two-stage
offline-handwriting derendering pipeline (see /root/reference, surveyed in
SURVEY.md): given a PNG of a single line of handwritten text it

  1. binarizes (text-segments) the line with an attention-UNet over
     overlapping 128x384 tiles, and
  2. estimates the pen strokes (ordered polylines) with a CNN encoder +
     attentive autoregressive LSTM decoder over 224x224 glyph-group crops,

emitting a ``*_BINARIZED.png`` and a ``*_STROKES.json`` per input image with
the same file contract as the reference ``main.py``.

Unlike the reference (per-tile ONNX Runtime CPU calls and a per-token host
loop), everything hot here is a single XLA program: tile cutting, the UNet
forward, thresholding and max-blend stitching fuse into one jit; the greedy
stroke decode is one ``lax.while_loop`` on device instead of up to 768 host
round-trips per image (reference evaluate_strokes.py:279-302).

Layout:
  config    — dataclass configs, JSON-loadable, defaults identical to the
              reference constants.
  ops       — pure-jnp geometry: resize, tiling/stitching, normalization,
              connected components, interval grouping, stroke post-processing.
  models    — flax models: attention-UNet binarizer, ResNet encoder,
              attentive LSTM stroke decoder.
  kernels   — Pallas TPU kernels for the hot ops.
  pipeline  — binarize / strokes / end-to-end jitted pipelines.
  parallel  — device-mesh creation and batch/param sharding (pjit).
  train     — losses + sharded train steps (the reference trains in torch
              out-of-repo; here training is first-class).
  weights   — param init, ONNX-initializer import (gated), npz/orbax store.
  native    — host-side C++ (connected components) with ctypes bindings.
  io        — host-side PNG/JSON/YAML IO.
"""

__version__ = "0.1.0"

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig  # noqa: F401
