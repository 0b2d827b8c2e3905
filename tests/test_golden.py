"""E2E golden contract test (VERDICT r1 item 8).

Fixed input PNG -> byte-pinned _BINARIZED.png + _STROKES.json through the
CLI with the COMMITTED models_demo weights, so contract or numerics
regressions are caught on the CPU backend without a TPU. The goldens were
produced by the same pipeline on this environment's jax/XLA CPU backend
(deterministic); regenerate UNDER THE SUITE'S ENV — the 8-virtual-device
flag changes XLA CPU reduction order enough to move the greedy decode —
with

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m stroke_derenderer_tpu.cli -models models_demo \
        -input tests/golden --output /tmp/golden_out

and copy the outputs over tests/golden/expected_* ONLY after verifying the
change that moved them is intentional (reference contract:
/root/reference/main.py:91-136).
"""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

GOLDEN = Path(__file__).parent / "golden"
REPO = Path(__file__).parent.parent


def test_e2e_golden_contract(tmp_path):
    from stroke_derenderer_tpu.cli import entrypoint
    models = REPO / "models_demo"
    if not (models / "binarizer.msgpack").exists():
        pytest.skip("models_demo weights not present")
    rc = entrypoint(["-models", str(models), "-input", str(GOLDEN),
                     "--output", str(tmp_path)])
    assert rc == 0

    got_mask = np.asarray(Image.open(tmp_path / "golden_input_BINARIZED.png"))
    exp_mask = np.asarray(Image.open(GOLDEN / "expected_BINARIZED.png"))
    np.testing.assert_array_equal(got_mask, exp_mask)

    got = json.loads((tmp_path / "golden_input_STROKES.json").read_text())
    exp = json.loads((GOLDEN / "expected_STROKES.json").read_text())
    assert got == exp
