"""Generate the committed labeled sample dataset (examples/sample_data/).

Three letterform-rendered line 'scans' with ground-truth stroke polylines in
the pipeline's OWN output format (<stem>.png + <stem>_STROKES.json — the
reference main.py:91-136 contract), so the real-data bootstrap loop

    python -m stroke_derenderer_tpu.train.loop --data examples/sample_data ...
    python main.py -models <out> -input examples/sample_data --output ...
    python -m stroke_derenderer_tpu.eval.run --models <out> --data examples/sample_data

is exercisable out of the box (docs/MIGRATION.md "Bringing your own data").
Deterministic; rerun to regenerate.
"""

import json
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stroke_derenderer_tpu.data.letters import line_of_words
from stroke_derenderer_tpu.data.synthetic import (
    _photo_render, rasterize_strokes,
)

OUT = Path(__file__).resolve().parents[1] / "examples" / "sample_data"
H0, W0 = 160, 640  # "scan" resolution; the pipeline height-normalizes to 128


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for i in range(3):
        rng = np.random.default_rng(100 + i)
        strokes = line_of_words(rng, (H0, W0), max_words=2)
        mask = rasterize_strokes(strokes, (H0, W0), thickness=3)
        Image.fromarray(_photo_render(mask, rng)).save(OUT / f"sample{i}.png")
        (OUT / f"sample{i}_STROKES.json").write_text(json.dumps(
            [[list(map(float, x)), list(map(float, y))]
             for x, y in strokes]))
        print(f"wrote sample{i}.png ({len(strokes)} strokes)")


if __name__ == "__main__":
    main()
