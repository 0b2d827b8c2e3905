"""Plot derendered strokes over the input image.

Mirror of the reference README's plotting recipe (its README:35-45) — the
strokes JSON structure is identical, so this is the same three lines plus
file output:

    python examples/plot_strokes.py IMAGE.png IMAGE_STROKES.json out.png
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from stroke_derenderer_tpu.io import load_image, load_json  # noqa: E402


def main(img_path: str, strokes_path: str, out_path: str = "plot.png"):
    img = load_image(img_path)
    strokes = load_json(strokes_path)

    plt.figure(figsize=(14, 3))
    plt.imshow(img)
    for (x, y) in strokes:
        plt.plot(x, y)
    plt.axis("off")
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
