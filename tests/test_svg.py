"""SVG stroke export (io/svg.py): well-formed XML, correct geometry."""

import xml.etree.ElementTree as ET

import numpy as np

from stroke_derenderer_tpu.io.svg import (
    json_strokes_to_svg, save_svg, strokes_to_svg,
)

NS = "{http://www.w3.org/2000/svg}"


def _parse(svg: str):
    return ET.fromstring(svg)


def test_polylines_and_scale():
    strokes = [(np.array([0.0, 10.0, 20.0]), np.array([5.0, 6.0, 7.0])),
               (np.array([3.0]), np.array([4.0]))]
    svg = strokes_to_svg(strokes, size=(100, 50), scale=2.0)
    root = _parse(svg)
    assert root.attrib["viewBox"] == "0 0 100 50"
    polys = root.findall(f"{NS}polyline")
    dots = root.findall(f"{NS}circle")
    assert len(polys) == 1 and len(dots) == 1  # 1-vertex stroke becomes a dot
    pts = [tuple(map(float, p.split(",")))
           for p in polys[0].attrib["points"].split()]
    assert pts == [(0.0, 10.0), (20.0, 12.0), (40.0, 14.0)]  # scaled by 2
    assert float(dots[0].attrib["cx"]) == 6.0


def test_inferred_canvas_and_empty():
    svg = strokes_to_svg([(np.array([5.0, 30.0]), np.array([8.0, 2.0]))],
                         stroke_width=2.0)
    root = _parse(svg)
    assert float(root.attrib["width"]) == 32.0   # max x + stroke_width
    assert float(root.attrib["height"]) == 10.0  # max y + stroke_width
    empty = _parse(strokes_to_svg([]))
    assert len(list(empty)) == 0


def test_json_roundtrip_and_save(tmp_path):
    stroke_json = [[[1.0, 2.0], [3.0, 4.0]]]
    svg = json_strokes_to_svg(stroke_json)
    assert "polyline" in svg
    p = tmp_path / "out.svg"
    save_svg([(np.array([1.0, 2.0]), np.array([3.0, 4.0]))], p)
    assert p.read_text().startswith("<svg")


def test_cli_flag_writes_svg(tmp_path, rng):
    from pathlib import Path

    from PIL import Image
    from stroke_derenderer_tpu import cli
    img = np.full((64, 300, 3), 255, np.uint8)
    img[30:34, 20:200] = 0
    (tmp_path / "in").mkdir()
    Image.fromarray(img).save(tmp_path / "in" / "a.png")
    # models_demo (vs random init) so the greedy decode hits EOS instead of
    # running all 384 steps per glyph — this test is about --svg plumbing.
    models = Path(__file__).parent.parent / "models_demo"
    cli.entrypoint(["-models", str(models),
                    "-input", str(tmp_path / "in"),
                    "--output", str(tmp_path / "out"), "--svg"])
    assert (tmp_path / "out" / "a_BINARIZED.png").exists()
    assert (tmp_path / "out" / "a_STROKES.json").exists()
    svg_path = tmp_path / "out" / "a_STROKES.svg"
    assert svg_path.exists()
    _parse(svg_path.read_text())  # well-formed
