"""SVG export for estimated strokes.

The pipeline's product is vector polylines, so SVG is their natural
serialization alongside the reference's ``_STROKES.json`` contract
(reference main.py:122-134; the reference declares svgpathtools in its
setup.py:15-31 but never emits vector output — this is a capability the
derendering result always implied).

The drawing convention matches the README plotting recipe (reference
README.md:35-45): image coordinates, y-axis pointing down, one polyline per
stroke.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_HEADER = ('<svg xmlns="http://www.w3.org/2000/svg" '
           'width="{w:.10g}" height="{h:.10g}" '
           'viewBox="0 0 {w:.10g} {h:.10g}">\n')


def _fmt(v: float) -> str:
    return f"{float(v):.10g}"


def strokes_to_svg(strokes, size: tuple[float, float] | None = None,
                   scale: float = 1.0, stroke_width: float = 2.0,
                   color: str = "#000") -> str:
    """Render ``[(X, Y), ...]`` polylines to an SVG document string.

    ``size`` is (width, height) of the canvas; when omitted it is inferred
    from the stroke extents (plus a stroke-width margin). ``scale`` rescales
    coordinates exactly like ``strokes_to_json``'s scale (the
    height-normalization ratio, reference main.py:122-131).
    """
    polys = []
    for x, y in strokes:
        x = np.asarray(x, dtype=np.float64) * scale
        y = np.asarray(y, dtype=np.float64) * scale
        n = min(x.size, y.size)
        if n == 0:
            continue
        polys.append((x[:n], y[:n]))

    if size is None:
        if polys:
            w = max(float(p[0].max()) for p in polys) + stroke_width
            h = max(float(p[1].max()) for p in polys) + stroke_width
        else:
            w = h = stroke_width
        size = (w, h)

    parts = [_HEADER.format(w=size[0], h=size[1])]
    for x, y in polys:
        pts = " ".join(f"{_fmt(a)},{_fmt(b)}" for a, b in zip(x, y))
        if x.size == 1:  # a single vertex: draw a dot (zero-length polyline
            # is invisible with butt linecaps)
            parts.append(f'  <circle cx="{_fmt(x[0])}" cy="{_fmt(y[0])}" '
                         f'r="{_fmt(stroke_width / 2)}" fill="{color}"/>\n')
        else:
            parts.append(f'  <polyline points="{pts}" fill="none" '
                         f'stroke="{color}" stroke-width="{_fmt(stroke_width)}" '
                         f'stroke-linecap="round" stroke-linejoin="round"/>\n')
    parts.append("</svg>\n")
    return "".join(parts)


def save_svg(strokes, filepath: str | Path,
             size: tuple[float, float] | None = None, scale: float = 1.0,
             stroke_width: float = 2.0, color: str = "#000") -> None:
    Path(filepath).write_text(
        strokes_to_svg(strokes, size=size, scale=scale,
                       stroke_width=stroke_width, color=color))


def json_strokes_to_svg(stroke_json: list, **kwargs) -> str:
    """Convert an already-serialized ``_STROKES.json`` structure
    ([[X_list, Y_list], ...]) to SVG."""
    return strokes_to_svg([(np.asarray(x), np.asarray(y))
                           for x, y in stroke_json], **kwargs)
