"""Reference-compatible entry point: ``python main.py -models M -input I
--output O`` (reference main.py contract). Thin shim over
stroke_derenderer_tpu.cli."""

from stroke_derenderer_tpu.cli import entrypoint

if __name__ == "__main__":
    raise SystemExit(entrypoint())
