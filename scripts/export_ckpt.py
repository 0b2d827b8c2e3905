"""Export a mid-training captioner checkpoint into a runnable model dir.

Training exports a model dir only when the run COMPLETES (train/loop.py
train_captioner tail); long finetunes want intermediate eval. This reads a
``ckpt_captioner/step_*`` dir (the EMA shadow when present — that is what a
completed run would export), writes strokes_{encoder,decoder}.msgpack +
configs into --out, and copies the binarizer artifacts from --base so the
dir drives the full CLI/eval pipeline.

  python scripts/export_ckpt.py --ckpt models_r12/ckpt_captioner/step_00007000 \
      --base models_demo --out /tmp/m_r12_7k
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint step dir (or ckpt_captioner dir -> latest)")
    ap.add_argument("--base", required=True,
                    help="model dir supplying binarizer + configs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--raw", action="store_true",
                    help="export the raw (non-EMA) params even when an EMA "
                         "shadow exists")
    ap.add_argument("--encoder-arch", default=None,
                    help="rewrite encoder_arch in the exported "
                         "configs_strokes.json — REQUIRED when the "
                         "checkpoint's architecture differs from --base's "
                         "(e.g. a --init-partial capacity-growth run)")
    args = ap.parse_args()

    from flax.serialization import msgpack_restore

    from stroke_derenderer_tpu.train.checkpoint import latest_checkpoint
    from stroke_derenderer_tpu.weights.store import save_variables

    ckpt = Path(args.ckpt)
    if not (ckpt / "params.msgpack").exists():
        ckpt = latest_checkpoint(ckpt)
        if ckpt is None:
            raise SystemExit(f"no checkpoint under {args.ckpt}")
    src = ckpt / ("params.msgpack" if args.raw else "extra_ema.msgpack")
    if not src.exists():
        src = ckpt / "params.msgpack"
    params = msgpack_restore(src.read_bytes())

    base, out = Path(args.base), Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_variables({"params": params["encoder"]},
                   out / "strokes_encoder.msgpack")
    save_variables({"params": params["decoder"]},
                   out / "strokes_decoder.msgpack")
    for name in ("binarizer.msgpack", "configs_binarizer.json",
                 "configs_strokes.json"):
        if (base / name).exists():
            shutil.copy(base / name, out / name)
    if args.encoder_arch:
        import json
        p = out / "configs_strokes.json"
        cfg = json.loads(p.read_text()) if p.exists() else {}
        cfg["encoder_arch"] = args.encoder_arch
        p.write_text(json.dumps(cfg, indent=1))
    print(f"exported {src} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
