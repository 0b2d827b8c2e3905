"""CLI driver with the reference ``main.py`` contract.

Same flags (-models / -input / --output), same outputs
(<name>_BINARIZED.png + <name>_STROKES.json), same per-image timing prints
(reference main.py:20-30, 91-136). Extras:

  * ``--init-models DIR`` materializes a randomly-initialized model
    directory (no pretrained weights ship in this environment);
  * ``--no-strokes`` runs binarization only (reference ``strokes`` kwarg);
  * per-image failures are logged and skipped instead of aborting the batch
    (QoL improvement over the reference, SURVEY.md §5).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from stroke_derenderer_tpu.config import BinarizerConfig, StrokesConfig
from stroke_derenderer_tpu.io import load_image, save_image, save_json
from stroke_derenderer_tpu.ops.normalize import minmax_normalize_np
from stroke_derenderer_tpu.ops.strokes import strokes_to_json
from stroke_derenderer_tpu.pipeline import Binarizer, StrokeEstimator


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native handwriting derenderer")
    parser.add_argument("-models", required=False, default=None,
                        help="Path to the folder containing all model files.")
    parser.add_argument("-input", default="./images/input",
                        help="Path to the folder containing all input images.")
    parser.add_argument("-output", "--output", default="./images/output",
                        help="Output directory to save all image outputs.")
    parser.add_argument("--no-strokes", action="store_true",
                        help="Binarize only.")
    parser.add_argument("--init-models", default=None, metavar="DIR",
                        help="Write a randomly-initialized model dir and exit.")
    parser.add_argument("--export-onnx", default=None, metavar="DIR",
                        help="Export -models (a native msgpack model dir) "
                             "as the reference's five-ONNX-graph artifact "
                             "layout into DIR and exit "
                             "(weights/graph_export.py).")
    parser.add_argument("--fused", action="store_true",
                        help="Fully fused per-width binarize programs.")
    parser.add_argument("--batch", action="store_true",
                        help="Throughput mode: batch ALL images' tiles and "
                             "glyphs into shared device programs (the "
                             "reference can only loop per image).")
    parser.add_argument("--preset", choices=["reference", "real"],
                        default="reference",
                        help="Decode policy preset. 'reference' (default) "
                             "is the reference-parity single greedy pass "
                             "(its main.py:91-136 contract). 'real' is the "
                             "measured best policy for REAL photographed "
                             "handwriting — the reference's own demo class "
                             "(its README.md:34): coverage-driven residual "
                             "re-decode at 0.9 with the calibrated 20 px "
                             "fragment join, which beats greedy on ALL "
                             "THREE quality metrics on the real-ink eval "
                             "set (models_demo/README.md: DTW 22.9 vs "
                             "30.4, chamfer 3.78 vs 5.6, coverage 0.953 "
                             "vs 0.694). Explicit --redecode/"
                             "--redecode-passes flags win over the "
                             "preset.")
    parser.add_argument("--decode", choices=["greedy", "beam"], default=None,
                        help="Decoding strategy (default: model config / "
                             "greedy; the reference is greedy-only).")
    parser.add_argument("--beam-size", type=int, default=None,
                        help="Beam width for --decode beam.")
    parser.add_argument("--redecode", type=float, default=None, metavar="C",
                        help="Coverage-driven re-decode: while less than "
                             "fraction C of the ink lies within ~2 px of "
                             "the predicted strokes, the uncovered residual "
                             "gets another decode pass (counters early-EOS "
                             "on dense glyphs). E.g. 0.9.")
    parser.add_argument("--redecode-passes", type=int, default=None,
                        metavar="K",
                        help="Max residual passes for --redecode "
                             "(default 3; each pass stops early once "
                             "coverage C is met or nothing new decodes).")
    parser.add_argument("--refine", type=float, default=None, metavar="PX",
                        help="Snap decoded stroke vertices onto the "
                             "binarized ink within PX pixels "
                             "(ops/strokes.refine_strokes): keeps the "
                             "model's stroke order/topology, takes metric "
                             "accuracy from the mask. E.g. 3.")
    parser.add_argument("--device-partition", action="store_true",
                        help="Materialize glyph crops on device (group-id "
                             "image + MXU resize; ops/device_partition.py; "
                             "the default — kept for compatibility).")
    parser.add_argument("--host-partition", action="store_true",
                        help="Disable device-side glyph partitioning (crops "
                             "composited/resized on the host instead).")
    parser.add_argument("--svg", action="store_true",
                        help="Also write <name>_STROKES.svg vector output "
                             "next to the JSON.")
    parser.add_argument("--mesh", type=int, default=0, metavar="N",
                        help="Data-parallel inference over the first N "
                             "devices: params replicated, tile/glyph batch "
                             "axes sharded over a ('dp',) mesh (SURVEY.md "
                             "§2.4). 0/1 = single device.")
    parser.add_argument("--two-stage", type=int, nargs="?", const=8,
                        default=0, metavar="CHUNK",
                        help="Pipeline-parallel overlap: binarize chunk k+1 "
                             "while chunk k's strokes decode "
                             "(parallel.TwoStagePipeline; stages live on "
                             "disjoint device halves when >1 device). "
                             "Optional value = chunk size (default 8).")
    parser.add_argument("--quant", choices=["none", "int8"], default=None,
                        help="Dynamic int8 quantization of the UNet and "
                             "encoder conv stacks (MXU int8 path, 2x bf16 "
                             "peak on v5e; ops/quant.py). Any checkpoint "
                             "runs in either mode.")
    parser.add_argument("--mesh-tp", type=int, default=1, metavar="K",
                        help="Sequence-parallel extent within --mesh: the "
                             "binarizer's tile WIDTH axis shards over a tp "
                             "axis of size K (N must be divisible by K).")
    return parser.parse_args(argv)


def initialize_sessions(folderpath, fused: bool = False,
                        se_overrides: dict | None = None, mesh=None,
                        bin_overrides: dict | None = None):
    """Build both pipelines from a model directory (reference main.py:33-64).

    Missing weight files fall back to random init with a warning so the
    pipeline stays runnable end-to-end. ``se_overrides``/``bin_overrides``
    are StrokesConfig/BinarizerConfig field overrides that win over the
    model dir's config JSON (used by the --decode/--beam-size/--quant CLI
    flags).

    A directory holding the REFERENCE's artifacts (the five ONNX graphs +
    config JSONs a reference user already has, /root/reference/main.py:43-62)
    is detected and imported turnkey via weights/graph_import.py — pointing
    -models at an unmodified reference download just works.
    """
    folder = Path(folderpath) if folderpath else None

    def _opt(name):
        p = folder / name if folder else None
        return p if (p and p.exists()) else None

    if _opt("binarizer.onnx") and not _opt("binarizer.msgpack"):
        return _sessions_from_onnx(folder, fused, se_overrides, mesh,
                                   bin_overrides)

    bin_cfg_path = _opt("configs_binarizer.json")
    bin_cfg = BinarizerConfig.from_json(bin_cfg_path)
    if bin_overrides:
        import dataclasses
        bin_cfg = dataclasses.replace(bin_cfg, **bin_overrides)
    bin_weights = _opt("binarizer.msgpack")
    if folder and not bin_weights:
        print(f"[warn] {folder}/binarizer.msgpack not found; using random init")
    binarizer = Binarizer(bin_cfg, weights_path=bin_weights, mesh=mesh)

    se_cfg_path = _opt("configs_strokes.json")
    se_cfg = StrokesConfig.from_json(se_cfg_path)
    if se_overrides:
        import dataclasses
        se_cfg = dataclasses.replace(se_cfg, **se_overrides)
    paths = {}
    enc_w, dec_w = _opt("strokes_encoder.msgpack"), _opt("strokes_decoder.msgpack")
    if enc_w and dec_w:
        paths = {"encoder": enc_w, "decoder": dec_w}
        proj_w = _opt("strokes_projection.msgpack")
        if proj_w:
            paths["projection"] = proj_w
    elif folder:
        print(f"[warn] stroke model weights not found in {folder}; using random init")
    estimator = StrokeEstimator(se_cfg, weights_paths=paths or None,
                                mesh=mesh)
    binarizer.fused = fused
    return binarizer, estimator


def _sessions_from_onnx(folder, fused, se_overrides, mesh,
                        bin_overrides=None):
    """Build both pipelines straight from a reference ONNX model directory
    (weights/graph_import.import_reference_models)."""
    from stroke_derenderer_tpu.weights.graph_import import (
        import_reference_models,
    )
    print(f"[info] importing reference ONNX models from {folder}")
    (bin_cfg, bin_vars, se_cfg, enc_vars, dec_vars,
     proj_vars) = import_reference_models(folder)
    import dataclasses
    if se_overrides:
        se_cfg = dataclasses.replace(se_cfg, **se_overrides)
    if bin_overrides:
        bin_cfg = dataclasses.replace(bin_cfg, **bin_overrides)
    binarizer = Binarizer(bin_cfg, variables=bin_vars, mesh=mesh)
    binarizer.fused = fused
    estimator = StrokeEstimator(se_cfg, variables=(enc_vars, dec_vars,
                                                   proj_vars), mesh=mesh)
    return binarizer, estimator


def run(imgs, binarizer: Binarizer, estimator: StrokeEstimator | None,
        output_folder, strokes: bool = True, svg: bool = False) -> int:
    """Per-image binarize -> save -> stroke-estimate -> rescale -> save loop
    (reference main.py:91-136). Returns the number of images processed."""
    out_dir = Path(output_folder)
    out_dir.mkdir(parents=True, exist_ok=True)
    done = 0
    for img, filename in imgs:
        try:
            height = img.shape[0]

            start_bin = time.time()
            img_bin = binarizer.binarize_image(img)
            mask = img_bin[:, :, 0] > (255 * binarizer.config.bin_thr)
            comp_bin_time = round(time.time() - start_bin, 4)

            bin_path = str(out_dir / f"{filename}_BINARIZED.png")
            save_image(minmax_normalize_np(mask.astype(np.uint8)), bin_path,
                       grayscale=True)
            print(f"{filename} took {comp_bin_time} seconds to binarize. "
                  f"Result is saved to {bin_path}")

            if strokes and estimator is not None:
                ratio = height / img_bin.shape[0]
                start_se = time.time()
                stroke_list = estimator.process_image(mask, max_length=None)
                comp_se_time = round(time.time() - start_se, 4)
                st_path = str(out_dir / f"{filename}_STROKES.json")
                save_json(strokes_to_json(stroke_list, scale=ratio), st_path)
                print(f"{filename} took {comp_se_time} seconds to estimate "
                      f"strokes. Result is saved to {st_path}")
                if svg:
                    from stroke_derenderer_tpu.io import save_svg
                    save_svg(stroke_list, out_dir / f"{filename}_STROKES.svg",
                             size=(img.shape[1], img.shape[0]), scale=ratio)
            done += 1
        except Exception as exc:  # per-image failures are non-fatal
            print(f"[error] {filename}: {type(exc).__name__}: {exc}")
    return done


def run_batched(imgs, binarizer: Binarizer, estimator: StrokeEstimator | None,
                output_folder, strokes: bool = True, svg: bool = False) -> int:
    """Throughput mode: one device batch for every image's tiles, one for
    every image's glyphs. Same outputs/filenames as :func:`run`; the timing
    print reports the amortized per-image time."""
    out_dir = Path(output_folder)
    out_dir.mkdir(parents=True, exist_ok=True)
    if not imgs:
        return 0
    t0 = time.time()
    bins = binarizer.binarize_images([img for img, _ in imgs])
    masks = [b[:, :, 0] > (255 * binarizer.config.bin_thr) for b in bins]
    t_bin = round((time.time() - t0) / len(imgs), 4)
    for (img, filename), mask in zip(imgs, masks):
        bin_path = str(out_dir / f"{filename}_BINARIZED.png")
        save_image(minmax_normalize_np(mask.astype(np.uint8)), bin_path,
                   grayscale=True)
        print(f"{filename} took {t_bin} seconds to binarize (amortized). "
              f"Result is saved to {bin_path}")
    if strokes and estimator is not None:
        t0 = time.time()
        all_strokes = estimator.process_images(masks)
        t_se = round((time.time() - t0) / len(imgs), 4)
        for (img, filename), mask, stroke_list in zip(imgs, masks, all_strokes):
            ratio = img.shape[0] / mask.shape[0]
            st_path = str(out_dir / f"{filename}_STROKES.json")
            save_json(strokes_to_json(stroke_list, scale=ratio), st_path)
            print(f"{filename} took {t_se} seconds to estimate strokes "
                  f"(amortized). Result is saved to {st_path}")
            if svg:
                from stroke_derenderer_tpu.io import save_svg
                save_svg(stroke_list, out_dir / f"{filename}_STROKES.svg",
                         size=(img.shape[1], img.shape[0]), scale=ratio)
    return len(imgs)


def run_two_stage(imgs, binarizer: Binarizer,
                  estimator: StrokeEstimator | None, output_folder,
                  chunk_size: int = 8, strokes: bool = True,
                  svg: bool = False) -> int:
    """Pipeline-parallel mode: stage A (binarize) overlaps stage B (stroke
    decode) across chunks of the image stream (parallel.TwoStagePipeline).
    Same outputs/filenames as :func:`run`; timing prints are amortized."""
    out_dir = Path(output_folder)
    out_dir.mkdir(parents=True, exist_ok=True)
    if not imgs:
        return 0
    if not strokes or estimator is None:
        # No stage B to overlap with: the batched single-stage path is the
        # same program.
        return run_batched(imgs, binarizer, None, output_folder,
                           strokes=False, svg=svg)
    from stroke_derenderer_tpu.parallel import TwoStagePipeline
    pipe = TwoStagePipeline(binarizer, estimator)
    t0 = time.time()
    masks, all_strokes = pipe.process_batched([img for img, _ in imgs],
                                              chunk_size=chunk_size)
    t_img = round((time.time() - t0) / len(imgs), 4)
    for (img, filename), mask, stroke_list in zip(imgs, masks, all_strokes):
        bin_path = str(out_dir / f"{filename}_BINARIZED.png")
        save_image(minmax_normalize_np(mask.astype(np.uint8)), bin_path,
                   grayscale=True)
        print(f"{filename} took {t_img} seconds e2e (two-stage amortized). "
              f"Result is saved to {bin_path}")
        ratio = img.shape[0] / mask.shape[0]
        st_path = str(out_dir / f"{filename}_STROKES.json")
        save_json(strokes_to_json(stroke_list, scale=ratio), st_path)
        print(f"{filename} strokes saved to {st_path}")
        if svg:
            from stroke_derenderer_tpu.io import save_svg
            save_svg(stroke_list, out_dir / f"{filename}_STROKES.svg",
                     size=(img.shape[1], img.shape[0]), scale=ratio)
    return len(imgs)


def load_images(img_filepaths):
    """(paths) -> [(image, stem), ...] (reference main.py:67-78).
    Unreadable files are skipped with a log line instead of aborting."""
    out = []
    for p in img_filepaths:
        try:
            out.append((load_image(str(p)), Path(p).stem))
        except Exception as exc:
            print(f"[error] cannot load {p}: {type(exc).__name__}: {exc}")
    return out


def entrypoint(argv=None):
    from stroke_derenderer_tpu.utils import (
        enable_compile_cache, honor_platform_env,
    )
    honor_platform_env()
    enable_compile_cache()
    args = parse_args(argv)
    if args.init_models:
        from stroke_derenderer_tpu.weights import materialize_model_dir
        materialize_model_dir(args.init_models)
        print(f"initialized model dir at {args.init_models}")
        return 0
    if args.export_onnx:
        if not args.models:
            print("[error] --export-onnx requires -models <native dir>")
            return 2
        from stroke_derenderer_tpu.weights.graph_export import (
            export_reference_models,
        )
        export_reference_models(args.models, args.export_onnx)
        print(f"exported reference-layout ONNX model dir to "
              f"{args.export_onnx}")
        return 0

    img_filepaths = sorted(Path(args.input).glob("*.png"))
    imgs = load_images(img_filepaths)
    se_overrides = {}
    if args.preset == "real":
        # Out-of-the-box policy for photographed handwriting; the
        # reference-parity greedy contract stays the default preset (the
        # round-4 decision record: VERDICT r4 item 8 / models_demo/README).
        se_overrides["redecode_coverage"] = 0.9
    if args.decode:
        se_overrides["decode"] = args.decode
    if args.beam_size:
        se_overrides["beam_size"] = args.beam_size
    if args.redecode is not None:
        se_overrides["redecode_coverage"] = args.redecode
    if args.redecode_passes is not None:
        se_overrides["redecode_passes"] = args.redecode_passes
    if args.refine is not None:
        se_overrides["refine_snap"] = args.refine
    if args.device_partition:
        se_overrides["device_partition"] = True
    if args.host_partition:
        se_overrides["device_partition"] = False
    bin_overrides = {}
    if args.quant:
        se_overrides["quant"] = args.quant
        bin_overrides["quant"] = args.quant
    mesh = None
    if args.mesh and args.mesh > 1:
        import jax

        from stroke_derenderer_tpu.parallel import make_mesh
        n_dev = len(jax.devices())
        if n_dev < args.mesh:
            print(f"[warn] --mesh {args.mesh} requested but only {n_dev} "
                  f"device(s) present; running single-device")
        else:
            mesh = make_mesh(args.mesh, tp=args.mesh_tp)
    binarizer, estimator = initialize_sessions(args.models, fused=args.fused,
                                               se_overrides=se_overrides,
                                               mesh=mesh,
                                               bin_overrides=bin_overrides)
    if args.two_stage:
        run_two_stage(imgs, binarizer, estimator, args.output,
                      chunk_size=args.two_stage,
                      strokes=not args.no_strokes, svg=args.svg)
    else:
        runner = run_batched if args.batch else run
        runner(imgs, binarizer, estimator, args.output,
               strokes=not args.no_strokes, svg=args.svg)
    return 0


if __name__ == "__main__":
    raise SystemExit(entrypoint())
