"""Non-interactive CLI replacing the reference's numbered scripts + stdin
menus (reference: scripts/Modello_2..5, Dataset_step*, ShowResult):

  prepare-data  scan pair dirs -> train/val/test manifests   (Modello_2)
  train         run a preset/config training                 (Modello_3+supporto)
  finalize      promote best checkpoint to final_weights     (Modello_4)
  test          eval split: PSNR/SSIM + TIFF16 + strips      (Modello_5)
  upscale       tiled SR on an arbitrary image               (new)
  benchmark     MP/s/chip harness                            (new)
  presets       list named configs
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _add_common(p):
    p.add_argument("--preset", default="edsr_baseline_x4")
    p.add_argument("--workdir", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--data-root", default=None,
                   help="directory of pair_* dirs (else synthetic data)")
    p.add_argument("--manifest-dir", default=None)
    p.add_argument("--mesh-data", type=int, default=None)
    p.add_argument("--mesh-pipe", type=int, default=None,
                   help="pipeline stages for the RRDB trunk body"
                        " (requires an RRDBNet arch; see MeshConfig)")


def _config_from_args(args):
    import os

    from superresolution_tpu.utils.config import get_preset

    cfg = get_preset(args.preset)
    data = cfg.data
    train = cfg.train
    mesh = cfg.mesh
    if args.manifest_dir:
        data = dataclasses.replace(
            data,
            train_manifest=os.path.join(args.manifest_dir, "train.json"),
            val_manifest=os.path.join(args.manifest_dir, "val.json"),
            test_manifest=os.path.join(args.manifest_dir, "test.json"))
    elif args.data_root:
        # scan pair_* dirs -> split manifests under the workdir -> train on
        # the real pairs (the reference's Modello_2 -> Modello_3 journey)
        from superresolution_tpu.data.manifest import prepare_splits

        split_dir = os.path.join(
            args.workdir or os.path.join("outputs", cfg.name), "splits")
        paths = prepare_splits(args.data_root, split_dir, mode="split")
        data = dataclasses.replace(
            data, train_manifest=paths["train"], val_manifest=paths["val"],
            test_manifest=paths["test"])
    if args.batch_size:
        data = dataclasses.replace(data, batch_size=args.batch_size)
    if args.epochs:
        train = dataclasses.replace(train, epochs=args.epochs)
    if args.mesh_data:
        mesh = dataclasses.replace(mesh, data=args.mesh_data)
    if args.mesh_pipe:
        mesh = dataclasses.replace(mesh, pipe=args.mesh_pipe)
    return dataclasses.replace(cfg, data=data, train=train, mesh=mesh)


def cmd_prepare_data(args):
    from superresolution_tpu.data.manifest import prepare_splits

    paths = prepare_splits(args.root, args.out, mode=args.mode,
                           val_frac=args.val_frac, seed=args.seed)
    print(json.dumps(paths, indent=2))


def cmd_train(args):
    from superresolution_tpu.train.trainer import Trainer

    cfg = _config_from_args(args)
    with Trainer(cfg, workdir=args.workdir) as trainer:
        result = trainer.fit()
    print(json.dumps(result))


def cmd_finalize(args):
    from superresolution_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(args.checkpoints)
    out = mgr.finalize(args.out)
    print(f"finalized -> {out}")


def cmd_test(args):
    from superresolution_tpu.infer.evaluate import run_test
    from superresolution_tpu.train.trainer import Trainer

    cfg = _config_from_args(args)
    with Trainer(cfg, workdir=args.workdir) as trainer:
        result = run_test(trainer, labeled=args.labeled)
    print(json.dumps(result))


def cmd_eval_folder(args):
    """PSNR/SSIM over an HR image folder (Set5/Set14 convention:
    Y-channel, shave=scale, MATLAB-bicubic LR) — the one-command parity
    harness for the day real benchmark data exists (VERDICT r2 item 7).
    """
    import os

    import numpy as np

    from superresolution_tpu.infer import upscale
    from superresolution_tpu.metrics.benchmark_eval import evaluate_folder

    if not os.path.isdir(args.hr_dir):
        print(f"error: not a directory: {args.hr_dir}", file=sys.stderr)
        return 2
    params = None
    model = args.model
    scale = args.scale
    if args.ckpt:
        from superresolution_tpu.models.factory import (
            build_from_config, total_scale)
        from superresolution_tpu.train.checkpoint import (
            load_params_for_inference)
        from superresolution_tpu.utils.config import ModelConfig

        if not os.path.exists(args.ckpt):
            print(f"error: checkpoint not found: {args.ckpt}",
                  file=sys.stderr)
            return 2
        params, mc = load_params_for_inference(args.ckpt, with_config=True)
        if mc:
            mc.pop("output_size", None)
            mcfg = ModelConfig(**mc)
            model = build_from_config(mcfg, output_size=None)
            scale = total_scale(mcfg)

    def up(lr):
        return np.asarray(upscale(lr, scale, model=model, params=params,
                                  tile=args.tile, halo=args.halo))

    result = evaluate_folder(up, args.hr_dir, scale,
                             y_channel=not args.rgb)
    print(json.dumps(result))


def cmd_upscale(args):
    import os

    import numpy as np

    from superresolution_tpu.data.io import load_image, save_png, save_tiff16
    from superresolution_tpu.infer import upscale

    if not os.path.exists(args.input):
        print(f"error: input image not found: {args.input}", file=sys.stderr)
        return 2
    img = load_image(args.input)
    params = None
    model = args.model
    scale = args.scale
    if args.ckpt:
        from superresolution_tpu.train.checkpoint import (
            load_params_for_inference)

        if not os.path.exists(args.ckpt):
            print(f"error: checkpoint not found: {args.ckpt}",
                  file=sys.stderr)
            return 2
        params, mc = load_params_for_inference(args.ckpt, with_config=True)
        if mc:
            # rebuild the exact trained architecture from the checkpoint
            from superresolution_tpu.models.factory import (
                build_from_config, total_scale)
            from superresolution_tpu.utils.config import ModelConfig

            mc.pop("output_size", None)
            if args.fast_attn and mc.get("refiner"):
                # flash window attention (Pallas, ops/pallas_attn.py):
                # logits stay in VMEM — faster AND more accurate than the
                # bf16-logits mode it supersedes (BENCHMARKS.md); bf16
                # logits remain the fallback for any non-flash einsums
                mc["refiner_kwargs"] = dict(mc.get("refiner_kwargs") or {},
                                            attn_f32=False,
                                            flash_attn=True)
            mcfg = ModelConfig(**mc)
            # output_size=None: tiles must keep their natural x-scale size
            # (the fixed-resize slot only applies to whole-patch training)
            model = build_from_config(mcfg, output_size=None)
            scale = total_scale(mcfg)
            if args.fast_attn and mc.get("refiner") == "hat_lite":
                # deploy-time fused kernels: HAB blocks in one VMEM
                # program each (ops/pallas_hab.py, 3x per block) and the
                # RRDB stage-1 trunk as fused dense blocks
                # (ops/pallas_dense_trunk.py) — BENCHMARKS.md
                from superresolution_tpu.infer.fused_hat import (
                    fused_hybrid_model)

                try:
                    model = fused_hybrid_model(params, model)
                except ValueError:
                    pass  # unsupported layout: keep the flash-attn path
            elif (args.fast_attn and mc.get("name") == "rrdbnet"
                  and not mc.get("refiner")):
                # plain ESRGAN generator: fused dense-block trunk
                from superresolution_tpu.infer.fused_trunk import (
                    fused_rrdb_model)

                try:
                    model = fused_rrdb_model(params, model)
                except (ValueError, KeyError):
                    pass  # unsupported layout: standard apply
    if getattr(args, "mesh_data", None) and args.mesh_data > 1:
        if getattr(args, "blend", "crop") != "crop":
            # the staged tiler always crop-blends (api.upscale's device
            # path rejects other blends for the same reason)
            print(f"error: --blend {args.blend} is not supported with"
                  " --mesh-data > 1 (the staged tiler crop-blends);"
                  " use --blend crop", file=sys.stderr)
            return 2
        # multi-chip tile-parallel inference: tiles sharded over the
        # 'data' mesh axis (infer/tiled_device.py)
        import jax
        import jax.numpy as jnp

        from superresolution_tpu.infer import make_tiled_infer_staged
        from superresolution_tpu.infer.tiled import _default_model_params
        from superresolution_tpu.models.rrdbnet import RRDBNet
        from superresolution_tpu.parallel import create_mesh
        from superresolution_tpu.utils.config import MeshConfig

        arr = img if img.ndim == 3 else img[..., None]
        model, params = _default_model_params(
            arr, scale, model, params, tile=args.tile, halo=args.halo)
        if not isinstance(model, RRDBNet):
            print("error: --mesh-data upscaling needs a trunk/tail"
                  " model (the rrdbnet family) without --fast-attn",
                  file=sys.stderr)
            return 2
        mesh = create_mesh(MeshConfig(data=args.mesh_data, spatial=1))
        h, w, c = arr.shape
        runner = make_tiled_infer_staged(
            lambda t: model.apply(params, t, method="trunk"),
            lambda f: model.apply(params, f, method="tail"),
            scale, args.tile, args.halo, tail_batch=4, h=h, w=w,
            channels=c, mesh=mesh)
        out = np.asarray(runner(jnp.asarray(arr)))  # runner is jitted
        if img.ndim == 2:
            out = out[..., 0]
    else:
        out = upscale(img, scale=scale, model=model, params=params,
                      tile=args.tile, halo=args.halo, blend=args.blend)
    if args.output.endswith((".tif", ".tiff")) and out.shape[-1] == 1:
        save_tiff16(out, args.output)
    else:
        save_png(np.asarray(out), args.output)
    print(f"{img.shape} -> {out.shape} saved to {args.output}")


def cmd_benchmark(args):
    try:
        import bench  # repo-root script, not part of the package
    except ModuleNotFoundError:
        print("benchmark requires a repo checkout: run from the"
              " repository root (bench.py is not installed)")
        raise SystemExit(2)

    bench.main()


def cmd_show_result(args):
    import numpy as np

    from superresolution_tpu.data.io import load_image
    from superresolution_tpu.utils.collage import frame_and_label_collage

    imgs = [load_image(p) for p in args.images]
    h = max(i.shape[0] for i in imgs)
    imgs = [np.pad(i, ((0, h - i.shape[0]), (0, 0), (0, 0))) for i in imgs]
    strip = np.concatenate(imgs, axis=1)
    labels = (args.labels.split(",") if args.labels
              else ["Input", "Result", "Target"][: len(imgs)])
    labels = (list(labels) + [""] * len(imgs))[: len(imgs)]
    out = frame_and_label_collage(
        strip, args.output, labels=tuple(labels),
        panel_widths=[i.shape[1] for i in imgs])
    print(f"collage -> {out}")


def cmd_import_reference(args):
    """Convert a reference-ecosystem .pth (BasicSR ESRGAN RRDBNet or the
    reference hybrid stage1/stage2 layout) into a checkpoint dir that
    `upscale --ckpt` consumes directly."""
    import os

    import numpy as np
    import orbax.checkpoint as ocp
    import torch

    from superresolution_tpu.models.convert import detect_and_import

    raw = torch.load(args.pth, map_location="cpu", weights_only=True)
    # BasicSR release files wrap the state dict
    for wrap in ("params_ema", "params", "state_dict"):
        if wrap in raw and isinstance(raw[wrap], dict):
            raw = raw[wrap]
            break
    sd = {k: np.asarray(v.detach().cpu().numpy()) if torch.is_tensor(v)
          else np.asarray(v) for k, v in raw.items()}
    variables, model_cfg = detect_and_import(sd)
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    best = os.path.join(out, "best")
    if os.path.exists(best):
        import shutil

        shutil.rmtree(best)
    # checkpoint contract: the 'params' entry holds the FULL flax
    # variables dict (as train states do)
    ckptr.save(best, {"params": variables, "ema_params": None})
    ckptr.wait_until_finished()
    with open(os.path.join(out, "model_config.json"), "w") as f:
        json.dump(dict(model_cfg, output_size=None), f, indent=2)
    print(json.dumps({"checkpoint": best, "model": model_cfg["name"],
                      "refiner": model_cfg["refiner"]}))


def _glob_fits(d):
    import glob
    import os

    return sorted(
        f for pat in ("*.fits", "*.fit", "*.fts")
        for f in glob.glob(os.path.join(d, pat))
        if not os.path.basename(f).startswith("reg_"))


def cmd_astro_register(args):
    from superresolution_tpu.astro.pipeline import register_images

    out = register_images(_glob_fits(args.hubble_dir),
                          _glob_fits(args.obs_dir), args.out,
                          workers=args.workers, fov_deg=args.fov)
    print(json.dumps({k: len(v) for k, v in out.items()} | {"dir": args.out}))


def cmd_astro_qc(args):
    import glob
    import os

    from superresolution_tpu.astro.pipeline import qc_overlay

    reg = sorted(glob.glob(os.path.join(args.registered_dir, "reg_*.fits")))
    hub = [f for f in reg if args.hubble_tag in os.path.basename(f)]
    obs = [f for f in reg if args.hubble_tag not in os.path.basename(f)]
    out = qc_overlay(hub or reg, obs or reg, args.out, max_obs=args.max_obs)
    print(f"QC overlay -> {out}")


def cmd_astro_extract(args):
    import glob
    import os

    from superresolution_tpu.astro.pipeline import extract_patches

    # registered (reg_*) frames are valid inputs here; exclude the master
    obs = sorted(
        f for pat in ("*.fits", "*.fit", "*.fts")
        for f in glob.glob(os.path.join(args.obs_dir, pat))
        if os.path.abspath(f) != os.path.abspath(args.hubble))
    n = extract_patches(args.hubble, obs, args.out,
                        hr_size=args.hr_size, stride=args.stride,
                        factor=args.factor, workers=args.workers)
    print(json.dumps({"pairs": n, "dir": args.out}))


def cmd_astro_normalize(args):
    from superresolution_tpu.astro.pipeline import normalize_pairs

    n = normalize_pairs(args.pairs, args.out, black_p=args.black_p,
                        white_p=args.white_p)
    print(json.dumps({"pairs": n, "dir": args.out}))


def cmd_presets(args):
    from superresolution_tpu.models.factory import total_scale
    from superresolution_tpu.utils.config import presets

    for name, cfg in sorted(presets.items()):
        print(f"{name:22s} model={cfg.model.name:9s} "
              f"x{total_scale(cfg.model)} loss={sorted(cfg.loss.terms)}")


def build_parser():
    p = argparse.ArgumentParser("superresolution_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("prepare-data")
    s.add_argument("--root", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--mode", choices=["split", "overfit"], default="split")
    s.add_argument("--val-frac", type=float, default=0.1)
    s.add_argument("--seed", type=int, default=42)
    s.set_defaults(fn=cmd_prepare_data)

    s = sub.add_parser("train")
    _add_common(s)
    s.set_defaults(fn=cmd_train)

    s = sub.add_parser("finalize")
    s.add_argument("--checkpoints", required=True)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_finalize)

    s = sub.add_parser("test")
    _add_common(s)
    s.add_argument("--labeled", action="store_true")
    s.set_defaults(fn=cmd_test)

    s = sub.add_parser("upscale")
    s.add_argument("--input", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--scale", type=int, default=4)
    s.add_argument("--model", default="rrdbnet")
    s.add_argument("--ckpt", default=None,
                   help="checkpoint dir (training checkpoints or "
                        "final_weights/best) to load params from")
    s.add_argument("--fast-attn", action="store_true",
                   help="Pallas flash window attention in attention "
                        "refiners (faster inference; attention softmax "
                        "stays f32 in VMEM)")
    s.add_argument("--tile", type=int, default=256)
    s.add_argument("--halo", type=int, default=16)
    s.add_argument("--blend", default="crop", choices=["crop", "hann"])
    s.add_argument("--mesh-data", type=int, default=None,
                   help="shard the tile batch over N chips (tile-"
                        "parallel multi-chip inference; rrdbnet family)")
    s.set_defaults(fn=cmd_upscale)

    s = sub.add_parser("eval-folder",
                       help="PSNR/SSIM over an HR folder (Set5/Set14"
                            " Y-channel convention)")
    s.add_argument("hr_dir")
    s.add_argument("--ckpt", default="")
    s.add_argument("--model", default="rrdbnet")
    s.add_argument("--scale", type=int, default=4)
    s.add_argument("--tile", type=int, default=256)
    s.add_argument("--halo", type=int, default=16)
    s.add_argument("--rgb", action="store_true",
                   help="metrics on RGB instead of the Y channel")
    s.set_defaults(fn=cmd_eval_folder)

    s = sub.add_parser("benchmark")
    s.set_defaults(fn=cmd_benchmark)

    s = sub.add_parser("show-result")
    s.add_argument("--images", nargs="+", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--labels", default=None,
                   help="comma-separated panel labels")
    s.set_defaults(fn=cmd_show_result)

    s = sub.add_parser("import-reference",
                       help="convert a reference-ecosystem .pth into a "
                            "checkpoint dir for `upscale --ckpt`")
    s.add_argument("--pth", required=True)
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_import_reference)

    # the reference's 4 numbered ETL stages (Dataset_step1..4) as
    # non-interactive subcommands
    s = sub.add_parser("astro-register",
                       help="step 1: plate-solve + register onto common TAN")
    s.add_argument("--hubble-dir", required=True)
    s.add_argument("--obs-dir", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--workers", type=int, default=2)
    s.add_argument("--fov", type=float, default=None,
                   help="blind-solve FOV override in degrees")
    s.set_defaults(fn=cmd_astro_register)

    s = sub.add_parser("astro-qc",
                       help="step 2: green/magenta alignment overlay PNG")
    s.add_argument("--registered-dir", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--hubble-tag", default="hst",
                   help="substring marking Hubble frames among reg_*.fits")
    s.add_argument("--max-obs", type=int, default=10)
    s.set_defaults(fn=cmd_astro_qc)

    s = sub.add_parser("astro-extract",
                       help="step 3: WCS-aligned LR/HR patch pair extraction")
    s.add_argument("--hubble", required=True, help="master Hubble FITS")
    s.add_argument("--obs-dir", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--hr-size", type=int, default=512)
    s.add_argument("--stride", type=int, default=75)
    s.add_argument("--factor", type=int, default=4)
    s.add_argument("--workers", type=int, default=4)
    s.set_defaults(fn=cmd_astro_extract)

    s = sub.add_parser("astro-normalize",
                       help="step 4: global log-stretch -> 16-bit TIFF pairs")
    s.add_argument("--pairs", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--black-p", type=float, default=3.0)
    s.add_argument("--white-p", type=float, default=99.99)
    s.set_defaults(fn=cmd_astro_normalize)

    s = sub.add_parser("presets")
    s.set_defaults(fn=cmd_presets)
    return p


def main(argv=None):
    from superresolution_tpu.utils.runtime import setup_jax_cache

    setup_jax_cache()
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
