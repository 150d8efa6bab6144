"""Training CLI — the reference's train binary as a configurable command.

Equivalent of src/bin/train.rs but with every hardcoded hyperparameter
exposed (the reference has no flag system at all, SURVEY §5), plus resume,
device-mesh selection, and the Pallas fast path.

Usage:
  python -m burn_raymarching_tpu.tools.train_cli [--cameras data/cameras.json]
      [--stages 5] [--steps 700] [--batch 16384] [--resume] [--no-pallas] ...
"""

from __future__ import annotations

import argparse
import dataclasses


def build_config(args) -> "TrainConfig":
    from burn_raymarching_tpu.config import TrainConfig

    overrides = {}
    for field in ("batch_size", "width", "height", "stages", "steps_per_stage",
                  "base_lr", "seed", "init_n"):
        v = getattr(args, field, None)
        if v is not None:
            overrides[field] = v
    if args.cameras:
        overrides["cameras_json"] = args.cameras
    if args.scene_out:
        overrides["scene_json"] = args.scene_out
    if args.steps_dir:
        overrides["steps_dir"] = args.steps_dir
    if args.checkpoint_dir is not None:
        overrides["checkpoint_dir"] = args.checkpoint_dir or None
    if args.no_pallas:
        overrides["use_pallas"] = False
    if args.turbo:
        overrides["warm_start"] = True
        overrides["use_fused_shade"] = True
    if args.cull:
        overrides["use_culling"] = True
        overrides["cull_budget"] = args.cull
        overrides["dataset_order"] = "morton"
    return TrainConfig(**overrides)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cameras", default="data/cameras.json")
    parser.add_argument("--scene-out", dest="scene_out", default="scene.json")
    parser.add_argument("--steps-dir", dest="steps_dir", default="steps")
    parser.add_argument("--checkpoint-dir", dest="checkpoint_dir",
                        default="checkpoints")
    parser.add_argument("--batch", dest="batch_size", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--stages", type=int, default=None)
    parser.add_argument("--steps", dest="steps_per_stage", type=int,
                        default=None)
    parser.add_argument("--lr", dest="base_lr", type=float, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--init-n", dest="init_n", type=int, default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--no-pallas", action="store_true")
    parser.add_argument("--turbo", action="store_true",
                        help="warm-started march + fused custom-VJP shade "
                             "kernel (validated at reference quality; "
                             "fastest TPU configuration)")
    parser.add_argument("--cull", type=int, default=0, metavar="K",
                        help="coherent-tile culling with a top-K primitive "
                             "budget (for large scenes; implies Morton "
                             "dataset order)")
    args = parser.parse_args(argv)

    cfg = build_config(args)
    from burn_raymarching_tpu.train.loop import Trainer, build_dataset

    dataset = build_dataset(cfg)
    print(f"Total training pixels: {dataset.num_total_pixels}")
    print(f"Foreground pixels: {dataset.num_fg}, "
          f"Background pixels: {dataset.num_bg}")
    trainer = Trainer(cfg, dataset)
    trainer.run(resume=args.resume)


if __name__ == "__main__":
    main()
