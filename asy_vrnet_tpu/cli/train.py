"""Training CLI (reference: train.py).

Unlike the reference's edit-the-constants style, everything is a flag or a
JSON config; `--synthetic N` runs end-to-end on a generated tiny dataset
(useful as a smoke test of the entire stack).

  python -m asy_vrnet_tpu.cli.train --synthetic 8 --epochs 2 --batch-size 2 \
      --input-size 64 --save-dir /tmp/run
  python -m asy_vrnet_tpu.cli.train --train-annotation 2007_train.txt \
      --val-annotation 2007_val.txt --classes model_data/waterscenes.txt \
      --radar-root radar --seg-path . --phi nano --epochs 100
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import tempfile


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", help="JSON config file (overrides defaults)")
    p.add_argument("--phi", default="nano", choices=["nano", "tiny", "s", "m", "l"])
    p.add_argument("--input-size", type=int, default=512)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--init-epoch", type=int, default=0)
    p.add_argument("--freeze-epoch", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    p.add_argument("--init-lr", type=float, default=1e-2)
    p.add_argument("--save-dir", default="logs")
    p.add_argument("--save-period", type=int, default=10)
    p.add_argument("--eval-period", type=int, default=10)
    p.add_argument("--num-devices", type=int, default=0,
                   help="data-parallel mesh size; 0 = all local devices, 1 = single chip")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--multitask", default="fixed", choices=["fixed", "uncertainty"])
    p.add_argument("--no-focal-loss", action="store_true",
                   help="plain CE instead of focal for segmentation "
                        "(reference train.py focal_loss flag)")
    p.add_argument("--no-dice-loss", action="store_true",
                   help="disable the dice term (reference train.py dice_loss)")
    p.add_argument("--remat", default="none",
                   choices=["none", "fusion", "blocks", "stages"],
                   help="activation rematerialisation span (fit larger "
                        "batches in HBM at ~1 extra forward of the span); "
                        "'blocks' checkpoints each ClusterBlock — half the "
                        "activation count of 'none' at one extra mixer "
                        "kernel per block, no conv recompute")
    p.add_argument("--seg-signed-logits", action="store_true",
                   help="corrected variant: drop the final seg ReLU so "
                        "background logits can go negative (parity default "
                        "keeps the reference's post-ReLU quirk)")
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--resume", help="orbax checkpoint path to resume from")
    p.add_argument("--weights", help=".npz weights for partial (shape-matched) init")
    p.add_argument("--weights-init", default="none",
                   choices=["none", "normal", "xavier", "kaiming", "orthogonal"],
                   help="reference-style conv/BN re-init for from-scratch runs "
                        "(nets/yolo_training.py:482-501)")
    p.add_argument("--init-gain", type=float, default=0.02)
    p.add_argument("--train-annotation", default="2007_train.txt")
    p.add_argument("--val-annotation", default="2007_val.txt")
    p.add_argument("--classes", default="model_data/waterscenes.txt")
    p.add_argument("--num-seg-classes", type=int, default=9)
    p.add_argument("--radar-root", default="radar")
    p.add_argument("--seg-path", default=".")
    p.add_argument("--max-boxes", type=int, default=100)
    p.add_argument("--synthetic-learnable", action="store_true",
                   help="with --synthetic: generate the LEARNABLE overfit "
                        "set (coloured boxes + co-located radar) instead of "
                        "noise — for convergence validation")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="generate an N-image synthetic dataset and train on it")
    p.add_argument("--augment", action="store_true",
                   help="enable flip/HSV augmentation on the train split")
    p.add_argument("--weather", action="store_true",
                   help="enable rain/fog/flare weather augmentation")
    p.add_argument("--seg-only", action="store_true",
                   help="segmentation-only training (utils_seg fit variant)")
    p.add_argument("--cache-gb", type=float, default=0.0,
                   help="decoded-sample cache budget in GiB (0 = off); "
                        "epochs >= 2 skip decode+letterbox for cached samples")
    return p


def resolve_config(args):
    """argparse namespace -> (Config, class_names).

    With --config, the JSON file is the base and only flags the user
    explicitly passed (value != argparse default) override it; without,
    flags populate a default Config directly.
    """
    from asy_vrnet_tpu.config import (
        Config, DataConfig, LossConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from asy_vrnet_tpu.data.preprocess import get_classes

    hw = args.input_size
    if args.config:
        # JSON config is the base; flags the user explicitly passed (i.e.
        # whose value differs from the argparse default) override it.
        with open(args.config) as f:
            cfg = Config.from_dict(json.load(f))
        parser = build_argparser()
        explicit = {
            k for k, v in vars(args).items() if v != parser.get_default(k)
        }

        def over(section, **pairs):
            updates = {field: value for flag, (field, value) in pairs.items()
                       if flag in explicit}
            return dataclasses.replace(section, **updates) if updates else section

        class_names, num_classes = get_classes(
            args.classes if "classes" in explicit else cfg.data.classes_path
        )
        model_over = over(
            cfg.model,
            phi=("phi", args.phi),
            input_size=("input_size", (hw, hw)),
            compute_dtype=("compute_dtype", args.compute_dtype),
            num_seg_classes=("num_seg_classes", args.num_seg_classes),
            classes=("num_classes", num_classes),
            remat=("train_remat", args.remat),
            seg_signed_logits=("seg_signed_logits", args.seg_signed_logits),
        )
        cfg = Config(
            model=model_over,
            loss=over(cfg.loss, multitask=("multitask_mode", args.multitask),
                      max_boxes=("max_boxes", args.max_boxes),
                      no_focal_loss=("focal_loss", not args.no_focal_loss),
                      no_dice_loss=("dice_loss", not args.no_dice_loss)),
            optim=over(cfg.optim, optimizer=("optimizer", args.optimizer),
                       init_lr=("init_lr", args.init_lr),
                       no_ema=("ema", not args.no_ema)),
            train=over(cfg.train, epochs=("epochs", args.epochs),
                       init_epoch=("init_epoch", args.init_epoch),
                       freeze_epoch=("freeze_epoch", args.freeze_epoch),
                       batch_size=("batch_size", args.batch_size),
                       save_period=("save_period", args.save_period),
                       eval_period=("eval_period", args.eval_period),
                       save_dir=("save_dir", args.save_dir)),
            data=over(cfg.data,
                      train_annotation=("train_annotation_path", args.train_annotation),
                      val_annotation=("val_annotation_path", args.val_annotation),
                      classes=("classes_path", args.classes),
                      radar_root=("radar_root", args.radar_root),
                      seg_path=("seg_dataset_path", args.seg_path),
                      input_size=("input_shape", (hw, hw))),
        )
    else:
        class_names, num_classes = get_classes(args.classes)
        cfg = Config(
            model=ModelConfig(
                num_classes=num_classes, num_seg_classes=args.num_seg_classes,
                phi=args.phi, input_size=(hw, hw), compute_dtype=args.compute_dtype,
                train_remat=args.remat,
                seg_signed_logits=args.seg_signed_logits,
            ),
            loss=LossConfig(
                multitask_mode=args.multitask, max_boxes=args.max_boxes,
                focal_loss=not args.no_focal_loss,
                dice_loss=not args.no_dice_loss,
            ),
            optim=OptimConfig(
                optimizer=args.optimizer, init_lr=args.init_lr, ema=not args.no_ema
            ),
            train=TrainConfig(
                epochs=args.epochs, init_epoch=args.init_epoch,
                freeze_epoch=args.freeze_epoch, batch_size=args.batch_size,
                save_period=args.save_period, eval_period=args.eval_period,
                save_dir=args.save_dir,
            ),
            data=DataConfig(
                train_annotation_path=args.train_annotation,
                val_annotation_path=args.val_annotation,
                classes_path=args.classes, radar_root=args.radar_root,
                seg_dataset_path=args.seg_path, input_shape=(hw, hw),
            ),
        )
    return cfg, class_names


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)

    import jax

    from asy_vrnet_tpu.config import show_config
    from asy_vrnet_tpu.data.dataset import DataLoader, WaterScenesDataset, read_annotation_file
    from asy_vrnet_tpu.models.efficient_vrnet import create_model, init_model
    from asy_vrnet_tpu.parallel.mesh import make_mesh
    from asy_vrnet_tpu.train.checkpoint import load_weights, partial_load, restore_checkpoint
    from asy_vrnet_tpu.train.loop import fit
    from asy_vrnet_tpu.train.state import create_train_state

    if args.synthetic:
        from asy_vrnet_tpu.data.synthetic import (
            write_learnable_voc_dataset,
            write_synthetic_voc_dataset,
        )

        hw = args.input_size
        root = tempfile.mkdtemp(prefix="asyvrnet_synth_")
        writer = (
            write_learnable_voc_dataset if args.synthetic_learnable
            else write_synthetic_voc_dataset
        )
        meta = writer(root, num_images=args.synthetic, hw=(hw, hw))
        print(f"synthetic dataset: {root}")
        args.train_annotation = meta["annotation_path"]
        args.val_annotation = meta["annotation_path"]
        args.classes = meta["classes_path"]
        args.radar_root = meta["radar_root"]
        args.seg_path = meta["seg_dataset_path"]
    seg_subdir = os.path.join("VOC2007", "SegmentationClass")

    cfg, class_names = resolve_config(args)
    print(show_config(cfg))

    model = create_model(cfg.model)
    params, bstats = init_model(model, jax.random.PRNGKey(cfg.train.seed))
    if args.weights_init != "none":
        from asy_vrnet_tpu.utils.init import reinit_params

        print(f"initialize network with {args.weights_init} type")
        params = reinit_params(params, cfg.train.seed, args.weights_init,
                               args.init_gain)
    if args.weights:
        src = load_weights(args.weights)
        params, _, _ = partial_load(params, src.get("params"))
        bstats, _, _ = partial_load(bstats, src.get("batch_stats"))
    state, tx = create_train_state(cfg, params, bstats)
    if args.resume:
        state = restore_checkpoint(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    def mk_loader(path, shuffle, augment=False):
        ds = WaterScenesDataset(
            read_annotation_file(path), cfg.data.input_shape,
            cfg.model.num_classes, cfg.model.num_seg_classes,
            cfg.data.radar_root, cfg.data.seg_dataset_path,
            max_boxes=cfg.loss.max_boxes, seg_subdir=seg_subdir,
            augment=augment, weather=args.weather and augment,
            seed=cfg.train.seed,
            cache_bytes=int(args.cache_gb * (1 << 30)),
        )
        return DataLoader(
            ds, cfg.train.batch_size, shuffle=shuffle, seed=cfg.train.seed,
            workers=max(1, cfg.train.num_workers),
        )

    train_loader = mk_loader(cfg.data.train_annotation_path, True, args.augment)
    val_loader = mk_loader(cfg.data.val_annotation_path, False)

    n_dev = args.num_devices if args.num_devices else len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        print(f"training on mesh {dict(mesh.shape)}")

    if args.seg_only:
        # seg-only schedule: one jit step over the same joint loader
        import jax.numpy as jnp

        from asy_vrnet_tpu.train.optim import make_lr_schedule, set_learning_rate
        from asy_vrnet_tpu.train.seg_only import build_seg_train_step

        schedule = make_lr_schedule(cfg.optim, cfg.train.batch_size, cfg.train.epochs)
        step = jax.jit(build_seg_train_step(model, cfg, tx))
        for epoch in range(cfg.train.init_epoch, cfg.train.epochs):
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, schedule(epoch))
            )
            losses = []
            for batch in train_loader:
                db = {k: jnp.asarray(v) for k, v in batch.items() if k != "image_id"}
                state, m = step(state, db)
                losses.append(float(m["loss"]))
            print(
                f"[seg-only] epoch {epoch + 1}/{cfg.train.epochs} "
                f"loss={sum(losses) / max(len(losses), 1):.4f}"
            )
        from asy_vrnet_tpu.train.checkpoint import save_weights
        from asy_vrnet_tpu.train.state import eval_variables

        os.makedirs(cfg.train.save_dir, exist_ok=True)
        variables = eval_variables(state, use_ema=cfg.optim.ema)
        save_weights(
            os.path.join(cfg.train.save_dir, "last_epoch_weights.npz"),
            variables["params"], variables["batch_stats"],
        )
        return

    fit(model, cfg, state, tx, train_loader, val_loader, class_names, mesh=mesh)


if __name__ == "__main__":
    main()
