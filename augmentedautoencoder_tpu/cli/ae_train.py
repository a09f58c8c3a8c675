"""`ae_train <group>/<experiment> [-d] [-gen]` — train one AAE.

Mirrors the reference CLI (auto_pose/ae/ae_train.py): resolves the workspace,
copies the cfg into the log dir, renders-or-loads the training set, then runs
the fused TPU training loop with checkpoints + reconstruction-grid figures
every SAVE_INTERVAL. `-gen` only generates data; `-d` shows/saves an
augmented-batch debug grid instead of training. SIGINT requests a gentle
stop (finish iteration, save, exit).
"""

from __future__ import annotations

import argparse
import os
import shutil
import signal

import numpy as np

from .. import factory
from .. import workspace as ws
from ..data.pipeline import DeviceDataset
from ..training import CheckpointManager, Trainer
from ..utils import tiles
from . import split_experiment_name


def _save_grid(path: str, batches, rows: int = 4) -> None:
    """Write a [inputs | reconstructions | targets] grid png."""
    import cv2

    cols = len(batches)
    n = min(rows * rows, batches[0].shape[0])
    panels = [
        tiles(np.asarray(b[:n]), rows, int(np.ceil(n / rows)), scale=1.0)
        for b in batches
    ]
    grid = np.concatenate(panels, axis=1)
    cv2.imwrite(path, (np.clip(grid, 0, 1) * 255).astype(np.uint8))


def main() -> None:
    from ..utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment_name")
    parser.add_argument("-d", action="store_true", default=False, help="debug: dump augmented batch + reconstruction grid, no training")
    parser.add_argument("-gen", action="store_true", default=False, help="generate training data only")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    experiment_name, experiment_group = split_experiment_name(args.experiment_name)
    cfg, paths = factory.load_experiment_config(
        experiment_name, experiment_group, prefer_log_dir=False
    )

    for key in ("checkpoint_dir", "train_fig_dir", "dataset_path"):
        os.makedirs(paths[key], exist_ok=True)
    # copy cfg into the log dir (re-read at inference, ae_train.py:72)
    src_cfg = paths["cfg_file"]
    if os.path.abspath(src_cfg) != os.path.abspath(paths["exp_cfg_file"]):
        shutil.copy2(src_cfg, paths["exp_cfg_file"])

    dataset = factory.build_dataset(paths["dataset_path"], cfg)
    if cfg.model == "dsprites":
        from ..data.dsprites import load_dsprites_training_images

        dataset.train_x, dataset.train_y = load_dsprites_training_images(cfg.model_path)
        dataset.mask_x = np.zeros(dataset.train_x.shape[:3], bool)
        dataset.noof_obj_pixels = dataset.mask_x.shape[1] * dataset.mask_x.shape[2] - dataset.mask_x.sum(axis=(1, 2))
        dataset.bg_imgs = np.zeros((1,) + dataset.train_x.shape[1:], np.uint8)
    else:
        dataset.get_training_images(paths["dataset_path"])
        if args.gen:
            print("training data generated; exiting (-gen)")
            return
        dataset.load_bg_images(paths["dataset_path"])

    occlusion_masks = None
    if cfg.realistic_occlusion:
        from ..data.occlusion_masks import synthesize_mask_bank, workspace_mask_bank

        occlusion_masks = workspace_mask_bank(
            ws.get_workspace_path(), (cfg.h, cfg.w)
        )
        if occlusion_masks is None:
            print("no random_tless_masks asset found; synthesizing occluders")
            occlusion_masks = synthesize_mask_bank(1000, (cfg.h, cfg.w))

    device_ds = DeviceDataset(
        cfg, dataset.train_x, dataset.mask_x, dataset.train_y,
        dataset.bg_imgs, dataset.noof_obj_pixels,
        occlusion_masks=occlusion_masks,
    )

    if args.d:
        import jax

        x, y = device_ds.sample_batch(jax.random.PRNGKey(args.seed), cfg.batch_size)
        out = os.path.join(paths["train_fig_dir"], "debug_augmented_batch.png")
        _save_grid(out, [np.asarray(x), np.asarray(y)])
        print(f"debug grid written to {out}")
        return

    from ..training.metrics import MetricWriter

    # summaries land in the checkpoint dir like the reference's TF
    # FileWriter (ae_train.py:117)
    writer = MetricWriter(paths["checkpoint_dir"])
    trainer = Trainer(
        cfg, device_ds, seed=args.seed, log_dir=paths["log_dir"],
        metric_writer=writer,
    )
    signal.signal(signal.SIGINT, lambda sig, frame: trainer.request_stop())

    ckpt = CheckpointManager(paths["checkpoint_dir"])
    trainer.state, payload = ckpt.restore_train_state(trainer.state)
    if payload is not None:
        print(f"resuming from step {int(trainer.state.step)}")

    recon_fn = None

    def save_hook(step: int, state) -> None:
        nonlocal recon_fn
        ckpt.save_train_state(step, state)
        # training-health figure: input | reconstruction | target
        import jax

        from ..training.trainer import make_reconstruction_fn

        if recon_fn is None:
            recon_fn = make_reconstruction_fn(trainer.model)
        x, y = device_ds.sample_batch(jax.random.PRNGKey(step), 16)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        recon, _ = recon_fn(variables, x, y)
        _save_grid(
            os.path.join(paths["train_fig_dir"], f"training_images_{step}.png"),
            [np.asarray(x), np.asarray(recon), np.asarray(y)],
        )

    trainer.train(save_hook=save_hook)
    print(f"done at step {int(trainer.state.step)}")


if __name__ == "__main__":
    main()
