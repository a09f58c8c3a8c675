"""`ae_import_tf <tf_ckpt_prefix> <group>/<experiment> --cfg <train.cfg>` —
import a reference TF1 checkpoint (e.g. the published pretrained models)
into this workspace as a native experiment.

After import, the experiment behaves like a locally trained one: aae_image /
ae_eval / AePoseEstimator all work, including the embedded codebook.
"""

from __future__ import annotations

import argparse
import os
import shutil

from .. import factory
from ..config import load_train_config
from ..training.tf_interop import import_reference_checkpoint
from . import split_experiment_name


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("tf_checkpoint", help="TF checkpoint prefix (chkpt-NNNN)")
    parser.add_argument("experiment_name")
    parser.add_argument("--cfg", required=True, help="the experiment's train cfg")
    parser.add_argument("--scope", default=None,
                        help="variable scope; defaults to the experiment name")
    parser.add_argument("--step", type=int, default=None,
                        help="step for the imported checkpoint (default: "
                             "parsed from the TF prefix or 0)")
    args = parser.parse_args()

    experiment_name, experiment_group = split_experiment_name(args.experiment_name)
    paths = factory.experiment_paths(experiment_name, experiment_group)
    os.makedirs(paths["checkpoint_dir"], exist_ok=True)

    cfg = load_train_config(args.cfg)
    # place the cfg where the factory expects it (log dir + workspace cfg/)
    os.makedirs(os.path.dirname(paths["cfg_file"]), exist_ok=True)
    if os.path.abspath(args.cfg) != os.path.abspath(paths["cfg_file"]):
        shutil.copy2(args.cfg, paths["cfg_file"])
    shutil.copy2(args.cfg, paths["exp_cfg_file"])

    step = args.step
    if step is None:
        tail = os.path.basename(args.tf_checkpoint).rsplit("-", 1)
        step = int(tail[1]) if len(tail) == 2 and tail[1].isdigit() else 0

    scope = args.scope if args.scope is not None else experiment_name
    out = import_reference_checkpoint(
        args.tf_checkpoint, scope, paths["checkpoint_dir"], step=step,
        num_filters=tuple(cfg.num_filter), auxiliary_mask=cfg.auxiliary_mask,
        variational=bool(cfg.variational),
    )
    print(f"imported {args.tf_checkpoint} -> {out}")


if __name__ == "__main__":
    main()
