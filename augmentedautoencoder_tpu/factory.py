"""Factory: build pipeline objects from configs / experiment names.

The TPU-native analogue of auto_pose/ae/ae_factory.py — resolves workspace
paths, loads the experiment cfg, restores checkpoints, and wires
Dataset/model/Codebook together. `build_codebook_from_name` mirrors the
reference entry point used by every inference consumer
(ae_factory.py:102-146).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import workspace as ws
import numpy as np

from .codebook import Codebook, normalize_uint8
from .config import TrainConfig, load_train_config
from .data.dataset import Dataset
from .models import AAE
from .training.checkpoint import CheckpointManager


def build_dataset(dataset_path: str, cfg: TrainConfig, renderer=None) -> Dataset:
    return Dataset(dataset_path, cfg, renderer=renderer)


def make_encode_fn(model: AAE, params, batch_stats=None, mesh=None):
    """Jitted deterministic encoder forward: (B,H,W,C) -> (B, J).

    Accepts float in [0,1] OR uint8 — uint8 is normalized ON DEVICE, so
    bulk callers (codebook embed) transfer 4x less over host->HBM.

    With a mesh, the batch shards over the data axis (params replicated) —
    used by ae_embed to spread the 92k-view codebook build across chips."""
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    def forward(x):
        return model.apply(variables, x, method=model.encode)

    if mesh is not None:
        from .parallel import batch_sharding

        in_sh = batch_sharding(mesh)
        out_sh = batch_sharding(mesh)
        jitted = partial(jax.jit, in_shardings=(in_sh,), out_shardings=out_sh)(forward)
    else:
        jitted = jax.jit(forward)

    def encode(x):
        # uint8 converts on device via the SAME shared program as Codebook
        # queries (codebook.normalize_uint8), so the float-input encode
        # executable is identical on both paths -> identical codes
        if x.dtype == np.uint8:
            x = normalize_uint8(jnp.asarray(x))
        return jitted(x)

    return encode


def make_decode_fn(model: AAE, params, batch_stats=None):
    """Jitted decoder forward: (B, J) -> reconstruction (B,H,W,C)."""
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    @jax.jit
    def decode(z):
        out = model.apply(variables, z, method=lambda m, z: m.decoder(z))
        return out[0] if model.auxiliary_mask else out

    return decode


def experiment_paths(experiment_name: str, experiment_group: str = ""):
    workspace_path = ws.get_workspace_path()
    log_dir = ws.get_log_dir(workspace_path, experiment_name, experiment_group)
    return {
        "workspace": workspace_path,
        "log_dir": log_dir,
        "checkpoint_dir": ws.get_checkpoint_dir(log_dir),
        "train_fig_dir": ws.get_train_fig_dir(log_dir),
        "dataset_path": ws.get_dataset_path(workspace_path),
        "cfg_file": ws.get_config_file_path(workspace_path, experiment_name, experiment_group),
        "exp_cfg_file": ws.get_train_config_exp_file_path(log_dir, experiment_name),
    }


def load_experiment_config(
    experiment_name: str, experiment_group: str = "", prefer_log_dir: bool = True
) -> Tuple[TrainConfig, dict]:
    """Load the experiment cfg (the copy in the log dir wins, matching the
    reference's rebuild-from-logged-cfg behavior, ae_factory.py:119-129)."""
    paths = experiment_paths(experiment_name, experiment_group)
    cfg_path = (
        paths["exp_cfg_file"]
        if prefer_log_dir and os.path.exists(paths["exp_cfg_file"])
        else paths["cfg_file"]
    )
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(f"config file not found: {cfg_path}")
    return load_train_config(cfg_path), paths


def restore_experiment(
    experiment_name: str,
    experiment_group: str = "",
    at_step: Optional[int] = None,
):
    """Restore (cfg, paths, model, checkpoint payload)."""
    cfg, paths = load_experiment_config(experiment_name, experiment_group)
    mgr = CheckpointManager(paths["checkpoint_dir"])
    payload = mgr.restore(at_step)
    if payload is None:
        raise FileNotFoundError(
            f"No checkpoint found. Expected one in:\n{paths['checkpoint_dir']}"
        )
    model = AAE.from_config(cfg)
    return cfg, paths, model, payload


def build_codebook_from_name(
    experiment_name: str,
    experiment_group: str = "",
    return_dataset: bool = False,
    return_decoder: bool = False,
    at_step: Optional[int] = None,
    renderer=None,
):
    """Load everything needed for inference from an experiment name."""
    cfg, paths, model, payload = restore_experiment(
        experiment_name, experiment_group, at_step
    )
    dataset = build_dataset(paths["dataset_path"], cfg, renderer=renderer)
    encode = make_encode_fn(model, payload["params"], payload.get("batch_stats"))

    codebook = Codebook(
        encode_fn=encode,
        viewsphere=dataset.viewsphere_for_embedding,
        embedding_normalized=payload.get("embedding_normalized"),
        embed_obj_bbs=payload.get("embed_obj_bbs"),
        num_cyclo=cfg.num_cyclo,
    )
    out = [codebook]
    if return_dataset:
        out.append(dataset)
    if return_decoder:
        out.append(make_decode_fn(model, payload["params"], payload.get("batch_stats")))
    return tuple(out) if len(out) > 1 else codebook
