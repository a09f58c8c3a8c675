"""`ae_embed <group>/<experiment> [--at_step N]` — build the codebook.

Streams all embedding view renders through the jitted encoder and re-saves
the checkpoint with the normalized embedding + per-view bboxes inside
(reference auto_pose/ae/ae_embed.py:53-93).
"""

from __future__ import annotations

import argparse

from .. import factory
from ..codebook import Codebook
from ..training.checkpoint import CheckpointManager
from . import split_experiment_name


def main() -> None:
    from ..utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment_name")
    parser.add_argument("--at_step", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    args = parser.parse_args()

    experiment_name, experiment_group = split_experiment_name(args.experiment_name)
    cfg, paths, model, payload = factory.restore_experiment(
        experiment_name, experiment_group, args.at_step
    )
    import jax

    dataset = factory.build_dataset(paths["dataset_path"], cfg)
    mesh = None
    if len(jax.devices()) > 1:
        from ..parallel import make_mesh

        mesh = make_mesh()
    encode = factory.make_encode_fn(
        model, payload["params"], payload.get("batch_stats"), mesh=mesh
    )

    if cfg.model == "dsprites":
        # orientation codebook from the pinned-latent image subset
        # (reference codebook.py:164-185)
        import jax.numpy as jnp
        import numpy as np

        from ..data.dsprites import load_dsprites_training_images

        _, train_y = load_dsprites_training_images(cfg.model_path)
        emb_imgs = train_y[::1024][40:80].astype(np.float32) / 255.0
        # np.array (copy): np.asarray of a jax array is a READ-ONLY view,
        # and the in-place normalize below would raise
        z = np.array(encode(jnp.asarray(emb_imgs)))
        z /= np.linalg.norm(z, axis=1, keepdims=True)
        mgr = CheckpointManager(paths["checkpoint_dir"])
        path = mgr.add_codebook(z, None, step=args.at_step)
        print(f"dsprites codebook ({z.shape[0]} x {z.shape[1]}) saved into {path}")
        return

    batch_size = args.batch_size or max(cfg.batch_size, 256)
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        batch_size = max(n_dev, (batch_size // n_dev) * n_dev)  # shardable
    print(f"embedding {dataset.embedding_size} views (batch {batch_size}) ...")
    embedding, obj_bbs = Codebook.build_embedding(
        encode, dataset.render_embedding_image_batch, dataset.embedding_size, batch_size
    )

    mgr = CheckpointManager(paths["checkpoint_dir"])
    path = mgr.add_codebook(
        embedding, obj_bbs if cfg.embed_bb else None, step=args.at_step
    )
    print(f"codebook ({embedding.shape[0]} x {embedding.shape[1]}) saved into {path}")


if __name__ == "__main__":
    main()
