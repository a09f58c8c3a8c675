"""The fused training step and the training loop driver.

One jit compiles the ENTIRE iteration — batch gather, occlusion, background
compositing, augmentation chain, forward, bootstrapped top-k loss, backward,
Adam update — replacing the reference's per-iteration session.run + host-side
producer threads (auto_pose/ae/ae_train.py:126-140, queue.py:41-74). The RNG
is folded from the step counter, so a run is reproducible from (seed, step)
and resumable mid-stream.

Multi-device: batch shards over the 1-D data mesh; params replicate; XLA
inserts the gradient all-reduce (see parallel/mesh.py for the layout story).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import jax

from ..config import TrainConfig
from ..data.pipeline import DeviceDataset
from ..models import AAE
from ..parallel import batch_sharding, make_mesh, replicated
from .state import AAETrainState, create_train_state

Metrics = Dict[str, jax.Array]


def make_train_step(
    model: AAE,
    dataset: DeviceDataset,
    batch_size: int,
    mesh=None,
) -> Callable[[AAETrainState, jax.Array], Tuple[AAETrainState, Metrics]]:
    """Build the fused (state, rng) -> (state, metrics) step."""

    use_bn = model.batch_norm
    variational = model.variational > 0

    # the HBM-resident arrays thread through jit as ARGUMENTS — closing over
    # them would capture gigabytes of constants into the step executable
    def step_fn(state: AAETrainState, rng: jax.Array, data):
        rng = jax.random.fold_in(rng, state.step)
        rng_batch, rng_model = jax.random.split(rng)

        x, y = dataset.sample_batch(rng_batch, batch_size, data=data)
        if mesh is not None:
            sh = batch_sharding(mesh)
            x = jax.lax.with_sharding_constraint(x, sh)
            y = jax.lax.with_sharding_constraint(y, sh)

        def loss_fn(params):
            variables = {"params": params}
            if use_bn:
                variables["batch_stats"] = state.batch_stats
                out, updates = state.apply_fn(
                    variables, x, y, train=True,
                    rng=rng_model if variational else None,
                    mutable=["batch_stats"],
                )
                return out.total_loss, (out.losses, updates["batch_stats"])
            out = state.apply_fn(
                variables, x, y, train=True,
                rng=rng_model if variational else None,
            )
            return out.total_loss, (out.losses, None)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_batch_stats)), grads = grad_fn(state.params)
        state = state.apply_gradients(grads=grads)
        if use_bn:
            state = state.replace(batch_stats=new_batch_stats)
        return state, losses

    if mesh is not None:
        rep = replicated(mesh)
        jitted = jax.jit(
            step_fn, in_shardings=(rep, rep, rep), out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
    else:
        jitted = jax.jit(step_fn, donate_argnums=(0,))
    return lambda state, rng: jitted(state, rng, dataset.data)


def make_reconstruction_fn(model: AAE):
    """Jitted (params_vars, x, y) -> (reconstruction, losses) for debugging
    and periodic training-health image grids (ae_train.py:137-148)."""

    @jax.jit
    def fn(variables, x, y):
        out = model.apply(variables, x, y, train=False)
        return out.reconstruction, out.losses

    return fn


class Trainer:
    """Training loop with the reference's save/summary cadence."""

    def __init__(
        self,
        cfg: TrainConfig,
        dataset: DeviceDataset,
        seed: int = 0,
        mesh=None,
        log_dir: Optional[str] = None,
        metric_writer=None,
    ):
        self.cfg = cfg
        self.dataset = dataset
        self.mesh = mesh if mesh is not None else (
            make_mesh() if len(jax.devices()) > 1 else None
        )
        self.model = AAE.from_config(cfg)
        self.rng = jax.random.PRNGKey(seed)
        # init key disjoint from the per-step keys (which fold in step numbers)
        init_key = jax.random.fold_in(self.rng, 2**31 - 1)
        self.state = create_train_state(init_key, cfg, self.model)
        self.step_fn = make_train_step(self.model, dataset, cfg.batch_size, self.mesh)
        self.log_dir = log_dir
        self.metric_writer = metric_writer
        self._stop_requested = False

    def request_stop(self) -> None:
        """Gentle SIGINT-style stop: finish the current iteration then exit
        (reference ae_train.py:30-34)."""
        self._stop_requested = True

    def train(
        self,
        num_iter: Optional[int] = None,
        save_hook: Optional[Callable[[int, AAETrainState], None]] = None,
        log_every: int = 10,
        progress: bool = True,
    ) -> AAETrainState:
        num_iter = num_iter or self.cfg.num_iter
        save_interval = self.cfg.save_interval
        start = int(self.state.step)

        # Deferred metric readback: a synchronous float(loss) every
        # log_every steps costs a full device->host round trip (~24 ms
        # through the TPU tunnel — measured 18.4 -> 30.9 ms/step, PERF.md).
        # Instead the logged losses are stacked into ONE tiny device vector,
        # its host copy is enqueued asynchronously, and values materialize
        # 50 logs later when the compute has long finished.
        import numpy as np

        pending: list = []  # (step, names, device vector)

        def flush_pending():
            last = None
            for step, names, vec in pending:
                vals = np.asarray(vec)
                last = {k: float(v) for k, v in zip(names, vals)}
                if self.metric_writer:
                    self.metric_writer.write_scalars(step, last)
            pending.clear()
            return last

        t0 = time.time()
        try:
            self._train_loop(
                start, num_iter, save_interval, save_hook, log_every,
                progress, pending, flush_pending, t0,
            )
        finally:
            # an exception inside step_fn (OOM, NaN abort) must not lose the
            # already-enqueued metrics closest to the crash
            flush_pending()
        return self.state

    def _train_loop(
        self, start, num_iter, save_interval, save_hook, log_every,
        progress, pending, flush_pending, t0,
    ) -> None:
        import jax.numpy as jnp

        for i in range(start, num_iter):
            self.state, losses = self.step_fn(self.state, self.rng)

            if (i + 1) % log_every == 0 and (self.metric_writer or progress):
                names = list(losses.keys())
                vec = jnp.stack([losses[k] for k in names])
                try:
                    vec.copy_to_host_async()
                except Exception:
                    pass
                pending.append((i + 1, names, vec))
                if (i + 1) % (log_every * 50) == 0:
                    host_losses = flush_pending()
                    if progress:
                        rate = (i + 1 - start) / (time.time() - t0)
                        print(
                            f"[{i + 1}/{num_iter}] "
                            + " ".join(f"{k}={v:.5f}" for k, v in host_losses.items())
                            + f" ({rate:.1f} it/s)",
                            flush=True,  # progress must surface through pipes
                        )

            if save_hook and ((i + 1) % save_interval == 0 or i + 1 == num_iter):
                flush_pending()
                save_hook(i + 1, self.state)

            if self._stop_requested:
                flush_pending()
                if save_hook:
                    save_hook(i + 1, self.state)
                break
