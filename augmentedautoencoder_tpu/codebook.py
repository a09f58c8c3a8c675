"""The codebook: SO(3) view embeddings + nearest-rotation + 6D pose recovery.

Reference semantics preserved (auto_pose/ae/codebook.py):
  * rows are l2-normalized latent codes of the embedding view sphere, in
    viewsphere order (row i -> viewsphere_for_embedding[i]); built by
    streaming rendered view batches through the encoder (codebook.py:190-219)
  * `nearest_rotation`: cosine argmax / top-n; `upright` restricts to
    in-plane-rotation-free entries via the num_cyclo stride (codebook.py:55-75)
  * `auto_pose6d`: depth from rendered-bbox/detected-bbox diagonal ratio x
    focal ratio x render radius; x,y from bbox centers through the pinhole;
    rotation corrected for the off-center crop by R_corr_y . R_corr_x
    (codebook.py:79-129)

TPU execution: encoding is a jitted batched forward; queries run the fused
Pallas top-1 kernel (ops/nn_query.py) on TPU or the XLA matmul+top_k path
elsewhere. Multi-crop, multi-object batching replaces the reference's
one-session.run-per-crop loop.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import TrainConfig
from .ops import cosine_top1
from .ops.nn_query import cosine_topk, l2_normalize
from .utils import batch_iteration_indices

Array = jax.Array
EncodeFn = Callable[[Array], Array]  # (B,H,W,C) float in [0,1] -> (B, latent)


@jax.jit
def normalize_uint8(x: Array) -> Array:
    """uint8 image batch -> float32 in [0,1], ON DEVICE.

    The single shared program for this conversion: the codebook embed
    stream and crop queries both route uint8 through it, so an identical
    crop yields an identical code regardless of entry path (and the
    host->HBM transfer stays 4x smaller than shipping float32)."""
    return x.astype(jnp.float32) / 255.0


# Deterministic multi-crop TTA pattern: relative (dx, dy) bbox-center
# offsets, entry 0 = the detection itself. Offsets stay inside the training
# augmentation's MAX_REL_OFFSET=0.2 envelope (data/dataset.py:226-228), so
# every jittered crop is in-distribution for the encoder; w/h are untouched
# (training never jitters scale, and the bbox used for the depth estimate
# is the original detection either way).
_TTA_OFFSETS = (
    (0.0, 0.0),
    (0.10, 0.0), (-0.10, 0.0), (0.0, 0.10), (0.0, -0.10),
    (0.07, 0.07), (-0.07, -0.07), (0.07, -0.07), (-0.07, 0.07),
    (0.15, 0.0), (-0.15, 0.0), (0.0, 0.15), (0.0, -0.15),
    (0.11, 0.11), (-0.11, -0.11), (0.11, -0.11),
)


def tta_jittered_bboxes(bb_xywh: Sequence[float], n: int) -> np.ndarray:
    """`n` deterministically jittered copies of an xywh bbox (first = the
    original). Crop each with the caller's patch extractor and pass the
    stack to `auto_pose6d_batch(..., tta=n)` — detection-major order."""
    if n > len(_TTA_OFFSETS):
        raise ValueError(f"tta_crops max is {len(_TTA_OFFSETS)}, got {n}")
    x, y, w, h = (float(v) for v in bb_xywh)
    return np.array([[x + dx * w, y + dy * h, w, h] for dx, dy in _TTA_OFFSETS[:n]])


def aggregate_candidates(
    viewsphere: np.ndarray,
    embed_obj_bbs: np.ndarray,
    part: np.ndarray,
    sims: np.ndarray,
    agg_angle_deg: float = 20.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Blend ranked top-k codebook candidates into one pose per row.

    part (B,k) candidate indices sorted best-first, sims (B,k) their cosine
    similarities. Keeps the candidates within `agg_angle_deg` of each row's
    top-1 rotation (so distant modes — e.g. near-symmetric views — never
    get averaged) and blends the survivors' quaternions and rendered bboxes
    with similarity-proportional weights. Shared by Codebook.auto_pose6d_batch
    and PoseServer (both feed it the device cosine_topk / lax.top_k result —
    the (B, N) similarity matrix never reaches the host). The viewsphere is
    a 92k-bin SO(3) quantization (SURVEY §2: 2562 views x 36 in-plane);
    averaging the local similarity neighborhood interpolates between bins,
    recovering precision the argmax discards.
    Returns (Rs (B,3,3), rendered_bbs (B,4), top1 idcs (B,))."""
    from .geometry.transform import (
        matrices_from_quaternions,
        quaternions_from_matrices,
    )

    part = np.asarray(part)
    sims = np.asarray(sims)
    top1 = part[:, 0]

    quats = quaternions_from_matrices(viewsphere[part])  # (B,k,4)
    # sign-align to each row's top-1 so the linear blend is well-posed
    dots = np.sum(quats * quats[:, :1], axis=-1)
    quats = np.where(dots[..., None] < 0, -quats, quats)
    # angular distance to top-1: 2*arccos(|<q, q0>|) <= agg_angle_deg
    inlier = np.abs(dots) >= np.cos(np.radians(agg_angle_deg) / 2.0)
    # similarity-proportional weights above the row's k-th similarity;
    # the top-1 always has positive weight (strictly best) or, in the
    # all-equal degenerate case, the +eps keeps it selected alone
    w = (sims - sims[:, -1:] + 1e-9) * inlier
    w /= w.sum(axis=1, keepdims=True)

    q_mean = (quats * w[..., None]).sum(axis=1)
    Rs = matrices_from_quaternions(q_mean)
    rbbs = np.asarray(embed_obj_bbs[part], dtype=np.float64)
    rendered_bbs = (rbbs * w[..., None]).sum(axis=1)
    return Rs, rendered_bbs, top1


class Codebook:
    """A per-object codebook bound to an encoder."""

    def __init__(
        self,
        encode_fn: EncodeFn,
        viewsphere: np.ndarray,  # (N, 3, 3)
        embedding_normalized: Optional[np.ndarray] = None,  # (N, latent)
        embed_obj_bbs: Optional[np.ndarray] = None,  # (N, 4)
        num_cyclo: int = 36,
    ):
        self._encode = encode_fn
        self.viewsphere = np.asarray(viewsphere)
        self.num_cyclo = int(num_cyclo)
        self.embedding_normalized = (
            jnp.asarray(embedding_normalized, jnp.float32)
            if embedding_normalized is not None
            else None
        )
        self.embed_obj_bbs = (
            np.asarray(embed_obj_bbs) if embed_obj_bbs is not None else None
        )

    # ------------------------------------------------------------- build
    @staticmethod
    def build_embedding(
        encode_fn: EncodeFn,
        render_batch_fn: Callable[[int, int], Tuple[np.ndarray, np.ndarray]],
        embedding_size: int,
        batch_size: int = 256,
        progress: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Stream rendered view batches through the encoder; returns
        (embedding_normalized (N, latent), obj_bbs (N, 4)).

        uint8 batches pass through unconverted (the encoder normalizes on
        device — 4x less host->HBM traffic), and the next batch renders on
        a worker thread while the current one encodes (the CPU rasterizer
        releases the GIL), so render and device time overlap."""
        from concurrent.futures import ThreadPoolExecutor

        z_chunks = []
        bb_chunks = []
        spans = list(batch_iteration_indices(embedding_size, batch_size))
        if not spans:
            raise ValueError(
                f"embedding_size={embedding_size} yields no view batches — "
                "check MIN_N_VIEWS/NUM_CYCLO in the [Embedding] config"
            )
        with ThreadPoolExecutor(1) as pool:
            pending = pool.submit(render_batch_fn, *spans[0])
            for i, (a, e) in enumerate(spans):
                if progress and a % (batch_size * 16) == 0:
                    print(f"embedding {a}/{embedding_size}")
                batch, obj_bbs = pending.result()
                if i + 1 < len(spans):
                    pending = pool.submit(render_batch_fn, *spans[i + 1])
                x = np.asarray(batch)
                if x.dtype != np.uint8:
                    x = x.astype(np.float32)
                # pad ragged tail to the jitted batch shape
                pad = batch_size - (e - a)
                if pad:
                    x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
                z = np.asarray(encode_fn(jnp.asarray(x)))
                z_chunks.append(z[: e - a])
                bb_chunks.append(np.asarray(obj_bbs))
        z_all = np.concatenate(z_chunks)
        z_all /= np.linalg.norm(z_all, axis=1, keepdims=True)
        return z_all.astype(np.float32), np.concatenate(bb_chunks)

    # ------------------------------------------------------------- queries
    def _require_embedding(self):
        if self.embedding_normalized is None:
            raise RuntimeError(
                "codebook embedding missing — run ae_embed for this experiment"
            )

    def _prep(self, x: Union[np.ndarray, Array]) -> Array:
        x = np.asarray(x)
        if x.ndim == 3:
            x = x[None]
        if x.dtype == np.uint8:
            # same device program as the embed stream -> identical crops
            # yield identical codes on either path
            return normalize_uint8(jnp.asarray(x))
        return jnp.asarray(x, jnp.float32)

    def nearest_rotation(
        self,
        x: Union[np.ndarray, Array],
        top_n: int = 1,
        upright: bool = False,
        return_idcs: bool = False,
    ):
        """Nearest codebook rotation(s) for crop(s) x.

        Single crop (H,W,C): returns (3,3) [top_n=1] or (top_n,3,3).
        Batch (B,H,W,C): top_n must be 1; returns (B,3,3).
        """
        self._require_embedding()
        xb = self._prep(x)
        z = self._encode(xb)

        # reference precedence (codebook.py:64-71): upright applies only at
        # top_n == 1; top_n > 1 returns sorted argpartition results with
        # upright IGNORED
        if top_n == 1 and not upright:
            _, idcs = cosine_top1(z, self.embedding_normalized)
            idcs = np.asarray(idcs)
        elif top_n == 1:
            # restrict to cyclo-0 entries (codebook.py:66); ranked on device
            _, idcs = cosine_topk(
                z, self.embedding_normalized, k=1, stride=self.num_cyclo
            )
            idcs = np.asarray(idcs)[:, 0]
        else:
            _, idcs = cosine_topk(
                z, self.embedding_normalized, k=self._clamp_k(top_n, 1)
            )
            idcs = np.asarray(idcs).squeeze(0)

        if return_idcs:
            return idcs
        return self.viewsphere[idcs].squeeze()

    def nearest_rotation_batch(self, x: Union[np.ndarray, Array]) -> np.ndarray:
        self._require_embedding()
        z = self._encode(self._prep(x))
        _, idcs = cosine_top1(z, self.embedding_normalized)
        return self.viewsphere[np.asarray(idcs)]

    def test_embedding(self, x, normalized: bool = True) -> np.ndarray:
        z = self._encode(self._prep(x))
        if normalized:
            z = l2_normalize(z)
        return np.asarray(z).squeeze()

    # ------------------------------------------------------------- 6D pose
    def auto_pose6d(
        self,
        x: Union[np.ndarray, Array],
        predicted_bb: Sequence[float],
        K_test: np.ndarray,
        top_n: int,
        train_cfg: TrainConfig,
        depth_pred: Optional[float] = None,
        upright: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Full 6D estimate for one crop: returns (Rs_est (top_n,3,3),
        ts_est (top_n,3)) — reference codebook.py:79-129."""
        self._require_embedding()
        if self.embed_obj_bbs is None:
            raise RuntimeError("codebook has no embedded bboxes (EMBED_BB off)")
        idcs = np.atleast_1d(
            self.nearest_rotation(x, top_n=top_n, upright=upright, return_idcs=True)
        )
        Rs_est = self.viewsphere[idcs].copy()

        K_train = train_cfg.K
        render_radius = train_cfg.radius
        K_test = np.asarray(K_test, dtype=np.float64)

        K_diag_ratio = np.sqrt(K_test[0, 0] ** 2 + K_test[1, 1] ** 2) / np.sqrt(
            K_train[0, 0] ** 2 + K_train[1, 1] ** 2
        )

        predicted_bb = np.asarray(predicted_bb, dtype=np.float64)
        ts_est = np.empty((len(idcs), 3))
        for i, idx in enumerate(idcs):
            rendered_bb = np.asarray(self.embed_obj_bbs[idx]).squeeze()
            if depth_pred is None:
                bb_diag_ratio = np.linalg.norm(
                    np.float32(rendered_bb[2:])
                ) / np.linalg.norm(np.float32(predicted_bb[2:]))
                z = bb_diag_ratio * K_diag_ratio * render_radius
            else:
                z = depth_pred

            cx_train = rendered_bb[0] + rendered_bb[2] / 2.0 - K_train[0, 2]
            cy_train = rendered_bb[1] + rendered_bb[3] / 2.0 - K_train[1, 2]
            cx_test = predicted_bb[0] + predicted_bb[2] / 2.0 - K_test[0, 2]
            cy_test = predicted_bb[1] + predicted_bb[3] / 2.0 - K_test[1, 2]

            tx = cx_test * z / K_test[0, 0] - cx_train * render_radius / K_train[0, 0]
            ty = cy_test * z / K_test[1, 1] - cy_train * render_radius / K_train[1, 1]
            t_est = np.array([tx, ty, z])
            ts_est[i] = t_est

            # rotation correction: the codebook holds CENTERED views; rotate
            # so appearance is preserved at the off-center crop location
            d_alpha_y = np.arctan(t_est[0] / np.sqrt(t_est[2] ** 2 + t_est[1] ** 2))
            d_alpha_x = -np.arctan(t_est[1] / t_est[2])
            ca, sa = np.cos(d_alpha_x), np.sin(d_alpha_x)
            cb, sb = np.cos(d_alpha_y), np.sin(d_alpha_y)
            R_corr_x = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
            R_corr_y = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
            Rs_est[i] = R_corr_y @ R_corr_x @ Rs_est[i]
        return Rs_est, ts_est

    def _clamp_k(self, k: int, stride: int) -> int:
        """k never exceeds the candidate count (strided width under
        `upright`) — static so the device top_k compiles with a valid k."""
        n = self.embedding_normalized.shape[0]
        width = n if stride <= 1 else -(-n // stride)
        return min(k, width)

    def topk_candidates(
        self,
        xs: Union[np.ndarray, Array],
        k: int,
        upright: bool = False,
        tta: int = 1,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k codebook indices + cosine similarities per detection — the
        hypothesis-expansion half of depth re-scoring (pose/rescore.py): no
        pose math, just the ranked matches. With tta > 1, xs is the
        detection-major (B*tta) jittered-crop stack and similarity rows are
        averaged per detection first (same voting as auto_pose6d_batch).
        Returns (idcs (B,k'), sims (B,k'))."""
        self._require_embedding()
        z = self._encode(self._prep(xs))
        stride = self.num_cyclo if upright else 1
        vals, idcs = cosine_topk(
            z,
            self.embedding_normalized,
            k=self._clamp_k(max(k, 1), stride),
            stride=stride,
            tta=tta,
        )
        return np.asarray(idcs), np.asarray(vals)

    def pose6d_from_indices(
        self,
        idcs: np.ndarray,
        bbs: np.ndarray,
        K_test: np.ndarray,
        train_cfg: TrainConfig,
        depth_pred: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Full 6D poses for GIVEN codebook indices — no encode, no query.

        idcs (B,) with bbs (B,4) yields one pose per detection; idcs (B,k)
        expands every detection into k hypotheses (bbs and depth_pred are
        repeated per candidate) and returns flattened (B*k,...) results.
        Used by depth re-scoring (pose/rescore.py) and by ICP stage 2 when a
        re-scored candidate must be KEPT instead of re-queried. Same
        translation recovery + off-center rotation correction as
        auto_pose6d_batch (reference codebook.py:79-129)."""
        self._require_embedding()
        if self.embed_obj_bbs is None:
            raise RuntimeError("codebook has no embedded bboxes (EMBED_BB off)")
        idcs = np.asarray(idcs)
        bbs = np.asarray(bbs, dtype=np.float64)
        if idcs.ndim == 2:
            k = idcs.shape[1]
            bbs = np.repeat(bbs, k, axis=0)
            if depth_pred is not None:
                depth_pred = np.repeat(np.asarray(depth_pred, np.float64), k)
            idcs = idcs.reshape(-1)
        Rs = self.viewsphere[idcs].copy()
        rendered_bbs = np.asarray(self.embed_obj_bbs[idcs], dtype=np.float64)
        return self._solve_6d(Rs, rendered_bbs, bbs, K_test, train_cfg, depth_pred)

    def auto_pose6d_batch(
        self,
        xs: Union[np.ndarray, Array],
        bbs: np.ndarray,
        K_test: np.ndarray,
        train_cfg: TrainConfig,
        depth_pred: Optional[np.ndarray] = None,
        upright: bool = False,
        topk_aggregate: int = 1,
        tta: int = 1,
        agg_angle_deg: float = 20.0,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized 6D pose for a batch of crops: ONE encode dispatch, one
        fused top-1 query, numpy-vectorized translation + rotation correction.

        xs: (B,H,W,C); bbs: (B,4) xywh in pixels. Returns (Rs (B,3,3),
        ts (B,3), idcs (B,)). Replaces the reference's per-crop session.run
        loop (ae_pose_estimator.py:143-229).

        Test-time aggregation (new capability — the reference always takes
        the single argmax, codebook.py:64-71):
          * tta > 1: xs holds `tta` jittered crops PER detection
            (detection-major: xs[i*tta:(i+1)*tta] belong to bbs[i], see
            `tta_jittered_bboxes`). Their cosine-similarity rows are
            averaged on device before the argmax — a clutter-shifted crop
            votes, it does not decide alone.
          * topk_aggregate > 1: blend the top-k codebook matches
            (quaternion + rendered-bbox averaging, `aggregate_candidates`).
        """
        self._require_embedding()
        if self.embed_obj_bbs is None:
            raise RuntimeError("codebook has no embedded bboxes (EMBED_BB off)")
        bbs = np.asarray(bbs, dtype=np.float64)
        xb = self._prep(xs)
        if tta > 1 and xb.shape[0] != len(bbs) * tta:
            raise ValueError(
                f"tta={tta} expects {len(bbs) * tta} crops for {len(bbs)} "
                f"detections, got {xb.shape[0]}"
            )
        z = self._encode(xb)

        if tta > 1 or topk_aggregate > 1:
            stride = self.num_cyclo if upright else 1
            sims, part = cosine_topk(
                z,
                self.embedding_normalized,
                k=self._clamp_k(max(topk_aggregate, 1), stride),
                stride=stride,
                tta=tta,
            )
            Rs, rendered_bbs, idcs = aggregate_candidates(
                self.viewsphere,
                self.embed_obj_bbs,
                np.asarray(part),
                np.asarray(sims),
                agg_angle_deg,
            )
        else:
            if upright:
                _, idcs = cosine_topk(
                    z, self.embedding_normalized, k=1, stride=self.num_cyclo
                )
                idcs = np.asarray(idcs)[:, 0]
            else:
                _, idcs = cosine_top1(z, self.embedding_normalized)
                idcs = np.asarray(idcs)
            Rs = self.viewsphere[idcs].copy()
            rendered_bbs = np.asarray(self.embed_obj_bbs[idcs], dtype=np.float64)

        Rs, ts = self._solve_6d(Rs, rendered_bbs, bbs, K_test, train_cfg, depth_pred)
        return Rs, ts, idcs

    def _solve_6d(
        self,
        Rs: np.ndarray,
        rendered_bbs: np.ndarray,
        bbs: np.ndarray,
        K_test: np.ndarray,
        train_cfg: TrainConfig,
        depth_pred: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized translation recovery + off-center rotation correction
        for matched codebook rotations (reference codebook.py:79-129)."""
        bbs = np.asarray(bbs, dtype=np.float64)
        K_train = train_cfg.K
        radius = train_cfg.radius
        K_test = np.asarray(K_test, dtype=np.float64)
        K_diag_ratio = np.sqrt(K_test[0, 0] ** 2 + K_test[1, 1] ** 2) / np.sqrt(
            K_train[0, 0] ** 2 + K_train[1, 1] ** 2
        )

        if depth_pred is None:
            diag_ratio = np.linalg.norm(
                rendered_bbs[:, 2:].astype(np.float32), axis=1
            ) / np.linalg.norm(bbs[:, 2:].astype(np.float32), axis=1)
            z_est = diag_ratio * K_diag_ratio * radius
        else:
            z_est = np.broadcast_to(np.asarray(depth_pred, np.float64), (len(bbs),))

        cx_train = rendered_bbs[:, 0] + rendered_bbs[:, 2] / 2.0 - K_train[0, 2]
        cy_train = rendered_bbs[:, 1] + rendered_bbs[:, 3] / 2.0 - K_train[1, 2]
        cx_test = bbs[:, 0] + bbs[:, 2] / 2.0 - K_test[0, 2]
        cy_test = bbs[:, 1] + bbs[:, 3] / 2.0 - K_test[1, 2]

        tx = cx_test * z_est / K_test[0, 0] - cx_train * radius / K_train[0, 0]
        ty = cy_test * z_est / K_test[1, 1] - cy_train * radius / K_train[1, 1]
        ts = np.stack([tx, ty, z_est], axis=1)

        d_ay = np.arctan(tx / np.sqrt(z_est**2 + ty**2))
        d_ax = -np.arctan(ty / z_est)
        ca, sa = np.cos(d_ax), np.sin(d_ax)
        cb, sb = np.cos(d_ay), np.sin(d_ay)
        zeros = np.zeros_like(ca)
        ones = np.ones_like(ca)
        R_corr_x = np.stack(
            [ones, zeros, zeros, zeros, ca, -sa, zeros, sa, ca], axis=1
        ).reshape(-1, 3, 3)
        R_corr_y = np.stack(
            [cb, zeros, sb, zeros, ones, zeros, -sb, zeros, cb], axis=1
        ).reshape(-1, 3, 3)
        Rs = R_corr_y @ R_corr_x @ Rs
        return Rs, ts
