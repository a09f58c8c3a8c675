"""Batched multi-object pose serving — the production path.

`AePoseEstimator.process` (pose/estimator.py) runs one batched encode +
query PER CLASS. This module formalizes the full TPU serving design for the
multi-object deployment (e.g. 30 T-LESS objects, each with its own trained
encoder and 92,232-row codebook — reference loads them as separate TF graphs
in one session, m3_interface/ae_pose_estimator.py:50-78, and loops
detections one session.run at a time):

  * every class's params stay device-resident; a frame dispatches ONE
    shared compiled encode per PRESENT class (a frame rarely contains
    more than a few of the configured classes — per-frame work is
    O(present), not O(configured)). A round-2 all-stacked vmap variant
    encoded every configured class every frame: at 30 classes / 3 present
    it measured 12.4 ms/frame vs 2.75 for this design (4.5x, PERF.md).
  * all codebooks live in one HBM slab (O, N_pad, D) with true lengths
    (ops/multi_codebook.stack_codebooks); each present class queries it
    through the scalar-prefetch Pallas kernel, which DMAs only that
    object's tiles (grouped_codebook_top1) — the slab is never sliced or
    broadcast.
  * frames pipeline: `submit()` returns a handle immediately (device work
    + async host copy in flight), `retrieve()` materializes and finishes
    the pose math on the host — so frame n+1's dispatch overlaps frame n's
    readback (the bench.py pattern, PERF.md "tunnel" notes).

Per-class crop batches are padded to a fixed `max_dets_per_class` so the
jitted step has static shapes (one compile); classes with more detections
dispatch multiple fixed-shape chunks — nothing is dropped.

Test-time accuracy knobs from the m3 config are served natively (round 4):
`topk_aggregate` switches the query to a device lax.top_k and blends the
ranked candidates (codebook.aggregate_candidates), `topk_rescore` expands
them into 6D hypotheses and keeps the best depth match (pose/rescore.py),
`upright` restricts candidates to the in-plane-rotation-free stride, and
`icp_frame_accurate` selects the frame-accurate ICP cloud geometry. All
default off = single-argmax reference parity.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from .codebook import aggregate_candidates
from .pose.estimator import AePoseEstimator, extract_square_patch_centered
from .pose.interfaces import BoundingBox, PoseEstimate


import contextlib as _contextlib


@_contextlib.contextmanager
def _noop_stage(_name):
    yield


_NOOP_STAGE = _noop_stage


@dataclasses.dataclass
class _FrameHandle:
    vals: Dict[str, object]  # per present class: list of (max_dets, k) device arrays (empty when k=1 — retrieve never reads scores then)
    idcs: Dict[str, object]  # per present class: list of (max_dets[, k]) device arrays
    by_class: Dict[str, List[int]]
    box_xywhs: List[Optional[List[float]]]
    bboxes: Sequence[BoundingBox]
    camK: np.ndarray
    camPose: Optional[np.ndarray]
    mm: bool
    depth_img: Optional[np.ndarray] = None


class PoseServer:
    """Multi-class 6D pose serving: resident per-class encoders + one
    codebook slab, dispatching only for classes present in each frame.

    Requires every configured class to share the network architecture
    (h/w/c, filters, strides, latent) — the reference's standard multi-
    object setup (one compiled encode serves every class). Fall back to
    the plain AePoseEstimator for heterogeneous setups.
    """

    def __init__(
        self,
        test_config_path: str,
        max_dets_per_class: int = 8,
        precision: Optional[str] = None,
        profile: bool = False,
    ):
        """precision: 'float32' (default) or 'bfloat16'. bf16 runs the
        encoder stack's convs on the MXU in bf16 and stores the codebook
        slab in bf16 (half the HBM traffic of the dominant (O,B,D)x(O,N,D)
        query einsum), while the latent head and the cosine accumulation
        stay f32 — the same recipe the training path validated end-to-end
        (scripts/quality_vsd_asym_bf16.json). Also settable as
        `serving_precision` in the [auto_pose] test config."""
        import jax
        import jax.numpy as jnp

        from . import factory
        from .cli import split_experiment_name
        from .models import AAE
        from .ops.multi_codebook import stack_codebooks

        self._est = AePoseEstimator(test_config_path)
        self.max_dets = int(max_dets_per_class)
        # optional wall-clock stage split (crop-extract / dispatch /
        # readback / pose-math / icp), accumulated across frames; read via
        # profile_summary(). Near-zero overhead when off; when on, note the
        # submit/retrieve pipelining means stages of DIFFERENT frames
        # overlap — per-stage sums can exceed end-to-end wall time.
        self.profile = bool(profile)
        self.profile_times: Dict[str, float] = {}
        self.profile_frames = 0
        if precision is None:
            precision = self._est.test_args.get(
                "auto_pose", "serving_precision", fallback="float32"
            )
        if precision not in ("float32", "bfloat16"):
            raise ValueError(f"unknown serving precision: {precision!r}")
        self.precision = precision

        self.classes = sorted(self._est.class_2_encoder)
        cfgs = [self._est.all_train_cfgs[c] for c in self.classes]
        arch = {
            (c.h, c.w, c.c, c.latent_space_size, tuple(c.num_filter), tuple(c.strides))
            for c in cfgs
        }
        if len(arch) != 1:
            raise ValueError(
                "PoseServer needs one shared architecture across classes; "
                f"got {arch}. Use AePoseEstimator for heterogeneous setups."
            )
        self.cfg0 = cfgs[0]
        import copy

        model_cfg = copy.copy(self.cfg0)
        model_cfg.precision = self.precision  # bf16 convs, f32 latent head
        self._model = AAE.from_config(model_cfg)

        # per-class resident params + one codebook slab. NOT stacked: a
        # stacked-params vmap step pays O(configured classes) encode FLOPs
        # and HBM every frame (and doubles param memory); per-class
        # dispatch pays O(present classes) — 4.5x faster at 30 classes
        # with 3 present (PERF.md round 3).
        self._params_by_class = {}
        codebooks = []
        for c in self.classes:
            experiment_name, experiment_group = split_experiment_name(
                self._est.class_2_encoder[c]
            )
            _, _, _, payload = factory.restore_experiment(
                experiment_name, experiment_group
            )
            self._params_by_class[c] = jax.tree.map(
                jnp.asarray, payload["params"]
            )
            cb = self._est.all_codebooks[c]
            codebooks.append(np.asarray(cb.embedding_normalized))
        slab, lengths = stack_codebooks(codebooks)
        slab_dtype = jnp.bfloat16 if self.precision == "bfloat16" else jnp.float32
        self._slab = jnp.asarray(slab, slab_dtype)
        # tiny device constants hoisted so submit() enqueues no host->device
        # transfers beyond the crops themselves
        self._obj_dev = [jnp.asarray(o, jnp.int32) for o in range(len(self.classes))]
        self._len_dev = [jnp.asarray(int(l), jnp.int32) for l in lengths]

        model = self._model

        @jax.jit
        def _encode(params, crops):
            # crops: (B, H, W, C) uint8 — normalized on device so the
            # per-frame host->HBM transfer is 4x smaller (tunnel-bound)
            x = crops.astype(jnp.float32) / 255.0
            return model.apply({"params": params}, x, method=model.encode)

        self._encode = _encode
        self._on_tpu = jax.default_backend() == "tpu"

        @jax.jit
        def _query_xla(z, cb2d, n_valid):
            # off-TPU fallback: direct masked matmul against one object's
            # (sliced) slab plane; cosine accumulates f32 under bf16 slabs
            zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
            cos = jnp.matmul(
                zn.astype(cb2d.dtype), cb2d.T, preferred_element_type=jnp.float32
            )
            col = jnp.arange(cos.shape[-1], dtype=jnp.int32)
            cos = jnp.where(col[None, :] < n_valid, cos, -2.0)
            idcs = jnp.argmax(cos, axis=-1)
            vals = jnp.take_along_axis(cos, idcs[:, None], axis=-1)[:, 0]
            return vals, idcs.astype(jnp.int32)

        self._query_xla = _query_xla

        # test-time aggregation / depth re-scoring need the k best matches,
        # not just the argmax: same masked matmul + a device lax.top_k (the
        # (B,k) readback replaces the (B,) one — still tiny). Used on every
        # backend incl. TPU; the fused Pallas top-1 kernel stays the k=1 path.
        # With `upright` the candidate set is the in-plane-rotation-free
        # stride (reference codebook.py:66), so the stride (static, per
        # class) restricts the argmax/top_k — same semantics as
        # AePoseEstimator, which PoseServer must match result-for-result.
        self._query_k = max(
            self._est._topk_aggregate, self._est._topk_rescore, 1
        )
        self._nc_by_class = {
            c: int(self._est.all_codebooks[c].num_cyclo) for c in self.classes
        }
        self._oi_by_class = {c: i for i, c in enumerate(self.classes)}
        # per-class k, clamped to the class's candidate count (the strided
        # width under `upright`) — mirrors Codebook._clamp_k. Without this a
        # topk_aggregate larger than a small codebook's valid width would
        # return masked sentinel rows (score -2) whose indices point at
        # padded slab columns and index viewsphere out of range.
        self._k_by_class = {}
        for c in self.classes:
            n_valid = int(self._est.all_codebooks[c].embedding_normalized.shape[0])
            stride_c = self._nc_by_class[c] if self._est._upright else 1
            width = n_valid if stride_c <= 1 else -(-n_valid // stride_c)
            self._k_by_class[c] = min(self._query_k, width)

        def _masked_cos(z, cb2d, n_valid):
            zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
            cos = jnp.matmul(
                zn.astype(cb2d.dtype), cb2d.T, preferred_element_type=jnp.float32
            )
            col = jnp.arange(cos.shape[-1], dtype=jnp.int32)
            return jnp.where(col[None, :] < n_valid, cos, -2.0)

        def _make_topk(stride, k):
            @jax.jit
            def _q(z, cb2d, n_valid):
                cos = _masked_cos(z, cb2d, n_valid)[:, ::stride]
                vals, idcs = jax.lax.top_k(cos, k)  # sorted best-first
                return vals, (idcs * stride).astype(jnp.int32)

            return _q

        def _make_upright_top1(stride):
            @jax.jit
            def _q(z, cb2d, n_valid):
                cos = _masked_cos(z, cb2d, n_valid)
                idcs = jnp.argmax(cos[:, ::stride], axis=-1) * stride
                vals = jnp.take_along_axis(cos, idcs[:, None], axis=-1)[:, 0]
                return vals, idcs.astype(jnp.int32)

            return _q

        # one compiled query per distinct (stride, clamped-k) pair (stride 1
        # unless upright; k varies only when a class's codebook is smaller
        # than the configured top-k)
        self._query_topk_xla = {}
        self._query_upright_xla = {}
        for c in self.classes:
            stride = self._nc_by_class[c] if self._est._upright else 1
            if self._query_k > 1:
                key = (stride, self._k_by_class[c])
                if key not in self._query_topk_xla:
                    self._query_topk_xla[key] = _make_topk(*key)
            if self._est._upright and self._query_k == 1:
                if stride not in self._query_upright_xla:
                    self._query_upright_xla[stride] = _make_upright_top1(stride)

        # lazy per-class 2D slab planes for the XLA query paths: indexing
        # self._slab[oi] at call time dispatches a device slice (a fresh
        # (N_pad, D) HBM copy) EVERY frame — cache the plane once per class
        # actually queried instead (bounded by present classes, so the HBM
        # cost never doubles the whole slab for large deployments)
        self._plane_cache: Dict[int, object] = {}

    # ------------------------------------------------------------- profiling
    def _stage_timer(self):
        """Stage-accumulating context factory; a shared no-op when off."""
        if not self.profile:
            return _NOOP_STAGE
        import contextlib
        import time

        @contextlib.contextmanager
        def stage(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                self.profile_times[name] = (
                    self.profile_times.get(name, 0.0)
                    + time.perf_counter()
                    - t0
                )

        return stage

    def profile_summary(self) -> Dict[str, float]:
        """Mean per-frame milliseconds per stage (profile=True only)."""
        n = max(self.profile_frames, 1)
        return {k: 1e3 * v / n for k, v in sorted(self.profile_times.items())}

    def _plane(self, oi: int):
        """This class's (N_pad, D) slab plane, sliced once and cached."""
        if oi not in self._plane_cache:
            self._plane_cache[oi] = self._slab[oi]
        return self._plane_cache[oi]

    def _query(self, z, oi: int):
        """Top-1 codebook match for one class: scalar-prefetch Pallas
        kernel on TPU (DMAs only this object's slab tiles), masked matmul
        elsewhere. With aggregation/re-scoring configured (k > 1) the
        TPU path is the fused grouped top-k kernel (same single-dispatch
        shape as top-1, PERF.md round 4); off-TPU a lax.top_k variant
        returns the (B,k) ranked candidates. `upright` restricts
        candidates to the in-plane-free stride in both."""
        cls = self.classes[oi]
        stride = self._nc_by_class[cls] if self._est._upright else 1
        if self._query_k > 1:
            k = self._k_by_class[cls]
            # the fused kernel validates k <= 32 (O(k) per-tile passes);
            # larger configured top-k falls back to the masked-matmul +
            # lax.top_k path even on TPU
            if self._on_tpu and k <= 32:
                from .ops.multi_codebook import grouped_codebook_topk

                return grouped_codebook_topk(
                    z,
                    self._slab,
                    self._obj_dev[oi],
                    self._len_dev[oi],
                    k=k,
                    stride=stride,
                )
            return self._query_topk_xla[(stride, k)](
                z, self._plane(oi), self._len_dev[oi]
            )
        if self._est._upright:
            return self._query_upright_xla[stride](
                z, self._plane(oi), self._len_dev[oi]
            )
        if self._on_tpu:
            from .ops.multi_codebook import grouped_codebook_top1

            return grouped_codebook_top1(
                z, self._slab, self._obj_dev[oi], self._len_dev[oi]
            )
        return self._query_xla(z, self._plane(oi), self._len_dev[oi])

    # ---------------------------------------------------------------- submit
    def submit(
        self,
        bboxes: Sequence[BoundingBox],
        color_img: np.ndarray,
        camK: np.ndarray,
        camPose: Optional[np.ndarray] = None,
        mm: bool = False,
        depth_img: Optional[np.ndarray] = None,
    ) -> _FrameHandle:
        """Crop + dispatch one frame; returns immediately with a handle."""
        import jax.numpy as jnp

        H, W = color_img.shape[:2]
        by_class: Dict[str, List[int]] = {}
        box_xywhs: List[Optional[List[float]]] = []
        for j, box in enumerate(bboxes):
            cls = box.best_class
            if cls not in self._est.class_2_encoder:
                box_xywhs.append(None)
                continue
            xywh = box.to_xywh(W, H)
            if np.any(np.array(xywh) < 0):
                box_xywhs.append(None)
                continue
            box_xywhs.append(xywh)
            by_class.setdefault(cls, []).append(j)

        # padded crop batches + one encode + one slab query per PRESENT
        # class — frames pay for the classes they contain, not for every
        # configured class. Classes with more than max_dets detections
        # dispatch ceil(n/max_dets) fixed-shape chunks (same compiled step;
        # nothing is silently dropped).
        want_icp = depth_img is not None and (
            self._est._use_icp or self._est._topk_rescore > 1
        )
        vals: Dict[str, object] = {}
        idcs: Dict[str, object] = {}
        prof = self._stage_timer()
        keep_vals = self._query_k > 1  # k=1 retrieve never reads the scores
        for cls, det_idcs in by_class.items():
            oi = self._oi_by_class[cls]
            chunk_vals, chunk_idcs = [], []
            for start in range(0, len(det_idcs), self.max_dets):
                chunk = det_idcs[start:start + self.max_dets]
                crops = np.zeros(
                    (self.max_dets, self.cfg0.h, self.cfg0.w, self.cfg0.c),
                    np.uint8,
                )
                with prof("crop_extract"):
                    for k, j in enumerate(chunk):
                        crops[k] = extract_square_patch_centered(
                            color_img,
                            box_xywhs[j],
                            self._est.pad_factors[cls],
                            resize=self._est.patch_sizes[cls],
                            interpolation="linear",
                            black_borders=True,
                        )
                with prof("dispatch"):
                    z = self._encode(
                        self._params_by_class[cls], jnp.asarray(crops)
                    )
                    v, i = self._query(z, oi)
                    # overlap d2h copies with later frames' device work
                    for a in (v, i) if keep_vals else (i,):
                        try:
                            a.copy_to_host_async()
                        except Exception:
                            pass
                if keep_vals:
                    chunk_vals.append(v)
                chunk_idcs.append(i)
            vals[cls] = chunk_vals
            idcs[cls] = chunk_idcs
        self.profile_frames += 1
        return _FrameHandle(
            vals=vals, idcs=idcs, by_class=by_class, box_xywhs=box_xywhs,
            bboxes=bboxes, camK=np.asarray(camK, np.float64),
            camPose=camPose, mm=mm,
            depth_img=depth_img if want_icp else None,
        )

    # --------------------------------------------------------------- retrieve
    def retrieve(self, h: _FrameHandle) -> List[PoseEstimate]:
        """Materialize a submitted frame and finish the pose math
        (codebook.auto_pose6d semantics, reference codebook.py:79-129)."""
        results: List[Optional[PoseEstimate]] = [None] * len(h.bboxes)
        prof = self._stage_timer()
        for cls, det_idcs in h.by_class.items():
            n = len(det_idcs)
            # chunked dispatch: concatenate the per-chunk (max_dets, ...)
            # arrays; row c*max_dets+k is detection k of chunk c and every
            # chunk before the last is full, so flat row k IS detection k —
            # rows past n are padding, dropped by the [:n]
            with prof("readback"):
                cls_idcs = np.concatenate(
                    [np.asarray(a) for a in h.idcs[cls]]
                )[:n]
                if self._query_k > 1:
                    cls_vals = np.concatenate(
                        [np.asarray(a) for a in h.vals[cls]]
                    )[:n]
            cfg = self._est.all_train_cfgs[cls]
            cb = self._est.all_codebooks[cls]
            K_test = h.camK
            pred_bbs = np.stack(
                [h.box_xywhs[j] for j in det_idcs]
            ).astype(np.float64)
            fixed_idcs = None
            with prof("pose_math"):
                if self._est._topk_aggregate > 1:
                    # blend the ranked candidates (codebook.py semantics)
                    R0, rendered_bbs, _ = aggregate_candidates(
                        cb.viewsphere, cb.embed_obj_bbs, cls_idcs, cls_vals
                    )
                    Rs_cls, ts_cls = cb._solve_6d(
                        R0, rendered_bbs, pred_bbs, K_test, cfg
                    )
                elif self._est._topk_rescore > 1 and h.depth_img is not None:
                    # expand all candidates, keep the best depth match
                    from .pose.rescore import select_best_hypothesis

                    k = cls_idcs.shape[1]
                    Rs_f, ts_f = cb.pose6d_from_indices(
                        cls_idcs, pred_bbs, K_test, cfg
                    )
                    Hd, Wd = h.depth_img.shape[:2]
                    best, _ = select_best_hypothesis(
                        self._est._icp_handle().renderers[cls].renderer,
                        K_test, (Wd, Hd), h.depth_img,
                        Rs_f.reshape(n, k, 3, 3), ts_f.reshape(n, k, 3),
                        tau=self._est._rescore_tau,
                    )
                    rows = np.arange(n)
                    Rs_cls = Rs_f.reshape(n, k, 3, 3)[rows, best]
                    ts_cls = ts_f.reshape(n, k, 3)[rows, best]
                    fixed_idcs = cls_idcs[rows, best]
                else:
                    idcs_1 = (
                        cls_idcs[:, 0] if cls_idcs.ndim == 2 else cls_idcs
                    )
                    Rs_cls, ts_cls = cb.pose6d_from_indices(
                        idcs_1, pred_bbs, K_test, cfg
                    )
            Rs_cls, ts_cls = list(Rs_cls), list(ts_cls)

            use_icp = (
                h.depth_img is not None and self._est._use_icp and Rs_cls
            )
            if use_icp:
                # batched 3-stage depth refinement (poses still in mm here)
                with prof("icp"):
                    depth_crops, crop_offsets = [], []
                    for j in det_idcs:
                        x, y, w, bh = (int(v) for v in h.box_xywhs[j])
                        size = int(max(bh, w) * self._est.pad_factors[cls])
                        Hd, Wd = h.depth_img.shape[:2]
                        left = max(int(x + w / 2 - size / 2), 0)
                        right = min(int(x + w / 2 + size / 2), Wd)
                        top = max(int(y + bh / 2 - size / 2), 0)
                        bottom = min(int(y + bh / 2 + size / 2), Hd)
                        depth_crops.append(h.depth_img[top:bottom, left:right])
                        crop_offsets.append((left, top))
                    # stage 2 re-uses the submit-time query: the encoder is
                    # deterministic, so re-encoding the same crops would
                    # reproduce exactly these ranked candidates — pass them
                    # instead of the crops and stage 2 costs no device work
                    # (see ICP.refine_batch stage2_candidates)
                    if self._est._topk_aggregate > 1:
                        stage2, fixed = (cls_idcs, cls_vals), fixed_idcs
                    elif fixed_idcs is not None:
                        stage2, fixed = None, fixed_idcs
                    else:
                        stage2 = None
                        fixed = (
                            cls_idcs[:, 0] if cls_idcs.ndim == 2 else cls_idcs
                        )
                    Rs_cls, ts_cls = self._est._icp_handle().refine_batch(
                        depth_crops, Rs_cls, ts_cls, K_test,
                        h.depth_img.shape[:2][::-1], class_name=cls,
                        codebook=self._est.all_codebooks[cls],
                        det_bbs=np.stack(
                            [h.box_xywhs[j] for j in det_idcs]
                        ).astype(np.float64),
                        train_cfg=cfg, upright=self._est._upright,
                        topk_aggregate=self._est._topk_aggregate,
                        fixed_idcs=fixed,
                        stage2_candidates=stage2,
                        crop_offsets=(
                            crop_offsets
                            if self._est._icp_frame_accurate else None
                        ),
                    )

            for k, j in enumerate(det_idcs):
                H_est = np.eye(4)
                H_est[:3, :3] = Rs_cls[k]
                H_est[:3, 3] = ts_cls[k] if h.mm else np.asarray(ts_cls[k]) / 1000.0
                if h.camPose is not None:
                    H_est = h.camPose @ H_est
                results[j] = PoseEstimate(
                    name=h.bboxes[j].best_class, trafo=H_est
                )
        return [r for r in results if r is not None]

    # ------------------------------------------------------------------ sync
    def process(self, bboxes, color_img, camK, camPose=None, mm=False,
                depth_img=None):
        """Synchronous single-frame path (AePoseEstimator-compatible)."""
        return self.retrieve(
            self.submit(bboxes, color_img, camK, camPose, mm, depth_img)
        )

    def process_stream(
        self, frames: Iterable[Dict], depth: int = 2
    ) -> Iterator[List[PoseEstimate]]:
        """Pipelined stream: keeps `depth` frames in flight so device compute
        overlaps host crop-extraction and readback. Each frame is a dict of
        submit() kwargs.

        retrieve() runs on a single worker thread, so frame n's readback /
        pose math / ICP refinement overlaps frame n+1's crop-extract and
        dispatch on the main thread. One worker keeps retrieves strictly
        ordered (results yield in submit order) and avoids contending for
        the renderer; the overlapped sections (rasterizer, device waits)
        release the GIL, so this helps even on a small host. The depth-off
        path keeps the same structure — its retrieve is readback-dominated,
        which equally benefits from overlapping the next frame's dispatch.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        q: deque = deque()
        with ThreadPoolExecutor(max_workers=1) as ex:
            for frame in frames:
                q.append(ex.submit(self.retrieve, self.submit(**frame)))
                if len(q) > depth:
                    yield q.popleft().result()
            while q:
                yield q.popleft().result()
