"""Depth-based ICP pose refinement, device-accelerated.

Algorithm parity with the reference (auto_pose/eval/icp_utils.py,
auto_pose/icp/icp.py): SVD best-fit with `depth_only` (translation-z only)
and `no_depth` (x,y,R only) modes, NN-correspondence ICP with mean-error
tolerance, outlier pre-gating by distance to the synthetic centroid, and the
20-degree rotation-change rejection.

The reference's per-iteration sklearn KD-tree query is replaced by a jitted
brute-force distance matrix: at the reference's own operating point
(N=3000 subsampled points, icp_utils.py:14) the 3000x3000 matmul-shaped
distance computation is a perfect MXU fit, and the whole ICP loop runs as
one lax.while_loop on device.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.misc import rgbd_to_point_cloud
from ..geometry.transform import rotation_angle
from ..ops.icp_nn import batched_nn_pallas, batched_nn_xla

N_SUB = 3000  # reference subsample size (icp_utils.py:14)
ANGLE_CHANGE_LIMIT = 20.0 * np.pi / 180.0  # icp_utils.py:18

# Fixed-point detection for the f32 device loop (PERF.md round-5 "ICP
# stage attribution" + "ICP f32 conditioning"). The reference's
# |prev_err - err| < 1e-6 test (icp_utils.py:161) fires there because its
# f64 + exact-KD-tree pipeline makes the refit exactly idempotent at the
# correspondence fixed point; in f32 on TPU the mean error keeps jiggling
# ~1e-4 mm forever, so that test almost never fires and every lane used to
# spin to the 100-iteration cap. With the bf16-transform noise floor
# removed (_transform_pts) the loop genuinely converges, and we detect the
# fixed point two robust ways (either stops a lane):
#   - the correspondence index vector stopped changing (exact fixed point;
#     measured on-chip: depth-only lanes reach it in ~10-15 iterations,
#     most rotation-only lanes in ~25-110),
#   - TWO consecutive refits moved the pose by less than STEP_TOL_ROT and
#     STEP_TOL_TRANS (some rotation-only lanes limit-cycle with a handful
#     of boundary correspondences flipping forever, so their index vector
#     never freezes — but the pose orbit is ~0.003 mm wide; requiring two
#     consecutive tiny steps rejects transient mid-flight plateaus).
# On-chip floors: depth-only steps ~2e-5 mm, converged rotation-only steps
# <= ~5e-3 mm; the thresholds sit 300x below the quality metrics' medians
# (te ~3 mm, re ~6.6 deg), so stopping inside a <=0.01 mm / <=0.011 deg
# orbit is harmless. Genuinely non-converging lanes (poor-overlap
# detections) still run to the cap, same as the reference.
STEP_TOL_ROT = 2e-4  # rad/iteration (~0.011 deg)
STEP_TOL_TRANS = 1e-2  # mm/iteration


def _inv3(M: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse (adjugate / det) — exact f32 arithmetic."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A_ = e * i - f * h
    B_ = -(d * i - f * g)
    C_ = d * h - e * g
    det = a * A_ + b * B_ + c * C_
    adj = jnp.array(
        [
            [A_, -(b * i - c * h), b * f - c * e],
            [B_, a * i - c * g, -(a * f - c * d)],
            [C_, -(a * h - b * g), a * e - b * d],
        ]
    )
    return adj / det


def _kabsch_rotation(H: jax.Array) -> jax.Array:
    """Rotation maximizing tr(R H) via the polar factor of H.

    H = U S V^T gives the Kabsch answer R = V U^T = (polar_factor(H))^T.
    Computed by the Newton polar iteration X <- (X + X^-T)/2 — matmuls and
    3x3 inverses only, because jnp.linalg.svd in f32 ON TPU is too
    inaccurate for this (measured ~3 deg error on a clean 4 deg rotation;
    the iteration is exact to f32 roundoff). Quadratic convergence: 16
    iterations from a Frobenius-normalized start is far past f32 saturation.
    """
    X = H / jnp.linalg.norm(H)

    def body(_, X):
        return 0.5 * (X + _inv3(X).T)

    W = jax.lax.fori_loop(0, 16, body, X)
    # Refuse rather than guess on degenerate input: improper (reflection)
    # polar factors, and ill-conditioned H (near-planar clouds) where 16
    # unscaled Newton steps may not have converged to an orthogonal matrix —
    # without the residual check a non-rigid W could be composed into the
    # pose. With dense 3-D clouds neither case occurs on sane input.
    # HIGHEST: at the default TPU precision this product carries ~2e-3 of
    # bf16 noise, which exceeds the 1e-3 threshold and silently rejected
    # VALID rotations on the real chip (round-5 on-chip gate finding).
    ortho_residual = jnp.linalg.norm(
        jnp.matmul(W.T, W, precision=jax.lax.Precision.HIGHEST) - jnp.eye(3)
    )
    proper_rotation = (jnp.linalg.det(W) > 0.0) & (ortho_residual < 1e-3)
    return jnp.where(proper_rotation, W.T, jnp.eye(3))


@functools.partial(jax.jit, static_argnames=("depth_only", "no_depth"))
def best_fit_transform_jax(
    A: jax.Array, B: jax.Array, depth_only: bool = False, no_depth: bool = False
) -> jax.Array:
    """Least-squares rigid transform mapping A onto B; returns 4x4 T.

    Conditioning (PERF.md round-5 "ICP f32 conditioning"): the clouds live
    in camera frame at z ~ 700 mm, so a direct f32 `mean` reduction
    accumulates into ~2e6 and its rounding noise is ~1 mm — measured
    on-chip as a +-1.4 mm PER-ITERATION pose oscillation with completely
    frozen correspondences, i.e. mm-scale noise on every fitted
    translation. Every mean here is therefore computed over small-magnitude
    values only: the centroid difference as mean(B - A) (point differences,
    ~mm scale), the centroid itself anchored on the first point (offsets ~
    object extent), and the translation in the (I - R) @ centroid form so
    centroid error enters only scaled by the rotation increment.
    """
    # centroid difference from per-point differences (exact same value in
    # exact arithmetic; ~1000x better f32 conditioning at camera distance)
    d = (B - A).mean(axis=0)

    if depth_only:
        R = jnp.eye(3)
        t = jnp.array([0.0, 0.0, 1.0]) * d[2]
    else:
        anchor = A[0]
        centroid_A = anchor + (A - anchor).mean(axis=0)
        centroid_B = centroid_A + d
        AA = A - centroid_A
        BB = B - centroid_B
        H = jnp.matmul(AA.T, BB, precision=jax.lax.Precision.HIGHEST)
        R = _kabsch_rotation(H)
        # t = centroid_B - R @ centroid_A, with the ~700 mm centroid entering
        # only through (I - R): its residual f32 error is scaled by the
        # rotation increment instead of standing alone at full magnitude.
        # HIGHEST: bf16 passes on a ~700 mm operand cost ~0.1 mm here.
        t = d + jnp.matmul(
            jnp.eye(3) - R, centroid_A, precision=jax.lax.Precision.HIGHEST
        )
        if no_depth:
            t = t * jnp.array([1.0, 1.0, 0.0])

    T = jnp.eye(4)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


@jax.jit
def nearest_neighbor_jax(src: jax.Array, dst: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Brute-force NN: for each src point the closest dst point.

    ||s - d||^2 = |s|^2 - 2 s.d + |d|^2 — the cross term is one MXU matmul.
    """
    # conditioning: center on the dst centroid (NN is translation-invariant)
    # so |p| ~ object radius, not camera distance — else f32 resolution of
    # |p|^2 at ~550 mm (~0.02 mm^2) decides correspondences instead of the
    # actual point distances. HIGHEST: TPU default matmul precision
    # multiplies in bf16 passes, far too coarse here (SURVEY.md §7).
    mu = dst.mean(axis=0)
    src = src - mu
    dst = dst - mu
    cross = jnp.matmul(src, dst.T, precision=jax.lax.Precision.HIGHEST)
    d2 = (src * src).sum(1, keepdims=True) - 2.0 * cross + (dst * dst).sum(1)[None, :]
    idx = jnp.argmin(d2, axis=1)
    dist = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0], 0.0))
    return dist, idx


def _transform_pts(s: jax.Array, T: jax.Array) -> jax.Array:
    """Apply a 4x4 rigid transform to an (N, 3) cloud at FULL f32 precision.

    The default TPU matmul precision multiplies in bf16 passes; at camera
    frame magnitudes (z ~ 700 mm) bf16's ~2.7 mm resolution re-quantizes
    the cloud every ICP iteration — measured on-chip as a permanent
    +-1.4 mm period-2 pose oscillation with completely frozen
    correspondences (PERF.md round-5 "ICP f32 conditioning"). The 3x3
    transform is microscopic next to the NN matmul, so HIGHEST here is
    free and removes that noise floor entirely.
    """
    return (
        jnp.matmul(s, T[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
        + T[:3, 3]
    )


def _converged(prev_err, mean_err, tolerance, prev_idx, idx, Ts, prev_tiny):
    """Per-lane ICP stopping rule (see STEP_TOL_* note above).

    prev_err/mean_err: (n,); prev_idx/idx: (n, N) int32; Ts: (n, 4, 4);
    prev_tiny: (n,) bool — whether the PREVIOUS refit was already tiny.
    A lane is done when the reference's error-delta test fires, OR its
    correspondence indices reached an exact fixed point, OR two
    consecutive refits moved the pose by less than the step tolerances.
    Returns (done, tiny) with tiny = this refit was tiny (next prev_tiny).
    """
    err_static = jnp.abs(prev_err - mean_err) < tolerance
    idx_fixed = jnp.all(idx == prev_idx, axis=-1)
    tr = jnp.trace(Ts[:, :3, :3], axis1=-2, axis2=-1)
    ang = jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))
    tn = jnp.linalg.norm(Ts[:, :3, 3], axis=-1)
    tiny = (ang < STEP_TOL_ROT) & (tn < STEP_TOL_TRANS)
    return err_static | idx_fixed | (tiny & prev_tiny), tiny


def _icp_loop(
    A: jax.Array,
    B: jax.Array,
    max_iterations: int,
    tolerance: float,
    depth_only: bool,
    no_depth: bool,
) -> jax.Array:
    """On-device ICP loop; returns an 18-vector: [T.ravel(16), err, iters]."""

    def cond(carry):
        i, src, prev_err, err, done, prev_idx, prev_tiny = carry
        return (~done) & (i < max_iterations)

    def body(carry):
        i, src, prev_err, err, _, prev_idx, prev_tiny = carry
        dist, idx = nearest_neighbor_jax(src, B)
        T = best_fit_transform_jax(src, B[idx], depth_only=depth_only, no_depth=no_depth)
        src_new = _transform_pts(src, T)
        mean_err = dist.mean()
        done, tiny = _converged(
            prev_err[None], mean_err[None], tolerance, prev_idx[None],
            idx[None], T[None], prev_tiny[None],
        )
        return i + 1, src_new, mean_err, mean_err, done[0], idx, tiny[0]

    init = (
        jnp.int32(0), A, jnp.float32(0.0), jnp.float32(jnp.inf),
        jnp.bool_(False), jnp.full((A.shape[0],), -1, jnp.int32),
        jnp.bool_(False),
    )
    iters, src_final, _, err, _, _, _ = jax.lax.while_loop(cond, body, init)

    T = best_fit_transform_jax(A, src_final, depth_only=depth_only, no_depth=no_depth)
    # pack into ONE result vector: each fetched array costs a full
    # device->host round trip (~24 ms through the TPU tunnel); serving/eval
    # fetches this once per refinement stage
    return jnp.concatenate(
        [T.reshape(16), err[None], iters.astype(jnp.float32)[None]]
    )


@functools.partial(
    jax.jit, static_argnames=("max_iterations", "depth_only", "no_depth")
)
def icp_jax(
    A: jax.Array,
    B: jax.Array,
    max_iterations: int = 100,
    tolerance: float = 1e-6,
    depth_only: bool = False,
    no_depth: bool = False,
) -> jax.Array:
    return _icp_loop(A, B, max_iterations, tolerance, depth_only, no_depth)


@functools.partial(
    jax.jit,
    static_argnames=("max_iterations", "depth_only", "no_depth", "nn_impl"),
)
def icp_jax_batch(
    A: jax.Array,
    B: jax.Array,
    max_iterations: int = 100,
    tolerance: float = 1e-6,
    depth_only: bool = False,
    no_depth: bool = False,
    nn_impl: str = "xla",
) -> jax.Array:
    """Batched ICP over (n, N, 3) cloud stacks -> (n, 18) packed results.

    One dispatch + one fetch refines every estimate of a frame/scene — the
    batched twin of icp_jax for multi-instance evaluation and serving. The
    whole batch steps through ONE while_loop with lane-wise `done` flags
    that freeze finished estimates' carries, so results equal the
    sequential runs on identical subsamples (the reference instead loops
    per detection per iteration, icp_utils.py:139-161).

    `nn_impl` selects the correspondence search for the loop body:
      'xla'    — per-lane (N, N) distance matrix + argmin (exactly the
                 single-lane `nearest_neighbor_jax` math, vmapped). Always
                 correct, but materializes n*N*N f32 in HBM each iteration
                 (~864 MB at n=24, N=3000) — the measured dominant term of
                 depth-refined serving (PERF.md round 5 attribution).
      'pallas' — fused TPU kernel (`ops/icp_nn.batched_nn_pallas`): the
                 distance tile lives only in VMEM; HBM sees the (n, 4, N)
                 inputs + (n, N) outputs per iteration.
    Host callers resolve the default with `_nn_impl_default()` (pallas on
    TPU, xla elsewhere; override with AAE_ICP_NN=xla|pallas).
    """
    n = A.shape[0]
    nn = batched_nn_pallas if nn_impl == "pallas" else batched_nn_xla
    transform_pts = jax.vmap(_transform_pts)
    best_fit = jax.vmap(
        lambda a, b: best_fit_transform_jax(
            a, b, depth_only=depth_only, no_depth=no_depth
        )
    )

    def cond(carry):
        g, src, prev, err, done, iters, prev_idx, prev_tiny = carry
        return (g < max_iterations) & ~jnp.all(done)

    def body(carry):
        g, src, prev, err, done, iters, prev_idx, prev_tiny = carry
        active = ~done
        dist, idx = nn(src, B)
        Bsel = jnp.take_along_axis(B, idx[..., None], axis=1)
        Ts = best_fit(src, Bsel)
        src_new = transform_pts(src, Ts)
        mean_err = jax.vmap(jnp.mean)(dist)
        newly_done, tiny = _converged(
            prev, mean_err, tolerance, prev_idx, idx, Ts, prev_tiny
        )
        # freeze lanes that were already done at iteration start — identical
        # semantics to vmap-of-while_loop (each lane's carry stops updating
        # once its own cond goes false)
        src = jnp.where(active[:, None, None], src_new, src)
        err = jnp.where(active, mean_err, err)
        prev = jnp.where(active, mean_err, prev)
        prev_idx = jnp.where(active[:, None], idx, prev_idx)
        prev_tiny = jnp.where(active, tiny, prev_tiny)
        iters = iters + active.astype(jnp.int32)
        done = done | (active & newly_done)
        return g + 1, src, prev, err, done, iters, prev_idx, prev_tiny

    init = (
        jnp.int32(0),
        A,
        jnp.zeros((n,), jnp.float32),
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.zeros((n,), jnp.bool_),
        jnp.zeros((n,), jnp.int32),
        jnp.full((n, A.shape[1]), -1, jnp.int32),
        jnp.zeros((n,), jnp.bool_),
    )
    _, src_final, _, err, _, iters, _, _ = jax.lax.while_loop(cond, body, init)
    Ts = best_fit(A, src_final)
    return jnp.concatenate(
        [Ts.reshape(n, 16), err[:, None], iters.astype(jnp.float32)[:, None]],
        axis=1,
    )


def _nn_impl_default() -> str:
    """NN backend for the batched ICP loop: the fused Pallas kernel on TPU,
    the XLA distance-matrix path elsewhere. AAE_ICP_NN=xla|pallas overrides
    (the A/B benches use this)."""
    env = os.environ.get("AAE_ICP_NN", "").lower()
    if env in ("xla", "pallas"):
        return env
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def icp(
    A: np.ndarray,
    B: np.ndarray,
    init_pose: Optional[np.ndarray] = None,
    max_iterations: int = 100,
    tolerance: float = 1e-6,
    depth_only: bool = False,
    no_depth: bool = False,
):
    """Host-facing ICP (same contract as the reference icp_utils.icp)."""
    A = np.asarray(A, np.float32)
    B = np.asarray(B, np.float32)
    if init_pose is not None:
        A = A @ init_pose[:3, :3].T + init_pose[:3, 3]
    packed = np.asarray(  # single host fetch (T, err, iters packed)
        icp_jax(
            jnp.asarray(A), jnp.asarray(B),
            max_iterations=max_iterations, tolerance=tolerance,
            depth_only=depth_only, no_depth=no_depth,
        )
    )
    return packed[:16].reshape(4, 4), float(packed[16]), int(packed[17])


def icp_batch(
    As: np.ndarray,
    Bs: np.ndarray,
    max_iterations: int = 100,
    tolerance: float = 1e-6,
    depth_only: bool = False,
    no_depth: bool = False,
):
    """Batched host-facing ICP: (n,N,3) stacks -> [(T, err, iters)] with ONE
    dispatch and ONE host fetch for the whole batch."""
    packed = np.asarray(
        icp_jax_batch(
            jnp.asarray(As, jnp.float32), jnp.asarray(Bs, jnp.float32),
            max_iterations=max_iterations, tolerance=tolerance,
            depth_only=depth_only, no_depth=no_depth,
            nn_impl=_nn_impl_default(),
        )
    )
    return [(p[:16].reshape(4, 4), float(p[16]), int(p[17])) for p in packed]


def best_fit_transform(A, B, depth_only=False, no_depth=False):
    """Host-facing best-fit (reference icp_utils.best_fit_transform)."""
    T = np.asarray(
        best_fit_transform_jax(
            jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32),
            depth_only=depth_only, no_depth=no_depth,
        )
    )
    return T, T[:3, :3], T[:3, 3]


class SynRenderer:
    """Renders the estimated pose's depth for ICP (icp_utils.py:178-218).

    `renderer` is any object with the Renderer.render contract (the cad-model
    software rasterizer in this build)."""

    def __init__(self, renderer, clip_near: float = 10.0, clip_far: float = 10000.0):
        self.renderer = renderer
        self.clip_near = clip_near
        self.clip_far = clip_far

    def generate_synthetic_depth(self, K_test, R_est, t_est, test_shape, obj_id=0):
        W, H = test_shape[:2]
        _, depth = self.renderer.render(
            obj_id, W, H, K_test, R_est, np.array([0.0, 0.0, t_est[2]]),
            self.clip_near, self.clip_far, random_light=False,
        )
        return rgbd_to_point_cloud(K_test, depth)[0]

    def render_trafo(self, K_test, R_est, t_est, test_shape, obj_id=0):
        W, H = test_shape[:2]
        bgr, depth = self.renderer.render(
            obj_id, W, H, K_test, R_est, np.asarray(t_est),
            self.clip_near, self.clip_far, random_light=False,
        )
        return bgr, depth

    def render_depth_window(
        self, K_test, R_est, t_est, window_shape, offset, obj_id=0
    ):
        """Synthetic depth of ONLY a crop window of the full frame.

        Rendering at the crop's size through a principal-point-shifted K
        makes pixel (u, v) here exactly pixel (u+left, v+top) of the
        full-frame render (a pure viewport crop — rasterization samples
        pixel centers through K, so shifting the principal point by the
        window origin is identity on the sampled geometry). The
        frame-accurate ICP prep renders ~6x fewer pixels this way than
        render_trafo + slice (PERF.md round-5 ICP attribution; this host
        is single-core, so the render term cannot be threaded away)."""
        h, w = int(window_shape[0]), int(window_shape[1])
        left, top = (int(v) for v in offset)
        Kc = np.asarray(K_test, np.float64).copy()
        Kc[0, 2] -= left
        Kc[1, 2] -= top
        _, depth = self.renderer.render(
            obj_id, w, h, Kc, R_est, np.asarray(t_est),
            self.clip_near, self.clip_far, random_light=False,
        )
        return depth


def icp_refinement(
    depth_crop: np.ndarray,
    icp_renderer: SynRenderer,
    R_est: np.ndarray,
    t_est: np.ndarray,
    K_test: np.ndarray,
    test_render_dims,
    depth_only: bool = False,
    no_depth: bool = False,
    max_mean_dist_factor: float = 2.0,
    obj_id: int = 0,
    rng: Optional[np.random.RandomState] = None,
):
    """One refinement pass (reference icp_utils.icp_refinement:248-305)."""
    clouds = _refinement_clouds(
        depth_crop, icp_renderer, R_est, t_est, K_test, test_render_dims,
        max_mean_dist_factor=max_mean_dist_factor, obj_id=obj_id, rng=rng,
    )
    if clouds is None:
        return R_est, t_est
    A_sub, B_sub = clouds
    T, _, _ = icp(
        A_sub, B_sub, tolerance=1e-6, depth_only=depth_only, no_depth=no_depth
    )
    return _apply_refinement(T, R_est, t_est, no_depth=no_depth)


def _real_cloud(depth_crop, K_test, crop_offset=None):
    """Re-project the REAL depth crop once — it is pose-independent, so
    refine_batch shares one cloud across the depth-only and rotation-only
    stages instead of re-projecting per stage (PERF.md round-5 ICP
    attribution). K handling matches _refinement_clouds' two geometries.

    Returns (pts (N,3), sq (N,)) with sq = per-point squared norms — the
    pose-independent half of the centroid-distance gate, precomputed once
    so both refinement passes gate via one matvec (see _gate_dists_sq)."""
    K_crop = np.asarray(K_test, np.float64).copy()
    if crop_offset is not None:
        left, top = (int(v) for v in crop_offset)
        K_crop[0, 2] -= left
        K_crop[1, 2] -= top
    else:
        K_crop[0, 2] = depth_crop.shape[0] / 2
        K_crop[1, 2] = depth_crop.shape[1] / 2
    pts = rgbd_to_point_cloud(K_crop, depth_crop)[0]
    return pts, np.einsum("ij,ij->i", pts, pts)


def _gate_dists_sq(pts, pts_sq, centroid):
    """Squared distances ||p - c||^2 as |p|^2 - 2 p.c + |c|^2 — one matvec
    instead of an (N,3) temporary + square + sum + sqrt. With |p|^2 cached
    across calls (the real cloud is gated once per refinement pass per
    detection) this is the difference between ~65 ms and ~15 ms of gating
    math per 24-detection frame pass (PERF.md round-5 prep profile)."""
    return pts_sq - 2.0 * (pts @ centroid) + centroid @ centroid


def _refinement_clouds(
    depth_crop, icp_renderer, R_est, t_est, K_test, test_render_dims,
    max_mean_dist_factor=2.0, obj_id=0, rng=None, crop_offset=None,
    real_pts=None,
):
    """Host prep of one refinement: render, gate, subsample.

    Returns (A_sub (N_SUB,3) synthetic, B_sub (N_SUB,3) real) or None when
    the pass is gated out (object invisible / too little real depth).
    Flag-independent: the same clouds feed depth_only and no_depth stages.

    crop_offset=None reproduces the reference's geometry (icp_utils.py:
    248-270): synthetic depth rendered at [0, 0, tz] — i.e. CENTERED — and
    the real crop re-projected through a crop-centered K. For an instance
    far from the principal point the two clouds are then seen along
    DIFFERENT viewing rays, which biases the fitted x/y by up to ~20 mm at
    +-115 mm lateral offset (PERF.md round-4 ICP-geometry study). With
    crop_offset=(left, top) of the depth crop in the full frame, the
    frame-accurate variant renders only the crop's window at the estimated
    lateral position (render_depth_window — a pure viewport crop of the
    full-frame render), so both clouds live in the true camera frame.

    real_pts: the pre-projected real cloud as `_real_cloud`'s (pts, sq)
    pair — pass it when refining multiple stages of the same detection;
    None re-projects here.
    """
    rng = rng or np.random
    if crop_offset is not None:
        left, top = (int(v) for v in crop_offset)
        syn_crop = icp_renderer.render_depth_window(
            K_test, R_est, t_est, depth_crop.shape, (left, top),
            obj_id=obj_id,
        )
        K_crop = np.asarray(K_test, np.float64).copy()
        K_crop[0, 2] -= left
        K_crop[1, 2] -= top
        synthetic_pts = rgbd_to_point_cloud(K_crop, syn_crop)[0]
        if len(synthetic_pts) == 0:
            return None
        if real_pts is None:
            real_pts = _real_cloud(depth_crop, K_test, crop_offset=crop_offset)
    else:
        synthetic_pts = icp_renderer.generate_synthetic_depth(
            K_test, R_est, t_est, test_render_dims, obj_id=obj_id
        )
        if len(synthetic_pts) == 0:
            return None
        if real_pts is None:
            real_pts = _real_cloud(depth_crop, K_test, crop_offset=None)

    # axis-1 einsum reduction beats the strided axis-0 mean on (N,3) layout
    centroid_syn = np.einsum("ij->j", synthetic_pts) / len(synthetic_pts)
    syn_sq = np.einsum("ij,ij->i", synthetic_pts, synthetic_pts)
    # squared-distance gate: same boolean as dist < factor * max_dist for
    # non-negative operands, without the (N,3) temporaries and sqrts
    max_mean_dist_sq = np.max(_gate_dists_sq(synthetic_pts, syn_sq, centroid_syn))
    rp, rp_sq = real_pts
    dist_sq_to_syn = _gate_dists_sq(rp, rp_sq, centroid_syn)
    gated = np.flatnonzero(
        dist_sq_to_syn < max_mean_dist_factor**2 * max_mean_dist_sq
    )

    if len(gated) < len(synthetic_pts) / 8.0:
        return None  # not enough visible points

    # The reference draws min(len_real, len_syn, N) samples WITH replacement
    # (icp_utils.py:269-270, np.random.choice default). Drawing a fixed N_SUB
    # with replacement is the same sampling process (each point equally
    # likely) with a constant sample count — statistically equivalent, and it
    # keeps the jitted ICP at ONE compiled shape per flag combination instead
    # of recompiling for every distinct visible-point count.
    # draw indices into the gated set, then gather only the N_SUB rows —
    # same draws (choice over the same count, same rng stream) as gathering
    # from a materialized gated copy, without copying ~30k points first
    sub_real = gated[rng.choice(len(gated), N_SUB)]
    sub_syn = rng.choice(len(synthetic_pts), N_SUB)
    return synthetic_pts[sub_syn], rp[sub_real]


def _apply_refinement(T, R_est, t_est, no_depth=False):
    """Compose a fitted T onto the estimate, with the reference's 20-degree
    rotation-change rejection on the no_depth stage."""
    if no_depth and abs(rotation_angle(T[:3, :3])) > ANGLE_CHANGE_LIMIT:
        T = np.eye(4)  # reject implausible rotation jumps

    H_est = np.eye(4)
    H_est[:3, :3] = R_est
    H_est[:3, 3] = t_est
    H_refined = T @ H_est
    return H_refined[:3, :3], H_refined[:3, 3]


class ICP:
    """Multi-object runtime ICP (reference auto_pose/icp/icp.py): the
    3-stage refinement used by eval — tz-only ICP, x,y re-estimate via
    auto_pose6d(depth_pred=tz), then rotation-only ICP."""

    def __init__(self, renderers: dict):
        """renderers: class/object name -> SynRenderer."""
        self.renderers = renderers

    def refine(
        self,
        depth_crop,
        R_est,
        t_est,
        K_test,
        test_render_dims,
        class_name=None,
        codebook=None,
        det_img=None,
        det_bb=None,
        train_cfg=None,
        upright: bool = False,
    ):
        syn = self.renderers[class_name] if class_name else next(iter(self.renderers.values()))
        # stage 1: depth-only alignment
        R1, t1 = icp_refinement(
            depth_crop, syn, R_est, t_est, K_test, test_render_dims, depth_only=True
        )
        # stage 2: re-estimate x,y at the corrected depth
        if codebook is not None and det_img is not None:
            Rs, ts = codebook.auto_pose6d(
                det_img, det_bb, K_test, 1, train_cfg,
                depth_pred=t1[2], upright=upright,
            )
            R1, t1 = Rs[0], ts[0]
        # stage 3: rotation-only with angle-change rejection
        R2, t2 = icp_refinement(
            depth_crop, syn, R1, t1, K_test, test_render_dims, no_depth=True
        )
        return R2, t2

    def refine_batch(
        self,
        depth_crops,
        Rs,
        ts,
        K_test,
        test_render_dims,
        class_name=None,
        codebook=None,
        det_imgs=None,
        det_bbs=None,
        train_cfg=None,
        upright: bool = False,
        rng=None,
        topk_aggregate: int = 1,
        tta: int = 1,
        fixed_idcs=None,
        crop_offsets=None,
        stage2_candidates=None,
    ):
        """Batched 3-stage refinement for every estimate of a frame/scene.

        `topk_aggregate`/`tta` forward the caller's test-time aggregation
        settings to the stage-2 codebook re-query (with tta > 1, `det_imgs`
        holds the detection-major B*tta jittered-crop stack) — otherwise
        stage 2 would silently overwrite an aggregated initial rotation
        with a plain argmax one.

        `fixed_idcs` (n,) pins stage 2 to those codebook entries instead of
        re-querying: used after depth re-scoring (pose/rescore.py), where a
        fresh argmax would throw away the depth-selected candidate. The
        translation still re-solves at the stage-1-corrected depth.

        `crop_offsets` (n, 2) = each depth crop's (left, top) in the full
        frame enables the frame-accurate cloud geometry (see
        `_refinement_clouds`); None keeps the reference's centered-render
        geometry.

        `stage2_candidates` = (idcs (n, k), sims (n, k)) ranked codebook
        candidates ALREADY queried for these crops. Stage 2 then needs no
        encode/re-query at all: the encoder is deterministic, so re-running
        it on the same crops would return the same ranked candidates — the
        only stage-1 output it consumes is the corrected depth, which
        enters the pose solve on the host (aggregate + _solve_6d with
        depth_pred). PoseServer queried every crop at submit time, so its
        ICP stage passes the fetched candidates here and the stage-2
        encode+query leaves the serving critical path entirely
        (PERF.md round-5 serving A/B follow-up).

        Same algorithm as per-estimate `refine`, but each device stage is
        ONE vmapped dispatch + ONE host fetch for all n estimates (vs ~3
        round trips per estimate sequentially — through the tunnel this is
        the difference between O(n) and O(1) frame latency). Returns
        (Rs (n,3,3), ts (n,3)).
        """
        syn = self.renderers[class_name] if class_name else next(iter(self.renderers.values()))
        n = len(Rs)
        Rs = [np.asarray(R) for R in Rs]
        ts = [np.asarray(t) for t in ts]

        # the real clouds are pose-independent: project each detection's
        # depth crop ONCE and share it between the depth-only and
        # rotation-only stages (the gating + subsample stay per stage)
        real_clouds = [
            _real_cloud(
                depth_crops[i], K_test,
                crop_offset=(
                    crop_offsets[i] if crop_offsets is not None else None
                ),
            )
            for i in range(n)
        ]

        def batched_stage(Rs_in, ts_in, depth_only, no_depth):
            preps = [
                _refinement_clouds(
                    depth_crops[i], syn, Rs_in[i], ts_in[i], K_test,
                    test_render_dims, rng=rng,
                    crop_offset=(
                        crop_offsets[i] if crop_offsets is not None else None
                    ),
                    real_pts=real_clouds[i],
                )
                for i in range(n)
            ]
            live = [i for i, p in enumerate(preps) if p is not None]
            Rs_out, ts_out = list(Rs_in), list(ts_in)
            if live:
                As = np.stack([preps[i][0] for i in live])
                Bs = np.stack([preps[i][1] for i in live])
                fits = icp_batch(
                    As, Bs, tolerance=1e-6,
                    depth_only=depth_only, no_depth=no_depth,
                )
                for (T, _, _), i in zip(fits, live):
                    Rs_out[i], ts_out[i] = _apply_refinement(
                        T, Rs_in[i], ts_in[i], no_depth=no_depth
                    )
            return Rs_out, ts_out

        # stage 1: depth-only alignment
        R1s, t1s = batched_stage(Rs, ts, depth_only=True, no_depth=False)
        # stage 2: re-estimate x,y at the corrected depths (one encode batch)
        if stage2_candidates is not None and codebook is not None:
            from ..codebook import aggregate_candidates

            idcs_k, sims_k = stage2_candidates
            depth_pred = np.array([t[2] for t in t1s])
            R0, rendered_bbs, _ = aggregate_candidates(
                codebook.viewsphere, codebook.embed_obj_bbs,
                np.asarray(idcs_k), np.asarray(sims_k),
            )
            R2s, t2s = codebook._solve_6d(
                R0, rendered_bbs, np.stack(det_bbs), K_test, train_cfg,
                depth_pred=depth_pred,
            )
            R1s, t1s = list(R2s), list(t2s)
        elif fixed_idcs is not None and codebook is not None:
            depth_pred = np.array([t[2] for t in t1s])
            R2s, t2s = codebook.pose6d_from_indices(
                np.asarray(fixed_idcs), np.stack(det_bbs), K_test, train_cfg,
                depth_pred=depth_pred,
            )
            R1s, t1s = list(R2s), list(t2s)
        elif codebook is not None and det_imgs is not None:
            depth_pred = np.array([t[2] for t in t1s])
            R2s, t2s, _ = codebook.auto_pose6d_batch(
                np.stack(det_imgs), np.stack(det_bbs), K_test, train_cfg,
                depth_pred=depth_pred, upright=upright,
                topk_aggregate=topk_aggregate, tta=tta,
            )
            R1s, t1s = list(R2s), list(t2s)
        # stage 3: rotation-only with angle-change rejection
        R3s, t3s = batched_stage(R1s, t1s, depth_only=False, no_depth=True)
        return np.stack(R3s), np.stack(t3s)
