"""Distributed (sharded) BA vs single-device BA on the 8-device CPU mesh —
the hermetic multi-chip test pattern (SURVEY.md §4 implication)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from corbslam_tpu.geometry import camera, se3
from corbslam_tpu.optim import ba
from corbslam_tpu.parallel import distributed_ba

CAM = camera.Intrinsics.create(
    fx=718.856, fy=718.856, cx=607.1928, cy=185.2157, bf=386.1448,
)


def make_problem(rng, n_cams=8, n_points=500):
    X = np.stack(
        [rng.uniform(-15, 15, n_points), rng.uniform(-5, 5, n_points),
         rng.uniform(12, 40, n_points)], -1
    ).astype(np.float32)
    poses = np.stack(
        [np.asarray(se3.exp(jnp.asarray([c * 0.6, 0.02 * c, 0.0, 0.0, 0.02 * c, 0.0], jnp.float32)))
         for c in range(n_cams)]
    )
    oc, op, uvr = [], [], []
    for c in range(n_cams):
        pc = np.asarray(se3.transform(jnp.asarray(poses[c]), jnp.asarray(X)))
        u = np.array(camera.project_stereo(CAM, jnp.asarray(pc)))
        u += rng.normal(scale=0.2, size=u.shape)
        idx = np.where(pc[:, 2] > 1)[0]
        oc.append(np.full(len(idx), c))
        op.append(idx)
        uvr.append(u[idx])
    oc = np.concatenate(oc).astype(np.int32)
    op = np.concatenate(op).astype(np.int32)
    uvr = np.concatenate(uvr).astype(np.float32)
    O = len(oc)
    dT = rng.normal(scale=0.02, size=(n_cams, 6)).astype(np.float32)
    dT[0] = 0
    return poses, X, ba.BAProblem(
        Tcw=se3.retract(jnp.asarray(poses), jnp.asarray(dT)),
        pose_fixed=jnp.asarray(np.arange(n_cams) == 0),
        X=jnp.asarray(X + rng.normal(scale=0.15, size=X.shape).astype(np.float32)),
        point_fixed=jnp.zeros(n_points, bool),
        obs_cam=jnp.asarray(oc), obs_point=jnp.asarray(op),
        obs_uvr=jnp.asarray(uvr),
        obs_inv_sigma2=jnp.ones(O, jnp.float32),
        obs_stereo=jnp.ones(O, bool),
        obs_valid=jnp.ones(O, bool),
    )


class TestDistributedBA:
    @pytest.fixture(scope="class")
    def mesh(self):
        devs = np.asarray(jax.devices())
        assert len(devs) == 8, "conftest must force 8 CPU devices"
        return Mesh(devs, (distributed_ba.AXIS,))

    def test_converges_like_single_device(self, mesh, rng):
        poses_true, X_true, prob = make_problem(rng)
        Tcw_d, X_d = distributed_ba.distributed_ba(
            CAM, prob, mesh, n_iters=12, cg_iters=60
        )
        # Pose error vs ground truth after optimization
        for c in range(1, 8):
            e = np.asarray(se3.log(se3.compose(jnp.asarray(Tcw_d)[c], se3.inverse(jnp.asarray(poses_true[c])))))
            assert np.abs(e).max() < 0.01, (c, e)

    def test_matches_unsharded_step(self, mesh, rng):
        """One sharded GN step == one unsharded GN step (same math)."""
        _, _, prob = make_problem(rng, n_cams=4, n_points=200)
        prob_p = distributed_ba.pad_observations(prob, 8)
        step = distributed_ba.make_gn_step(CAM, mesh, cg_iters=25)
        T1, X1 = step(
            prob_p.Tcw, prob_p.X, prob_p.pose_fixed, prob_p.point_fixed,
            prob_p.obs_cam, prob_p.obs_point, prob_p.obs_uvr,
            prob_p.obs_inv_sigma2, prob_p.obs_stereo, prob_p.obs_valid,
            jnp.float32(1e-4),
        )
        mesh1 = Mesh(np.asarray(jax.devices())[:1], (distributed_ba.AXIS,))
        step1 = distributed_ba.make_gn_step(CAM, mesh1, cg_iters=25)
        T2, X2 = step1(
            prob_p.Tcw, prob_p.X, prob_p.pose_fixed, prob_p.point_fixed,
            prob_p.obs_cam, prob_p.obs_point, prob_p.obs_uvr,
            prob_p.obs_inv_sigma2, prob_p.obs_stereo, prob_p.obs_valid,
            jnp.float32(1e-4),
        )
        np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), atol=5e-3)
