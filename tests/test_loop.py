"""Loop-closing component tests: RANSAC alignment, Sim3 refinement,
pose-graph optimization, vocabulary retrieval, relocalization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eao_fusion_tpu.mapping import vocabulary
from eao_fusion_tpu.ops import lie, ransac
from eao_fusion_tpu.solvers import pose_graph


class TestRansacAlign:
    def test_se3_with_outliers(self):
        r = np.random.default_rng(0)
        pa = r.uniform(-2, 2, (100, 3)).astype(np.float32)
        g_gt = np.asarray(lie.sim3_exp(jnp.asarray(
            np.r_[0.2, -0.1, 0.3, 0.5, -0.2, 0.8, 0.0].astype(np.float32))))
        pb = np.asarray(lie.sim3_apply(jnp.asarray(g_gt), jnp.asarray(pa)))
        pb = pb + r.normal(0, 0.005, pb.shape).astype(np.float32)
        pb = np.array(pb)
        out = r.choice(100, 30, replace=False)
        pb[out] += r.uniform(0.5, 2.0, (30, 3)).astype(np.float32)
        res = ransac.ransac_align(jnp.asarray(pa), jnp.asarray(pb),
                                  jnp.ones(100, bool), jax.random.PRNGKey(0),
                                  with_scale=False, inlier_th=0.05)
        assert int(res.n_inliers) >= 60
        inl = np.asarray(res.inliers)
        assert not inl[out].any()
        err = np.asarray(lie.sim3_log(lie.sim3_compose(
            lie.sim3_inverse(res.transform), jnp.asarray(g_gt))))
        assert np.linalg.norm(err) < 0.05

    def test_sim3_scale_recovery(self):
        r = np.random.default_rng(1)
        pa = r.uniform(-2, 2, (50, 3)).astype(np.float32)
        g_gt = np.asarray(lie.sim3_exp(jnp.asarray(
            np.r_[0.1, 0.2, -0.1, 0.3, 0.1, -0.4, 0.3].astype(np.float32))))
        pb = np.asarray(lie.sim3_apply(jnp.asarray(g_gt), jnp.asarray(pa)))
        res = ransac.ransac_align(jnp.asarray(pa), jnp.asarray(pb),
                                  jnp.ones(50, bool), jax.random.PRNGKey(1),
                                  with_scale=True, inlier_th=0.05)
        assert abs(float(res.transform[7]) - float(g_gt[7])) < 0.02


class TestSim3Refine:
    def test_converges(self):
        r = np.random.default_rng(2)
        pa = r.uniform(-1, 1, (40, 3)).astype(np.float32)
        g_gt = np.asarray(lie.sim3_exp(jnp.asarray(
            np.r_[0.05, -0.1, 0.08, 0.2, 0.1, -0.1, 0.0].astype(np.float32))))
        pb = np.asarray(lie.sim3_apply(jnp.asarray(g_gt), jnp.asarray(pa)))
        g0 = np.asarray(lie.sim3_retract(jnp.asarray(g_gt), jnp.asarray(
            np.r_[0.03, 0.02, -0.04, 0.05, -0.06, 0.02, 0.0]
            .astype(np.float32))))
        g = pose_graph.sim3_refine(jnp.asarray(pa), jnp.asarray(pb),
                                   jnp.ones(40), jnp.asarray(g0))
        err = np.asarray(lie.sim3_log(lie.sim3_compose(
            lie.sim3_inverse(g), jnp.asarray(g_gt))))
        assert np.linalg.norm(err) < 1e-3


class TestPoseGraph:
    def test_closes_drifted_ring(self):
        """12 keyframes around a circle with odometry drift; a perfect loop
        edge between last and first must pull the ring closed."""
        K = 12
        # ground-truth ring
        gt = []
        for i in range(K):
            ang = 2 * np.pi * i / K
            tau = np.r_[0, ang, 0, np.sin(ang), 0, 1 - np.cos(ang)]
            gt.append(np.asarray(lie.se3_exp(jnp.asarray(
                tau.astype(np.float32)))))
        gt = np.stack(gt)
        # drifted estimates: inject growing yaw error
        est = gt.copy()
        for i in range(1, K):
            drift = np.r_[0, 0.03 * i, 0, 0.02 * i, 0, 0].astype(np.float32)
            est[i] = np.asarray(lie.se3_retract(jnp.asarray(gt[i]),
                                                jnp.asarray(drift)))
        est_sim = np.asarray(lie.sim3_from_se3(jnp.asarray(est)))
        gt_sim = np.asarray(lie.sim3_from_se3(jnp.asarray(gt)))

        # odometry edges from drifted relative poses; loop edge from GT
        ei, ej, meas, w = [], [], [], []
        for i in range(K - 1):
            ei.append(i)
            ej.append(i + 1)
            m = np.asarray(lie.sim3_compose(
                jnp.asarray(est_sim[i + 1]),
                lie.sim3_inverse(jnp.asarray(est_sim[i]))))
            meas.append(m)
            w.append(1.0)
        ei.append(K - 1)
        ej.append(0)
        meas.append(np.asarray(lie.sim3_compose(
            jnp.asarray(gt_sim[0]),
            lie.sim3_inverse(jnp.asarray(gt_sim[K - 1])))))
        w.append(5.0)

        fixed = np.zeros(K, bool)
        fixed[0] = True
        prob = pose_graph.PoseGraphProblem(
            poses=jnp.asarray(est_sim), pose_valid=jnp.ones(K, bool),
            fixed=jnp.asarray(fixed), edge_i=jnp.asarray(np.array(ei, np.int32)),
            edge_j=jnp.asarray(np.array(ej, np.int32)),
            edge_meas=jnp.asarray(np.stack(meas)),
            edge_weight=jnp.asarray(np.array(w, np.float32)))
        opt = np.asarray(pose_graph.optimize_pose_graph(prob, n_iters=30))

        def ring_gap(poses):
            # residual of the loop edge
            rel = np.asarray(lie.sim3_compose(
                jnp.asarray(meas[-1]),
                lie.sim3_compose(jnp.asarray(poses[K - 1]),
                                 lie.sim3_inverse(jnp.asarray(poses[0])))))
            return np.linalg.norm(np.asarray(lie.sim3_log(jnp.asarray(rel))))

        assert ring_gap(opt) < 0.1 * ring_gap(est_sim)


class TestVocabulary:
    def test_retrieval_ranks_same_place_first(self):
        from eao_fusion_tpu.config import SystemConfig, ORBConfig
        from eao_fusion_tpu.frontend import extractor
        from eao_fusion_tpu.io import synthetic
        cfg = SystemConfig(orb=ORBConfig(n_features=500, max_keypoints=512))
        seq = synthetic.generate_sequence(n_frames=3, seed=0, style="arc",
                                          cache_dir=synthetic.DEFAULT_CACHE)
        seq2 = synthetic.generate_sequence(n_frames=3, seed=9, style="arc",
                                           cache_dir=synthetic.DEFAULT_CACHE)
        import os
        if os.path.exists(vocabulary.DEFAULT_VOCAB_PATH):
            vocab = vocabulary.Vocabulary.load()
        else:
            pytest.skip("trained vocabulary not present")
        vs = []
        for f in [seq.frames[0], seq.frames[1], seq2.frames[0]]:
            feats = extractor.extract_features(
                jnp.asarray(f.gray), jnp.asarray(f.depth),
                orb_cfg=cfg.orb, cam_cfg=cfg.camera)
            vs.append(vocabulary.bow_vector(vocab, feats.desc_pm1,
                                            feats.valid))
        db = jnp.stack(vs[1:])
        s = np.asarray(vocabulary.l1_scores(vs[0], db, jnp.ones(2, bool)))
        # nearby frame of the same scene must outscore a different scene
        assert s[0] > s[1]
