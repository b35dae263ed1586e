"""Sharded training-step and graft-entry contract tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestMesh:
    def test_make_mesh_shapes(self):
        from dspslam_tpu.parallel import mesh_utils

        mesh = mesh_utils.make_mesh(8)
        assert mesh.shape["dp"] * mesh.shape["tp"] == 8
        mesh1 = mesh_utils.make_mesh(1)
        assert mesh1.shape == {"dp": 1, "tp": 1}


class TestTrainStep:
    def test_single_device_loss_decreases(self):
        from dspslam_tpu.models import deepsdf, deepsdf_train

        cfg = deepsdf.DecoderConfig(code_len=8, hidden=(32, 32), latent_in=())
        opt = deepsdf_train.make_optimizer(1e-3)
        state = deepsdf_train.init_state(cfg, 4, jax.random.PRNGKey(0), opt)
        batch = deepsdf_train.make_sphere_dataset(jax.random.PRNGKey(1), 4, 2048)
        losses = []
        for _ in range(150):
            state, loss = deepsdf_train.train_step(state, batch, cfg, opt)
            losses.append(float(loss))
        # near-surface-biased sampling (deepsdf_train.make_sphere_dataset)
        # is a harder target distribution for this capacity-limited 32x32
        # net: it plateaus at ~0.52x the initial loss
        assert losses[-1] < 0.6 * losses[0]

    def test_sharded_matches_single_device(self):
        from dspslam_tpu.models import deepsdf, deepsdf_train
        from dspslam_tpu.parallel import mesh_utils
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = deepsdf.DecoderConfig(code_len=8, hidden=(64, 64, 64), latent_in=())
        opt = deepsdf_train.make_optimizer(1e-3)
        batch = deepsdf_train.make_sphere_dataset(jax.random.PRNGKey(1), 4, 256)

        state0 = deepsdf_train.init_state(cfg, 4, jax.random.PRNGKey(0), opt)
        _, loss_single = deepsdf_train.train_step(state0, batch, cfg, opt)

        mesh = mesh_utils.make_mesh(8)
        state1 = deepsdf_train.init_state(cfg, 4, jax.random.PRNGKey(0), opt)
        with mesh:
            params = mesh_utils.decoder_param_sharding(mesh, state1.params)
            codes = jax.device_put(state1.codes, NamedSharding(mesh, P()))
            state1 = deepsdf_train.TrainState(
                params, codes, state1.opt_state, state1.step
            )
            sharded_batch = mesh_utils.batch_sharding(mesh)(batch)
            _, loss_sharded = deepsdf_train.train_step(
                state1, sharded_batch, cfg, opt
            )
        np.testing.assert_allclose(
            float(loss_single), float(loss_sharded), rtol=1e-4
        )


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        t_cam_obj, code, loss = out
        assert t_cam_obj.shape == (4, 4, 4)
        assert np.all(np.isfinite(np.asarray(t_cam_obj)))

    def test_dryrun_multichip_8(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestShardedMeshDecode:
    def test_sharded_sdf_grid_matches_unsharded(self):
        import numpy as np

        from dspslam_tpu.models import deepsdf
        from dspslam_tpu.parallel import mesh_utils
        from dspslam_tpu.shape import mesh as mesh_mod

        params = deepsdf.make_sphere_params(code_len=8)
        code = np.zeros(8, np.float32)
        code[0] = 0.5
        ref = np.asarray(mesh_mod.decode_sdf_grid(
            deepsdf.sphere_decoder_fn, params, code, 17
        ))
        dev_mesh = mesh_utils.make_mesh(8, tp=1)
        got = np.asarray(mesh_mod.decode_sdf_grid_sharded(
            deepsdf.sphere_decoder_fn, params, code, 17, dev_mesh
        ))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_sharded_object_gn_matches_unsharded(self):
        """Per-keyframe multi-object GN with the object batch sharded
        over dp (mesh_utils.sharded_object_gn) reproduces the
        single-device result — objects are independent, so partitioning
        inserts no collectives in the hot loop."""
        import numpy as np

        from dspslam_tpu.models import deepsdf
        from dspslam_tpu.parallel import mesh_utils
        from dspslam_tpu.shape import gn

        cfg = gn.GNConfig(
            code_len=8, num_iterations=2, num_depth_samples=8,
            max_grad_points=64,
        )
        params = deepsdf.make_sphere_params(code_len=8)
        recon = gn.batched_reconstruct(deepsdf.sphere_decoder_fn, cfg)
        B, P, R = 8, 32, 32
        rng = np.random.default_rng(0)
        t = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        t[:, :3, :3] *= 2.0
        t[:, 2, 3] = 8.0
        dirs = rng.normal(size=(B, P, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        args = (
            jnp.asarray(t),
            jnp.asarray(dirs + np.array([0, 0, 8.0]), jnp.float32),
            jnp.ones((B, P), jnp.float32),
            jnp.asarray(
                rng.normal(0, 0.05, (B, R, 3)) + np.array([0, 0, 1.0]),
                jnp.float32,
            ),
            jnp.ones((B, R), jnp.float32),
            jnp.full((B, R), 8.0, jnp.float32),
            jnp.ones((B, R), jnp.float32),
            jnp.zeros((B, 8), jnp.float32),
        )
        ref = recon(params, *args)
        got = mesh_utils.sharded_object_gn(
            mesh_utils.make_mesh(8, tp=1), recon, params, *args
        )
        np.testing.assert_allclose(
            np.asarray(got["t_cam_obj"]), np.asarray(ref["t_cam_obj"]),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got["loss"]), np.asarray(ref["loss"]), atol=1e-4
        )

    def test_extractor_with_mesh_produces_sphere(self):
        import numpy as np

        from dspslam_tpu.models import deepsdf
        from dspslam_tpu.parallel import mesh_utils
        from dspslam_tpu.shape import mesh as mesh_mod

        params = deepsdf.make_sphere_params(code_len=8)
        ex = mesh_mod.MeshExtractor(
            deepsdf.sphere_decoder_fn, params, code_len=8, voxels_dim=25,
            mesh=mesh_utils.make_mesh(8, tp=1),
        )
        m = ex.extract_mesh_from_code(np.zeros(8, np.float32))
        r = np.linalg.norm(m["vertices"], axis=-1)
        assert len(r) > 100
        np.testing.assert_allclose(r.mean(), 0.5, atol=0.03)
