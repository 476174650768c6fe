"""Multi-device tests on the virtual 8-CPU mesh: sharded BA, sharded extraction,
sharded matching — same programs as single-device, placement does the parallelism."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import pytest

from vo_tpu.ba import BAConfig, bundle_adjust
from vo_tpu.ba.distributed import bundle_adjust_sharded
from vo_tpu.parallel import make_mesh, shard_frames
from tests.test_ba import make_ba_problem


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return make_mesh(n_data=4, n_model=2)


class TestShardedBA:
    def test_matches_single_device(self, rng, mesh8):
        prob, poses_gt, _ = make_ba_problem(rng, P=6, L=96, M=64)
        poses_1, points_1, info_1 = bundle_adjust(prob, BAConfig(iterations=8))
        poses_n, points_n, info_n = bundle_adjust_sharded(prob, mesh8,
                                                          BAConfig(iterations=8))
        assert np.allclose(np.asarray(poses_1), np.asarray(poses_n), atol=1e-3)
        assert np.isclose(float(info_1["final_cost"]), float(info_n["final_cost"]),
                          rtol=1e-2)


class TestShardedExtraction:
    def test_dp_extraction_matches(self, rng, mesh8):
        from vo_tpu.features.extractor import OrbLikeExtractor

        imgs = rng.uniform(0, 255, (8, 120, 160)).astype(np.float32)
        ex = OrbLikeExtractor(max_kp=128)
        ref = ex(jnp.asarray(imgs))
        with mesh8:
            sharded_imgs = jax.device_put(
                jnp.asarray(imgs), NamedSharding(mesh8, P("data")))
            out = ex(sharded_imgs)
        assert np.allclose(np.asarray(ref.kp), np.asarray(out.kp))
        assert np.allclose(np.asarray(ref.desc, np.float32),
                           np.asarray(out.desc, np.float32))


class TestGraftEntry:
    def test_entry_and_dryrun(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = fn(*args)
        assert out[0].shape[0] == args[0].shape[0]
        g.dryrun_multichip(8)
