"""Data-parallel inference over the virtual 8-device mesh: batch sharded,
params replicated, outputs match single-device results."""

import numpy as np
import jax
import jax.numpy as jnp

from rgrg_tpu.core import mesh as mesh_lib
from rgrg_tpu.models.full_model import RGRG

from tests.test_full_model import SMOKE_CFG


def test_sharded_detect_matches_single_device():
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 512, 512, 1)) * 0.3

    single = model.detect(params, images)

    mesh = mesh_lib.make_mesh(batch_size=8)
    assert mesh.size == 8
    with mesh:
        p = mesh_lib.replicate_pytree(params, mesh)
        x = jax.device_put(images, mesh_lib.batch_sharded(mesh))
        sharded = model.detect(p, x)

    np.testing.assert_array_equal(np.asarray(single["class_detected"]),
                                  np.asarray(sharded["class_detected"]))
    np.testing.assert_allclose(np.asarray(single["region_features"]),
                               np.asarray(sharded["region_features"]),
                               rtol=1e-4, atol=1e-4)


def test_mesh_clamps_to_batch():
    mesh = mesh_lib.make_mesh(batch_size=3)
    assert mesh.size in (1, 3)
