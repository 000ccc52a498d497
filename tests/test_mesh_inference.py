"""Data-parallel inference over the virtual 8-device mesh: batch sharded,
params replicated, outputs match single-device results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


@pytest.mark.parametrize("num_beams,max_length", [(1, 6), (3, 12)])
def test_mesh_serving_matches_single_device(tmp_path, num_beams, max_length):
    """Data-parallel serving through the real pipeline: params replicated,
    batches sharded over a 2-device mesh; reports identical to unsharded
    serving, including a padded final partial batch (5 images, batch 4).
    The beam case also routes through the length-bucket cascade (buckets
    (4, 12) < max_length) so DP + beam + cascade compose."""
    import dataclasses

    import cv2

    from rgrg_tpu.core.config import GenerationConfig
    from rgrg_tpu.inference import ReportGenerator
    from rgrg_tpu.serving import generate_reports_pipelined
    from rgrg_tpu.text.tokenizer import GPT2Tokenizer

    cfg = dataclasses.replace(
        SMOKE_CFG, generation=GenerationConfig(length_buckets=(4, 12)))
    model = RGRG(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0))
    gen = ReportGenerator(params, GPT2Tokenizer.dummy(), cfg=cfg)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"i{i}.png")
        cv2.imwrite(p, (np.random.default_rng(i).uniform(0, 255, (600, 500))
                        ).astype(np.uint8))
        paths.append(p)

    kwargs = dict(batch_size=4, num_beams=num_beams, max_length=max_length,
                  kv_cache_dtype=None)
    base = [r for chunk in generate_reports_pipelined(gen, paths, **kwargs)
            for r in chunk]
    mesh = mesh_lib.make_mesh(num_devices=2)
    sharded = [r for chunk in generate_reports_pipelined(
        gen, paths, mesh=mesh, **kwargs) for r in chunk]
    assert len(base) == len(sharded) == 5
    for a, b in zip(base, sharded):
        assert a.report == b.report
        np.testing.assert_array_equal(a.selected_regions, b.selected_regions)


def test_mesh_serving_rejects_bad_batch_size():
    import pytest as _pytest

    from rgrg_tpu.inference import ReportGenerator
    from rgrg_tpu.serving import generate_reports_pipelined
    from rgrg_tpu.text.tokenizer import GPT2Tokenizer

    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    gen = ReportGenerator(params, GPT2Tokenizer.dummy(), cfg=SMOKE_CFG)
    mesh = mesh_lib.make_mesh(num_devices=3)
    imgs = [np.zeros((64, 64), np.uint8)] * 4
    with _pytest.raises(ValueError, match="multiple"):
        list(generate_reports_pipelined(gen, imgs, batch_size=4, mesh=mesh))
